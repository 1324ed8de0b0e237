package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines document ingest with schema enforcement and corrupt-line
  * QUARANTINE — the front door of a web-scale text pipeline (crawl
  * dumps arrive as JSONL with a long tail of truncated lines, encoding
  * damage, and schema drift; dropping them silently loses data,
  * failing the job on one bad line loses the day).
  *
  * Shape: ONE text scan, then a map-only `from_json` with a
  * `_corrupt_record` field in the schema — PERMISSIVE parsing puts the
  * raw line there when it fails to parse, and the two output frames
  * split on its nullness. This deliberately avoids
  * `spark.read.json(path)`: referencing only the corrupt column of a
  * direct JSON scan is disallowed (Spark requires caching the whole
  * relation — SPARK-21610), and the documented workaround is a cache
  * that is exactly wrong at 100 TB. The text-then-from_json form has no
  * such restriction, parses each line once, and keeps the quarantine a
  * plain filter.
  *
  * Type drift (parseable JSON, wrong field type) also quarantines: a
  * line whose `doc_id` is not a bigint yields a NULL key, and keyless
  * documents cannot enter a keyed corpus. */
object JsonlDocuments {

  /** The documents-table schema the rest of the engine expects. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** `clean`: typed rows matching [[schema]]. `quarantine`: the raw
    * offending line + its source file, ready for a side sink. */
  case class IngestResult(clean: DataFrame, quarantine: DataFrame)

  def read(spark: SparkSession, path: String): IngestResult = {
    import spark.implicits._
    val parseSchema = schema.add("_corrupt_record", StringType)
    val parsed = spark.read.textFile(path).toDF("line")
      .select($"line", input_file_name().as("src_file"))
      .withColumn("j", from_json($"line", parseSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))
    val clean = parsed
      .filter($"j._corrupt_record".isNull && $"j.doc_id".isNotNull)
      .select(schema.fieldNames.map(f => col(s"j.$f")): _*)
    val quarantine = parsed
      .filter($"j._corrupt_record".isNotNull || $"j.doc_id".isNull)
      .select($"line", $"src_file")
    IngestResult(clean, quarantine)
  }
}
