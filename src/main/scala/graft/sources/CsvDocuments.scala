package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV document ingest with schema enforcement and corrupt-row
  * QUARANTINE — the JSONL front door's sibling for the other format
  * bulk text actually arrives in (exports, labeling-vendor deliveries,
  * spreadsheet-born metadata). Same contract as [[JsonlDocuments]]:
  * never drop silently, never fail the job on one bad row.
  *
  * Shape: ONE text scan, then a map-only `from_csv` with a
  * `_corrupt_record` field — PERMISSIVE parsing lands the raw row
  * there on column-count damage, unclosed quotes, or type drift
  * (`doc_id` not a bigint ⇒ corrupt or NULL key; keyless documents
  * cannot enter a keyed corpus). The text-then-from_csv form keeps
  * the quarantine a plain filter and parses each line exactly once —
  * the same SPARK-21610 reasoning as the JSONL path (a direct
  * `spark.read.csv` corrupt-column reference demands caching the
  * whole relation: exactly wrong at 100 TB).
  *
  * Header rows: CSV files carry their header IN-BAND, and `textFile`
  * sees it as just another line. Rather than per-file first-line
  * bookkeeping (which breaks under splittable reads at scale — a
  * 128 MB split boundary does not know where its file began), the
  * header line is matched by VALUE and dropped wherever it appears;
  * a data row that happens to equal the header verbatim is
  * indistinguishable from a header by construction.
  *
  * CONTRACT — column order is FIXED to [[schema]]'s order. CSV
  * parsing is positional: a file with the same columns in a
  * different order would parse with string fields silently swapped
  * (string↔string swaps satisfy any schema). The detection signal is
  * the HEADER: a reordered file's header does not match the
  * canonical line, so it lands in quarantine as the first row of
  * that file — an operator watching the quarantine sees one header
  * row per misordered file BEFORE trusting its data. (The JSONL
  * sibling is immune — its fields are keyed.)
  *
  * LIMITATION — quoted fields containing NEWLINES (legal CSV) cannot
  * survive a line-based splittable read: the record arrives as two
  * lines and both quarantine (unclosed quote + type drift). Multiline
  * documents belong on the JSONL path, where \n is escaped in-band;
  * this front door is for the single-line-record deliveries
  * (metadata exports, label files) CSV is actually used for. */
object CsvDocuments {

  /** The documents-table schema, as the CSV columns in order. */
  val schema = JsonlDocuments.schema

  private val headerLine: String = schema.fieldNames.mkString(",")

  def read(spark: SparkSession, path: String): JsonlDocuments.IngestResult = {
    import spark.implicits._
    val parseSchema = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    val parsed = spark.read.textFile(path).toDF("line")
      .filter($"line" =!= headerLine && length(trim($"line")) > 0)
      .select($"line", input_file_name().as("src_file"))
      .withColumn("c", from_csv($"line", parseSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))
    val clean = parsed
      .filter($"c._corrupt_record".isNull && $"c.doc_id".isNotNull)
      .select(schema.fieldNames.map(f => col(s"c.$f")): _*)
    val quarantine = parsed
      .filter($"c._corrupt_record".isNotNull || $"c.doc_id".isNull)
      .select($"line", $"src_file")
    JsonlDocuments.IngestResult(clean, quarantine)
  }
}
