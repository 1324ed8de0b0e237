package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** One sampled frame emitted by the frame-sampling pipeline. */
case class SampledFrame(
    media_id: Long,
    frame_idx: Int,
    byte_offset: Long,
    frame_bytes: Int,
    frame_hash: Long)

/** Multimodal column handling (SURVEY.md §2.F): media payloads travel
  * as opaque `binary` columns beside typed metadata; decode/
  * feature-extraction runs per-partition against a pluggable decoder.
  *
  * The decode step is STUBBED (this container ships no media codecs):
  * [[Multimodal.StubDecoder]] treats the payload as fixed-size chunks.
  * Everything around it — schema, partitioning, per-partition batch
  * shape, sampling, output schema — is the real production plumbing; a
  * real H.264/VP9 decoder drops in by implementing [[FrameDecoder]].
  *
  * Scale: payloads never shuffle (decode is a map-only pass over the
  * scan); metadata-only queries never touch the binary column thanks to
  * parquet column pruning.
  */
object Multimodal {

  // ---------------------------------------------------------------- F1
  /** Typed-metadata manifest over binary media payloads. The payload is
    * materialized (text → utf-8 bytes stands in for a video blob) and
    * immediately pruned away for metadata-only consumers — the query
    * output is pure arithmetic, so it oracle-checks in DuckDB. */
  def mmManifest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id".as("media_id"), $"text".cast("binary").as("payload"),
        $"n_chars", $"source")
      .select(
        $"media_id",
        length($"payload").cast("long").as("size_bytes"),
        element_at(array(lit("h264"), lit("vp9"), lit("av1")),
          ($"media_id" % 3).cast("int") + 1).as("codec"),
        (lit(320) + ($"media_id" % 4) * 160).cast("int").as("width"),
        (lit(240) + ($"media_id" % 4) * 120).cast("int").as("height"),
        round($"n_chars".cast("double") / 32.0, 2).as("duration_s"),
        $"source")
      .orderBy($"media_id")
  }

  val mmManifestSql: String =
    """SELECT doc_id AS media_id,
      |  octet_length(encode(text)) AS size_bytes,
      |  CASE doc_id % 3 WHEN 0 THEN 'h264' WHEN 1 THEN 'vp9' ELSE 'av1' END AS codec,
      |  CAST(320 + (doc_id % 4) * 160 AS INT) AS width,
      |  CAST(240 + (doc_id % 4) * 120 AS INT) AS height,
      |  ROUND(CAST(n_chars AS DOUBLE) / 32.0, 2) AS duration_s,
      |  source
      |FROM documents ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------- F3
  /** Fleet-level media stats per (codec, source): the metadata-only
    * rollup a curation pipeline runs before deciding what to decode.
    * Composes on the F1 manifest; one map-side-partial agg shuffle on
    * the tiny (codec, source) key space. */
  def mmCodecStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mmManifest(spark, sfDir)
      .groupBy($"codec", $"source")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"size_bytes").as("total_bytes"),
        (sum($"duration_s".cast("decimal(18,4)")).cast("double") / count(lit(1)))
          .as("avg_duration_s"))
      .orderBy($"codec", $"source")
  }

  val mmCodecStatsSql: String =
    s"""WITH manifest AS (${mmManifestSql.replace("ORDER BY media_id", "")})
       |SELECT codec, source, COUNT(*) AS n_media,
       |  CAST(SUM(size_bytes) AS BIGINT) AS total_bytes,
       |  CAST(SUM(CAST(duration_s AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_duration_s
       |FROM manifest GROUP BY codec, source
       |ORDER BY codec, source""".stripMargin

  // ---------------------------------------------------------------- F2
  /** Decoder contract: payload bytes → iterator of frames. Real codec
    * integrations implement this; it runs inside mapPartitions so one
    * instance serves a whole partition (amortized init — the batch
    * shape a JNI/FFI decoder needs). */
  trait FrameDecoder extends Serializable {
    def decode(payload: Array[Byte]): Iterator[Array[Byte]]
  }

  /** STUB decoder — deterministic fake standing in for a real codec:
    * "frames" are fixed `frameSize`-byte chunks of the payload. */
  final class StubDecoder(frameSize: Int) extends FrameDecoder {
    override def decode(payload: Array[Byte]): Iterator[Array[Byte]] =
      payload.grouped(frameSize)
  }

  /** Frame sampling: decode each payload, keep every `stride`-th frame,
    * emit (media_id, frame_idx, byte_offset, frame_bytes, frame_hash).
    * Map-only (no shuffle); decoder instantiated once per partition. */
  def frameSample(media: Dataset[(Long, Array[Byte])],
      frameSize: Int = 64, stride: Int = 4): Dataset[SampledFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new StubDecoder(frameSize)
      rows.flatMap { case (id, payload) =>
        decoder.decode(payload).zipWithIndex.collect {
          case (frame, idx) if idx % stride == 0 =>
            var h = 1469598103934665603L // FNV-1a over frame bytes
            var i = 0
            while (i < frame.length) {
              h = (h ^ (frame(i) & 0xff)) * 1099511628211L; i += 1
            }
            SampledFrame(id, idx, idx.toLong * frameSize, frame.length, h)
        }
      }
    }
  }

  /** Driver-facing query: sample frames from the documents-as-media
    * payloads (rows-only; the stub decode is engine-specific). */
  def mmFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text".cast("binary"))
      .as[(Long, Array[Byte])]
    frameSample(media)
      .orderBy($"media_id", $"frame_idx")
      .toDF()
  }
}
