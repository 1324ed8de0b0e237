package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming sources for device telemetry.
  *
  * The reference feeds from a managed video-stream service; in this
  * library the transport is abstracted to "a stream of DeviceEvent
  * rows". Three interchangeable sources:
  *
  *  - [[fileStream]]: micro-batch file source over a directory of
  *    parquet drops (the production shape: landing zone → stream).
  *  - [[rateStream]]: synthetic load from Spark's rate source, mapped
  *    onto the event schema (soak/perf testing without data).
  *  - MemoryStream[DeviceEvent] in specs (driven row-by-row).
  *
  * All emit the exact `events` table schema, so every batch operator in
  * [[graft.operators.Monitoring]] and every streaming transform in
  * [[graft.streaming.StreamingAggs]] applies unchanged.
  */
object EventSource {

  /** The canonical event schema (events.parquet, with ts as proper
    * timestamp). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Micro-batch file stream over a landing directory of parquet files.
    * `maxFilesPerTrigger=1` gives deterministic batch boundaries in
    * tests; production would tune trigger + file size instead. */
  def fileStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Synthetic event stream from the rate source: deterministic mapping
    * from (value) to the event schema; ~`rowsPerSecond` events/s with
    * `nDevices` devices and a fixed error ratio. */
  def rateStream(spark: SparkSession, rowsPerSecond: Int = 1000,
      nDevices: Int = 16): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        pmod(col("value"), lit(nDevices)).cast("long").as("user_id"),
        when(pmod(col("value"), lit(5)) === 0, "error")
          .when(pmod(col("value"), lit(5)) === 1, "purchase")
          .when(pmod(col("value"), lit(5)) === 2, "click")
          .when(pmod(col("value"), lit(5)) === 3, "view")
          .otherwise("signup").as("event_type"),
        (pmod(col("value"), lit(1000)).cast("double") / 10.0).as("value"),
        concat(lit("{\"k\": "), pmod(col("value"), lit(100)), lit("}")).as("props"))

  /** Replay the batch events table as a bounded stream: write it as a
    * directory of parquet part-files, then stream those files back
    * `maxFilesPerTrigger` at a time. Gives real micro-batch semantics
    * over the driver's deterministic data. */
  def replayTable(spark: SparkSession, sfDir: String, stagingDir: String,
      parts: Int = 8): DataFrame = {
    graft.Tables.events(spark, sfDir)
      .repartition(parts)
      .write.mode("overwrite").parquet(stagingDir)
    fileStream(spark, stagingDir)
  }
}
