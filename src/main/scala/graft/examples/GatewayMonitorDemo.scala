package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{AlertSink, ContinuousRollup, DeviceEvent, NotifyPipeline, StreamingAggs}

/** End-to-end replacement for the reference gateway's monitoring loop
  * (check_wf.sh + putmedia_check.sh + restart.sh), as one streaming
  * pipeline:
  *
  *   device event stream (Kinesis-shaped graft-replay source)
  *     → exact dedup within watermark        (transport retries)
  *     → per-device escalation state machine (consecutive failures →
  *       SERVICE_RESTART / USB_POWER_CYCLE / REBOOT / RECOVERED)
  *     → cooldown SUPPRESSION               (one page per cooldown)
  *     → alert DELIVERY (parquet audit log + notifier — the mail step)
  *   and, beside it, the CONTINUOUSLY-MAINTAINED metric rollup — the
  *   CloudWatch table putmedia_check.sh polls, kept up to date by
  *   upserting each trigger's changed 60-second windows into a
  *   bucketed snapshot instead of recomputing per poll.
  *
  * Run: sbt "runMain graft.examples.GatewayMonitorDemo [sfDir]"
  */
object GatewayMonitorDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local("gateway-monitor-demo")
    import spark.implicits._

    val events = spark.readStream
      .format("graft-replay")
      .option("path", s"$sfDir/events.parquet")
      .option("eventsPerTrigger", "250")
      .load()

    val deduped = StreamingAggs.dedupEvents(events)

    val alertDir = java.nio.file.Files.createTempDirectory("demo-alerts").toString
    // the FULL notify path as one wired query: monitor → per-(device,
    // action) cooldown suppression → epoch-idempotent delivery
    val alerts = NotifyPipeline.start(
      deduped.as[DeviceEvent],
      alertDir,
      java.nio.file.Files.createTempDirectory("demo-alerts-ck").toString)

    // the polled statistics TABLE, maintained incrementally
    val rollupDir = java.nio.file.Files.createTempDirectory("demo-rollup").toString
    val rollup = ContinuousRollup.start(deduped, rollupDir,
      java.nio.file.Files.createTempDirectory("demo-rollup-ck").toString,
      nBuckets = 8, watermark = "3650 days")

    alerts.processAllAvailable()
    rollup.processAllAvailable()
    alerts.stop(); rollup.stop()

    val delivered = AlertSink.deliveredLog(spark, alertDir)
    println("=== delivered remediation actions (reference: restart.sh ladder + mail) ===")
    delivered
      .groupBy($"action").agg(count(lit(1)).as("n"))
      .orderBy($"action").show(false)
    println("=== the maintained metric-statistics table (reference: putmedia_check.sh poll) ===")
    val snap = ContinuousRollup.snapshot(spark, rollupDir)
    snap.orderBy($"user_id", $"window_us").show(5, false)
    println(s"pipeline complete: ${snap.count()} maintained metric windows, " +
      s"${delivered.count()} suppressed-and-delivered remediation pages in $alertDir")
    spark.stop()
  }
}
