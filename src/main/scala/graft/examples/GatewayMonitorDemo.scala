package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{AlertSink, DeviceEvent, HealthMonitor, StreamingAggs}

/** End-to-end replacement for the reference gateway's monitoring loop
  * (check_wf.sh + putmedia_check.sh + restart.sh), as one streaming
  * pipeline:
  *
  *   device event stream (Kinesis-shaped graft-replay source)
  *     → exact dedup within watermark        (transport retries)
  *     → per-device escalation state machine (consecutive failures →
  *       SERVICE_RESTART / USB_POWER_CYCLE / REBOOT / RECOVERED)
  *     → alert DELIVERY (parquet audit log + notifier — the mail step)
  *     → 60-second metric sums               (PutMedia.Success analog)
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
    val alerts = AlertSink.start(
      HealthMonitor.monitor(deduped.as[DeviceEvent]),
      alertDir,
      java.nio.file.Files.createTempDirectory("demo-alerts-ck").toString)

    val metrics = StreamingAggs.metricSums(deduped)
      .writeStream.format("memory").queryName("metrics")
      .outputMode("append").start()

    alerts.processAllAvailable()
    metrics.processAllAvailable()
    alerts.stop(); metrics.stop()

    val delivered = AlertSink.deliveredLog(spark, alertDir)
    println("=== delivered remediation actions (reference: restart.sh ladder + mail) ===")
    delivered
      .groupBy($"action").agg(count(lit(1)).as("n"))
      .orderBy($"action").show(false)
    println("=== sample per-minute metric sums (reference: putmedia_check.sh) ===")
    spark.table("metrics").orderBy($"user_id", $"window.start").show(5, false)
    println(s"pipeline complete: ${spark.table("metrics").count()} metric windows, " +
      s"${delivered.count()} remediation transitions delivered to $alertDir")
    spark.stop()
  }
}
