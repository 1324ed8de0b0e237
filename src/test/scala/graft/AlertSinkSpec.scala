package graft

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{AlertSink, DeviceEvent, HealthAlert, HealthMonitor}

/** End-to-end alert DELIVERY: MemoryStream → HealthMonitor state
  * machine → AlertSink (parquet audit log + notifier side channel) —
  * the reference's probe→escalate→mail loop as one streaming pipeline. */
class AlertSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, minute: Int, dev: Long, typ: String): DeviceEvent =
    DeviceEvent(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), dev, typ, 1.0, "{}")

  test("alerts are delivered to the parquet log and the notifier, exactly once") {
    val outDir = java.nio.file.Files.createTempDirectory("graft-alerts").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-alerts-ck").toString
    val input = MemoryStream[DeviceEvent](100, spark, None)
    val q = AlertSink.start(
      HealthMonitor.monitor(input.toDS()), outDir, ckDir, CountingNotifier)
    try {
      CountingNotifier.seen.set(0)
      // batch 1: device 7 fails 3× → SERVICE_RESTART
      input.addData((1 to 3).map(i => ev(i, i, 7L, "error")))
      q.processAllAvailable()
      // batch 2: three more failures → USB_POWER_CYCLE, then recovery
      input.addData((4 to 6).map(i => ev(i, i, 7L, "error")) :+ ev(7, 7, 7L, "click"))
      q.processAllAvailable()
    } finally q.stop()

    val log = AlertSink.deliveredLog(spark, outDir)
    val actions = log.select($"action").as[String].collect().sorted
    assert(actions === Array(
      HealthMonitor.RECOVERED, HealthMonitor.SERVICE_RESTART,
      HealthMonitor.USB_POWER_CYCLE))
    // the epoch partition column records which micro-batch delivered
    assert(log.select($"epoch").distinct().count() >= 2)
    // notifier saw every alert exactly once (no dupes from replays)
    assert(CountingNotifier.seen.get() === 3)
  }

  test("deliveredLog on a healthy fleet (zero alerts) is empty, not an error") {
    val empty = java.nio.file.Files.createTempDirectory("graft-alerts-none").toString
    val log = AlertSink.deliveredLog(spark, empty)
    assert(log.count() === 0L)
    assert(log.columns.contains("action") && log.columns.contains("epoch"))
  }

  test("suppression: repeats inside the cooldown drop, actions page independently") {
    def al(min: Int, dev: Long, action: String) = HealthAlert(dev,
      Timestamp.valueOf(f"2024-01-01 10:$min%02d:00"), action, 3)
    val input = MemoryStream[HealthAlert](101, spark, None)
    // 30-min cooldown
    val q = AlertSink.suppressStream(input.toDS(), cooldownUs = 1800000000L)
      .writeStream.format("memory").queryName("suppress_out")
      .outputMode("append").start()
    try {
      input.addData(
        al(0, 1L, "restart"),   // pages
        al(10, 1L, "restart"),  // inside cooldown: dropped
        al(5, 1L, "reboot"),    // different action: pages
        al(0, 2L, "restart"))   // different device: pages
      q.processAllAvailable()
      assert(spark.table("suppress_out").count() === 3)
      // state crosses the trigger boundary: 10:10 was suppressed but the
      // anchor stays 10:00, so 10:31 pages; 10:29 would not
      input.addData(al(29, 1L, "restart"))
      q.processAllAvailable()
      assert(spark.table("suppress_out").count() === 3)
      input.addData(al(31, 1L, "restart"))
      q.processAllAvailable()
      assert(spark.table("suppress_out").count() === 4)
      // replayed alert (at-least-once transport): no re-page
      input.addData(al(31, 1L, "restart"))
      q.processAllAvailable()
      assert(spark.table("suppress_out").count() === 4)
    } finally q.stop()
  }

  test("notify pipeline: monitor → suppress → deliver wired; replayed trigger leaves the audit log unchanged") {
    val outDir = java.nio.file.Files.createTempDirectory("graft-notify").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-notify-ck").toString
    val input = MemoryStream[DeviceEvent](102, spark, None)
    val q = graft.streaming.NotifyPipeline.start(
      input.toDS(), outDir, ckDir,
      cooldownUs = 1800000000L, notifier = CountingNotifier)
    try {
      CountingNotifier.seen.set(0)
      // a flapping device: three escalation-worthy bursts with
      // recoveries between, all inside one 30-min cooldown — the raw
      // monitor would page 6 times, the wired pipeline twice
      input.addData(
        (1 to 3).map(i => ev(i, i, 7L, "error")) :+ ev(4, 4, 7L, "click"))
      q.processAllAvailable()
      input.addData(
        (5 to 7).map(i => ev(i, i, 7L, "error")) :+ ev(8, 8, 7L, "click"))
      q.processAllAvailable()
      input.addData((9 to 11).map(i => ev(i, i, 7L, "error")))
      q.processAllAvailable()
    } finally q.stop()

    val log = AlertSink.deliveredLog(spark, outDir)
    val delivered = log.select($"user_id", $"action", $"ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    // exactly one SERVICE_RESTART (min 3) and one RECOVERED (min 4);
    // the min-7/min-11 restarts and min-8 recovery fall inside the
    // cooldown anchored at the delivered pair
    assert(delivered.map(_._2).sorted === Array(
      HealthMonitor.RECOVERED, HealthMonitor.SERVICE_RESTART),
      s"delivered: ${delivered.toSeq}")
    assert(CountingNotifier.seen.get() === 2)

    // REPLAYED TRIGGER: re-deliver an already-delivered epoch with its
    // own content — the epoch-overwrite fence must leave the log
    // byte-identical (the notifier side channel fires again: mail is
    // at-least-once)
    val epochs = log.select($"epoch").distinct().as[Int].collect()
    val replayEpoch = epochs.min
    // materialized first: a real replayed trigger's rows come from the
    // upstream stream, not from reading the sink it is about to
    // overwrite
    val replayRows = log.filter($"epoch" === replayEpoch)
      .drop("epoch").as[HealthAlert].collect().toSeq.toDS()
    val before = log.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    AlertSink.deliverBatch(replayRows, replayEpoch.toLong, outDir,
      CountingNotifier)
    val after = AlertSink.deliveredLog(spark, outDir).collect()
      .map(_.toSeq).toSeq.sortBy(_.toString)
    assert(after === before, "replayed trigger changed the audit log")
  }

  test("notify pipeline board: latest (device, action) rows live, replayed trigger changes neither log nor board") {
    import org.apache.spark.sql.functions.{col, concat_ws, expr}
    val outDir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    val boardDir = java.nio.file.Files.createTempDirectory("graft-nb-brd").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-nb-ck").toString
    val input = MemoryStream[DeviceEvent](103, spark, None)
    val q = graft.streaming.NotifyPipeline.startWithBoard(
      input.toDS(), outDir, boardDir, ckDir,
      cooldownUs = 1800000000L, notifier = CountingNotifier)
    try {
      // batch 1: device 7 fails 3× → SERVICE_RESTART pages
      input.addData((1 to 3).map(i => ev(i, i, 7L, "error")))
      q.processAllAvailable()
      // batch 2: device 7 recovers (different action → pages through
      // the cooldown); device 9's own ladder fires independently
      input.addData(Seq(ev(4, 4, 7L, "click")) ++
        (5 to 7).map(i => ev(i + 10L, i, 9L, "error")))
      q.processAllAvailable()
    } finally q.stop()

    // the board is exactly "latest delivered transition per (device,
    // action)" — derivable from the audit log, maintained without
    // scanning it
    val board = graft.streaming.NotifyPipeline.board(spark, boardDir)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getTimestamp(1)))
      .toSet
    val fromLog = AlertSink.deliveredLog(spark, outDir)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getTimestamp(1)))
      .groupBy(t => (t._1, t._2))
      .map { case (_, rows) => rows.maxBy(_._3.getTime) }.toSet
    assert(board === fromLog, s"board $board != log-derived $fromLog")
    assert(board.map(_._2) === Set(HealthMonitor.SERVICE_RESTART,
      HealthMonitor.RECOVERED), s"board actions: $board")
    assert(board.map(_._1) === Set(7L, 9L))

    // replayed trigger: the board upsert short-circuits on its batch
    // marker — even a poisoned re-apply of a delivered epoch is a no-op
    val poison = Seq(HealthAlert(999L,
        Timestamp.valueOf("2024-01-01 11:00:00"), "restart", 9))
      .toDS().toDF()
      .withColumn("alert_key", concat_ws(":", col("user_id"), col("action")))
      .withColumn("__ver", expr("unix_micros(ts)"))
    graft.streaming.UpsertSink.applyBatch(poison, 0L, boardDir,
      "alert_key", "__ver", 16)
    val after = graft.streaming.NotifyPipeline.board(spark, boardDir)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getTimestamp(1)))
      .toSet
    assert(after === board, "replayed trigger changed the board")
  }
}

/** Serializable counting notifier; local-mode executors share the JVM,
  * so the static counter observes executor-side delivery. */
object CountingNotifier extends AlertSink.Notifier {
  val seen = new AtomicInteger(0)
  override def notify(a: HealthAlert): Unit = { seen.incrementAndGet(); () }
}
