package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

/** Alert delivery — the Spark twin of the reference's notify step: the
  * watchdog configures a recipient and mails a notification before it
  * reboots the gateway (restart.sh:4-7 `To=` config, restart.sh:~104
  * mail-then-reboot). The repo's monitors compute `Dataset[HealthAlert]`;
  * this sink completes the loop by DELIVERING them.
  *
  * Two channels per micro-batch, both scale-safe:
  *
  *  1. A partitioned parquet audit log (`epoch=<id>/` per micro-batch,
  *     written cluster-side). The write is idempotent: a replayed epoch
  *     after a failure OVERWRITES its own directory instead of
  *     appending duplicates, which upgrades foreachBatch's at-least-once
  *     contract to exactly-once for the log.
  *  2. A pluggable [[AlertSink.Notifier]] invoked per alert ON THE
  *     EXECUTORS (foreachPartition) — the seam where a production
  *     deployment hangs SMTP/SNS/webhook delivery. Alert volume is
  *     tiny relative to event volume (only state-machine transitions),
  *     so per-alert side calls are not a throughput concern.
  *
  * The batch is pinned with `persist()` so the two consumers don't
  * recompute the upstream stateful query, then released.
  */
object AlertSink {

  /** Side-channel delivery seam (SMTP/SNS/webhook in production).
    * Implementations must be serializable — they run on executors. */
  trait Notifier extends Serializable {
    def notify(alert: HealthAlert): Unit
  }

  /** Default notifier: structured log line per alert (the sandbox
    * stand-in for the reference's `mail` call). */
  object LogNotifier extends Notifier with Logging {
    override def notify(a: HealthAlert): Unit =
      logInfo(s"ALERT device=${a.user_id} action=${a.action} " +
        s"consec_fails=${a.consec_fails} ts=${a.ts}")
  }

  /** One epoch's delivery — the foreachBatch body, exposed so a
    * REPLAYED trigger is testable directly: re-invoking with the same
    * (batch, epochId) overwrites the epoch's own directory, leaving
    * the audit log byte-identical (exactly-once); the notifier side
    * channel fires again (at-least-once — the semantics real mail
    * has; a production Notifier dedupes on its own key if it must). */
  def deliverBatch(batch: Dataset[HealthAlert], epochId: Long,
      outDir: String, notifier: Notifier = LogNotifier): Unit = {
    batch.persist()
    try {
      batch.write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
      batch.foreachPartition { it: Iterator[HealthAlert] =>
        it.foreach(notifier.notify)
      }
    } finally batch.unpersist()
    ()
  }

  /** Attach delivery to an alert stream. Returns the started query;
    * callers own its lifecycle. */
  def start(alerts: Dataset[HealthAlert], outDir: String,
      checkpointDir: String, notifier: Notifier = LogNotifier): StreamingQuery =
    alerts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[HealthAlert], epochId: Long) =>
        deliverBatch(batch, epochId, outDir, notifier)
      }
      .start()

  /** The delivered audit log as a DataFrame (partition column `epoch`
    * identifies the micro-batch that delivered each alert). A healthy
    * fleet may deliver ZERO alerts — an empty/partless log directory
    * yields an empty frame with the alert schema, not an
    * unable-to-infer-schema error. */
  def deliveredLog(spark: org.apache.spark.sql.SparkSession,
      outDir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    try spark.read.parquet(outDir)
    catch {
      // match the structured error condition, not the message text —
      // messages get reworded across Spark versions, conditions don't
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getCondition).exists(c =>
            c.startsWith("UNABLE_TO_INFER_SCHEMA") ||
              c.startsWith("PATH_NOT_FOUND")) =>
        // epoch matches the type partition discovery infers on the
        // populated path (IntegerType), so both fleet states union/cast
        // identically
        spark.emptyDataset[HealthAlert].toDF()
          .withColumn("epoch",
            org.apache.spark.sql.functions.lit(0).cast("int"))
    }
  }

  /** ALERT SUPPRESSION — the anti-fatigue stage between the monitors
    * and delivery: a repeat of the SAME (device, action) inside the
    * cooldown window is dropped, so a flapping device (A44's failure
    * mode) pages once per cooldown instead of once per transition.
    * Keyed on (device, action) — distinct remediation actions page
    * independently (a `reboot` escalation must not be silenced by a
    * recent `restart` page). State per key is two longs: the last
    * DELIVERED alert's event time (the cooldown anchor — suppressed
    * repeats do NOT extend it, or a steady flap would silence itself
    * forever) and a processed-(us) replay fence so at-least-once
    * delivery cannot re-page. State is O(live device × ladder
    * actions). */
  def suppressStream(alerts: org.apache.spark.sql.Dataset[HealthAlert],
      cooldownUs: Long = 1800000000L): org.apache.spark.sql.Dataset[HealthAlert] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = alerts.sparkSession
    import spark.implicits._
    require(cooldownUs > 0, "cooldown must be positive")
    alerts
      .groupByKey(a => (a.user_id, a.action))
      .flatMapGroupsWithState[SuppressState, HealthAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, it, state) =>
          val sorted = it.toArray.sortBy(a => HealthMonitor.tsMicros(a.ts))
          var st = state.getOption.getOrElse(SuppressState(Long.MinValue,
            Long.MinValue))
          val out = Seq.newBuilder[HealthAlert]
          sorted.foreach { a =>
            val us = HealthMonitor.tsMicros(a.ts)
            if (us > st.lastSeenUs) { // replay fence
              if (st.lastSentUs == Long.MinValue ||
                  us - st.lastSentUs >= cooldownUs) {
                out += a
                st = st.copy(lastSentUs = us)
              }
              st = st.copy(lastSeenUs = us)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}

/** Per-(device, action) suppression state: last delivered event time
  * (cooldown anchor) + last processed event time (replay fence). */
case class SuppressState(lastSentUs: Long, lastSeenUs: Long)
