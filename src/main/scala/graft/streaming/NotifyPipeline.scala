package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference's FULL notify path as ONE wired streaming pipeline —
  * monitor → suppress → deliver (restart.sh: probe failures escalate
  * through the remediation ladder, and the watchdog MAILS the
  * configured recipient before acting, restart.sh:4-7 + ~104): the
  * three separately-spec'd stages composed into a single runnable
  * query.
  *
  *  1. [[HealthMonitor.monitor]] — the escalation state machine
  *     (consec-failure ladder, recovery alerts), O(1) state/device.
  *  2. [[AlertSink.suppressStream]] — anti-fatigue cooldown per
  *     (device, action): a flapping device (A44's failure mode) pages
  *     once per cooldown, not once per transition; distinct ladder
  *     actions page independently.
  *  3. [[AlertSink]] delivery — partitioned parquet audit log
  *     (exactly-once: a replayed trigger overwrites its OWN epoch
  *     directory) + the executor-side Notifier seam (at-least-once,
  *     like real mail).
  *
  * Chaining note: both stateful stages are Append-mode
  * flatMapGroupsWithState, which Spark permits in sequence inside one
  * query — state for each lives independently in the one checkpoint,
  * so a restart resumes BOTH machines consistently (no cross-stage
  * replay seam to reason about). Input redelivery is out of scope for
  * the monitor by contract (front with [[StreamingAggs.dedupEvents]]
  * on an at-least-once transport); TRIGGER replay — the failure mode
  * this pipeline owns — is fenced at both ends: suppress drops
  * re-seen event times per key, and the audit write is
  * epoch-idempotent (spec re-invokes [[AlertSink.deliverBatch]] with
  * a delivered epoch and pins the log unchanged). */
object NotifyPipeline {

  def start(events: Dataset[DeviceEvent], outDir: String,
      checkpointDir: String, cooldownUs: Long = 1800000000L,
      notifier: AlertSink.Notifier = AlertSink.LogNotifier): StreamingQuery =
    AlertSink.start(
      AlertSink.suppressStream(HealthMonitor.monitor(events), cooldownUs),
      outDir, checkpointDir, notifier)

  /** [[start]] with a LIVE ALERT BOARD downstream: beside the append
    * audit log + notifier, every delivered alert upserts its
    * (device, action) row into an [[UpsertSink]] snapshot — the
    * "what is each device's current state per ladder action" table an
    * on-call dashboard polls, without scanning the epoch log. One
    * trigger, both sinks, exactly-once EACH by their own fences:
    * delivery overwrites its epoch directory, the board upsert
    * short-circuits on its batch marker — so a replayed trigger
    * leaves log AND board unchanged (the composed spec pins both).
    * Within a batch the later event time wins (verCol = unix micros);
    * across batches apply order = trigger order, which IS event-time
    * order per key because the suppress stage's fence drops
    * out-of-order repeats. */
  def startWithBoard(events: Dataset[DeviceEvent], outDir: String,
      boardDir: String, checkpointDir: String,
      cooldownUs: Long = 1800000000L,
      notifier: AlertSink.Notifier = AlertSink.LogNotifier,
      nBuckets: Int = 16): StreamingQuery = {
    import org.apache.spark.sql.functions._
    AlertSink.suppressStream(HealthMonitor.monitor(events), cooldownUs)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[HealthAlert], epochId: Long) =>
        AlertSink.deliverBatch(batch, epochId, outDir, notifier)
        UpsertSink.applyBatch(
          batch.toDF()
            .withColumn("alert_key",
              concat_ws(":", col("user_id"), col("action")))
            .withColumn("__ver", expr("unix_micros(ts)")),
          epochId, boardDir, "alert_key", "__ver", nBuckets)
      }
      .start()
  }

  /** The live alert board: one row per (device, action) with the
    * latest delivered transition. */
  def board(spark: org.apache.spark.sql.SparkSession,
      boardDir: String): org.apache.spark.sql.DataFrame =
    UpsertSink.snapshot(spark, boardDir)
      .select("user_id", "ts", "action", "consec_fails")
}
