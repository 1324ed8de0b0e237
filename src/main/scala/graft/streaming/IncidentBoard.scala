package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Monitoring

/** STREAMING incident blast-radius board — A58's live twin (A58b's
  * pair screen included) on the [[LedgerBoard]] cadence: the
  * common-cause group table an ops review reads, kept current as
  * telemetry arrives instead of recomputed in tomorrow's batch sweep.
  *
  * Incident GROUPING is a whole-history product: the A45b panel (which
  * devices anomaly detectors flagged, over all time), the correlation
  * kernel (bucket co-movement across the full series), and the
  * connected components all change non-incrementally when one event
  * arrives — a genuinely incremental formulation would be a different
  * operator with different answers. So the live twin is the ledger +
  * committed-epoch cadence (fences documented once on
  * [[LedgerBoard]]); per-regroup cost is exactly batch A58's — the
  * panel cap bounds pair work at maxPanel², components ride the
  * guarded CC fast path — plus one ledger scan. */
object IncidentBoard {

  /** Attach the board maintainer to an event stream. The screening
    * `corrThreshold` and panel knobs are batch A58's, verbatim — one
    * definition of the math, two execution shapes. */
  def start(events: DataFrame, ledgerDir: String, boardDir: String,
      checkpointDir: String, corrThreshold: Double = 0.8,
      k: Double = 2.0, target: Double = 50.0, slack: Double = 2.5,
      h: Double = 200.0, maxPanel: Int = 24, minBuckets: Long = 24,
      regroupEvery: Int = 1): StreamingQuery =
    LedgerBoard.start(events, ledgerDir, boardDir, checkpointDir,
      regroupEvery)(history =>
      Monitoring.incidentGroupsOf(history, corrThreshold, k, target,
        slack, h, maxPanel, minBuckets))

  /** One trigger (spec entry — replay-fence re-invocation). */
  def applyBatch(batch: DataFrame, batchId: Long, ledgerDir: String,
      boardDir: String, corrThreshold: Double, k: Double, target: Double,
      slack: Double, h: Double, maxPanel: Int, minBuckets: Long,
      regroupEvery: Int): Unit =
    LedgerBoard.applyBatch(batch, batchId, ledgerDir, boardDir,
      regroupEvery)(history =>
      Monitoring.incidentGroupsOf(history, corrThreshold, k, target,
        slack, h, maxPanel, minBuckets))

  /** The board an ops review reads: the newest committed regroup. */
  def board(spark: SparkSession, boardDir: String): DataFrame =
    LedgerBoard.board(spark, boardDir)
}
