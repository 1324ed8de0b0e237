package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A device telemetry event (the streaming twin of the `events` table). */
case class DeviceEvent(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

/** Per-device monitor state carried across micro-batches. */
case class MonitorState(consecFails: Int, level: Int)

/** An emitted remediation/recovery transition. */
case class HealthAlert(
    user_id: Long,
    ts: Timestamp,
    action: String,
    consec_fails: Int)

/** Streaming re-expression of the reference's watchdog loop
  * (restart.sh:27-159): per-device consecutive-failure counting with an
  * escalation ladder, as a `flatMapGroupsWithState` state machine.
  *
  *  - probe fails (event_type='error') → consecutive counter ++
  *  - counter hits 3/6/9 → emit SERVICE_RESTART / USB_POWER_CYCLE /
  *    REBOOT, once per level (restart.sh max_failed_cnt=3, escalation
  *    chain restart→network→USB→reboot)
  *  - healthy probe after failures → emit RECOVERED, reset state
  *    (restart.sh resets kvs_failed_cnt after a good loop)
  *
  * Scale: state is O(1) per device (two ints); Spark shuffles events to
  * their key's state partition once; watermark-less ProcessingTime
  * semantics match the reference's wall-clock loop. Event-time ordering
  * inside a micro-batch is restored by sorting the group's batch — the
  * only buffering is per-device per-trigger.
  */
object HealthMonitor {

  val SERVICE_RESTART = "SERVICE_RESTART"
  val USB_POWER_CYCLE = "USB_POWER_CYCLE"
  val REBOOT = "REBOOT"
  val RECOVERED = "RECOVERED"

  private def levelFor(consec: Int): Int =
    if (consec >= 9) 3 else if (consec >= 6) 2 else if (consec >= 3) 1 else 0

  private def actionFor(level: Int): String = level match {
    case 1 => SERVICE_RESTART
    case 2 => USB_POWER_CYCLE
    case _ => REBOOT
  }

  /** Full-microsecond epoch of a Timestamp — `getTime` alone truncates
    * to milliseconds, which would break ties differently from the
    * (ts, event_id) microsecond ordering every batch operator uses. */
  private[streaming] def tsMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** The state-transition kernel: pure, so batch replays and specs can
    * call it directly. Returns (alerts, newState). */
  def step(events: Seq[DeviceEvent], state: MonitorState): (Seq[HealthAlert], MonitorState) = {
    var s = state
    val out = Seq.newBuilder[HealthAlert]
    events.sortBy(e => (tsMicros(e.ts), e.event_id)).foreach { e =>
      if (e.event_type == "error") {
        val consec = s.consecFails + 1
        val newLevel = levelFor(consec)
        if (newLevel > s.level) {
          out += HealthAlert(e.user_id, e.ts, actionFor(newLevel), consec)
        }
        s = MonitorState(consec, math.max(newLevel, s.level))
      } else {
        if (s.consecFails >= 3) {
          out += HealthAlert(e.user_id, e.ts, RECOVERED, s.consecFails)
        }
        s = MonitorState(0, 0)
      }
    }
    (out.result(), s)
  }

  /** Attach the monitor to a streaming Dataset[DeviceEvent].
    *
    * Buffering note: `it.toSeq` holds one device's events *for one
    * micro-batch* — bounded by trigger size, which is the right
    * trade-off for streams. For batch replay over unbounded history use
    * [[replaySorted]], which never buffers. */
  def monitor(events: Dataset[DeviceEvent]): Dataset[HealthAlert] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[MonitorState, HealthAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[DeviceEvent], state: GroupState[MonitorState]) =>
          val current = state.getOption.getOrElse(MonitorState(0, 0))
          val (alerts, next) = step(it.toSeq, current)
          state.update(next)
          alerts.iterator
      }
  }

  /** Batch-scale replay: one shuffle keyed by device, sort within
    * partitions by (user_id, ts, event_id), then a single forward pass
    * feeding the same [[step]] kernel one event at a time. Memory is
    * O(1) per partition however hot a device is — unlike
    * flatMapGroupsWithState, which would buffer a device's entire
    * history when the "micro-batch" is 100 TB of history. */
  def replaySorted(events: Dataset[DeviceEvent]): Dataset[HealthAlert] = {
    import events.sparkSession.implicits._
    events
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { it =>
        var dev = Long.MinValue
        var st = MonitorState(0, 0)
        it.flatMap { e =>
          if (e.user_id != dev) { dev = e.user_id; st = MonitorState(0, 0) }
          val (alerts, next) = step(e :: Nil, st)
          st = next
          alerts
        }
      }
  }

  /** Batch convenience: replay the state machine over the events table
    * (same kernel, batch Dataset, streaming-pass execution). */
  def replayBatch(spark: SparkSession, sfDir: String): Dataset[HealthAlert] = {
    import spark.implicits._
    replaySorted(graft.Tables.events(spark, sfDir).as[DeviceEvent])
  }

  /** DuckDB twin of [[replayBatch]] — the closed form of the [[step]]
    * kernel: within a maximal per-device error run (gaps-and-islands),
    * escalations fire exactly at run positions 3/6/9 (levelFor is
    * monotone in the strictly-incrementing counter, so "newLevel >
    * level" reduces to position ∈ {3,6,9}); RECOVERED fires at the
    * first event AFTER a run of length ≥ 3 (by run maximality that
    * event is non-error) with the full run length — a run still open at
    * end-of-history emits nothing, exactly like the kernel's pending
    * state. Timestamps emitted as epoch micros per SURVEY §4. */
  val replaySql: String =
    """WITH seq AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts, event_id) AS rn_t
      |  FROM events),
      |err AS (
      |  SELECT user_id, ts, rn, rn - rn_t AS grp,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, rn - rn_t ORDER BY rn) AS k
      |  FROM seq WHERE event_type = 'error'),
      |escal AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us,
      |    CASE k WHEN 3 THEN 'SERVICE_RESTART'
      |           WHEN 6 THEN 'USB_POWER_CYCLE'
      |           ELSE 'REBOOT' END AS action,
      |    k AS consec_fails
      |  FROM err WHERE k IN (3, 6, 9)),
      |runs AS (
      |  SELECT user_id, grp, COUNT(*) AS run_len, MAX(rn) AS last_rn
      |  FROM err GROUP BY user_id, grp HAVING COUNT(*) >= 3),
      |recov AS (
      |  SELECT r.user_id, epoch_us(s.ts) AS ts_us,
      |    'RECOVERED' AS action, r.run_len AS consec_fails
      |  FROM runs r
      |  JOIN seq s ON s.user_id = r.user_id AND s.rn = r.last_rn + 1)
      |SELECT user_id, ts_us, action, consec_fails FROM escal
      |UNION ALL
      |SELECT user_id, ts_us, action, consec_fails FROM recov
      |ORDER BY user_id, ts_us, action""".stripMargin
}
