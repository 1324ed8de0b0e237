package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** The escalation state machine on Spark 4's transformWithState API —
  * the successor to flatMapGroupsWithState ([[HealthMonitor]]): typed
  * named state via `ValueState`, optional TTL, timer support, RocksDB
  * state store. Same pure kernel (`HealthMonitor.step`), so both APIs
  * provably implement identical semantics (spec cross-checks their
  * outputs).
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...RocksDBStateStoreProvider` — at 100 TB state scale the RocksDB
  * store is the right default anyway (spill-to-disk, changelog
  * checkpointing).
  */
class HealthProcessor extends StatefulProcessor[Long, DeviceEvent, HealthAlert] {

  @transient private var state: org.apache.spark.sql.streaming.ValueState[MonitorState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[MonitorState](
      "monitor", Encoders.product[MonitorState], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[DeviceEvent],
      timerValues: TimerValues): Iterator[HealthAlert] = {
    val current = Option(state.get()).getOrElse(MonitorState(0, 0))
    val (alerts, next) = HealthMonitor.step(rows.toSeq, current)
    state.update(next)
    alerts.iterator
  }
}

object HealthMonitorV2 {
  /** Attach the monitor via transformWithState (RocksDB store required;
    * see class docs). */
  def monitor(events: Dataset[DeviceEvent]): Dataset[HealthAlert] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new HealthProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
