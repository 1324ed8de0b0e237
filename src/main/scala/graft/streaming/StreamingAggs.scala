package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming window aggregations (SURVEY.md §2.A13/A14) — the
  * Structured Streaming twins of Monitoring.windowSum/sessionize.
  *
  * All take an (event-schema) streaming DataFrame so any source — file,
  * Kinesis-like, MemoryStream — plugs in. Watermarks bound state:
  * windows older than the watermark are finalized and dropped, so state
  * stays O(open windows × devices) no matter how much history flows
  * through — the property that matters at 100 TB/day.
  */
object StreamingAggs {

  /** Apply a watermark unless the stream already carries one ON THE
    * SAME COLUMN — redefining a watermark is an analysis error, and
    * chained stateful stages (dedup → windowed agg) share the upstream
    * one; a watermark on a different timestamp column does NOT satisfy
    * this stage and must still fail loudly downstream rather than be
    * silently absorbed here. */
  private[streaming] def withWatermarkIfAbsent(df: DataFrame, col: String, delay: String): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark
    val already = df.queryExecution.logical.collectFirst {
      case e: EventTimeWatermark if e.eventTime.name == col => e
    }.isDefined
    if (already || !df.isStreaming) df else df.withWatermark(col, delay)
  }

  /** Per-device sliding-window failure counts (5-minute windows sliding
    * every minute, 10-minute watermark) — the streaming form of the
    * reference's "failures in the last measurement window" check. */
  def failureCounts(events: DataFrame): DataFrame =
    withWatermarkIfAbsent(events, "ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes", "1 minute"), col("user_id"))
      .agg(
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("failures"),
        count(lit(1)).as("n_events"))

  /** CloudWatch-style tumbling 60-second metric Sum per device
    * (putmedia_check.sh PERIOD=60), streaming form of A3. */
  def metricSums(events: DataFrame): DataFrame =
    withWatermarkIfAbsent(events.filter(col("event_type") === "purchase"),
      "ts", "10 minutes")
      .groupBy(window(col("ts"), "60 seconds"), col("user_id"))
      .agg(sum(col("value")).as("metric_sum"), count(lit(1)).as("sample_count"))

  /** A53c — STREAMING WINDOW PERCENTILES: the live twin of the A53b
    * sketch path (an SLO dashboard alarms on tail latency as it
    * happens, not at the nightly rollup). Tumbling per-device hour
    * windows through the same approx_percentile sketch — the sketch
    * buffer IS the streaming state (mergeable partials, fixed size
    * per open window), finalized and dropped once the watermark
    * passes, so state stays O(open windows × devices) regardless of
    * volume. Same approx_ column naming, same round-4 cells as the
    * batch sibling; the parity spec replays history through both and
    * pins equality (exact at spec scale: n ≪ accuracy keeps the
    * sketch lossless). */
  def windowPercentiles(events: DataFrame, watermark: String = "2 hours",
      accuracy: Int = 10000): DataFrame =
    withWatermarkIfAbsent(
        events.filter(col("event_type") === "purchase" &&
          col("value").isNotNull), "ts", watermark)
      .groupBy(col("user_id"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_samples"),
        expr(s"approx_percentile(value, array(0.5, 0.95, 0.99), $accuracy)")
          .as("ap"))
      .select(col("user_id"),
        expr("unix_micros(window.start)").as("window_us"),
        col("n_samples"),
        round(element_at(col("ap"), 1), 4).as("approx_p50"),
        round(element_at(col("ap"), 2), 4).as("approx_p95"),
        round(element_at(col("ap"), 3), 4).as("approx_p99"))

  /** Session windows with a 30-minute inactivity gap — streaming
    * sessionization via the native session_window (state merges
    * adjacent windows; watermark finalizes closed sessions). */
  def sessions(events: DataFrame): DataFrame =
    withWatermarkIfAbsent(events, "ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))

  /** Streaming exact dedup — the streaming twin of Dedup.dedupExact:
    * drop events whose id was already seen, with state bounded by the
    * watermark (an id older than the watermark can no longer collide,
    * so its state entry is dropped). At-least-once transports (Kinesis
    * consumer retries) become exactly-once downstream. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    withWatermarkIfAbsent(events, "ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: every failure paired with the same
    * device's successes from the preceding `windowMinutes` — the
    * streaming twin of the batch ASOF analysis (which operation was in
    * flight when the probe failed). Both sides carry watermarks and the
    * join condition bounds event-time distance, so Spark can expire
    * state: each side holds at most `windowMinutes` + watermark of
    * per-device history, regardless of stream length. */
  def failureContext(events: DataFrame, windowMinutes: Int = 10): DataFrame = {
    val fails = events.filter(col("event_type") === "error")
      .select(col("user_id").as("f_user"), col("ts").as("fail_ts"),
        col("event_id").as("fail_id"))
      .withWatermark("fail_ts", "10 minutes")
    val oks = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("s_user"), col("ts").as("ok_ts"),
        col("value").as("ok_value"))
      .withWatermark("ok_ts", "10 minutes")
    fails.join(oks, expr(
      s"""f_user = s_user AND
         |ok_ts >= fail_ts - INTERVAL $windowMinutes MINUTES AND
         |ok_ts < fail_ts""".stripMargin))
      .select(col("f_user").as("user_id"), col("fail_ts"), col("fail_id"),
        col("ok_ts"), col("ok_value"))
  }

  /** Per-device running EWMA carried across micro-batches — the
    * streaming twin of [[graft.operators.Monitoring.ewma]] (A30).
    * State is the recurrence's own O(1) footprint: (current ewma,
    * sample count); each trigger folds its group's new samples in
    * (ts, event_id) order into the carried value and emits the
    * updated smoothed level per device. Seeding matches the batch
    * operator: the first sample IS the initial ewma. Within-batch
    * buffering is one device's per-trigger slice (the HealthMonitor
    * ordering note applies); across batches nothing is re-read — the
    * carried double is the whole history's summary, which is the
    * point of EWMA as a streaming statistic. */
  def ewmaStream(events: Dataset[DeviceEvent],
      alpha: Double = 0.2): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha out of (0, 1]")
    val spark = events.sparkSession
    import spark.implicits._
    events.filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, (Long, Double, Long)](
        GroupStateTimeout.NoTimeout) {
        (dev: Long, it: Iterator[DeviceEvent], state: GroupState[EwmaState]) =>
          // full-microsecond order (HealthMonitor.tsMicros) — getTime
          // truncates to millis and would tie-break same-millisecond
          // samples differently from the batch twin's unix_micros sort
          val sorted = it.toSeq.sortBy(e =>
            (HealthMonitor.tsMicros(e.ts), e.event_id))
          var s = state.getOption.getOrElse(EwmaState(0.0, 0L))
          sorted.foreach { e =>
            s = if (s.n == 0L) EwmaState(e.value, 1L)
            else EwmaState(alpha * e.value + (1 - alpha) * s.ewma, s.n + 1L)
          }
          state.update(s)
          (dev, s.ewma, s.n)
      }
      .toDF("user_id", "ewma", "n_events")
  }
  /** STREAMING heartbeat timeout — the live half of
    * [[graft.operators.Monitoring.heartbeatGaps]] (A40): the batch
    * operator reports CLOSED silent intervals; the one alert batch
    * cannot raise — "this device is silent RIGHT NOW" — is exactly
    * what event-time timeouts exist for. Each device's state carries
    * its last-seen event; every update arms a timeout at
    * last_us + maxGapUs, and when the WATERMARK passes that deadline
    * with no new event, the group fires with hasTimedOut and emits
    * one silence alert (then clears state — a device that resumes
    * re-arms from its next event, so a long outage alerts once, not
    * per trigger). State is two longs per live device; devices that
    * time out leave the store entirely, so state tracks the LIVE
    * fleet, not the historical one. Deadline semantics are the batch
    * operator's: an alert at deadline d corresponds to a batch gap
    * row with gap_start_us = d − maxGapUs once the device resumes. */
  def heartbeatStream(events: Dataset[DeviceEvent],
      maxGapUs: Long = 43200000000L,
      watermark: String = "10 minutes"): DataFrame = {
    require(maxGapUs > 0, s"maxGapUs $maxGapUs must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[HeartbeatState, SilenceAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (dev: Long, it: Iterator[DeviceEvent], state: GroupState[HeartbeatState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SilenceAlert(dev, s.lastEventId, s.lastUs,
              s.lastUs + maxGapUs))
          } else {
            val latest = it.maxBy(e =>
              (HealthMonitor.tsMicros(e.ts), e.event_id))
            val us = HealthMonitor.tsMicros(latest.ts)
            val prev = state.getOption
            // keep the newest heartbeat across batches (a late slice
            // must not rewind the deadline)
            if (prev.forall(_.lastUs <= us)) {
              state.update(HeartbeatState(us, latest.event_id))
              state.setTimeoutTimestamp((us + maxGapUs) / 1000L)
            }
            Iterator.empty
          }
      }
      .toDF()
  }

  /** STREAMING SLO burn rate — the running twin of
    * [[graft.operators.Monitoring.burnRate]] (A38). The batch
    * operator pairs each hour's burn with its CALENDAR-ALIGNED
    * enclosing 6-hour bucket, so an hour's 6-hour burn is only known
    * once the whole bucket has passed: the stream therefore carries,
    * per device, the CURRENT 6-hour bucket's per-hour (errors, total)
    * counters — O(6) state, watermark-free — and EMITS the bucket's
    * hourly rows (those that consumed budget faster than earned, the
    * batch filter) when the first event of a LATER bucket arrives.
    * Closed buckets replayed from history land on the identical rows
    * as the batch operator — the parity spec pins this; the
    * still-open tail bucket is not yet emittable by construction
    * (its 6-hour denominator is still growing). Events are folded in
    * (ts, event_id) order per trigger; an event arriving for an
    * already-closed bucket is DROPPED (logged in the row it would
    * have joined — late data past a closed SLO window is a report
    * correction, not a page). */
  def burnRateStream(events: Dataset[DeviceEvent], slo: Double = 0.8,
      fast: Double = 1.5, slow: Double = 1.2): DataFrame = {
    require(slo > 0 && slo < 1, s"slo $slo out of (0, 1)")
    val budget = 1.0 - slo
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    def rnd6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BurnState, BurnRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (dev: Long, it: Iterator[DeviceEvent], state: GroupState[BurnState]) =>
          val sorted = it.toSeq.sortBy(e =>
            (HealthMonitor.tsMicros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(
            BurnState(-1L, Seq.fill(6)(0L), Seq.fill(6)(0L)))
          val out = scala.collection.mutable.ArrayBuffer.empty[BurnRow]
          def close(s: BurnState): Unit = if (s.bucket6 >= 0) {
            val errors6 = s.errors.sum
            val total6 = s.totals.sum
            if (total6 > 0) {
              val burn6 = (errors6.toDouble / total6) / budget
              (0 until 6).foreach { i =>
                val (e, t) = (s.errors(i), s.totals(i))
                if (t > 0) {
                  val burn1 = (e.toDouble / t) / budget
                  if (burn1 > 1.0)
                    out += BurnRow(dev, (s.bucket6 * 6 + i) * 3600000000L,
                      e, t, rnd6(burn1), rnd6(burn6),
                      burn1 > fast && burn6 > slow)
                }
              }
            }
          }
          sorted.foreach { e =>
            val hb = HealthMonitor.tsMicros(e.ts) / 3600000000L
            val b6 = hb / 6
            if (b6 > st.bucket6) {
              close(st)
              st = BurnState(b6, Seq.fill(6)(0L), Seq.fill(6)(0L))
            }
            if (b6 == st.bucket6) {
              val i = (hb % 6).toInt
              st = st.copy(
                errors = st.errors.updated(i,
                  st.errors(i) + (if (e.event_type == "error") 1L else 0L)),
                totals = st.totals.updated(i, st.totals(i) + 1L))
            } // b6 < bucket6: late event for a closed bucket — dropped
          }
          state.update(st)
          out.iterator
      }
      .toDF()
  }

  /** STREAMING one-sided CUSUM — the running twin of
    * [[graft.operators.Monitoring.cusum]] (A35). State is the
    * recurrence's own O(1) footprint per device: (statistic, running
    * max, sample count); each trigger folds its group's new samples
    * in (ts, event_id) order — the batch fold's exact order and
    * arithmetic (max(0, s + (v − ref)), then max into m), so a
    * replayed history lands on the identical (final, max, alarm)
    * triple per device — the parity spec pins this. Emits the updated
    * triple per device per trigger; `alarm` latches once `m` crosses
    * the decision interval (m is monotone, so a crossed alarm never
    * un-crosses). */
  def cusumStream(events: Dataset[DeviceEvent], target: Double = 50.0,
      slack: Double = 2.5, h: Double = 200.0): DataFrame = {
    require(slack >= 0 && h > 0, s"need slack >= 0 (got $slack), h > 0 (got $h)")
    val spark = events.sparkSession
    import spark.implicits._
    val ref = target + slack
    events.filter(e => e.event_type == "purchase")
      .groupByKey(_.user_id)
      .mapGroupsWithState[CusumState, (Long, Long, Double, Double, Boolean)](
        GroupStateTimeout.NoTimeout) {
        (dev: Long, it: Iterator[DeviceEvent], state: GroupState[CusumState]) =>
          val sorted = it.toSeq.sortBy(e =>
            (HealthMonitor.tsMicros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(CusumState(0.0, 0.0, 0L))
          sorted.foreach { e =>
            val s2 = math.max(0.0, st.s + (e.value - ref))
            st = CusumState(s2, math.max(st.m, s2), st.n + 1L)
          }
          state.update(st)
          (dev, st.n, st.s, st.m, st.m > h)
      }
      .toDF("user_id", "n_events", "cusum_final", "cusum_max", "alarm")
  }

  /** STREAMING z-score anomaly flags — the running twin of
    * [[graft.operators.Monitoring.zscoreOutliers]] (A31) and the
    * adaptive form of the reference's fixed alarm level: each device
    * carries Welford (n, mean, M2) state across micro-batches, and an
    * arriving sample is judged against the statistics of everything
    * BEFORE it (folding it in first would let the outlier shrink its
    * own z-score — the batch operator can afford two passes, a stream
    * cannot, so prior-state judgment is the honest one-pass
    * semantics). Devices stay silent until `minSamples` history
    * exists (a two-sample "σ" flags everything). State is O(1) per
    * device; Welford's update is numerically stable where naive
    * Σx²−(Σx)²/n cancels catastrophically on long-running streams. */
  def zscoreStream(events: Dataset[DeviceEvent], k: Double = 2.0,
      minSamples: Long = 10): DataFrame = {
    require(k > 0 && minSamples >= 2,
      s"need k > 0 (got $k) and minSamples >= 2 (got $minSamples)")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events.filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[WelfordState, ZscoreAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (dev: Long, it: Iterator[DeviceEvent], state: GroupState[WelfordState]) =>
          val sorted = it.toSeq.sortBy(e =>
            (HealthMonitor.tsMicros(e.ts), e.event_id))
          var s = state.getOption.getOrElse(WelfordState(0L, 0.0, 0.0))
          val alerts = scala.collection.mutable.ArrayBuffer.empty[ZscoreAlert]
          sorted.foreach { e =>
            if (s.n >= minSamples) {
              val sigma = math.sqrt(s.m2 / s.n)
              // no sigma > 0 guard: a perfectly constant warmup series
              // (sigma == 0) followed by ANY deviation is an anomaly —
              // |v-mu| > k*0 holds exactly when v != mu, matching the
              // batch twin; the old guard silently suppressed it
              if (math.abs(e.value - s.mean) > k * sigma)
                alerts += ZscoreAlert(dev, e.event_id,
                  HealthMonitor.tsMicros(e.ts), e.value, s.mean, sigma)
            }
            val d = e.value - s.mean
            val mean2 = s.mean + d / (s.n + 1)
            s = WelfordState(s.n + 1, mean2, s.m2 + d * (e.value - mean2))
          }
          state.update(s)
          alerts.iterator
      }
      .toDF()
  }

  /** STREAMING seasonality-aware deviation — the ingest-time twin of
    * [[graft.operators.Monitoring.seasonalDeviationOf]] (A34) and the
    * one alerting operator that existed only in batch until round 7:
    * traffic that is normal at 14:00 is an incident at 03:00, which
    * neither a fixed alarm level (the reference) nor a global running
    * mean (A33) can express. `baseline` is the persisted
    * per-(device, hour-of-day) table
    * ([[graft.operators.Monitoring.seasonalBaseline]] over history —
    * a deployment refreshes it nightly and restarts the query, the
    * C16 static-side-rotation pattern). The join runs BEFORE the
    * windowed aggregation: each event looks up its slot baseline as a
    * stream-static broadcast (map-side hash probe, zero join state —
    * a device/slot without 2 windows of history drops out exactly as
    * the batch inner join drops it), then one watermarked hourly
    * window-sum per (device, baseline) emits on window close. Join
    * state zero; agg state O(open windows × devices), bounded by the
    * watermark; the ratio arithmetic and the `>k` / `<1/k` cut are
    * the batch operator's expressions verbatim, so a replayed history
    * flags the identical (device, window) set — the parity spec pins
    * this. */
  def seasonalDeviationStream(events: Dataset[DeviceEvent],
      baseline: DataFrame, k: Double = 1.5,
      watermark: String = "2 hours"): DataFrame = {
    require(k > 1, s"deviation factor $k must exceed 1")
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF()
      .withWatermark("ts", watermark)
      .filter($"event_type" === "purchase")
      .withColumn("hod", hour($"ts"))
      .join(broadcast(baseline.select($"user_id", $"hod", $"baseline")),
        Seq("user_id", "hod"))
      .groupBy(window($"ts", "1 hour"), $"user_id", $"baseline")
      .agg(sum($"value".cast("decimal(18,4)")).as("m"))
      .withColumn("metric_sum", $"m".cast("double"))
      .withColumn("ratio", $"metric_sum" / $"baseline")
      // cut on the UNROUNDED ratio, round only for display — the batch
      // detector's exact order, so the k-boundary cannot diverge
      .filter($"ratio" > k || $"ratio" * k < 1.0)
      .select($"user_id", expr("unix_micros(window.start)").as("window_us"),
        hour($"window.start").as("hod"),
        $"metric_sum", $"baseline", round($"ratio", 6).as("ratio"))
  }

  /** LIVE MTTR — the streaming twin of
    * [[graft.operators.Monitoring.mttr]] (A28): per device, a run of
    * ≥ `minRun` consecutive errors is an incident; the first healthy
    * event STRICTLY after the run's last error closes it, emitting the
    * recovery delay the moment the device comes back (the batch
    * operator can only report it at query time). State per device is
    * O(1): the current error run's (start, end, length), the incidents
    * awaiting a strictly-later healthy event (more than one only under
    * same-microsecond tie chains — a healthy event at exactly the
    * run's end_us breaks the run without recovering it, the batch
    * kernel's strict `>`), and the last processed (us, event_id) so
    * at-least-once replays drop instead of double-emitting. Incidents
    * the device NEVER recovers from stay open in state — that device
    * is A41's silence-alert territory, not a recovery row; the batch
    * twin reports them as mttr_us = -1 at query time. */
  def recoveryStream(events: Dataset[DeviceEvent],
      minRun: Int = 3): Dataset[RecoveryRow] = {
    require(minRun >= 1, s"minRun $minRun must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RecoveryState, RecoveryRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (dev: Long, it: Iterator[DeviceEvent], state: GroupState[RecoveryState]) =>
          val sorted = it.toArray.sortBy(e =>
            (HealthMonitor.tsMicros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(
            RecoveryState(-1L, -1L, 0, Nil, -1L, -1L))
          val out = Seq.newBuilder[RecoveryRow]
          sorted.foreach { e =>
            val us = HealthMonitor.tsMicros(e.ts)
            val replay = us < st.lastUs ||
              (us == st.lastUs && e.event_id <= st.lastId)
            if (!replay) {
              st = st.copy(lastUs = us, lastId = e.event_id)
              if (e.event_type == "error") {
                st =
                  if (st.runLen == 0) st.copy(runStart = us, runEnd = us, runLen = 1)
                  else st.copy(runEnd = us, runLen = st.runLen + 1)
              } else {
                // healthy: close the current run (queue it if it
                // qualifies), then recover every pending incident whose
                // end is STRICTLY before this event
                val pending0 =
                  if (st.runLen >= minRun) st.pending :+ ((st.runStart, st.runEnd))
                  else st.pending
                val (done, still) = pending0.partition(_._2 < us)
                done.foreach { case (s0, e0) =>
                  out += RecoveryRow(dev, s0, e0, us, us - e0)
                }
                st = st.copy(runStart = -1L, runEnd = -1L, runLen = 0,
                  pending = still)
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** STREAMING DOWNTIME accounting — the live twin of
    * [[graft.operators.Monitoring.downtimeSla]] (A57): when a device's
    * next event arrives after a silence longer than `maxGapUs`, the
    * closed gap is emitted immediately as per-DAY fragments (the A57
    * day-split kernel run row-locally at close time), so the
    * availability ledger is current the moment a gap closes instead of
    * at the next batch sweep. State per device is two longs — the last
    * seen (us, event_id), which is both the gap anchor and the replay
    * fence (the flapStream in-order-per-device delivery contract
    * applies verbatim). Still-open silence is [[HealthMonitor]]/A41
    * timeout territory by the same division of labor as batch
    * A40/A42; replayed history aggregated per (device, day) equals
    * the batch A57 rows exactly (parity spec). */
  def downtimeStream(events: Dataset[DeviceEvent],
      maxGapUs: Long = 43200000000L): Dataset[DowntimeFragment] = {
    require(maxGapUs > 0, s"maxGapUs $maxGapUs must be positive")
    val dayUs = 86400000000L
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GapState, DowntimeFragment](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (dev, it, state) =>
          val sorted = it.toArray.sortBy(e =>
            (HealthMonitor.tsMicros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(GapState(-1L, -1L))
          val out = Seq.newBuilder[DowntimeFragment]
          sorted.foreach { e =>
            val us = HealthMonitor.tsMicros(e.ts)
            val replay = us < st.lastUs ||
              (us == st.lastUs && e.event_id <= st.lastId)
            if (!replay) {
              if (st.lastUs >= 0 && us - st.lastUs > maxGapUs) {
                val (s, en) = (st.lastUs, us)
                var day = s / dayUs
                while (day <= en / dayUs) {
                  val ov = math.min(en, (day + 1) * dayUs) -
                    math.max(s, day * dayUs)
                  if (ov > 0) out += DowntimeFragment(dev, day * dayUs,
                    ov, s, en)
                  day += 1
                }
              }
              st = GapState(us, e.event_id)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** STREAMING SLO ERROR BUDGET — the live twin of
    * [[graft.operators.Monitoring.errorBudget]] (A65): the "stop
    * shipping" line maintained continuously instead of at review time.
    * Every trigger that touches a device re-emits that device's
    * CURRENT budget row — observed span, accumulated silence mass
    * (A59's gap kernel folded into state: budget and gap ledger cannot
    * disagree on what downtime is), the SLO's allowance, consumed
    * fraction, exhausted verdict — so the sink's last row per device
    * IS the live budget board (the A47 upsert sink is the natural
    * consumer). State per device is five longs: first/last (us, id)
    * and the downtime sum; the (us, id) fence is the flapStream
    * delivery contract verbatim. Zero-span devices (one event so far)
    * have no observable availability and emit nothing — batch A65's
    * exclusion rule, stated there; math matches batch per-expression
    * (floor of one IEEE product; HALF_UP round-6 of one divide), so
    * the final emitted row per device equals the batch row exactly
    * (parity spec). */
  def errorBudgetStream(events: Dataset[DeviceEvent],
      maxGapUs: Long = 43200000000L, slo: Double = 0.95)
      : Dataset[BudgetRow] = {
    require(maxGapUs > 0, s"maxGapUs $maxGapUs must be positive")
    require(slo > 0 && slo < 1, s"slo $slo out of (0, 1)")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BudgetState, BudgetRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (dev, it, state) =>
          val sorted = it.toArray.sortBy(e =>
            (HealthMonitor.tsMicros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(
            BudgetState(-1L, -1L, -1L, 0L, 0L))
          var touched = false
          sorted.foreach { e =>
            val us = HealthMonitor.tsMicros(e.ts)
            val replay = us < st.lastUs ||
              (us == st.lastUs && e.event_id <= st.lastId)
            if (!replay) {
              touched = true
              if (st.lastUs >= 0 && us - st.lastUs > maxGapUs)
                st = st.copy(downUs = st.downUs + (us - st.lastUs),
                  nGaps = st.nGaps + 1)
              if (st.firstUs < 0) st = st.copy(firstUs = us)
              st = st.copy(lastUs = us, lastId = e.event_id)
            }
          }
          state.update(st)
          val span = st.lastUs - st.firstUs
          if (!touched || span <= 0L) Iterator.empty
          else {
            // batch A65's expression tree verbatim
            val budget = math.floor(span.toDouble * (1.0 - slo)).toLong
            val consumed = if (budget == 0L) None
              else Some(BigDecimal(st.downUs.toDouble / budget.toDouble)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            Iterator.single(BudgetRow(dev, span, st.downUs, st.nGaps,
              budget, consumed, st.downUs > budget))
          }
      }
  }

  /** STREAMING FLAP detection — the live twin of
    * [[graft.operators.Monitoring.statusFlaps]] (A44): a device-day
    * accumulating err↔ok transitions pages the MOMENT its count
    * reaches `minFlaps` (batch can only report at query time, after
    * the marginal device has toggled all day). State per device is
    * O(1): the previous event's error flag (carried ACROSS midnight —
    * the batch lag window does not reset per day, so a flip whose two
    * events straddle midnight counts in the LATER event's day), the
    * current day, its flip count, an alerted latch (one page per
    * device-day, A48's cooldown discipline built into the operator),
    * and a replay fence for at-least-once transport. Alert rows carry
    * the flip count AT THE MOMENT of paging (= minFlaps) — the
    * parity spec keys on (device, day), which replayed history lands
    * on exactly the batch operator's flagged set.
    *
    * DELIVERY CONTRACT (batch-parity precondition): events must
    * arrive in (ts, event_id) order PER DEVICE across triggers. The
    * replay fence cannot distinguish a redelivery from a genuinely
    * late out-of-order event — both sort at-or-before the watermark
    * pair — so on an unordered transport late events are silently
    * dropped and the stream diverges from [[graft.operators
    * .Monitoring.statusFlaps]] with no signal. Front an unordered
    * transport with a per-device reorder buffer (or run the batch
    * twin over the landed history) before trusting parity. */
  def flapStream(events: Dataset[DeviceEvent],
      minFlaps: Int = 4): Dataset[FlapAlert] = {
    require(minFlaps >= 1, s"minFlaps $minFlaps must be >= 1")
    val dayUs = 86400000000L
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FlapState, FlapAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (dev: Long, it: Iterator[DeviceEvent], state: GroupState[FlapState]) =>
          val sorted = it.toArray.sortBy(e =>
            (HealthMonitor.tsMicros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(
            FlapState(prevErr = -1, day = -1L, flips = 0L,
              alerted = false, lastUs = -1L, lastId = -1L))
          val out = Seq.newBuilder[FlapAlert]
          sorted.foreach { e =>
            val us = HealthMonitor.tsMicros(e.ts)
            val replay = us < st.lastUs ||
              (us == st.lastUs && e.event_id <= st.lastId)
            if (!replay) {
              val err = if (e.event_type == "error") 1 else 0
              val day = us / dayUs
              if (day != st.day)
                st = st.copy(day = day, flips = 0L, alerted = false)
              val flipped = st.prevErr >= 0 && st.prevErr != err
              st = st.copy(prevErr = err,
                flips = if (flipped) st.flips + 1L else st.flips,
                lastUs = us, lastId = e.event_id)
              if (flipped && !st.alerted && st.flips >= minFlaps) {
                out += FlapAlert(dev, day * dayUs, st.flips, us)
                st = st.copy(alerted = true)
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** STREAMING capacity forecast — the live twin of
    * [[graft.operators.Monitoring.capacityForecastOf]] (A60): the
    * regression moments are COMMUTATIVE sums, so unlike the EWMA
    * recurrence no per-device ordering is needed at all — each trigger
    * folds its samples into exact accumulators (Σx and max x as longs;
    * Σy at scale 4 as a long; Σxy / Σx² as exact BigDecimals, since a
    * year-long per-second series pushes both past 2⁶³) and re-emits the
    * device's refreshed forecast. The closed form replays the batch
    * operator's IEEE tree on doubles taken from the SAME exact decimal
    * moments, so a replayed history matches batch BIT-EXACTLY (the
    * parity spec pins it). State is six scalars per device however
    * long its series. Events are assumed at/after the feed epoch
    * (A60's rebase contract — batch `div` and this floorDiv agree on
    * non-negative x). */
  def trendStream(events: Dataset[DeviceEvent], threshold: Double = 400.0,
      minPoints: Int = 3): DataFrame = {
    require(minPoints >= 2, s"minPoints $minPoints < 2 cannot fit a line")
    val spark = events.sparkSession
    import spark.implicits._
    val zero = java.math.BigDecimal.ZERO
    events.filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .mapGroupsWithState[TrendState, TrendRow](GroupStateTimeout.NoTimeout) {
        (dev: Long, it: Iterator[DeviceEvent], state: GroupState[TrendState]) =>
          var s = state.getOption.getOrElse(
            TrendState(0L, 0L, 0L, zero, zero, Long.MinValue))
          it.foreach { e =>
            val x = Math.floorDiv(
              HealthMonitor.tsMicros(e.ts) - graft.operators.Monitoring.FeedEpochUs,
              1000000L)
            // value → DECIMAL(18,4) exactly as the batch cast does
            // (BigDecimal.valueOf(double) = shortest decimal repr,
            // HALF_UP — Spark's Decimal.set(double) path)
            val y4 = java.math.BigDecimal.valueOf(e.value)
              .setScale(4, java.math.RoundingMode.HALF_UP)
            s = TrendState(s.n + 1L, s.sx + x,
              s.sy4 + y4.unscaledValue().longValueExact(),
              s.sxy.add(java.math.BigDecimal.valueOf(x).multiply(y4)),
              s.sxx.add(java.math.BigDecimal.valueOf(x * x)),
              math.max(s.xmax, x))
          }
          state.update(s)
          // the A60 closed form on doubles off the exact moments
          val n = s.n.toDouble
          val sx = s.sx.toDouble
          val sy = java.math.BigDecimal.valueOf(s.sy4, 4).doubleValue()
          val sxy = s.sxy.doubleValue()
          val sxx = s.sxx.doubleValue()
          val denom = n * sxx - sx * sx
          if (s.n >= minPoints && denom > 0.0) {
            val slopeSec = (n * sxy - sx * sy) / denom
            val slopeDay = slopeSec * 86400.0
            val projected = (sy - slopeSec * sx) / n + slopeSec * s.xmax.toDouble
            val eta = if (slopeDay > 0.0 && projected < threshold)
              Some(round6((threshold - projected) / slopeDay)) else None
            TrendRow(dev, s.n, ready = true,
              Some(round6(slopeDay)), Some(round6(projected)), eta)
          } else TrendRow(dev, s.n, ready = false, None, None, None)
      }
      .filter(_.ready)
      .toDF()
      .select(col("user_id"), col("n_samples"), col("slope_per_day"),
        col("projected_now"), col("days_to_breach"))
  }

  /** Spark's Round-on-double semantics (HALF_UP over the shortest
    * decimal repr) — shared so stream and batch cannot drift. */
  private def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}

/** Exact per-device regression moments (A61): counts/Σx/max-x as longs,
  * Σy at fixed scale 4 as a long, Σxy / Σx² as arbitrary-precision
  * decimals — a year-long per-second series overflows 2⁶³ on both. */
case class TrendState(n: Long, sx: Long, sy4: Long,
    sxy: java.math.BigDecimal, sxx: java.math.BigDecimal, xmax: Long)

/** One live forecast row (ready = fitted: enough points, nonzero
  * x-variance). */
case class TrendRow(user_id: Long, n_samples: Long, ready: Boolean,
    slope_per_day: Option[Double], projected_now: Option[Double],
    days_to_breach: Option[Double])

/** Per-device flap state: previous error flag (-1 = none yet, carried
  * across midnight like the batch lag window), current day + flip
  * count + one-page latch, and the replay fence. */
case class FlapState(prevErr: Int, day: Long, flips: Long,
  alerted: Boolean, lastUs: Long, lastId: Long)

/** One page per flapping device-day, at the moment the count crossed. */
case class FlapAlert(user_id: Long, day_us: Long, n_flips: Long, at_us: Long)

/** Per-device live-MTTR state: the current error run, incidents
  * awaiting a strictly-later healthy event, and the replay fence. */
case class RecoveryState(runStart: Long, runEnd: Long, runLen: Int,
    pending: Seq[(Long, Long)], lastUs: Long, lastId: Long)

/** One closed incident: recovery observed live. */
case class RecoveryRow(user_id: Long, start_us: Long, end_us: Long,
    recovery_us: Long, mttr_us: Long)

/** Running-EWMA state: the recurrence's whole history in two fields. */
case class EwmaState(ewma: Double, n: Long)

/** Running-CUSUM state: statistic, running max, sample count. */
case class CusumState(s: Double, m: Double, n: Long)

/** Current 6-hour SLO bucket per device: aligned bucket id + per-hour
  * error/total counters (index = hour-of-bucket). */
case class BurnState(bucket6: Long, errors: Seq[Long], totals: Seq[Long])

/** Last heartbeat per live device (the armed-timeout state). */
case class HeartbeatState(lastUs: Long, lastEventId: Long)

/** One "device is silent right now" alert: the last thing it said and
  * the event-time deadline the watermark crossed. */
case class SilenceAlert(user_id: Long, last_event_id: Long,
    last_us: Long, deadline_us: Long)

/** One emitted hourly burn row (a closed 6-hour bucket's hour). */
case class BurnRow(user_id: Long, window_us: Long, errors_1h: Long,
    total_1h: Long, burn_1h: Double, burn_6h: Double, paged: Boolean)

/** Welford running-moment state: count, mean, sum of squared deviations. */
case class WelfordState(n: Long, mean: Double, m2: Double)

/** An emitted streaming anomaly: the sample and the prior statistics
  * it was judged against. */
case class ZscoreAlert(user_id: Long, event_id: Long, us: Long,
    value: Double, prior_mean: Double, prior_sigma: Double)

/** A59 state: last seen (us, event_id) — gap anchor + replay fence. */
case class GapState(lastUs: Long, lastId: Long)

/** One closed silence gap's contribution to one device-day — sum per
  * (user_id, day_us) to get batch A57's downtime_us exactly. */
case class DowntimeFragment(user_id: Long, day_us: Long, downtime_us: Long,
    gap_start_us: Long, gap_end_us: Long)

/** A66 state: first/last seen (us, id) + accumulated closed-gap mass. */
case class BudgetState(firstUs: Long, lastUs: Long, lastId: Long,
    downUs: Long, nGaps: Long)

/** A66's emitted live budget row — batch A65's schema; the last row
  * per device is the current budget board entry. */
case class BudgetRow(user_id: Long, span_us: Long, downtime_us: Long,
    n_gaps: Long, budget_us: Long, budget_consumed: Option[Double],
    exhausted: Boolean)
