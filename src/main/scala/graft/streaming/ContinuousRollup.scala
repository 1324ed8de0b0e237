package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** CONTINUOUSLY-MAINTAINED METRIC ROLLUP — the composition the r8
  * verdict named as the top telemetry gap: the reference's CloudWatch
  * surface is a TABLE it polls (putmedia_check.sh:10-37 asks for a
  * window's statistics on demand), and until now this repo computed
  * those windows per query (A3/A4/A53) while separately owning an
  * exactly-once keyed upsert sink (A47). This wires them together:
  * A3's 60-second tumbling (device, window) Sum/SampleCount aggregate,
  * maintained INCREMENTALLY by a streaming query that upserts each
  * trigger's changed windows into the bucketed [[UpsertSink]] snapshot
  * keyed by (device, window) — the continuous-aggregate /
  * materialized-rollup shape every telemetry store ships (TimescaleDB
  * continuous aggregates, Druid rollup segments), built from the
  * primitives this engine already owns.
  *
  * Semantics:
  *  - UPDATE output mode: a window re-emits every trigger that changes
  *    it, and last-writer-wins (version = batch id) in the snapshot
  *    converges each key to its latest partial — readers poll the
  *    TABLE, exactly like the reference's CLI, and always see a
  *    complete consistent rollup that is at most one trigger stale for
  *    still-open windows and EXACT for settled ones.
  *  - A3 PARITY: the aggregate uses A3's DECIMAL(18,4) sum discipline
  *    (order-independent partials), so once history has drained the
  *    snapshot's rows equal `Monitoring.windowSum`'s batch answer
  *    bit-for-bit — the spec pins that, across a stop/restart AND a
  *    replayed trigger (the A47 marker short-circuits it).
  *  - Scale: state is O(open windows × devices) under the watermark;
  *    each trigger rewrites only the snapshot buckets its changed
  *    windows hash into (dynamic partition overwrite — A47's
  *    economics); the snapshot read side prunes to polled buckets.
  *
  * Ref: putmedia_check.sh:10-37 (get-metric-statistics over a period),
  * putmedia_check2.sh:22-52 (the same windows re-polled continuously).
  */
object ContinuousRollup {

  /** The per-trigger update stream: (device, window) rows whose
    * aggregate changed, with A3's exact decimal sum. `rollup_key`
    * packs the composite key for the single-key upsert sink. */
  def updates(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    StreamingAggs.withWatermarkIfAbsent(
        events.filter(col("event_type") === "purchase"), "ts", watermark)
      .groupBy(window(col("ts"), "60 seconds"), col("user_id"))
      .agg(sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("metric_sum"),
        count(lit(1)).as("sample_count"))
      .select(col("user_id"),
        expr("unix_micros(window.start)").as("window_us"),
        col("metric_sum"), col("sample_count"))
      .withColumn("rollup_key",
        concat_ws(":", col("user_id"), col("window_us")))

  /** Start maintaining the rollup table at `dir`. Exactly-once per
    * trigger via [[UpsertSink.applyBatch]]'s marker + idempotent
    * apply; version = batch id gives last-writer-wins convergence for
    * windows that span triggers. */
  def start(events: DataFrame, dir: String, checkpointDir: String,
      nBuckets: Int = 64, watermark: String = "10 minutes"): StreamingQuery =
    updates(events, watermark).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        UpsertSink.applyBatch(batch.withColumn("__ver", lit(batchId)),
          batchId, dir, "rollup_key", "__ver", nBuckets)
      }
      .start()

  /** The rollup TABLE a poller reads — the get-metric-statistics
    * surface: current (device, window) Sum/SampleCount rows. */
  def snapshot(spark: SparkSession, dir: String): DataFrame =
    UpsertSink.snapshot(spark, dir)
      .select(col("user_id"), col("window_us"),
        col("metric_sum"), col("sample_count"))

  /** The FULL CloudWatch statistic set (A4's hourly
    * Sum/Average/Minimum/Maximum/SampleCount, all event types)
    * maintained continuously — every statistic the reference's CLI can
    * request (putmedia_check.sh `--statistics`) from one incremental
    * table. All five are order-free aggregates, so update-mode
    * last-writer-wins converges them exactly like the Sum rollup;
    * settled windows are bit-identical to `Monitoring.windowStats`
    * (spec-pinned). */
  def statUpdates(events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    StreamingAggs.withWatermarkIfAbsent(events, "ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(
        sum(col("value").cast("decimal(18,4)")).cast("double").as("stat_sum"),
        (sum(col("value").cast("decimal(18,4)")).cast("double") /
          count(lit(1))).as("stat_avg"),
        min(col("value")).as("stat_min"),
        max(col("value")).as("stat_max"),
        count(lit(1)).as("sample_count"))
      .select(col("user_id"),
        expr("unix_micros(window.start)").as("window_us"),
        col("stat_sum"), col("stat_avg"), col("stat_min"),
        col("stat_max"), col("sample_count"))
      .withColumn("rollup_key",
        concat_ws(":", col("user_id"), col("window_us")))

  def startStats(events: DataFrame, dir: String, checkpointDir: String,
      nBuckets: Int = 64, watermark: String = "10 minutes"): StreamingQuery =
    statUpdates(events, watermark).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        UpsertSink.applyBatch(batch.withColumn("__ver", lit(batchId)),
          batchId, dir, "rollup_key", "__ver", nBuckets)
      }
      .start()

  def statsSnapshot(spark: SparkSession, dir: String): DataFrame =
    UpsertSink.snapshot(spark, dir)
      .select(col("user_id"), col("window_us"), col("stat_sum"),
        col("stat_avg"), col("stat_min"), col("stat_max"),
        col("sample_count"))

  /** CONTINUOUS HISTOGRAM rollup — the tail-percentile half (A53's
    * p50/p95/p99) maintained incrementally. Exact percentiles are not
    * mergeable, so no upsert of a percentile column can be right;
    * the honest continuously-maintainable statistic is the fixed-
    * bucket HISTOGRAM (A16's shape), kept here as (device, window,
    * bucket) COUNT rows — plain integer aggregates, trivially
    * last-writer-wins convergent, bit-exact against a batch recount
    * (spec-pinned) — with percentiles DERIVED at read time by
    * interpolating within the cumulative bucket walk. That is the
    * B20/A53 trade stated as a table: sub-bucket-width percentile
    * error, any quantile on demand, no re-aggregation per poll. */
  def histUpdates(events: DataFrame, nBins: Int = 20, lo: Double = 0.0,
      hi: Double = 600.0, watermark: String = "10 minutes"): DataFrame = {
    require(nBins >= 1 && hi > lo, "need nBins >= 1 and hi > lo")
    val width = (hi - lo) / nBins
    StreamingAggs.withWatermarkIfAbsent(
        events.filter(col("value").isNotNull), "ts", watermark)
      // "vbucket": the VALUE bucket — "bucket" is reserved by the
      // upsert sink for its hash-partition column
      .withColumn("vbucket",
        least(greatest(floor((col("value") - lo) / width), lit(0.0)),
          lit((nBins - 1).toDouble)).cast("int"))
      .groupBy(window(col("ts"), "1 hour"), col("user_id"), col("vbucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
        expr("unix_micros(window.start)").as("window_us"),
        col("vbucket"), col("cnt"))
      .withColumn("rollup_key",
        concat_ws(":", col("user_id"), col("window_us"), col("vbucket")))
  }

  def startHist(events: DataFrame, dir: String, checkpointDir: String,
      nBins: Int = 20, lo: Double = 0.0, hi: Double = 600.0,
      nBuckets: Int = 64, watermark: String = "10 minutes"): StreamingQuery =
    histUpdates(events, nBins, lo, hi, watermark).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        UpsertSink.applyBatch(batch.withColumn("__ver", lit(batchId)),
          batchId, dir, "rollup_key", "__ver", nBuckets)
      }
      .start()

  def histSnapshot(spark: SparkSession, dir: String): DataFrame =
    UpsertSink.snapshot(spark, dir)
      .select(col("user_id"), col("window_us"), col("vbucket"), col("cnt"))

  /** Percentiles ON DEMAND from the maintained histogram: for each
    * (device, window) walk the cumulative bucket counts and linearly
    * interpolate inside the bucket that crosses q·n — within ~a bucket
    * width of the exact sample quantile (uniform-within-bucket is one
    * width; the q·n vs q·(n−1) index conventions can shift the
    * crossing one sample into an adjacent bucket — two widths is the
    * spec-pinned bound). Any quantile, any time, from the same
    * table. */
  def histPercentile(spark: SparkSession, dir: String, q: Double,
      nBins: Int = 20, lo: Double = 0.0, hi: Double = 600.0): DataFrame = {
    import spark.implicits._
    require(q >= 0 && q <= 1, s"quantile $q out of [0, 1]")
    val width = (hi - lo) / nBins
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"window_us").orderBy($"vbucket")
    histSnapshot(spark, dir)
      .withColumn("cum", sum($"cnt").over(w))
      .withColumn("n", sum($"cnt").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id", $"window_us")))
      // the first bucket whose cumulative count reaches q·n holds the
      // quantile; interpolate by the fraction of that bucket consumed.
      // q = 0 needs its own crossing rule: (cum − cnt) < 0 never holds
      // (the first bucket starts at exactly 0), so p0 is the first
      // NON-EMPTY bucket (cum − cnt = 0 ∧ cnt > 0 — unique per key
      // even when zero-count repair rows lead the walk), and the
      // interpolation fraction evaluates to 0 there — the
      // minimum-bucket estimate.
      .filter(
        if (q == 0) ($"cum" - $"cnt") === 0 && $"cnt" > 0
        else $"cum" >= lit(q) * $"n" &&
          ($"cum" - $"cnt") < lit(q) * $"n")
      .select($"user_id", $"window_us",
        round(lit(lo) + ($"vbucket" +
          ((lit(q) * $"n" - ($"cum" - $"cnt")) / $"cnt")) * width, 6)
          .as(s"p_est"))
      .orderBy($"user_id", $"window_us")
  }

  /** BACKFILL / repair — the lambda-loop closer: data later than the
    * watermark never reaches the streaming aggregate, so a scheduled
    * batch pass recomputes the affected window range FROM HISTORY and
    * upserts the corrected rows over the snapshot (A47's idempotent
    * apply — re-running a repair converges; give each repair run its
    * own `repairId` outside the stream's epoch space, negative by
    * convention, so the marker fence never collides with live
    * triggers). Only windows intersecting [fromUs, toUs) are touched —
    * the history scan prunes on the same bound. */
  def backfillSums(spark: SparkSession, sfDir: String, dir: String,
      fromUs: Long, toUs: Long, repairId: Long,
      nBuckets: Int = 64): Unit = {
    import spark.implicits._
    require(repairId < 0, "use a negative repairId — the stream owns >= 0")
    require(fromUs < toUs, s"empty repair range [$fromUs, $toUs)")
    // EXPAND to whole windows: recounting a partially-covered window
    // would overwrite a correct total with a partial one — the repair
    // unit is the window, never the event range
    val winUs = 60000000L
    val f = fromUs - java.lang.Math.floorMod(fromUs, winUs)
    val t0 = java.lang.Math.floorMod(toUs, winUs)
    val t = if (t0 == 0) toUs else toUs + (winUs - t0)
    val recomputed = graft.Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .withColumn("us", expr("unix_micros(ts)"))
      .filter($"us" >= f && $"us" < t)
      .groupBy($"user_id", expr("unix_micros(date_trunc('minute', ts))")
        .as("window_us"))
      .agg(sum($"value".cast("decimal(18,4)")).cast("double")
          .as("metric_sum"),
        count(lit(1)).as("sample_count"))
      .withColumn("rollup_key",
        concat_ws(":", col("user_id"), col("window_us")))
      .localCheckpoint(true) // read twice: upsert + stale-key anti-join
    // STALE rows must not survive the repair: a (device, window) the
    // snapshot carries inside the repaired range but for which history
    // now has ZERO events would emit no recomputed row, and the wrong
    // existing row would win by omission. Emit explicit ZERO rows for
    // exactly those snapshot keys — history is authoritative for the
    // whole expanded range, including its silences.
    val stale = snapshot(spark, dir)
      .filter($"window_us" >= f && $"window_us" < t)
      .select($"user_id", $"window_us",
        concat_ws(":", $"user_id", $"window_us").as("rollup_key"))
      .join(recomputed.select($"rollup_key"), Seq("rollup_key"),
        "left_anti")
      .withColumn("metric_sum", lit(0.0))
      .withColumn("sample_count", lit(0L))
      .select($"user_id", $"window_us", $"metric_sum", $"sample_count",
        $"rollup_key")
    // Cross-batch precedence is APPLY ORDER: UpsertSink.applyBatch
    // replaces existing keys unconditionally (anti-join + union), so
    // the last apply wins regardless of version — a repair overwrites
    // whatever the snapshot holds (including a higher-stamped poison
    // row), and a LATER live trigger would overwrite a repaired key in
    // turn. That is safe by protocol, not by version math: repairs
    // target settled windows past the watermark, where no live trigger
    // emits. The version column only arbitrates duplicates WITHIN one
    // batch; a repair emits one row per key, so any distinct stamp
    // works — MaxValue/2 − repairId keeps successive repairs (−1, −2,
    // … by convention) distinct for debuggability.
    val batch = recomputed.unionByName(stale)
      .withColumn("__ver", lit(Long.MaxValue / 2 - repairId))
    // the apply (its writes are actions) is the pin's last reader —
    // released in a finally so a failed repair does not leak it
    try UpsertSink.applyBatch(batch, repairId, dir, "rollup_key",
      "__ver", nBuckets)
    finally graft.Tables.unpinCheckpoint(recomputed)
  }

  /** [[backfillSums]] for the FULL-STAT table ([[startStats]]'s hourly
    * Sum/Avg/Min/Max/SampleCount) — the repair path the five-stat
    * rollup was missing: same contract (expand to whole hour windows,
    * recompute from history with [[statUpdates]]'s exact expressions,
    * explicit ZERO rows for stale snapshot keys — avg/min/max NULL and
    * sample_count 0, the "no data" shape a `sample_count > 0` reader
    * filters), same apply-order precedence notes as the Sum repair. */
  def backfillStats(spark: SparkSession, sfDir: String, dir: String,
      fromUs: Long, toUs: Long, repairId: Long,
      nBuckets: Int = 64): Unit = {
    import spark.implicits._
    require(repairId < 0, "use a negative repairId — the stream owns >= 0")
    require(fromUs < toUs, s"empty repair range [$fromUs, $toUs)")
    val winUs = 3600000000L
    val f = fromUs - java.lang.Math.floorMod(fromUs, winUs)
    val t0 = java.lang.Math.floorMod(toUs, winUs)
    val t = if (t0 == 0) toUs else toUs + (winUs - t0)
    val recomputed = graft.Tables.events(spark, sfDir)
      .withColumn("us", expr("unix_micros(ts)"))
      .filter($"us" >= f && $"us" < t)
      .groupBy($"user_id", expr("unix_micros(date_trunc('hour', ts))")
        .as("window_us"))
      .agg(
        sum($"value".cast("decimal(18,4)")).cast("double").as("stat_sum"),
        (sum($"value".cast("decimal(18,4)")).cast("double") /
          count(lit(1))).as("stat_avg"),
        min($"value").as("stat_min"),
        max($"value").as("stat_max"),
        count(lit(1)).as("sample_count"))
      .withColumn("rollup_key",
        concat_ws(":", col("user_id"), col("window_us")))
      .localCheckpoint(true) // read twice: upsert + stale-key anti-join
    val stale = statsSnapshot(spark, dir)
      .filter($"window_us" >= f && $"window_us" < t)
      .select($"user_id", $"window_us",
        concat_ws(":", $"user_id", $"window_us").as("rollup_key"))
      .join(recomputed.select($"rollup_key"), Seq("rollup_key"),
        "left_anti")
      .withColumn("stat_sum", lit(0.0))
      .withColumn("stat_avg", lit(null).cast("double"))
      .withColumn("stat_min", lit(null).cast("double"))
      .withColumn("stat_max", lit(null).cast("double"))
      .withColumn("sample_count", lit(0L))
      .select($"user_id", $"window_us", $"stat_sum", $"stat_avg",
        $"stat_min", $"stat_max", $"sample_count", $"rollup_key")
    val batch = recomputed.unionByName(stale)
      .withColumn("__ver", lit(Long.MaxValue / 2 - repairId))
    // the apply (its writes are actions) is the pin's last reader —
    // released in a finally so a failed repair does not leak it
    try UpsertSink.applyBatch(batch, repairId, dir, "rollup_key",
      "__ver", nBuckets)
    finally graft.Tables.unpinCheckpoint(recomputed)
  }

  /** [[backfillSums]] for the HISTOGRAM table ([[startHist]]'s hourly
    * (device, window, vbucket) counts) — the last rollup without a
    * repair path: late-past-watermark data left the percentile-serving
    * histogram permanently stale exactly where its sum/stat siblings
    * healed. Same contract, one histogram-specific sharpening: the
    * repair key is (device, window, VBUCKET), so a late event does not
    * just change one count — it can POPULATE a bucket the snapshot
    * never held and VACATE one it did (the event that moved was that
    * bucket's only member). Recount covers the first case; the stale
    * anti-join emits explicit cnt=0 rows for the second (and for ghost
    * keys a poisoned snapshot carries), so the read-time cumulative
    * walk — which sums whatever rows exist per (device, window) —
    * never mixes a healed bucket with a stale neighbor. Zero-count
    * rows are harmless to [[histPercentile]] by construction (its p0
    * crossing rule already skips empty leading buckets). Bin geometry
    * (nBins, lo, hi) must match the stream's — it is part of the
    * table's identity, exactly like the window width. */
  def backfillHist(spark: SparkSession, sfDir: String, dir: String,
      fromUs: Long, toUs: Long, repairId: Long, nBins: Int = 20,
      lo: Double = 0.0, hi: Double = 600.0, nBuckets: Int = 64): Unit = {
    import spark.implicits._
    require(repairId < 0, "use a negative repairId — the stream owns >= 0")
    require(fromUs < toUs, s"empty repair range [$fromUs, $toUs)")
    require(nBins >= 1 && hi > lo, "need nBins >= 1 and hi > lo")
    val width = (hi - lo) / nBins
    val winUs = 3600000000L
    val f = fromUs - java.lang.Math.floorMod(fromUs, winUs)
    val t0 = java.lang.Math.floorMod(toUs, winUs)
    val t = if (t0 == 0) toUs else toUs + (winUs - t0)
    val recomputed = graft.Tables.events(spark, sfDir)
      .filter($"value".isNotNull)
      .withColumn("us", expr("unix_micros(ts)"))
      .filter($"us" >= f && $"us" < t)
      // histUpdates' exact bucketing expression — the repair must land
      // in the same bins the stream wrote or parity is vacuous
      .withColumn("vbucket",
        least(greatest(floor(($"value" - lo) / width), lit(0.0)),
          lit((nBins - 1).toDouble)).cast("int"))
      .groupBy($"user_id", expr("unix_micros(date_trunc('hour', ts))")
        .as("window_us"), $"vbucket")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rollup_key",
        concat_ws(":", col("user_id"), col("window_us"), col("vbucket")))
      .localCheckpoint(true) // read twice: upsert + stale-key anti-join
    val stale = histSnapshot(spark, dir)
      .filter($"window_us" >= f && $"window_us" < t)
      .select($"user_id", $"window_us", $"vbucket",
        concat_ws(":", $"user_id", $"window_us", $"vbucket")
          .as("rollup_key"))
      .join(recomputed.select($"rollup_key"), Seq("rollup_key"),
        "left_anti")
      .withColumn("cnt", lit(0L))
      .select($"user_id", $"window_us", $"vbucket", $"cnt", $"rollup_key")
    val batch = recomputed.unionByName(stale)
      .withColumn("__ver", lit(Long.MaxValue / 2 - repairId))
    // the apply (its writes are actions) is the pin's last reader —
    // released in a finally so a failed repair does not leak it
    try UpsertSink.applyBatch(batch, repairId, dir, "rollup_key",
      "__ver", nBuckets)
    finally graft.Tables.unpinCheckpoint(recomputed)
  }
}
