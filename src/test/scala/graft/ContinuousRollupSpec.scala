package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Monitoring
import graft.sources.EventSource
import graft.streaming.{ContinuousRollup, UpsertSink}

/** The continuous-aggregate composition (A3 ∘ A47): a streaming
  * windowed rollup upserted into the bucketed snapshot must, after
  * replaying history, equal the batch A3 answer EXACTLY — including
  * across a replayed trigger, which the A47 marker short-circuits. */
class ContinuousRollupSpec extends SparkSpec {
  import spark.implicits._

  test("replayed history's snapshot equals A3's batch rollup; replayed trigger is a no-op") {
    val staging = java.nio.file.Files.createTempDirectory("graft-roll-in").toString
    val dir = java.nio.file.Files.createTempDirectory("graft-roll").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-roll-ck").toString
    // 4 files -> 4 micro-batches: windows split across triggers exercise
    // the last-writer-wins convergence, not just single-shot aggregation.
    // The huge watermark keeps every window open so no late row is
    // dropped — the parity precondition (production uses a real
    // watermark and parity holds for rows inside it).
    val stream = EventSource.replayTable(spark, sf, staging, parts = 4)
    val q = ContinuousRollup.start(stream, dir, ckpt,
      nBuckets = 8, watermark = "3650 days")
    try q.processAllAvailable() finally q.stop()

    val snap = ContinuousRollup.snapshot(spark, dir)
    val batch = Monitoring.windowSum(spark, sf)
    // exact set equality, both directions (decimal-sum discipline makes
    // the doubles bit-identical)
    assert(snap.exceptAll(batch).count() === 0, "snapshot rows not in batch")
    assert(batch.exceptAll(snap).count() === 0, "batch rows not in snapshot")
    assert(snap.count() > 0)

    // a REPLAYED trigger must be short-circuited by its marker: re-apply
    // batch 0 with poisoned content — if the fence failed, these rows
    // would land and parity above would be destroyed
    val poison = Seq((999999L, 0L, -1.0, 1L, "999999:0"))
      .toDF("user_id", "window_us", "metric_sum", "sample_count",
        "rollup_key")
      .withColumn("__ver", org.apache.spark.sql.functions.lit(0L))
    UpsertSink.applyBatch(poison, 0L, dir, "rollup_key", "__ver", 8)
    val after = ContinuousRollup.snapshot(spark, dir)
    assert(after.filter($"user_id" === 999999L).count() === 0,
      "replayed trigger was applied — the exactly-once fence is broken")
    assert(after.exceptAll(batch).count() === 0 &&
      batch.exceptAll(after).count() === 0)
  }

  test("full stat set: replayed history equals A4's hourly Sum/Avg/Min/Max/Count") {
    val staging = java.nio.file.Files.createTempDirectory("graft-rollst-in").toString
    val dir = java.nio.file.Files.createTempDirectory("graft-rollst").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rollst-ck").toString
    val stream = EventSource.replayTable(spark, sf, staging, parts = 3)
    val q = ContinuousRollup.startStats(stream, dir, ckpt,
      nBuckets = 8, watermark = "3650 days")
    try q.processAllAvailable() finally q.stop()
    val snap = ContinuousRollup.statsSnapshot(spark, dir)
    val batch = Monitoring.windowStats(spark, sf)
    assert(snap.exceptAll(batch).count() === 0, "snapshot rows not in batch")
    assert(batch.exceptAll(snap).count() === 0, "batch rows not in snapshot")
    assert(snap.count() > 0)

    // REPAIR: poison a real window + plant a ghost key, then backfill
    // the range — the five-stat table must return to batch parity and
    // the ghost must be explicitly zeroed (the sums-repair contract)
    val victim = batch.limit(1).collect().head
    val (vu, vw) = (victim.getLong(0), victim.getLong(1))
    val ghostU = 999999999L
    val poison = Seq(
        (vu, vw, -1.0, -1.0, -1.0, -1.0, 1L, s"$vu:$vw"),
        (ghostU, vw, 9.0, 9.0, 9.0, 9.0, 9L, s"$ghostU:$vw"))
      .toDF("user_id", "window_us", "stat_sum", "stat_avg", "stat_min",
        "stat_max", "sample_count", "rollup_key")
      .withColumn("__ver", org.apache.spark.sql.functions.lit(Long.MaxValue))
    UpsertSink.applyBatch(poison, -999L, dir, "rollup_key", "__ver", 8)
    assert(ContinuousRollup.statsSnapshot(spark, dir)
      .filter($"user_id" === vu && $"window_us" === vw)
      .head().getDouble(2) === -1.0)
    ContinuousRollup.backfillStats(spark, sf, dir,
      vw + 7L, vw + 8L, repairId = -1000L, nBuckets = 8)
    val repaired = ContinuousRollup.statsSnapshot(spark, dir)
    def live(df: org.apache.spark.sql.DataFrame) =
      df.filter($"sample_count" > 0)
    assert(live(repaired).exceptAll(batch).count() === 0 &&
      batch.exceptAll(live(repaired)).count() === 0,
      "stats repair did not restore parity")
    val ghost = repaired.filter($"user_id" === ghostU).collect()
    assert(ghost.length === 1 && ghost.head.getDouble(2) === 0.0 &&
      ghost.head.isNullAt(3) && ghost.head.getLong(6) === 0L,
      s"ghost not zeroed: ${ghost.toSeq}")
  }

  test("histogram rollup: maintained bucket counts equal a batch recount; percentiles derive") {
    val staging = java.nio.file.Files.createTempDirectory("graft-rollh-in").toString
    val dir = java.nio.file.Files.createTempDirectory("graft-rollh").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rollh-ck").toString
    val stream = EventSource.replayTable(spark, sf, staging, parts = 3)
    val q = ContinuousRollup.startHist(stream, dir, ckpt,
      nBuckets = 8, watermark = "3650 days")
    try q.processAllAvailable() finally q.stop()
    val snap = ContinuousRollup.histSnapshot(spark, dir)
    // batch recount with the identical bucketing
    val width = (600.0 - 0.0) / 20
    val batch = Tables.events(spark, sf)
      .filter($"value".isNotNull)
      .withColumn("vbucket",
        least(greatest(floor($"value" / width), lit(0.0)), lit(19.0))
          .cast("int"))
      .groupBy($"user_id",
        expr("unix_micros(date_trunc('hour', ts))").as("window_us"),
        $"vbucket")
      .agg(count(lit(1)).as("cnt"))
    assert(snap.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(snap).count() === 0)
    // derived percentile: within ~a bucket of the exact interpolated
    // sample quantile — the uniform-within-bucket assumption is one
    // width, and the q·n vs q·(n−1) index conventions can shift the
    // crossing by one sample into the adjacent bucket, so the honest
    // bound is two widths
    val p95 = ContinuousRollup.histPercentile(spark, dir, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Tables.events(spark, sf).filter($"value".isNotNull)
      .groupBy($"user_id",
        expr("unix_micros(date_trunc('hour', ts))").as("window_us"))
      .agg(expr("percentile(value, 0.95)").as("p")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(p95.keySet === exact.keySet)
    p95.foreach { case (k, est) =>
      assert(math.abs(est - exact(k)) <= 2 * width + 1e-9,
        s"$k: est $est vs exact ${exact(k)}")
    }
    // q = 0 has its own crossing rule (the generic filter's
    // (cum − cnt) < 0 never holds): every key must yield exactly one
    // row — the left edge of its first non-empty bucket, which is
    // within one bucket width of the true minimum
    val p0 = ContinuousRollup.histPercentile(spark, dir, 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val mins = Tables.events(spark, sf).filter($"value".isNotNull)
      .groupBy($"user_id",
        expr("unix_micros(date_trunc('hour', ts))").as("window_us"))
      .agg(min($"value").as("m")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(p0.keySet === mins.keySet, "p0 must cover every key")
    p0.foreach { case (k, est) =>
      assert(est <= mins(k) + 1e-9 && mins(k) - est <= width + 1e-9,
        s"$k: p0 $est vs min ${mins(k)}")
    }
  }

  test("backfill repairs a poisoned window back to the batch answer, idempotently") {
    val staging = java.nio.file.Files.createTempDirectory("graft-rollb-in").toString
    val dir = java.nio.file.Files.createTempDirectory("graft-rollb").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rollb-ck").toString
    val stream = EventSource.replayTable(spark, sf, staging, parts = 2)
    val q = ContinuousRollup.start(stream, dir, ckpt,
      nBuckets = 8, watermark = "3650 days")
    try q.processAllAvailable() finally q.stop()
    val batch = Monitoring.windowSum(spark, sf)
    // poison one real window (a late-data miss would look like this:
    // the snapshot holds a stale partial)
    val victim = batch.limit(1).collect().head
    val (vu, vw) = (victim.getLong(0), victim.getLong(1))
    // two poisons: a stale partial on a REAL window, and a GHOST row
    // whose (device, window) has zero history events inside the
    // repaired range — the repair must zero the ghost out explicitly
    // (omission would let it survive)
    val ghostU = 999999999L
    val poison = Seq((vu, vw, -1.0, 1L, s"$vu:$vw"),
        (ghostU, vw, 123.0, 9L, s"$ghostU:$vw"))
      .toDF("user_id", "window_us", "metric_sum", "sample_count",
        "rollup_key")
      .withColumn("__ver", org.apache.spark.sql.functions.lit(Long.MaxValue))
    UpsertSink.applyBatch(poison, -999L, dir, "rollup_key", "__ver", 8)
    assert(ContinuousRollup.snapshot(spark, dir)
      .filter($"user_id" === vu && $"window_us" === vw)
      .head().getDouble(2) === -1.0)
    // repair the window's range (deliberately unaligned bounds: the
    // operator must expand to whole windows)
    ContinuousRollup.backfillSums(spark, sf, dir,
      vw + 7L, vw + 8L, repairId = -1000L, nBuckets = 8)
    def live(df: org.apache.spark.sql.DataFrame) =
      df.filter($"sample_count" > 0) // zeroed ghosts read as "no data"
    val snap = ContinuousRollup.snapshot(spark, dir)
    assert(live(snap).exceptAll(batch).count() === 0 &&
      batch.exceptAll(live(snap)).count() === 0,
      "repair did not restore parity")
    val ghost = snap.filter($"user_id" === ghostU && $"window_us" === vw)
      .collect()
    assert(ghost.length === 1 && ghost.head.getDouble(2) === 0.0 &&
      ghost.head.getLong(3) === 0L, "ghost row not zeroed by the repair")
    // a re-run of the same repair converges (content-idempotent apply;
    // precedence is apply order — the fresh repairId skips the marker)
    ContinuousRollup.backfillSums(spark, sf, dir,
      vw + 7L, vw + 8L, repairId = -1001L, nBuckets = 8)
    val again = ContinuousRollup.snapshot(spark, dir)
    assert(live(again).exceptAll(batch).count() === 0 &&
      batch.exceptAll(live(again)).count() === 0)
  }

  test("backfill heals the histogram: poisoned bucket, vacated bucket, ghost key — idempotently") {
    val staging = java.nio.file.Files.createTempDirectory("graft-rollhb-in").toString
    val dir = java.nio.file.Files.createTempDirectory("graft-rollhb").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rollhb-ck").toString
    val stream = EventSource.replayTable(spark, sf, staging, parts = 2)
    val q = ContinuousRollup.startHist(stream, dir, ckpt,
      nBuckets = 8, watermark = "3650 days")
    try q.processAllAvailable() finally q.stop()
    val width = (600.0 - 0.0) / 20
    def batchRecount() = Tables.events(spark, sf)
      .filter($"value".isNotNull)
      .withColumn("vbucket",
        least(greatest(floor($"value" / width), lit(0.0)), lit(19.0))
          .cast("int"))
      .groupBy($"user_id",
        expr("unix_micros(date_trunc('hour', ts))").as("window_us"),
        $"vbucket")
      .agg(count(lit(1)).as("cnt"))
    val batch = batchRecount().localCheckpoint(true)
    val victim = batch.limit(1).collect().head
    val (vu, vw, vb) = (victim.getLong(0), victim.getLong(1),
      victim.getInt(2))
    // an EMPTY bucket for the victim key — the "vacated bucket" shape:
    // the snapshot claims members in a bin history holds none in
    val emptyB = (0 until 20).find(b => batch.filter($"user_id" === vu &&
      $"window_us" === vw && $"vbucket" === b).isEmpty).get
    val ghostU = 999999999L
    val poison = Seq(
        (vu, vw, vb, 777L, s"$vu:$vw:$vb"),        // stale count, real bucket
        (vu, vw, emptyB, 5L, s"$vu:$vw:$emptyB"),  // bucket history vacated
        (ghostU, vw, 0, 9L, s"$ghostU:$vw:0"))     // ghost key entirely
      .toDF("user_id", "window_us", "vbucket", "cnt", "rollup_key")
      .withColumn("__ver", lit(Long.MaxValue))
    UpsertSink.applyBatch(poison, -999L, dir, "rollup_key", "__ver", 8)
    // repair through deliberately unaligned bounds — whole-hour expansion
    ContinuousRollup.backfillHist(spark, sf, dir,
      vw + 7L, vw + 8L, repairId = -1000L, nBuckets = 8)
    def live(df: org.apache.spark.sql.DataFrame) = df.filter($"cnt" > 0)
    val snap = ContinuousRollup.histSnapshot(spark, dir)
    assert(live(snap).exceptAll(batch).count() === 0 &&
      batch.exceptAll(live(snap)).count() === 0,
      "repair did not restore bucket-count parity")
    // both zeroed shapes present EXPLICITLY (omission would let the
    // poison win) and at zero
    Seq((vu, vw, emptyB), (ghostU, vw, 0)).foreach { case (u, w, b) =>
      val r = snap.filter($"user_id" === u && $"window_us" === w &&
        $"vbucket" === b).collect()
      assert(r.length === 1 && r.head.getLong(3) === 0L,
        s"($u, $w, $b) not explicitly zeroed: ${r.toSeq}")
    }
    // the percentile walk still covers the repaired key (zero-count
    // leading rows are skipped by the p0 crossing rule)
    val p50 = ContinuousRollup.histPercentile(spark, dir, 0.5)
      .filter($"user_id" === vu && $"window_us" === vw).collect()
    assert(p50.length === 1, s"percentile walk broken: ${p50.toSeq}")
    // idempotence: a re-run converges to the same table
    ContinuousRollup.backfillHist(spark, sf, dir,
      vw + 7L, vw + 8L, repairId = -1001L, nBuckets = 8)
    val again = ContinuousRollup.histSnapshot(spark, dir)
    assert(live(again).exceptAll(batch).count() === 0 &&
      batch.exceptAll(live(again)).count() === 0)
  }

  test("open windows converge: a window split across triggers ends at its full sum") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.DeviceEvent
    val dir = java.nio.file.Files.createTempDirectory("graft-roll2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-roll2-ck").toString
    val input = MemoryStream[DeviceEvent](41, spark, None)
    def ev(id: Long, sec: Int, v: Double) = DeviceEvent(id,
      Timestamp.valueOf(f"2024-01-01 10:00:$sec%02d"), 7L, "purchase", v, "{}")
    val q = ContinuousRollup.start(input.toDS().toDF(), dir, ckpt,
      nBuckets = 4, watermark = "3650 days")
    try {
      input.addData(ev(1, 5, 10.0), ev(2, 20, 2.5))
      q.processAllAvailable()
      // partial state after trigger 1: the poller already sees the window
      val mid = ContinuousRollup.snapshot(spark, dir).collect()
      assert(mid.length === 1 && mid.head.getDouble(2) === 12.5 &&
        mid.head.getLong(3) === 2L)
      // trigger 2 adds to the SAME window: upsert must replace, not dup
      input.addData(ev(3, 40, 30.0))
      q.processAllAvailable()
      val fin = ContinuousRollup.snapshot(spark, dir).collect()
      assert(fin.length === 1, s"window duplicated: ${fin.toSeq}")
      assert(fin.head.getDouble(2) === 42.5 && fin.head.getLong(3) === 3L)
    } finally q.stop()
  }
}
