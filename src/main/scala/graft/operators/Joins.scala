package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Generic temporal join operators (SURVEY.md §2.B): the two join
  * shapes Spark's built-in planner has no operator for — AS-OF (most
  * recent earlier match) and RANGE (point-in-interval) — re-expressed
  * as shuffle-bounded compositions instead of the O(n·m) range
  * products a naive formulation plans.
  *
  * Reference behavior: restart.sh:27-159's state machine repeatedly
  * asks "what was the last successful probe before this failure" (an
  * as-of lookup) and "which events fell inside this outage window" (a
  * range lookup); A15/A8 hard-code those two questions for the events
  * table — these operators are the reusable library forms.
  */
object Joins {

  private def dec(c: Column): Column = c.cast("decimal(18,4)")

  // ---------------------------------------------------------------- B24
  /** Generic AS-OF join: for every left row, the single most recent
    * right row with the same `keys` and `rightTs` ≤/< `leftTs`,
    * carrying `payload` columns from that matched row (null when no
    * earlier right row exists — left-outer semantics; filter on
    * `asof_ts` for inner).
    *
    * NOT a range join: both sides are tagged and unioned, sorted once
    * per key (ONE shuffle per side, merged by the union), and the
    * match is carried forward with `last(ignoreNulls)` over an
    * unbounded-preceding window — cost is one shuffle+sort keyed by
    * `keys`, independent of how far back matches lie. At equal
    * timestamps the left row sorts BEFORE the right row when
    * `strict` (so an equal-ts right row is NOT visible: strict `<`)
    * and after it otherwise (`≤`). The payload rides in ONE struct so
    * all emitted columns come from the SAME matched row — per-column
    * `last(ignoreNulls)` could mix rows when a payload cell is null.
    *
    * Among right rows sharing (keys, ts), the LAST in `tiebreak`
    * order wins; pass a unique tiebreak (or pre-aggregate the right
    * side) for deterministic output.
    *
    * Output: every left column, then `asof_ts` (the matched right
    * timestamp) and the payload columns. Payload/`asof_ts` names must
    * not collide with left columns. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      strict: Boolean = true, tiebreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!(("asof_ts" +: payload).exists(leftCols.contains)),
      "payload/asof_ts names must not collide with left columns")
    val (lTag, rTag) = if (strict) (0, 1) else (1, 0)
    val rMatch = struct((col(rightTs).as("asof_ts") +: payload.map(col)): _*)
    val rightTagged = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(rTag).as("__tag") :+
        tiebreak.map(col).getOrElse(lit(0L)).as("__tb") :+
        rMatch.as("__m")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftTagged = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(lTag).as("__tag") :+
        lit(null).cast(rightTagged.schema("__tb").dataType).as("__tb") :+
        lit(null).cast(rightTagged.schema("__m").dataType).as("__m")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = leftTagged.unionByName(rightTagged)
      .withColumn("__last", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__tag") === lTag)
    matched.select(
      leftCols.map(matched(_)) ++
        ("asof_ts" +: payload).map(p => col(s"__last.$p").as(p)): _*)
  }

  /** Driver query: purchase attribution — for every purchase, the most
    * recent strictly-earlier click by the same user. The click side is
    * pre-aggregated per (user, ts) with a max-event_id tiebreak so the
    * as-of choice is deterministic in BOTH engines (DuckDB's ASOF JOIN
    * leaves the equal-ts winner unspecified otherwise). */
  def asofJoinQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .withColumn("us", expr("unix_micros(ts)"))
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"us".as("click_us"))
      .agg(max($"event_id").as("click_id"),
        expr("max_by(value, event_id)").as("click_value"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"),
        $"us".as("purchase_us"))
    asofJoin(purchases, clicks, Seq("user_id"), "purchase_us", "click_us",
      Seq("click_id", "click_value"), strict = true)
      .filter($"asof_ts".isNotNull)
      .select($"user_id", $"purchase_id", $"purchase_us",
        $"asof_ts".as("click_us"),
        ($"purchase_us" - $"asof_ts").as("gap_us"),
        $"click_id", $"click_value")
      .orderBy($"user_id", $"purchase_id")
  }

  val asofJoinSql: String =
    """WITH c AS (
      |  SELECT user_id, epoch_us(ts) AS click_us,
      |    max(event_id) AS click_id,
      |    max_by(value, event_id) AS click_value
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |p AS (
      |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.user_id, p.purchase_id, p.purchase_us, c.click_us,
      |  p.purchase_us - c.click_us AS gap_us, c.click_id, c.click_value
      |FROM p ASOF JOIN c
      |  ON p.user_id = c.user_id AND p.purchase_us > c.click_us
      |ORDER BY p.user_id, p.purchase_id""".stripMargin

  // ---------------------------------------------------------------- B25
  /** Floor division as SQL text (DuckDB's `//`): Spark's `div`
    * truncates toward zero, which disagrees with floor on negatives —
    * one CASE keeps bucket ids aligned across engines for any sign. */
  private def floorDivSql(x: String, w: Long): String =
    s"(CASE WHEN ($x) >= 0 OR ($x) % ${w}L = 0 THEN ($x) DIV ${w}L" +
      s" ELSE ($x) DIV ${w}L - 1 END)"

  /** Generic RANGE (point-in-interval) join: every (point, interval)
    * pair with equal `keys` and `loCol` ≤ point ≤ `hiCol` (closed
    * bounds), emitted exactly once.
    *
    * Spark plans a raw `p.ts BETWEEN i.lo AND i.hi` join as a
    * broadcast-nested-loop or cartesian product — O(n·m) per key and
    * a scale-killer. This is the bucketed re-expression: intervals
    * explode onto the fixed-width time buckets they cover, points map
    * to their single bucket, and the join becomes an EQUI-join on
    * (keys, bucket) — one hash shuffle per side — followed by the
    * exact containment filter. A pair joins only in the point's own
    * bucket, so no dedup pass is needed. Cost scales with
    * interval_length / bucketWidth copies per interval: pick
    * `bucketWidth` of the order of the typical interval length (≤2
    * copies) — the classic time-bucketing trade, not a correctness
    * knob. Degenerate intervals (lo > hi) emit nothing. Column names
    * (besides `keys`) must be disjoint across the two frames. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      ptCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ivals = intervals.filter(col(loCol) <= col(hiCol))
      .withColumn("__b", explode(sequence(
        expr(floorDivSql(loCol, bucketWidth)),
        expr(floorDivSql(hiCol, bucketWidth)))))
    val pts = points.withColumn("__b", expr(floorDivSql(ptCol, bucketWidth)))
    pts.join(ivals, keys :+ "__b")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__b")
  }

  /** Driver query: incident blast radius — every error event opens a
    * 10-minute window; count the purchases (and their value) landing
    * inside each window for the same user. bucketWidth = the window
    * length, so each interval covers ≤2 buckets. Windows with zero
    * purchases drop out (inner join). */
  def rangeJoinQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val winUs = 600000000L // 10 min in micros
    val ev = Tables.events(spark, sfDir)
      .withColumn("us", expr("unix_micros(ts)"))
    val incidents = ev.filter($"event_type" === "error")
      .select($"user_id", $"event_id".as("incident_id"),
        $"us".as("lo"), ($"us" + winUs).as("hi"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"us", $"value")
    rangeJoin(purchases, incidents, Seq("user_id"), "us", "lo", "hi", winUs)
      .groupBy($"user_id", $"incident_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum(dec($"value")).cast("double").as("sum_value"))
      .orderBy($"user_id", $"incident_id")
  }

  val rangeJoinSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id AS incident_id,
      |    epoch_us(ts) AS lo, epoch_us(ts) + 600000000 AS hi
      |  FROM events WHERE event_type = 'error'),
      |p AS (
      |  SELECT user_id, epoch_us(ts) AS us, value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT e.user_id, e.incident_id, COUNT(*) AS n_purchases,
      |  CAST(SUM(CAST(p.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM e JOIN p
      |  ON e.user_id = p.user_id AND p.us >= e.lo AND p.us <= e.hi
      |GROUP BY 1, 2
      |ORDER BY e.user_id, e.incident_id""".stripMargin
}
