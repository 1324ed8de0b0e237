package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Semantics of the generic temporal joins (B24/B25) on handcrafted
  * frames where every expected pair is enumerable by hand, plus a
  * brute-force equivalence sweep for the bucketed range join. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: strict vs non-strict at equal timestamps, unmatched stays null") {
    val left = Seq((1L, 100L, "l1"), (1L, 50L, "l0"), (2L, 10L, "l2"))
      .toDF("k", "lts", "lname")
    val right = Seq((1L, 100L, "r@100", 7.0), (1L, 40L, "r@40", 3.0),
      (3L, 5L, "other-key", 9.9))
      .toDF("k", "rts", "rname", "rval")
    val strict = Joins.asofJoin(left, right, Seq("k"), "lts", "rts",
      Seq("rname", "rval"), strict = true)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.getAs[String]("rname"))))
      .sortBy(t => (t._1, t._2))
    // l1@100: equal-ts right row INVISIBLE under strict — matches r@40
    assert(strict === Seq(
      (1L, 50L, Some(40L), Some("r@40")),
      (1L, 100L, Some(40L), Some("r@40")),
      (2L, 10L, None, None)))
    val loose = Joins.asofJoin(left, right, Seq("k"), "lts", "rts",
      Seq("rname", "rval"), strict = false)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._2))
    assert(loose === Seq((1L, 50L, Some(40L)), (1L, 100L, Some(100L)),
      (2L, 10L, None)))
  }

  test("asofJoin: payload columns come from the SAME matched row even through nulls") {
    // newest right row has a NULL payload cell: per-column
    // last(ignoreNulls) would stitch val from the older row onto the
    // newer row's name — the struct carry must keep them together
    val left = Seq((1L, 100L)).toDF("k", "lts")
    val right = Seq((1L, 10L, Some("old"), Some(1.0)),
      (1L, 20L, Some("new"), None))
      .toDF("k", "rts", "rname", "rval")
    val row = Joins.asofJoin(left, right, Seq("k"), "lts", "rts",
      Seq("rname", "rval")).collect().head
    assert(row.getAs[Long]("asof_ts") === 20L)
    assert(row.getAs[String]("rname") === "new")
    assert(row.isNullAt(row.fieldIndex("rval")),
      "rval must be the matched row's null, not an older row's value")
  }

  test("asofJoin: tiebreak picks the LAST right row in tiebreak order at equal ts") {
    val left = Seq((1L, 100L)).toDF("k", "lts")
    val right = Seq((1L, 50L, 1L, "a"), (1L, 50L, 3L, "c"), (1L, 50L, 2L, "b"))
      .toDF("k", "rts", "rid", "rname")
    val row = Joins.asofJoin(left, right, Seq("k"), "lts", "rts",
      Seq("rname"), tiebreak = Some("rid")).collect().head
    assert(row.getAs[String]("rname") === "c")
  }

  test("asofJoin: equals the brute-force max-earlier-match join") {
    val left = (0 until 300).map(i => (i % 5L, i.toLong * 17 % 400, i.toLong))
      .toDF("k", "lts", "lid")
    val right = (0 until 200).map(i => (i % 5L, i.toLong * 29 % 400, 100000L + i))
      .toDF("k", "rts", "rid")
    val got = Joins.asofJoin(left, right, Seq("k"), "lts", "rts",
      Seq("rid"), strict = true, tiebreak = Some("rid"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    // brute force: all strictly-earlier matches, keep max (rts, rid)
    val ls = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rs = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = ls.map { case (k, lts, lid) =>
      val m = rs.filter(r => r._1 == k && r._2 < lts)
      (lid, if (m.isEmpty) None else Some(m.maxBy(r => (r._2, r._3))._3))
    }
    assert(got.sortBy(_._1).toSeq === want.sortBy(_._1).toSeq)
  }

  test("rangeJoin: equals the brute-force containment join, pairs exactly once") {
    // deterministic pseudo-random points/intervals spanning negative
    // timestamps (floor-div bucketing must stay sign-correct) and
    // interval lengths from 0 to several buckets
    val pts = (0 until 400).map { i =>
      (i % 7L, i.toLong * 37 % 1000 - 500, i.toLong)
    }.toDF("k", "pt", "pid")
    val ivals = (0 until 120).map { i =>
      val lo = i.toLong * 101 % 900 - 450
      (i % 7L, lo, lo + (i % 5) * 60L, 1000L + i)
    }.toDF("k", "lo", "hi", "iid")
    for (w <- Seq(25L, 60L, 1000L)) {
      val got = Joins.rangeJoin(pts, ivals, Seq("k"), "pt", "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = pts.join(ivals, Seq("k"))
        .filter($"pt" >= $"lo" && $"pt" <= $"hi")
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.sorted.toSeq === want.sorted.toSeq, s"bucketWidth=$w")
      assert(got.length === got.distinct.length,
        s"pair emitted more than once at bucketWidth=$w")
    }
  }

  test("rangeJoin: degenerate intervals emit nothing, closed bounds hold") {
    val pts = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("k", "pt", "lo_hi_probe")
    val ivals = Seq((1L, 10L, 10L, 100L), (1L, 30L, 20L, 101L))
      .toDF("k", "lo", "hi", "iid")
    val got = Joins.rangeJoin(pts, ivals, Seq("k"), "pt", "lo", "hi", 5L)
      .select("lo_hi_probe", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // [10,10] keeps the pt=10 point (closed); [30,20] is degenerate
    assert(got.toSeq === Seq((1L, 100L)))
  }
}
