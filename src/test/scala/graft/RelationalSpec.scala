package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("q1 pricing summary: one row per (returnflag, linestatus), sane sums") {
    val rows = Relational.q1PricingSummary(spark, sf).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0)                      // sum_qty
      assert(r.getDouble(3) >= r.getDouble(4))        // base >= discounted
      assert(r.getLong(7) > 0)                        // count_order
    }
  }

  test("q3 shipping priority: top-10, descending revenue, unique orderkeys") {
    val rows = Relational.q3ShippingPriority(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getDouble(2))
    assert(revs.sameElements(revs.sortBy(-_)))
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
  }

  test("q5 local supplier: only ASIA nations, positive revenue") {
    val asia = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_name").as[String].collect().toSet
    val rows = Relational.q5LocalSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(asia.contains(r.getString(0)))
      assert(r.getDouble(1) > 0)
    }
  }

  test("broadcast dim join: every customer accounted for exactly once") {
    val total = Relational.qBroadcastDim(spark, sf)
      .agg(sum($"n_customers")).as[Long].head()
    assert(total === Tables.customer(spark, sf).count())
  }

  test("semi + anti join partition orders/customers consistently") {
    val semi = Relational.qSemiJoin(spark, sf)
      .agg(sum($"n_orders")).as[Long].head()
    val heavyOrders = Tables.lineitem(spark, sf)
      .filter($"l_quantity" > 45).select($"l_orderkey").distinct().count()
    // every order has ≥1 heavy line or not; semi counts orders that do
    val ordersWithHeavy = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf).filter($"l_quantity" > 45),
        $"o_orderkey" === $"l_orderkey", "left_semi").count()
    assert(semi === ordersWithHeavy)
    assert(heavyOrders >= semi || heavyOrders <= semi * 2) // sanity link
    val anti = Relational.qAntiJoin(spark, sf).agg(sum($"n_customers")).as[Long].head()
    val recent = Tables.orders(spark, sf)
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select($"o_custkey").distinct().count()
    assert(anti === Tables.customer(spark, sf).count() - recent)
  }

  test("window rank: at most 2 per customer, rank within customer is 1..2") {
    val rows = Relational.qWindowRank(spark, sf).collect()
    val byCust = rows.groupBy(_.getLong(0))
    byCust.values.foreach { rs =>
      assert(rs.length <= 2)
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
      if (rs.length == 2) assert(rs(0).getDouble(3) >= rs(1).getDouble(3))
    }
  }

  test("rollup: grand total row equals orders count") {
    val rows = Relational.qRollup(spark, sf).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length === 1)
    assert(grand.head.getLong(2) === Tables.orders(spark, sf).count())
  }

  test("percentiles: p50 <= p95, groups complete") {
    val rows = Relational.qPercentiles(spark, sf).collect()
    assert(rows.length === 3) // F, O, P
    rows.foreach(r => assert(r.getDouble(1) <= r.getDouble(2)))
  }

  test("approx percentiles within 2% of exact") {
    Relational.qApproxPercentiles(spark, sf).collect().foreach { r =>
      val (a50, a95, e50, e95) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(a50 - e50) / e50 < 0.02, s"p50 approx=$a50 exact=$e50")
      assert(math.abs(a95 - e95) / e95 < 0.02, s"p95 approx=$a95 exact=$e95")
    }
  }

  test("approx distinct within 5% of exact") {
    Relational.qApproxDistinct(spark, sf).collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx=$approx exact=$exact")
    }
  }

  test("union/except produces distinct sorted nationkeys") {
    val keys = Relational.qUnionExcept(spark, sf).as[Int].collect()
    assert(keys.distinct.length === keys.length)
    assert(keys.sameElements(keys.sorted))
  }

  test("funnel: step horizons gate each stage, partial converters keep their furthest stage") {
    def ev(u: Long, t: String, typ: String) =
      (u, java.sql.Timestamp.valueOf(t), typ)
    val h = 3600000000L // 1h / 2h step horizons for the test
    val events = Seq(
      // user 1: full path inside both horizons → stage 3
      ev(1L, "2024-01-01 10:00:00", "signup"),
      ev(1L, "2024-01-01 10:30:00", "click"),
      ev(1L, "2024-01-01 11:30:00", "purchase"),
      // user 2: click AFTER the 1h horizon → stage 1, and its purchase
      // cannot count either (no qualifying click)
      ev(2L, "2024-01-01 10:00:00", "signup"),
      ev(2L, "2024-01-01 12:00:00", "click"),
      ev(2L, "2024-01-01 12:30:00", "purchase"),
      // user 3: in-horizon click, purchase past the 2h horizon → stage 2
      ev(3L, "2024-01-01 10:00:00", "signup"),
      ev(3L, "2024-01-01 10:10:00", "click"),
      ev(3L, "2024-01-01 20:00:00", "purchase"),
      // user 4: click BEFORE signup only → stage 1 (order matters)
      ev(4L, "2024-01-01 09:00:00", "click"),
      ev(4L, "2024-01-01 10:00:00", "signup"),
      // user 5: never signed up → absent entirely
      ev(5L, "2024-01-01 10:00:00", "click"),
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.qFunnelOf(events, step1Us = h, step2Us = 2 * h)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out === Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 1),
      s"funnel stages: $out")
  }

  test("rolling dau: contribution-explode window matches hand-rolled 7-day distinct") {
    val dayUs = 86400000000L
    val d0 = 19900L // an arbitrary epoch day
    def ev(u: Long, day: Long) =
      (u, new java.sql.Timestamp((day * dayUs) / 1000))
    val events = Seq(
      ev(1L, d0), ev(2L, d0), ev(1L, d0), // duplicate activity same day
      ev(1L, d0 + 1),
      ev(3L, d0 + 8)
    ).toDF("user_id", "ts")
    val out = Relational.qRollingDauOf(events)
      .collect().map(r => (r.getLong(0) - d0, r.getLong(1), r.getLong(2)))
    // day offset -> (dau, wau): user 1,2 on d0; user 1 on d1; user 3 on d8.
    // WAU(d) counts users active in [d-6, d]; horizon cut at max day d8,
    // so no fabricated days past d8 and every day d0..d8 appears.
    val expect = Seq(
      (0L, 2L, 2L), (1L, 1L, 2L), (2L, 0L, 2L), (3L, 0L, 2L), (4L, 0L, 2L),
      (5L, 0L, 2L), (6L, 0L, 2L), (7L, 0L, 1L), (8L, 1L, 1L))
    assert(out.toSeq === expect, s"rolling dau: ${out.toSeq}")
  }

  test("event paths: gap splits sessions, cap bounds the path, event_id breaks ts ties") {
    def ev(id: Long, u: Long, t: String, typ: String) =
      (id, u, java.sql.Timestamp.valueOf(t), typ)
    val long = (0 until 12).map(i =>
      ev(200L + i, 2L, f"2024-01-01 10:${i}%02d:00", if (i % 2 == 0) "view" else "click"))
    val events = (Seq(
      // user 1: two sessions split by a 40-min gap
      ev(1L, 1L, "2024-01-01 10:00:00", "click"),
      ev(2L, 1L, "2024-01-01 10:05:00", "view"),
      ev(3L, 1L, "2024-01-01 10:10:00", "purchase"),
      ev(4L, 1L, "2024-01-01 10:50:00", "click"),
      ev(5L, 1L, "2024-01-01 10:55:00", "view"),
      // user 3: identical timestamps — event_id must order the path
      ev(101L, 3L, "2024-01-01 09:00:00", "signup"),
      ev(102L, 3L, "2024-01-01 09:00:00", "click")
    ) ++ long).toDF("event_id", "user_id", "ts", "event_type")
    val out = Relational.qEventPathsOf(events, maxLen = 8, topK = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val eight = (0 until 8).map(i => if (i % 2 == 0) "view" else "click")
      .mkString(">")
    assert(out === Map(
      "click>view>purchase" -> 1L, "click>view" -> 1L,
      "signup>click" -> 1L, eight -> 1L), s"paths: $out")
  }

  test("profile: one row per column, counts/nulls/distincts consistent") {
    val n = Tables.orders(spark, sf).count()
    val rows = Relational.qProfile(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("o_custkey", "o_odate_us", "o_orderkey", "o_orderpriority",
        "o_orderstatus", "o_totalprice"))
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === n)  // n + nulls = total
      assert(r.getLong(3) <= r.getLong(1))       // distinct <= non-null
    }
    val key = byCol("o_orderkey")
    assert(key.getLong(3) === n)                 // primary key: all distinct
    assert(key.getDouble(4) <= key.getDouble(5)) // min <= max
    assert(byCol("o_orderstatus").getLong(3) <= 3L)
    assert(byCol("o_orderstatus").isNullAt(4) &&
      !byCol("o_orderstatus").isNullAt(6))
  }

  test("rolling dau approx: HLL path within 5% of the exact explode, same days") {
    val approx = Relational.qRollingDauApprox(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Relational.qRollingDau(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (day, (we, wa)) =>
      assert(we === exact(day))
      assert(math.abs(wa - we).toDouble <= math.max(1.0, 0.05 * we),
        s"day $day: approx $wa vs exact $we")
    }
  }

  test("top movers: floor cuts tiny bases, pct change exact on planted revenue") {
    val rows = Relational.qTopMovers(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (prev, curr, pct) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(prev >= 10000.0)
      assert(math.abs(pct - (curr - prev) / prev * 100.0) < 1e-9)
    }
    val pcts = rows.map(r => math.abs(r.getDouble(3)))
    assert(pcts.sameElements(pcts.sortBy(-(_: Double))), "not sorted by |pct|")
  }

  test("heatmap: full grid covered, counts reconcile with the raw table") {
    val rows = Relational.qHeatmap(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum === Tables.events(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 23)
      assert(r.getLong(2) > 0)
    }
    val keys = rows.map(r => (r.getLong(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
  }

  test("copurchase: planted baskets produce exact support and lift") {
    val lines = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 20L), // dup line: counts once
      (4L, 30L), (4L, 40L))
      .toDF("l_orderkey", "l_partkey")
    val out = Relational.qCopurchaseOf(lines).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // 4 orders; df: 10->3, 20->3, 30->2, 40->1
    assert(out.keySet === Set((10L, 20L), (10L, 30L), (20L, 30L), (30L, 40L)))
    assert(out((10L, 20L)) === ((3L, 3L, 3L, 4.0 * 3 / 9)))
    assert(out((10L, 30L)) === ((1L, 3L, 2L, 4.0 * 1 / 6)))
    assert(out((20L, 30L)) === ((1L, 3L, 2L, 4.0 * 1 / 6)))
    assert(out((30L, 40L)) === ((1L, 2L, 1L, 4.0 * 1 / 2)))
    // ordering: support desc first
    val sup = Relational.qCopurchaseOf(lines).collect().map(_.getLong(2))
    assert(sup.sameElements(sup.sortBy(-_)))
  }

  test("copurchase: hot basket capped deterministically, small baskets untouched") {
    // one pathological 1000-part "basket" (a bot / default key) beside
    // two ordinary orders that plant a known top pair
    val mega = (1 to 1000).map(p => (99L, p.toLong + 10000L))
    val lines = (Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L)) ++ mega)
      .toDF("l_orderkey", "l_partkey")
    val capped = Relational.qCopurchaseOf(lines, topK = 1000000,
      maxBasket = 32).collect()
    // the mega-basket contributes at most C(32, 2) pairs, not C(1000, 2)
    val megaPairs = capped.count(_.getLong(0) > 10000L)
    assert(megaPairs === 32 * 31 / 2, s"mega basket produced $megaPairs pairs")
    // sub-cap baskets are bit-identical to the uncapped run
    val plant = capped.filter(_.getLong(0) === 10L).map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(plant.toSeq === Seq((10L, 20L, 2L, 2L, 2L)))
    // support <= df invariant survives the cap (df keeps only the
    // surviving parts of a capped basket)
    capped.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(2) <= r.getLong(4))
    }
    // the subsample is deterministic: a second run is identical
    val again = Relational.qCopurchaseOf(lines, topK = 1000000,
      maxBasket = 32).collect()
    assert(capped.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("returned customers: bounded top-k, revenue descending, positive counts") {
    val out = Relational.qReturnedCustomers(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    val rev = out.map(_.getDouble(3))
    assert(rev.sameElements(rev.sortBy(-_)))
    out.foreach { r => assert(r.getDouble(3) > 0.0 && r.getLong(4) >= 1L) }
  }

  test("nation trade: strictly cross-border, deterministic order, positive volumes") {
    val out = Relational.qNationTrade(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.foreach { case (s, c, _, v) =>
      assert(s != c, s"same-nation flow leaked: $s")
      assert(v > 0.0)
    }
    assert(out.sameElements(out.sortBy(t => (t._1, t._2, t._3))))
  }

  test("value tiers: parallel closed-form NTILE equals Spark's native window") {
    import org.apache.spark.sql.expressions.Window
    val got = Relational.qValueTiers(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6))).toMap
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy(round($"c_acctbal" * 100, 0).cast("long").desc, $"c_custkey")
    val want = Tables.customer(spark, sf)
      .select($"c_custkey",
        row_number().over(w).cast("long").as("rank"),
        ntile(10).over(w).cast("long").as("tier"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(got === want, "closed-form tiering diverged from native ntile")
    // tier sizes: first (n mod 10) tiles carry one extra row
    val bySeg = Relational.qValueTiers(spark, sf).collect()
      .groupBy(_.getString(1))
    bySeg.foreach { case (_, rows) =>
      val sizes = rows.groupBy(_.getLong(4)).view.mapValues(_.length)
      assert(sizes.values.max - sizes.values.min <= 1)
    }
  }

  test("market share: shares partition each (region, year) to exactly 1") {
    val out = Relational.qMarketShare(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty)
    out.foreach { case (_, _, _, rev, sh) =>
      assert(rev > 0.0 && sh > 0.0 && sh <= 1.0)
    }
    out.groupBy(t => (t._1, t._2)).foreach { case (k, rows) =>
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4, s"$k shares")
    }
  }

  test("skew report: planted hot key flagged, shares ordered, uniform keys cold") {
    val out = Relational.qSkewReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getBoolean(4)))
    assert(out.nonEmpty && out.length <= 20)
    // descending by count with id tie-break
    assert(out.map(_._2).sameElements(out.map(_._2).sortBy(-_)))
    // shares are fractions of the total
    out.foreach(t => assert(t._3 > 0.0 && t._3 <= 1.0))
    // sf events are near-uniform per device: nothing should read hot
    assert(out.forall(!_._4), s"uniform corpus flagged hot: ${out.toSeq}")
  }

  test("SQL surface: registered views + native functions answer spark.sql") {
    Tables.registerAll(spark, sf)
    val n = spark.sql("SELECT COUNT(*) FROM lineitem").head().getLong(0)
    assert(n === Tables.lineitem(spark, sf).count())
    // a native kernel over a registered view, pure SQL end to end
    val r = spark.sql(
      """SELECT d.doc_id, lang_id(d.text) AS guess,
        |  simhash64(regexp_extract_all(lower(d.text), '[a-z0-9]+', 0)) AS sig
        |FROM documents d ORDER BY d.doc_id LIMIT 5""".stripMargin).collect()
    assert(r.length === 5)
    assert(r.forall(row => row.getString(1).nonEmpty))
  }

  test("profile stream: clean batch silent, drifted batch flags nulls and range") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // reference: a trusted clean profile of val in [10, 20], no nulls
    val refDocs = Seq((10.0, "a"), (15.0, "b"), (20.0, "a"))
      .toDF("v", "s")
    val reference = Seq(("v", 3L, 0L, 3L, 10.0, 20.0),
      ("s", 3L, 0L, 2L, Double.NaN, Double.NaN))
      .toDF("col_name", "n", "n_nulls", "n_distinct", "mn", "mx")
      .select($"col_name", $"n", $"n_nulls", $"n_distinct",
        when($"col_name" === "v", $"mn").otherwise(lit(null)).as("min_num"),
        when($"col_name" === "v", $"mx").otherwise(lit(null)).as("max_num"))
    val input = MemoryStream[(java.lang.Double, String)](33, spark, None)
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Boolean, Boolean)]
    val q = Relational.profileStream(
      input.toDS().toDF("v", "s"), Seq("v"), Seq("s"), Some(reference)) {
      (report, id) =>
        report.collect().foreach(r => rows +=
          ((id, r.getString(0),
            r.getBoolean(r.fieldIndex("null_drift")),
            r.getBoolean(r.fieldIndex("range_drift")))))
    }.start()
    try {
      // batch 0: clean, in range — nothing flags
      input.addData((12.0, "a"), (18.0, "b"))
      q.processAllAvailable()
      assert(rows.filter(_._1 == 0L).forall(t => !t._3 && !t._4),
        s"clean batch flagged: $rows")
      // batch 1: a null v and an out-of-range v — both flags fire on v
      input.addData((null.asInstanceOf[java.lang.Double], "a"), (99.0, "b"))
      q.processAllAvailable()
      val v1 = rows.find(t => t._1 == 1L && t._2 == "v").get
      assert(v1._3, s"null drift not flagged: $rows")
      assert(v1._4, s"range drift not flagged: $rows")
      val s1 = rows.find(t => t._1 == 1L && t._2 == "s").get
      assert(!s1._3 && !s1._4, s"string column falsely flagged: $rows")
    } finally q.stop()
  }

  test("late orders: semi-join counts equal a distinct-key recompute, full window covered") {
    val out = Relational.qLateOrders(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.nonEmpty)
    out.foreach { case (_, n) => assert(n > 0L) }
    assert(out.sameElements(out.sortBy(_._1)), "priority order broken")
    // EXISTS semantics: the count must equal distinct qualifying orders,
    // not late-line multiplicity (an inner join would overcount).
    val want = Tables.orders(spark, sf)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .join(Tables.lineitem(spark, sf),
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .select($"o_orderkey").distinct().count()
    assert(out.map(_._2).sum == want,
      s"semi-join total ${out.map(_._2).sum} != distinct recompute $want")
  }

  test("promo share: bounded, consistent with its own sums, months ordered") {
    val out = Relational.qPromoShare(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (promo, total, share) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(total > 0.0 && promo >= 0.0 && promo <= total)
      assert(share >= 0.0 && share <= 100.0)
      assert(share == math.rint(100.0 * promo / total * 1e6) / 1e6 ||
        math.abs(share - 100.0 * promo / total) < 1e-6,
        s"share $share inconsistent with $promo/$total")
    }
    val keys = out.map(r => (r.getInt(0), r.getInt(1)))
    assert(keys.sameElements(keys.sorted), "month order broken")
  }

  test("order count dist: conserves customers AND orders, keeps the zero tail") {
    val out = Relational.qOrderCountDist(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val nCust = Tables.customer(spark, sf).count()
    val nOrd = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        $"o_custkey" === $"c_custkey", "left_semi").count()
    assert(out.map(_._2).sum == nCust, "customer mass not conserved")
    assert(out.map(t => t._1 * t._2).sum == nOrd, "order mass not conserved")
    val zeroTail = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf),
        $"c_custkey" === $"o_custkey", "left_anti").count()
    assert(out.toMap.getOrElse(0L, 0L) == zeroTail,
      "zero-order customers dropped (inner-join bug)")
  }

  test("large orders: every survivor clears the floor, set matches a direct recompute") {
    val out = Relational.qLargeOrders(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(4) > 250.0))
    val qty = out.map(r => r.getDouble(4))
    assert(qty.sameElements(qty.sorted.reverse), "not descending by qty")
    val want = Tables.lineitem(spark, sf).groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast("decimal(18,4)")).cast("double").as("q"))
      .filter($"q" > 250.0).count()
    assert(out.length == want, s"${out.length} survivors != recompute $want")
  }

  test("idle customers: members verified idle and above the positive-balance mean") {
    val out = Relational.qIdleCustomers(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    val c = Tables.customer(spark, sf)
    val avgBal = c.filter($"c_acctbal" > 0.0)
      .agg((sum($"c_acctbal".cast("decimal(18,4)")).cast("double") /
        count(lit(1))).as("a")).head().getDouble(0)
    val idle = c.filter($"c_acctbal" > avgBal)
      .join(Tables.orders(spark, sf)
        .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
        .select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
    assert(out.map(_._2).sum == idle.count(), "membership mass mismatch")
    out.foreach { case (n, cnt, bal) =>
      assert(cnt > 0L, s"empty nation row $n")
      assert(bal > avgBal, s"nation $n total below one member's floor")
    }
  }

  test("rfm: telescoping cadence equals a lag recompute, single-order customers NULL") {
    val out = Relational.qRfm(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    assert(out.nonEmpty)
    // independent recompute: per-customer date list, consecutive gaps
    val dates = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderdate".cast("string")).collect()
      .map(r => (r.getLong(0), java.time.LocalDate.parse(
        r.getString(1).take(10))))
      .groupBy(_._1).map { case (c, rows) => c -> rows.map(_._2).sorted }
    val refDate = dates.values.flatten.max
      .asInstanceOf[java.time.LocalDate]
    dates.foreach { case (c, ds) =>
      val (freq, rec, _, gap) = out(c)
      assert(freq == ds.length.toLong)
      assert(rec ==
        java.time.temporal.ChronoUnit.DAYS.between(ds.last, refDate))
      if (ds.length >= 2) {
        val gaps = ds.sliding(2).map(p =>
          java.time.temporal.ChronoUnit.DAYS.between(p.head, p.last))
        val want = gaps.sum.toDouble / (ds.length - 1)
        assert(math.abs(gap - want) < 1e-6,
          s"customer $c cadence $gap != lag mean $want")
      } else assert(gap.isNaN, s"single-order customer $c must carry NULL")
    }
  }

  test("min cost supplier: winner is the true per-part minimum with key tie-break") {
    val out = Relational.qMinCostSupplier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(4)))
    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.length == out.length, "dup part rows")
    // recompute every (part, supplier) unit price and verify the winner
    val up = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf)
        .filter($"p_size".between(10, 20) && $"p_type" === "STANDARD"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_partkey", $"l_suppkey")
      .agg((sum($"l_extendedprice".cast("decimal(18,4)")).cast("double") /
        sum($"l_quantity".cast("decimal(18,4)")).cast("double")).as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == up.map(_._1).distinct.length, "part coverage")
    out.foreach { case (pk, price) =>
      val mine = up.filter(_._1 == pk)
      val best = mine.map(_._3).min
      assert(price == math.rint(best * 1e6) / 1e6,
        s"part $pk price $price != min $best")
    }
  }

  test("product profit: groups match the filtered join, profit is rev - cost/2") {
    val out = Relational.qProductProfit(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out.nonEmpty)
    val j = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter($"p_name".like("%gear%")),
        $"l_partkey" === $"p_partkey")
      .join(Tables.supplier(spark, sf), $"l_suppkey" === $"s_suppkey")
      .join(Tables.nation(spark, sf), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name", year($"l_shipdate").cast("int").as("y"))
      .agg(
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .cast("decimal(18,4)")).cast("double").as("rev"),
        sum(($"p_retailprice" * $"l_quantity").cast("decimal(18,4)"))
          .cast("double").as("cost2"))
      .collect()
    assert(j.length == out.size, "group coverage mismatch")
    j.foreach { r =>
      val want = r.getDouble(2) - 0.5 * r.getDouble(3)
      val got = out((r.getString(0), r.getInt(1)))
      // spec recompute multiplies doubles pre-cast (a different tree
      // than the operator's pure-decimal product) — tolerance, not hash
      assert(math.abs(got - want) < 1e-3, s"$r -> $got vs $want")
    }
  }

  test("top supplier: every returned row achieves the exact quarter maximum") {
    val out = Relational.qTopSupplier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.nonEmpty)
    val rev = Tables.lineitem(spark, sf)
      .filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast("decimal(18,4)")).cast("decimal(38,4)").cast("double").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mx = rev.values.max
    assert(out.forall(_._2 == mx), s"non-max row in $out")
    assert(out.map(_._1).toSet == rev.filter(_._2 == mx).keySet,
      "tie set mismatch — Q15 view semantics require ALL maxima")
  }

  test("supplier counts: negative-balance suppliers never counted, spot group exact") {
    val out = Relational.qSupplierCounts(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3))
    assert(out.nonEmpty)
    // sf0.001 has no negative-balance suppliers (sf0.01+ do — the
    // oracle exercises the exclusion there); the recompute below still
    // applies the same filter so the contract holds at every SF.
    val bad = Tables.supplier(spark, sf).filter($"s_acctbal" < 0.0)
      .select($"s_suppkey").collect().map(_.getLong(0)).toSet
    val full = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf)
        .filter($"p_brand" =!= "Brand#1" && !$"p_type".startsWith("PROMO")),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"p_type", $"p_size", $"l_suppkey")
      .distinct().collect()
      .map(r => ((r.getString(0), r.getString(1), r.getInt(2)), r.getLong(3)))
    val byGroup = full.groupBy(_._1)
    out.foreach { case (g, cnt) =>
      val want = byGroup(g).map(_._2).filterNot(bad).distinct.length
      assert(cnt == want, s"group $g: $cnt != $want")
    }
    assert(out.map(_._1).toSet ==
      byGroup.filter(_._2.exists(t => !bad(t._2))).keySet,
      "group coverage mismatch")
  }

  test("small qty revenue: one row matching a direct recompute") {
    val out = Relational.qSmallQtyRevenue(spark, sf).collect()
    assert(out.length == 1)
    val l = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter($"p_brand" === "Brand#13"),
        $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val avg = l.groupBy(_._1).map { case (k, rows) =>
      k -> rows.map(_._2).sum / rows.length }
    val kept = l.filter(t => t._2 < 0.2 * avg(t._1))
    assert(kept.nonEmpty, "fixture has no small-quantity lines")
    val want = kept.map(_._3).sum / 7.0
    assert(math.abs(out.head.getDouble(0) - want) < 1e-3,
      s"${out.head.getDouble(0)} vs $want")
  }

  test("disjunctive revenue: equals the brute post-join filter, hull loses nothing") {
    val out = Relational.qDisjunctiveRevenue(spark, sf).head().getDouble(0)
    val j = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#5" && $"p_size".between(1, 5) &&
          $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#13" && $"p_size".between(1, 10) &&
          $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#20" && $"p_size".between(1, 15) &&
          $"l_quantity".between(20, 30)))
      .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast("decimal(18,4)")).cast("decimal(38,4)").cast("double"))
      .head().getDouble(0)
    assert(out == j, s"$out != brute $j — the quantity hull dropped rows")
  }

  test("blocking supplier: counts match an independent per-order recompute") {
    val out = Relational.qBlockingSupplier(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.nonEmpty)
    val fOrders = Tables.orders(spark, sf)
      .filter($"o_orderstatus" === "F").select($"o_orderkey")
      .collect().map(_.getLong(0)).toSet
    val os = Tables.lineitem(spark, sf)
      // ISO strings order chronologically — NTZ-vintage-proof
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate".cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .filter(t => fOrders(t._1))
      .groupBy(t => (t._1, t._2))
      .map { case ((o, s), rows) => (o, s, rows.map(_._3).max) }.toSeq
    val want = os.groupBy(_._1).valuesIterator.flatMap { rows =>
      val mx = rows.map(_._3).max
      val atMax = rows.filter(_._3 == mx)
      if (rows.map(_._2).toSeq.distinct.length >= 2 && atMax.size == 1)
        Some(atMax.head._2)
      else None
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out == want, s"blocker counts diverge: $out vs $want")
  }

  test("safe release: under-k groups collapse into OTHER, totals reconcile exactly") {
    val customers = (
      (1 to 12).map(i => (100L + i, s"c$i", 1, 10.25, "AUTO")) ++
        Seq((201L, "x", 2, 5.50, "BIKE"), (202L, "y", 2, 4.50, "BIKE"),
          (203L, "z", 2, 1.00, "BIKE")) ++
        Seq((301L, "p", 3, 7.75, "SHIP"), (302L, "q", 3, 2.25, "SHIP")))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
    val out = Relational.qSafeReleaseOf(customers, k = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    // group (1, AUTO) n=12 released; (2, BIKE) n=3 and (3, SHIP) n=2
    // suppressed into one OTHER row carrying both groups' mass
    assert(out === Array(
      (-1, "OTHER", 5L, 21.0, 2L),
      (1, "AUTO", 12L, 123.0, 0L)))
    // no released row under k, and the partition reconciles exactly
    assert(out.filter(_._5 == 0L).forall(_._3 >= 10L))
    assert(out.map(_._3).sum === customers.count())
    assert(out.map(r => BigDecimal(r._4)).sum === BigDecimal("144.00"))
    // k=1 releases everything — no OTHER row fabricated
    val all = Relational.qSafeReleaseOf(customers, k = 1).collect()
    assert(all.length === 3 && !all.exists(_.getInt(0) == -1))
  }
}
