package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join result identical to plain join") {
    val o = Tables.orders(spark, sf)
    val l = Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey")
    val plain = o.join(l, Seq("o_orderkey"))
    val salted = Scale.saltedJoin(o, l, Seq("o_orderkey"), salts = 4)
    assert(salted.count() === plain.count())
    assert(Scale.contentFingerprint(salted.select(plain.columns.map(col): _*))
      === Scale.contentFingerprint(plain))
  }

  test("salted join with skewed data: one hot key, still exact") {
    val left = spark.range(10000)
      .select((when($"id" % 10 === 0, 0L).otherwise($"id")).as("k"), $"id".as("v"))
    val right = Seq((0L, "hot"), (1L, "one"), (7L, "seven")).toDF("k", "name")
    val plain = left.join(right, Seq("k"))
    val salted = Scale.saltedJoin(left, right, Seq("k"), salts = 8)
    assert(salted.count() === plain.count())
    assert(Scale.contentFingerprint(salted.select("k", "v", "name"))
      === Scale.contentFingerprint(plain.select("k", "v", "name")))
  }

  test("bucketed tables join without a shuffle") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Scale.writeBucketed(Tables.orders(spark, sf), "orders_b", 4, Seq("o_orderkey"))
      Scale.writeBucketed(
        Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", 4, Seq("o_orderkey"))
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), Seq("o_orderkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
      assert(joined.count() === Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("date-partitioned layout prunes partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Scale.writePartitionedByDay(Tables.events(spark, sf), dir, "ts")
    val read = spark.read.parquet(dir).filter($"dt" === "2024-01-05")
    read.collect()
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("dt"),
      s"no partition pruning:\n$p")
    // pruned read matches the unpartitioned filter
    val direct = Tables.events(spark, sf)
      .filter(date_format($"ts", "yyyy-MM-dd") === "2024-01-05").count()
    assert(read.count() === direct)
    // and scans only that day's files
    val files = read.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.linesIterator.filter(_.contains("file:"))).mkString
    assert(!files.contains("dt=2024-01-06"), "scan touched pruned partition")
  }

  test("bounded self-pairs: hot block splits into sub-bucket keys, result exact") {
    val n = 200L
    val target = 16
    val df = spark.range(n)
      .select(lit(1).as("blk"), $"id", ($"id" * 3 % 17).as("v"))
    val naive = df.select($"blk", $"id".as("id1"), $"v".as("v_1"))
      .join(df.select($"blk", $"id".as("id2"), $"v".as("v_2")), Seq("blk"))
      .filter($"id1" < $"id2")
      .select($"id1", $"id2", $"v_1", $"v_2")
    val bounded = Scale.boundedSelfPairs(
      df, Seq("blk"), "id", Seq("v"), targetSubRows = target, keepKeys = true)
    // exact: every unordered pair exactly once, payloads intact
    assert(bounded.count() === n * (n - 1) / 2)
    assert(Scale.contentFingerprint(bounded.select("id1", "id2", "v_1", "v_2"))
      === Scale.contentFingerprint(naive))
    // and the hot block actually decomposed: g sub-buckets → up to
    // g(g+1)/2 distinct shuffle keys instead of one, with per-key pair
    // counts bounded by ~target² (slack for hash imbalance) — the
    // property that keeps one hot label from melting a single reducer
    val g = Scale.subBuckets(n, target)
    assert(g > 1, s"expected a multi-bucket decomposition, got g=$g")
    val keys = bounded.select($"__u", $"__v").distinct().count()
    assert(keys > 1 && keys <= g.toLong * (g + 1) / 2,
      s"unexpected key count $keys for g=$g")
    val maxPerKey = bounded.groupBy($"__u", $"__v").count()
      .agg(max($"count")).head.getLong(0)
    assert(maxPerKey <= 4L * target * target,
      s"hot sub-bucket pair still quadratic: $maxPerKey pairs on one key")
    // cold blocks keep g = 1: zero replication overhead
    assert(Scale.subBuckets(10, 4096) === 1)
  }

  test("bounded self-pairs cold path: no hot block → plain self-join, exact") {
    // every block under targetSubRows → the decomposition must be
    // skipped entirely (all pairs on the single (0,0) key) and the
    // result must still be the exact pair set
    val df = spark.range(60)
      .select(($"id" % 4).as("blk"), $"id", ($"id" * 7 % 13).as("v"))
    val naive = df.select($"blk", $"id".as("id1"), $"v".as("v_1"))
      .join(df.select($"blk", $"id".as("id2"), $"v".as("v_2")), Seq("blk"))
      .filter($"id1" < $"id2")
      .select($"id1", $"id2", $"v_1", $"v_2")
    val cold = Scale.boundedSelfPairs(
      df, Seq("blk"), "id", Seq("v"), targetSubRows = 4096, keepKeys = true)
    assert(Scale.contentFingerprint(cold.select("id1", "id2", "v_1", "v_2"))
      === Scale.contentFingerprint(naive))
    // the shortcut really ran: one degenerate sub-bucket key, no explode
    assert(cold.select($"__u", $"__v").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq === Seq((0, 0)))
    assert(!cold.queryExecution.executedPlan.toString.contains("Generate"),
      "cold path still pays the explode/decomposition machinery")
  }

  test("z-order layout: every file covers a narrow range of BOTH dimensions") {
    import graft.functions.LayoutFunctions
    // kernel sanity: interleaving is monotone in each dim and exact
    val z = Seq((3L, 5L)).toDF("a", "b")
      .select(LayoutFunctions.interleaveBits($"a", $"b")).as[Long].head()
    assert(z === (1L | 4L | 2L | 32L)) // a=3→even bits 0,2 (=5); b=5→odd bits 1,5 (=34)
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // two independent-ish dimensions over events
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"user_id", ($"value" * 1000).cast("long").as("v"))
    Scale.writeZOrdered(ev, dir, "user_id", "v", files = 8)
    val stats = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val d = spark.read.parquet(f.getPath)
        val r = d.agg(min($"user_id"), max($"user_id"), min($"v"), max($"v")).head()
        (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
      }
    assert(stats.size > 1)
    val g = ev.agg(max($"user_id") - min($"user_id"),
      max($"v") - min($"v")).head()
    val (gu, gv) = (g.getLong(0), g.getLong(1))
    val avgU = stats.map(_._1).sum.toDouble / stats.size
    val avgV = stats.map(_._2).sum.toDouble / stats.size
    // a single-column sort would leave ONE dimension at ~full range;
    // z-order must narrow both simultaneously
    assert(avgU < 0.7 * gu, s"user_id not clustered: avg range $avgU of $gu")
    assert(avgV < 0.7 * gv, s"v not clustered: avg range $avgV of $gv")
    // and the layout loses no rows
    assert(spark.read.parquet(dir).count() === ev.count())
  }

  test("connected components: chains, stars, and singletons resolve to min labels") {
    // components: {1,2,3,4} (chain), {10,11,12} (star via 12), {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 12L), (11L, 12L), (20L, 21L)).toDF("id1", "id2")
    val comp = Scale.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) === 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) === 10L))
    assert(Seq(20L, 21L).forall(comp(_) === 20L))
    // the driver union-find fast path (default) and the iterative
    // distributed path (forced via maxDriverEdges = 0) must agree
    val dist = Scale.connectedComponents(edges, maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === comp, "driver fast path diverged from iterative CC")
    // the case pairwise keep-min gets wrong: edges (B,C),(A,C) —
    // components must put A, B, C in ONE cluster labeled A
    val tri = Seq((2L, 3L), (1L, 3L)).toDF("id1", "id2")
    val t = Scale.connectedComponents(tri).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connected components with a reliable checkpoint dir: identical labels") {
    // the durability option for shared clusters (executor loss must not
    // kill the iteration): same fixpoint, pins via durable parquet
    // round-trips instead of executor-local blocks
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    // a 7-node chain forces > 3 rounds, so BOTH the every-3rd-round pin
    // and the final pin run through the reliable path
    val edges = ((1L to 6L).map(i => (i, i + 1)) ++ Seq((10L, 11L)))
      .toDF("id1", "id2")
    // maxDriverEdges = 0 forces the iterative path — the durability
    // machinery under test only runs there (the driver fast path holds
    // everything in one process and needs no pins)
    val local = Scale.connectedComponents(edges, maxDriverEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = Scale.connectedComponents(edges,
        checkpointDir = Some(dir), maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === local)
    assert((1L to 7L).forall(reliable(_) === 1L))
    // the reliable path actually wrote pin data to the dir…
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    val paths = try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toVector
    } finally walk.close()
    assert(paths.exists(java.nio.file.Files.isRegularFile(_)),
      "no durable pin files written")
    // …and superseded pins were deleted as iteration advanced: only the
    // FINAL pin (the returned frame's backing files) may remain, so a
    // weekly sweep cannot grow the checkpoint dir without bound
    val pinDirs = paths.filter(p =>
      java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("pin-"))
    assert(pinDirs.size === 1,
      s"superseded pins not cleaned up: ${pinDirs.map(_.getFileName)}")
    // the surviving pin still backs the returned frame (re-collect works)
    assert(Scale.connectedComponents(edges, checkpointDir = Some(dir),
      maxDriverEdges = 0L).count() === 9)
    // default config real callers hit: FAST path + checkpointDir — the
    // edge pin is written, read back for the collect, and the whole run
    // dir is removed again (driver result needs no pins)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-cc-fast").toString
    val fast = Scale.connectedComponents(edges, checkpointDir = Some(dir2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === local, "fast path with checkpointDir diverged")
    val leftover = java.nio.file.Files.list(java.nio.file.Paths.get(dir2))
    try assert(!leftover.iterator().hasNext,
      "fast path left pin data behind") finally leftover.close()
  }

  test("bloom prefilter join: identical to plain join, prunes pre-shuffle") {
    val o = Tables.orders(spark, sf)
    // selective small side: ~2% of orders
    val small = o.filter($"o_orderkey" % 50 === 0)
      .select($"o_orderkey", $"o_totalprice".as("sp"))
    val big = Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey")
    val plain = big.join(small, Seq("o_orderkey"))
    val bloomed = Scale.bloomPrefilterJoin(big, small, "o_orderkey",
      expectedItems = 1000L)
    assert(bloomed.count() === plain.count())
    assert(Scale.contentFingerprint(bloomed.select(plain.columns.map(col): _*))
      === Scale.contentFingerprint(plain))
    // the prefilter must actually discard most of the big side (fpp 1%
    // on a ~2%-selective key set ⇒ well under half survives)
    val bf = small.stat.bloomFilter("o_orderkey", 1000L, 0.01)
    val survivors = big.filter(
      graft.functions.BloomFunctions.mightContain($"o_orderkey", bf)).count()
    assert(survivors < big.count() / 2,
      s"prefilter kept $survivors of ${big.count()} rows")
  }

  test("extensions: SQL users can call the native functions") {
    // SparkSpec.session is built withExtensions(new GraftExtensions)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb")
    val self = spark.sql(
      "SELECT cosine_sim(embedding, embedding) c, l2_norm(embedding) n FROM emb LIMIT 5")
      .collect()
    assert(self.length === 5)
    self.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(r.getDouble(1) > 0)
    }
    Tables.documents(spark, sf).createOrReplaceTempView("docs")
    val sh = spark.sql(
      "SELECT simhash64(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) h FROM docs LIMIT 3")
      .collect()
    assert(sh.length === 3)
    // round-5 registration: the positional shingle kernel — one hash
    // per window in text order, so size = tokens - n + 1
    val ps = spark.sql(
      "SELECT size(positional_shingle_hashes(array('a','b','c','d'), 2))")
      .head().getInt(0)
    assert(ps === 3)
    // SQL arrays admit null elements (the tokenizer never emits them):
    // the kernel must hash them to the seed, not NPE in the executor
    val psNull = spark.sql(
      "SELECT size(positional_shingle_hashes(array('a', CAST(NULL AS STRING), 'b'), 2))")
      .head().getInt(0)
    assert(psNull === 2)
    // round-3 registrations: layout kernel + heavy-hitters aggregate
    val z = spark.sql("SELECT interleave_bits(3L, 5L)").head().getLong(0)
    assert(z === 39L)
    val hh = spark.sql(
      """SELECT t.word, t.est FROM (
        |  SELECT inline(approx_top_k(lang, 3)) AS (word, est)
        |  FROM docs) t ORDER BY est DESC, word""".stripMargin)
    assert(hh.count() === 3)
    // round-9 registrations: row-local counts, compression ratio,
    // DSIR features, int8 serving kernels
    val tc = spark.sql(
      "SELECT token_counts(array('a','b','a'))['a']").head().getLong(0)
    assert(tc === 2L)
    val dr = spark.sql("SELECT deflate_ratio(repeat('ab', 500))")
      .head().getDouble(0)
    assert(dr > 0.0 && dr < 0.2, s"repetitive text should compress: $dr")
    // 3 tokens -> 2 bigram features, buckets inside [0, 64)
    val bb = spark.sql("SELECT bigram_buckets(array('a','b','c'), 64)")
      .head().getSeq[Long](0)
    assert(bb.length === 2 && bb.forall(b => b >= 0 && b < 64))
    val iq = spark.sql(
      """SELECT int8_cosine_sim(quantize8(embedding), quantize8(embedding))
        |FROM emb LIMIT 3""".stripMargin).collect()
    iq.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 0.05))
  }
}
