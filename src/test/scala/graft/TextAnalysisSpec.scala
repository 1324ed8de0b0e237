package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: word_tokens <= ws_tokens <= re_tokens envelope holds") {
    TextAnalysis.textTokens(spark, sf).collect().foreach { r =>
      val (ws, re, words) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ws >= 1)
      assert(re >= ws) // regex splits punctuation off, never merges
      assert(words >= 1)
    }
  }

  test("quality: ratios in [0,1], score in [0,1]") {
    TextAnalysis.textQuality(spark, sf).collect().foreach { r =>
      Seq(4, 5, 6, 7).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0, s"col $i out of range: $v")
      }
    }
  }

  test("langid: deterministic, known label set, CJK short-circuit") {
    val out1 = TextAnalysis.textLangId(spark, sf).collect().map(_.getString(1))
    val out2 = TextAnalysis.textLangId(spark, sf).collect().map(_.getString(1))
    assert(out1.sameElements(out2))
    assert(out1.forall(Set("en", "de", "es", "fr", "zh").contains))
    val zh = Seq((1L, "这是一个中文句子")).toDF("doc_id", "text")
      .select(TextFunctions.langId($"text")).as[String].head()
    assert(zh === "zh")
    val de = Seq((1L, "der hund und die katze sind schnell")).toDF("doc_id", "text")
      .select(TextFunctions.langId($"text")).as[String].head()
    assert(de === "de")
  }

  test("fingerprints: identical docs hash identically, different docs differ") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "utterly different content with other words entirely here now")
    ).toDF("doc_id", "text")
      .withColumn("toks", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .select($"doc_id",
        TextFunctions.rollingHashMin($"toks", 8).as("fp"),
        TextFunctions.simhash64($"toks").as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) === m(2L))
    assert(m(1L)._1 !== m(3L)._1)
  }

  test("simhash of near-identical docs has small hamming distance") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the morning light"),
      (2L, "the quick brown fox jumps over the lazy cat in the morning light"))
      .toDF("doc_id", "text")
      .withColumn("toks", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .select(TextFunctions.simhash64($"toks")).as[Long].collect()
    val hamming = java.lang.Long.bitCount(df(0) ^ df(1))
    assert(hamming <= 16, s"hamming=$hamming")
  }

  test("tf-idf: rare planted term dominates its document") {
    // zzyzxunique: tf=2, df=1 → 2·(ln(4/2)+1) ≈ 3.39; every common
    // term: tf≤2, df=3 → ≤ 2·(ln(4/4)+1) = 2.0 — the rare term MUST win
    val docs = Seq(
      (1L, "alpha beta gamma delta zzyzxunique alpha beta zzyzxunique", "en", "s", 40L),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 40L),
      (3L, "alpha beta gamma delta epsilon zeta eta iota", "en", "s", 40L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // replicate the op inline on the planted frame
    val postings = docs.select($"doc_id",
      explode(TextAnalysis.tokens()).as("term"))
    val df_ = postings.distinct().groupBy($"term").agg(count(lit(1)).as("df"))
    val tf = postings.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val scored = tf.join(df_, Seq("term"))
      .withColumn("tfidf", $"tf" * (log((lit(3) + 1.0) / ($"df" + 1.0)) + 1.0))
    val top1 = scored.filter($"doc_id" === 1L)
      .orderBy($"tfidf".desc).select($"term").as[String].head()
    assert(top1 === "zzyzxunique")
    // and on the real corpus the driver query returns topK rows per doc
    val real = TextAnalysis.tfIdfTop(spark, sf)
    val counts = real.groupBy($"doc_id").count().select($"count").as[Long].collect()
    assert(counts.forall(_ <= 3))
    assert(real.count() > 0)
  }

  test("word freq: counts positive and non-increasing") {
    val rows = TextAnalysis.wordFreqTopK(spark, sf).collect()
    assert(rows.length === 20)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("lm score: in-distribution text outscores rare-token gibberish") {
    val rows = TextAnalysis.textLmScore(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach(r => assert(r.getDouble(2) < 0.0)) // log-probs are negative
    // planted: a doc of corpus-common words vs a doc of hapaxes —
    // replicate the op's LM inline on a corpus where we control df
    val docs = (1L to 20L).map(i => (i, "data spark query join table scan row value")) ++
      Seq((99L, "zzyzx qwfp vexing jumbled xylophone quartz")) // all-rare tokens
    val df = docs.toDF("doc_id", "text")
    val postings = df.select($"doc_id", explode(TextAnalysis.tokens()).as("term"))
    val totals = postings.agg(count(lit(1)).as("n"), countDistinct($"term").as("v")).head()
    val (n, v) = (totals.getLong(0), totals.getLong(1))
    val lm = postings.groupBy($"term").agg(count(lit(1)).as("tf"))
      .select($"term", log(($"tf" + 1.0) / (n + v).toDouble).as("logp"))
    val scores = postings.join(lm, Seq("term"))
      .groupBy($"doc_id").agg((sum($"logp") / count(lit(1))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(99L),
      s"common-word doc should outscore gibberish: ${scores(1L)} vs ${scores(99L)}")
  }

  test("approx top-k: exact when vocab fits the sketch; MG bound under compaction") {
    // The corpus vocabulary is far under 8·20 counters, so no counter
    // is ever evicted and the sketch must equal the exact top-20.
    val exact = TextAnalysis.wordFreqTopK(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val approx = TextAnalysis.wordFreqTopKApprox(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(approx.toSeq === exact.toSeq)
    // planted skew + tiny sketch (k=2, slack=2 → 4 counters) forces
    // compaction: the heavy hitter must survive at rank 1 with an
    // undercount of at most n/capacity
    val n = 400
    val words = (Seq.fill(300)("hot") ++ (1 to 100).map(i => s"rare${i % 50}"))
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("i", "word")
    val top = df.agg(graft.functions.AggFunctions.approxTopK($"word", 2, slack = 2).as("t"))
      .selectExpr("inline(t)").collect()
    assert(top.head.getString(0) === "hot")
    val est = top.head.getLong(1)
    assert(est <= 300L && est >= 300L - n / 4,
      s"MG bound violated: est=$est, true=300, n/capacity=${n / 4}")
  }

  test("repetition: ratios in [0,1); planted loop maxes them, unique text zeros them") {
    TextAnalysis.textRepetition(spark, sf).collect().foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
    }
    // same expressions on planted extremes: a 2-word loop is nearly all
    // duplicate; all-unique and single-token docs are 0 (incl. the
    // empty-bigram guard)
    val planted = Seq(
      (1L, ("ping pong " * 20).trim),
      (2L, "each word appears exactly once in this sentence"),
      (3L, "solo"),
    ).toDF("doc_id", "text")
      .withColumn("toks", TextAnalysis.tokens())
    val out = planted.selectExpr("doc_id",
      "1.0 - cast(size(array_distinct(toks)) as double) / size(toks) AS dtr",
      """IF(size(toks) < 2, array(),
        |   transform(sequence(1, size(toks) - 1),
        |     i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))) AS bg""".stripMargin)
      .selectExpr("doc_id", "dtr",
        "IF(size(bg) = 0, 0.0, 1.0 - cast(size(array_distinct(bg)) as double) / size(bg)) AS dbr")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 > 0.9 && out(1L)._2 > 0.9) // 40 tokens / 2 distinct, 39 bigrams / 2 distinct
    assert(out(2L)._1 === 0.0 && out(2L)._2 === 0.0)
    assert(out(3L)._1 === 0.0 && out(3L)._2 === 0.0)
  }

  test("pii scrub: planted emails/phones/ips are counted and redacted") {
    val planted = Seq(
      (1L, "contact alice.smith+spam@example.co.uk or call 555-123-4567 now"),
      (2L, "server at 192.168.10.1 is fine; mail root@host.org"),
      (3L, "nothing sensitive here at all"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(planted, "doc_id", "text").collect()
    val byId = got.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(byId(1L)._1 === 1L && byId(1L)._2 === 1L && byId(1L)._3 === 0L)
    assert(byId(1L)._4 === "contact [EMAIL] or call [PHONE] now")
    assert(byId(2L)._1 === 1L && byId(2L)._3 === 1L)
    assert(byId(2L)._4 === "server at [IP] is fine; mail [EMAIL]")
    assert(byId(3L) === ((0L, 0L, 0L, "nothing sensitive here at all")))
  }

  test("text normalize: NFD composes, case folds locale-free, whitespace collapses, idempotent") {
    import graft.functions.TextFunctions
    // "Cafe" + combining acute (NFD) must compose to the NFC é and
    // then lowercase; runs of tabs/newlines collapse; edges trim
    val docs = Seq(
      (1L, "Cafe\u0301  DU\tMonde\n\nNOW "), // NFD: e + combining acute
      (2L, "already clean text"),
      (3L, ""),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.textNormalizeOf(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) === "café du monde now", s"normalized: ${got(1L)}")
    assert(got(2L) === "already clean text")
    assert(got(3L) === "" && got(4L) === null)
    // char accounting: composed + collapsed output is shorter
    val counts = TextAnalysis.textNormalizeOf(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) (-1, -1) else (r.getInt(2), r.getInt(3))))
      .toMap
    assert(counts(1L)._2 < counts(1L)._1, s"no shrinkage: ${counts(1L)}")
    // idempotence: normalizing the normalized text is the identity
    val once = Seq((1L, got(1L))).toDF("doc_id", "text")
    val twice = TextAnalysis.textNormalizeOf(once, "doc_id", "text")
      .head().getString(1)
    assert(twice === got(1L), "normalize not idempotent")
    // a non-string input fails type check by name
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      docs.select(TextFunctions.normalizeText(col("doc_id"))).collect()
    }
    assert(ex.getMessage.contains("normalize_text needs a string"),
      ex.getMessage)
  }

  test("sentiment: hand valences exact, zero-hit docs carry NULL not neutral, rollup covers") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a", "this works great and i love it"),   // 2+3+3 = 8/3
      (2L, "a", "terrible slow crash"),              // -4-1-2 = -7/3
      (3L, "a", "completely neutral words here"),    // no hits -> NULL
      (10L, "b", "good good bad"))                   // 3+3-3 = 3/3
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.textSentimentOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got(1L)._1 === 3L &&
      math.abs(got(1L)._2.get - 8.0 / 3) < 1e-6, s"doc 1: $got")
    assert(math.abs(got(2L)._2.get - (-7.0 / 3)) < 1e-6, s"doc 2: $got")
    assert(got(3L) === ((0L, None)), s"no-evidence doc: $got")
    assert(got(10L)._2.get === 1.0, s"doc 10: $got")
    val roll = TextAnalysis.sentimentBySourceOf(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // a: 3 docs, 2 scored, mean (8/3 - 7/3)/2 = 1/6, coverage 2/3
    assert(roll("a")._1 === 3L && roll("a")._2 === 2L)
    assert(math.abs(roll("a")._3 - 1.0 / 6) < 1e-5, s"mean: ${roll("a")}")
    assert(roll("a")._4 === 0.666667)
    assert(roll("b") === ((1L, 1L, 1.0, 1.0)))
    // the stateless live twin scores a replayed stream bit-equal to
    // the batch kernel, doc for doc
    val input = new org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](233, spark, None)
    val q = TextAnalysis.sentimentStream(
        input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("senti_stream")
      .outputMode("append").start()
    try {
      input.addData(docs.collect().map(r =>
        (r.getLong(0), r.getString(2))).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val live = spark.table("senti_stream").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(live.keySet === got.keySet)
    got.foreach { case (id, v) =>
      assert(live(id) === v, s"stream twin drifted on doc $id") }
  }

  test("normalize impact: composition/case/whitespace twins collapse, raw distincts stand") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a", "Hello World"),
      (2L, "a", "hello   world"),  // whitespace + case twin of 1
      (3L, "a", "hello world"),    // the canonical form itself
      (4L, "a", "something else"),
      (10L, "b", "unique here"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.normalizeImpactOf(docs, "source").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // raw: 4 distinct texts in a; normalized: docs 1/2/3 collapse to 1
    assert(got("a") === ((4L, 4L, 2L, 2L)), s"source a: $got")
    assert(got("b") === ((1L, 1L, 1L, 0L)), s"source b: $got")
  }

  test("pii report: per-source hit totals and affected fractions are exact, stream twin matches the batch scrub") {
    val planted = Seq(
      (1L, "a", "contact alice.smith+spam@example.co.uk or call 555-123-4567 now"),
      (2L, "a", "nothing sensitive here at all"),
      (3L, "a", "mail root@host.org and also admin@host.org today"),
      (4L, "b", "server at 192.168.10.1 is fine"),
    ).toDF("doc_id", "source", "text")
    val rep = TextAnalysis.piiReportOf(planted, "source").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // a: 3 docs, 2 affected, 3 emails, 1 phone; b: 1 doc, 1 ip
    assert(rep("a") === ((3L, 2L, 3L, 1L, 0L, 0.666667)))
    assert(rep("b") === ((1L, 1L, 0L, 0L, 1L, 1.0)))
    // the live twin is the batch kernel minus the display sort: every
    // replayed row matches E8 exactly
    val input = new org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](231, spark, None)
    val q = TextAnalysis.piiScrubStream(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pii_scrub_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, "call 555-123-4567 and mail a@b.io"),
        (2L, "clean"))
      q.processAllAvailable()
    } finally q.stop()
    val live = spark.table("pii_scrub_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sortBy(_._1)
    val batch = TextAnalysis.piiScrub(
        Seq((1L, "call 555-123-4567 and mail a@b.io"), (2L, "clean"))
          .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1)
    assert(live.toSeq === batch.toSeq, s"batch/stream twin parity: ${live.toSeq}")
  }

  test("boilerplate frac: cross-doc template grams flagged, unique text scores 0") {
    val template = "click here to subscribe now" // 5-token boilerplate
    val docs = Seq(
      (1L, s"$template and read about mountain hiking trails today"),
      (2L, s"$template and learn piano scales with daily practice"),
      (3L, s"$template plus entirely different cooking recipe content"),
      (4L, "a fully original document about deep sea creatures and biology"),
      (5L, "too few words"), // < 5 tokens → no grams → absent from output
    ).toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateFracOf(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!got.contains(5L), "sub-n doc must have no gram rows")
    assert(got(4L) === 0.0, "unique doc must score 0")
    // the template 5-gram appears in 3 docs (> maxDf 2) → positive frac
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id) > 0.0 && got(id) < 1.0, s"doc $id: ${got(id)}")
    }
  }

  test("tokenCounts kernel: counts match groupBy, empty/null safe, buffer-stable") {
    val docs = Seq(
      (1L, Seq("a", "b", "a", "c", "a", "b")),
      (2L, Seq("x")),
      (3L, Seq.empty[String]),
    ).toDF("doc_id", "toks")
    val viaKernel = docs
      .select($"doc_id", explode(TextFunctions.tokenCounts($"toks")).as(Seq("t", "n")))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val viaGroupBy = docs
      .select($"doc_id", explode($"toks").as("t"))
      .groupBy($"doc_id", $"t").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaKernel === viaGroupBy)
    assert(!viaKernel.keys.exists(_._1 == 3L), "empty array must emit no rows")
    // null array → explode drops the row, like the groupBy shape
    val withNull = Seq((4L, null.asInstanceOf[Seq[String]])).toDF("doc_id", "toks")
      .select($"doc_id", explode(TextFunctions.tokenCounts($"toks")))
    assert(withNull.count() === 0)
    // through a real parquet scan (reused column-batch buffers): the
    // kernel must clone keys out of the batch — corrupt keys would
    // show as wrong counts or duplicate map keys on the sf corpus
    val fromParquet = Tables.documents(spark, sf)
      .withColumn("toks", TextAnalysis.tokens())
      .select($"doc_id", explode(TextFunctions.tokenCounts($"toks")).as(Seq("t", "n")))
    val viaAgg = Tables.documents(spark, sf)
      .withColumn("toks", TextAnalysis.tokens())
      .select($"doc_id", explode($"toks").as("t"))
      .groupBy($"doc_id", $"t").count()
    assert(fromParquet.count() === viaAgg.count())
    assert(fromParquet.join(viaAgg,
      fromParquet("doc_id") === viaAgg("doc_id") &&
        fromParquet("t") === viaAgg("t") &&
        fromParquet("n") === viaAgg("count"), "left_anti").count() === 0)
  }

  test("deflate ratio: repetitive < prose < noise, empty/null handled, deterministic") {
    val rnd = new scala.util.Random(7)
    val noise = (0 until 400).map(_ => rnd.nextPrintableChar()).mkString
    val prose = ("the quick brown fox jumps over the lazy dog while " +
      "seventy owls watch a distant storm gather beyond the river ") * 4
    val docs = Seq(
      (1L, Some("spam " * 200)),           // highly repetitive
      (2L, Some(prose)),                   // natural-ish prose
      (3L, Some(noise)),                   // near-incompressible
      (4L, Some("")),                      // empty → 1.0 by convention
      (5L, None),                          // null text → null ratio
    ).toDF("doc_id", "text")
    val got = TextAnalysis.compressRatioOf(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val (rep, pr, nz) = (got(1L).get, got(2L).get, got(3L).get)
    assert(rep < pr && pr < nz, s"ordering violated: $rep / $pr / $nz")
    assert(rep < 0.1, s"200x-repeated token should compress hard: $rep")
    assert(nz > 0.5, s"random printable noise should resist: $nz")
    assert(got(4L) === Some(1.0) && got(5L) === None)
    val again = TextAnalysis.compressRatioOf(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(again === got, "ratio must be a pure function of the bytes")
  }

  test("corpus drift: single source sits at zero, disjoint vocab near ln 2, bounds hold") {
    // one-source corpus: its distribution IS the corpus → JSD exactly 0
    val solo = Seq(("a", "x y x z")).toDF("source", "text")
    val soloOut = TextAnalysis.corpusDriftOf(solo, "source").collect()
    assert(soloOut.length === 1 && soloOut.head.getDouble(3) === 0.0,
      s"single-source drift: ${soloOut.toSeq}")
    // disjoint vocabularies: each source maximally far from the 50/50
    // corpus mix — JSD per source = ln 2 / 2... no: vs the MIX, each
    // source's divergence is bounded by ln 2 and here sits well above 0
    val split = Seq(("a", "x x x x"), ("b", "y y y y")).toDF("source", "text")
    val out = TextAnalysis.corpusDriftOf(split, "source").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val ln2 = math.log(2.0)
    assert(out.keySet === Set("a", "b"))
    out.values.foreach { j =>
      assert(j >= 0.0 && j <= ln2 + 1e-12, s"JSD out of [0, ln2]: $out")
    }
    // disjoint halves: P={x:1}, M={x:.5,y:.5} → 0.5·ln2 + 0.5·(ln2·0.5)
    // ... compute directly: 0.5·Σp ln(p/m) + 0.5·Σq ln(q/m)
    //  p-side: 1·ln(1/0.75)… no — m=(p+q)/2 per token: x: p=1,q=.5,m=.75
    //  q-side x: .5·ln(.5/.75); absent y: ln2·(1−.5)
    val want = 0.5 * (1.0 * math.log(1.0 / 0.75)) +
      0.5 * (0.5 * math.log(0.5 / 0.75) + ln2 * 0.5)
    out.values.foreach(j => assert(math.abs(j - want) < 1e-9,
      s"disjoint-half JSD: got $out want $want"))
    // sf corpus sanity: all sources in range, deterministic
    val sf1 = TextAnalysis.corpusDrift(spark, sf).collect()
    assert(sf1.nonEmpty)
    sf1.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= ln2))
  }

  test("langid confusion: shares sum to 1 per lang, diagonal accuracy beats chance") {
    val out = TextAnalysis.langIdConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(out.nonEmpty)
    val n = Tables.documents(spark, sf).count()
    assert(out.map(_._3).sum === n, "docs lost from the matrix")
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3, s"$lang shares")
    }
    val acc = out.filter(_._5).map(_._3).sum.toDouble / n
    val langs = out.map(_._1).distinct.length
    assert(acc > 1.0 / langs, s"accuracy $acc no better than chance")
  }

  test("bigram lm: word salad collapses, unigram can't tell — the upgrade's point") {
    val fluent = "the cat sat on the mat and the dog sat on the rug"
    // same BAG of words, scrambled order: every unigram count identical
    val salad = "sat the rug dog mat the on cat and on sat the the"
    val docs = (Seq(
      (1L, fluent), (2L, salad)) ++
      // corpus mass: more fluent text so bigram statistics favor it
      (10L to 14L).map(i => (i, fluent)))
      .toDF("doc_id", "text")
    val out = TextAnalysis.textLmScoreBigramOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 12L) // 13 tokens -> 12 bigram positions
    assert(out(1L)._2 > out(2L)._2,
      s"scrambled doc did not score lower: $out")
    // <2-token docs carry NULL, not a fabricated floor
    val tiny = TextAnalysis.textLmScoreBigramOf(
      (docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq :+
        (99L, "solo")).toDF("doc_id", "text")).collect()
      .filter(_.getLong(0) == 99L).head
    assert(tiny.getLong(1) === 0L && tiny.isNullAt(2))
  }

  test("drift stream: per-batch JSD vs static baseline, novel vocab exact, identical slice at zero") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ln2 = math.log(2.0)
    val baseline = Seq(("b", "x x x x")).toDF("source", "text")
    val input = MemoryStream[(String, String)](31, spark, None)
    val got = scala.collection.mutable.Map.empty[(Long, String), Double]
    val q = TextAnalysis.driftStream(
      input.toDS().toDF("source", "text"), baseline) { (report, id) =>
      report.collect().foreach(r =>
        got((id, r.getString(0))) = r.getDouble(3))
    }.start()
    try {
      // batch 0: srcA matches the baseline exactly (JSD 0); srcB is
      // ENTIRELY novel vocabulary — the worst-drift case must come out
      // as exactly ln 2, not NaN
      input.addData(("srcA", "x x"), ("srcB", "y y"))
      q.processAllAvailable()
      assert(got((0L, "srcA")) === 0.0, s"identical slice drifted: $got")
      assert(math.abs(got((0L, "srcB")) - ln2) < 1e-12, s"novel-vocab JSD: $got")
      // batch 1: half-novel slice — P={x:.5,y:.5} vs Q={x:1}:
      //  x: p=.5,q=1,m=.75 → .5·ln(.5/.75) + 1·ln(1/.75)
      //  y: novel → p-side .5·ln2; ref absent mass = 0
      val want = 0.5 * (0.5 * math.log(0.5 / 0.75) + 0.5 * ln2) +
        0.5 * (1.0 * math.log(1.0 / 0.75))
      input.addData(("srcC", "x y"))
      q.processAllAvailable()
      assert(math.abs(got((1L, "srcC")) - want) < 1e-12,
        s"half-novel JSD: got ${got.get((1L, "srcC"))} want $want")
    } finally q.stop()
  }

  test("vocab coverage: planted frequencies give exact cut coverage, over-cut saturates") {
    import spark.implicits._
    // counts: aa×5, bb×3, cc×1, dd×1 → total 10
    val docs = Seq((0L, "aa aa aa bb bb cc"), (1L, "aa aa bb dd"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.textVocabCoverageOf(docs, cuts = Seq(1, 2, 10))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(out.keySet === Set(1L, 2L, 10L))
    assert(out(1L) === ((4L, 10L, 5L, 0.5)), s"cut 1: ${out(1L)}")
    assert(out(2L) === ((4L, 10L, 8L, 0.8)), s"cut 2: ${out(2L)}")
    assert(out(10L) === ((4L, 10L, 10L, 1.0)),
      s"a cut past the vocabulary must saturate at 1: ${out(10L)}")
  }

  test("script profile: planted composition exact, fractions partition 1") {
    import spark.implicits._
    val docs = Seq(
      (0L, "abc 12\n!!", "clean"), // 3 alpha, 2 digit, 2 ws, 2 other of 9
      (1L, "ABCDEFGHIJ", "clean"), // pure letters
      (2L, "<<<>>>", "markup")) // pure "other" — the mojibake signal
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.textScriptProfileOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    val (nd, nc, a, d, s, o) = out("clean")
    assert((nd, nc) === ((2L, 19L)))
    assert(a === math.rint(13.0 / 19 * 1e6) / 1e6)
    assert(d === math.rint(2.0 / 19 * 1e6) / 1e6)
    assert(s === math.rint(2.0 / 19 * 1e6) / 1e6)
    assert(o === math.rint(2.0 / 19 * 1e6) / 1e6)
    assert(out("markup") === ((1L, 6L, 0.0, 0.0, 0.0, 1.0)),
      s"pure-markup source must land fully in other: ${out("markup")}")
  }

  test("bpe pairs: vocab-weighted counts equal the per-token scan exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "banana banana band"),
      (2L, "ana banana!  AND band and"),
      (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.textBpePairsOf(docs, k = 100).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // brute: every adjacent pair of every token occurrence
    val toks = Seq("banana", "banana", "band", "ana", "banana", "and",
      "band", "and", "x")
    val want = toks.flatMap(w => w.sliding(2).filter(_.length == 2))
      .groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    assert(out.toMap == want, s"${out.toMap} != $want")
    // ordering: count desc, then pair asc
    val sorted = out.sortBy { case (p, c) => (-c, p) }
    assert(out.sameElements(sorted), "top-k order broken")
    assert(out.forall(_._1.length == 2))
  }

  test("bpe pairs: driver-table counts match a token-stream recompute") {
    // the Σ tf(term)·pairs(term) identity on real data: the operator's
    // vocab-weighted aggregate vs a direct per-token-occurrence explode
    val out = TextAnalysis.textBpePairs(spark, sf, k = 30).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.nonEmpty)
    import spark.implicits._
    val brute = Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokens()).as("w"))
      .filter(length($"w") >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy($"pair").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"pair").limit(30).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.sameElements(brute), "vocab-weighted != token-stream scan")
  }

  test("hapax profile: noisy source reads high, templated source reads low") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo", "noisy"),
      (2L, "foxtrot golf hotel india juliet", "noisy"),
      (3L, "spam spam spam eggs spam", "template"),
      (4L, "spam eggs spam eggs", "template"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.textHapaxOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    // noisy: 10 tokens, 10 terms, all hapax
    assert(out("noisy") === ((10L, 10L, 10L, 1.0, 1.0)))
    // template: 9 tokens, 2 terms (spam=6, eggs=3), no hapax
    assert(out("template") === ((9L, 2L, 0L, 0.0,
      math.rint(2.0 / 9 * 1e6) / 1e6)))
  }

  test("rake keywords: hand-computed scores, stopword islands, deterministic phrase text") {
    import spark.implicits._
    // doc 1: "deep learning of deep networks and the learning rate"
    //   islands: [deep learning], [deep networks], [learning rate]
    //   freq: deep 2, learning 2, networks 1, rate 1
    //   deg:  deep 2+2=4, learning 2+2=4, networks 2, rate 2
    //   scores: deep 2, learning 2, networks 2, rate 2
    //   phrases: "deep learning" 4, "deep networks" 4, "learning rate" 4
    //   tie at 4 -> lexicographic: "deep learning"
    val docs = Seq(
      (1L, "deep learning of deep networks and the learning rate"),
      (2L, "the of and"), // all stopwords -> NULL keyword
      (3L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.textKeywordsOf(docs).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1),
          if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    assert(out(1L) === (("deep learning", 4.0)), s"doc 1: ${out(1L)}")
    assert(out(2L)._1 == null, s"all-stopword doc: ${out(2L)}")
    assert(out(3L) === (("solo", 1.0)), s"single-word doc: ${out(3L)}")
    // a longer phrase outranks repeated short ones: degree rewards
    // words living in long phrases
    val d4 = Seq((4L, "alpha beta gamma delta of beta of beta"))
      .toDF("doc_id", "text")
    val k4 = TextAnalysis.textKeywordsOf(d4).collect().head
    assert(k4.getString(1) == "alpha beta gamma delta", s"long phrase lost: $k4")
  }

  test("bpe train: the classic corpus learns the canonical merge sequence") {
    import spark.implicits._
    // Sennrich et al.'s worked example: {low:5, lower:2, newest:6,
    // widest:3}. Pair counts put (e,s)=9 tied with (s,t)=9 — the
    // deterministic (count desc, left, right) order picks (e,s); then
    // (es,t)=9, then (l,o)=7 tied with (o,w)=7 -> (l,o), then (lo,w)=7.
    val docs = Seq((1L,
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    val (merges, vocab) = TextAnalysis.bpeLearnOf(docs, nMerges = 4)
    assert(merges.map(m => (m._1, m._2, m._3)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)),
      s"merge sequence diverged: $merges")
    // final symbolization after 4 merges
    val syms = vocab.select($"term", $"syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(syms("low") == Seq("low"))
    assert(syms("lower") == Seq("low", "e", "r"))
    assert(syms("newest") == Seq("n", "e", "w", "est"))
    assert(syms("widest") == Seq("w", "i", "d", "est"))
    // reconstruction: merging never loses or reorders characters
    syms.foreach { case (t, ss) => assert(ss.mkString == t) }
    // OOV apply: an unseen term counts at character-piece fallback —
    // it must never silently vanish from the token budget
    val oov = Seq((9L, "low unseen")).toDF("doc_id", "text")
    val row = TextAnalysis.bpeApplyOf(oov, vocab).collect().head
    assert(row.getLong(1) == 2L, s"word_tokens dropped the OOV term: $row")
    assert(row.getLong(2) == (1 + "unseen".length).toLong,
      s"OOV char fallback broken: $row")
  }

  test("bpe train: overlapping runs merge leftmost non-overlapping") {
    import spark.implicits._
    // 'aaaa' under merge (a,a): leftmost pass yields [aa][aa], never
    // [a][aa][a] or a triple — the fold's just-merged symbol must not
    // re-merge with the next single 'a' ('aaa' -> [aa][a])
    val docs = Seq((1L, "aaaa aaa aa")).toDF("doc_id", "text")
    val (merges, vocab) = TextAnalysis.bpeLearnOf(docs, nMerges = 1)
    assert(merges.head._1 == "a" && merges.head._2 == "a")
    val syms = vocab.select($"term", $"syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(syms("aaaa") == Seq("aa", "aa"))
    assert(syms("aaa") == Seq("aa", "a"))
    assert(syms("aa") == Seq("aa"))
  }

  test("unigram train: EM concentrates mass on the productive piece, viterbi uses it, alphabet survives pruning") {
    import spark.implicits._
    // a corpus dominated by 'ab' repetition: the seed holds ab/aba/...,
    // EM's best parses route mass through 'ab', and pruning to a tiny
    // budget must keep it (plus the {a,b,c} alphabet, unconditionally)
    val docs = Seq((1L, Seq.fill(20)("ababab").mkString(" ") + " cc"))
      .toDF("doc_id", "text")
    val logp = TextAnalysis.unigramLearnOf(docs, vocabSize = 5,
      maxPieceLen = 3, seedSize = 64, emRounds = 3)
    assert(Set("a", "b", "c").subsetOf(logp.keySet),
      s"alphabet pruned: ${logp.keySet}")
    assert(logp.keySet.size <= 5, s"vocab budget blown: ${logp.keySet}")
    assert(logp.contains("ab") || logp.contains("aba") ||
      logp.contains("bab"), s"no productive piece survived: ${logp.keySet}")
    // segmentation determinism + the productive piece actually used
    val seg = TextAnalysis.unigramSegment("ababab", logp, 3)
    assert(seg.mkString == "ababab", s"parse loses chars: $seg")
    assert(seg.length < 6, s"viterbi ignored the learned piece: $seg")
    assert(seg == TextAnalysis.unigramSegment("ababab", logp, 3))
    // char fallback: a term with an out-of-alphabet char still counts
    val oov = TextAnalysis.unigramSegment("azb", logp, 3)
    assert(oov.mkString == "azb" && oov.nonEmpty, s"fallback broken: $oov")
  }

  test("unigram apply: hand-fitted table gives hand-checkable piece counts in E27's schema") {
    import spark.implicits._
    // hand table: 'ab' strong, chars weak — 'abab' parses [ab][ab]
    val logp = Map("ab" -> math.log(0.4), "a" -> math.log(0.1),
      "b" -> math.log(0.1), "c" -> math.log(0.1))
    val docs = Seq((1L, "abab abab c"), (2L, ""), (3L, "zz"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramApplyOf(docs, logp, maxPieceLen = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // doc 1: tf(abab)=2 ×2 pieces + tf(c)=1 ×1 = 5 pieces / 3 words
    assert(out(1L) === ((3L, 5L)), s"doc1: ${out(1L)}")
    assert(out(2L) === ((0L, 0L)), s"empty doc: ${out(2L)}")
    // 'zz' is out-of-alphabet: char fallback = 2 pieces, never dropped
    assert(out(3L) === ((1L, 2L)), s"oov doc: ${out(3L)}")
    // driver table: determinism + the E27 conservation invariants
    val a1 = TextAnalysis.unigramApply(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a2 = TextAnalysis.unigramApply(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a1.sameElements(a2), "apply not deterministic")
    assert(a1.nonEmpty)
    a1.foreach { case (id, words, pieces) =>
      assert(pieces >= words, s"doc $id: fewer pieces than words")
    }
    val train = TextAnalysis.unigramTrain(spark, sf).collect()
    assert(train.nonEmpty && train.length <= 512)
    // ranked by logp desc: monotone non-increasing
    train.sliding(2).foreach {
      case Array(hi, lo) =>
        assert(hi.getDouble(2) >= lo.getDouble(2), "rank order broken")
      case _ =>
    }
  }

  test("tokenizer compare: both fertilities >= 1, shared word totals, deterministic") {
    val r1 = TextAnalysis.tokenizerCompare(spark, sf).collect()
    val r2 = TextAnalysis.tokenizerCompare(spark, sf).collect()
    assert(r1.sameElements(r2), "compare not deterministic")
    assert(r1.nonEmpty)
    r1.foreach { r =>
      val (wt, bp, up) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bp >= wt && up >= wt,
        s"source ${r.getString(0)}: pieces below words ($wt, $bp, $up)")
      assert(r.getDouble(5) >= 1.0 && r.getDouble(6) >= 1.0,
        s"fertility below 1 for ${r.getString(0)}")
    }
    // cross-family consistency: word totals come from the SAME
    // tokenize pass on both sides — they must agree with the corpus
    val corpusWords = TextAnalysis.textTokens(spark, sf)
      .agg(org.apache.spark.sql.functions.sum(col("word_tokens")))
      .head.getLong(0)
    assert(r1.map(_.getLong(2)).sum === corpusWords,
      "per-source word totals do not cover the corpus")
  }

  test("bpe train + apply on the driver table: determinism, conservation, monotonicity") {
    val m1 = TextAnalysis.bpeTrain(spark, sf, nMerges = 8).collect()
    val m2 = TextAnalysis.bpeTrain(spark, sf, nMerges = 8).collect()
    assert(m1.sameElements(m2), "train not deterministic")
    assert(m1.length == 8)
    // pair counts never increase along the greedy sequence's prefix
    // in ties only — but each merged symbol must concat its halves
    m1.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0L)
    }
    val applied = TextAnalysis.bpeApply(spark, sf, nMerges = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(applied.nonEmpty)
    // conservation: >= 1 piece per word; pieces never exceed characters
    applied.foreach { case (id, words, pieces) =>
      assert(pieces >= words, s"doc $id: fewer pieces than words")
    }
    // monotonicity: more merges -> no more total pieces
    val applied16 = TextAnalysis.bpeApply(spark, sf, nMerges = 16).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    applied.foreach { case (id, _, p8) =>
      assert(applied16(id) <= p8, s"doc $id: pieces grew with more merges")
    }
  }

  test("zipf fit: slope/intercept match a driver-side OLS on the rank curve") {
    val out = TextAnalysis.textZipf(spark, sf, topN = 200).head()
    val (n, slope, icept) = (out.getLong(0), out.getDouble(1), out.getDouble(2))
    import spark.implicits._
    val counts = Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokens()).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val ranked = counts.sortBy { case (w, c) => (-c, w) }.take(200)
    assert(n == ranked.length.toLong)
    val xy = ranked.zipWithIndex.map { case ((_, c), i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxx = xy.map(t => t._1 * t._1).sum
    val sxy = xy.map(t => t._1 * t._2).sum
    val m = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val b = (sy - m * sx) / n
    assert(math.abs(slope - m) < 1e-6, s"slope $slope vs $m")
    assert(math.abs(icept - b) < 1e-6, s"intercept $icept vs $b")
    assert(slope < 0.0, "rank-frequency slope must be negative")
  }

  test("ngram diversity: hand-computed ratios, unique text ones, degenerate loop low, empty null") {
    val docs = Seq(
      // [x y x y x y]: distinct1 2/6, distinct2 2/5, distinct3 2/4
      (1L, "x y x y x y"),
      (2L, "each word appears exactly once here"), // all ratios 1.0
      (3L, ""),                                    // no tokens: all NULL
      (4L, "ab cd"))                               // 1 bigram, no trigram
      .toDF("doc_id", "text")
    val out = TextAnalysis.textNgramDiversityOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def d(r: org.apache.spark.sql.Row, i: Int) = r.getDouble(i)
    assert(d(out(1L), 2) === math.rint(2.0 / 6 * 1e6) / 1e6)
    assert(d(out(1L), 3) === 0.4 && d(out(1L), 4) === 0.5)
    assert(d(out(2L), 2) === 1.0 && d(out(2L), 3) === 1.0 &&
      d(out(2L), 4) === 1.0)
    assert(out(3L).isNullAt(2) && out(3L).isNullAt(3) && out(3L).isNullAt(4))
    assert(d(out(4L), 3) === 1.0 && out(4L).isNullAt(4),
      "two tokens: one bigram, no trigram")
  }

  test("tokenizer fertility: hand vocab exact, OOV falls back to char pieces") {
    val docs = Seq(
      (1L, "hello hello", "s1"),   // 2 words × 2 pieces = 4
      (2L, "xyz", "s2"))           // OOV: 3 char pieces for 1 word
      .toDF("doc_id", "text", "source")
    val vocab = Seq(("hello", Seq("he", "llo"))).toDF("term", "syms")
    val perDoc = TextAnalysis.bpeApplyOf(docs, vocab)
    val out = TextAnalysis.tokenizerFertilityOf(docs, perDoc, spark)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out("s1") === ((1L, 2L, 4L, 2.0, 2.5)),
      s"hello-doc fertility: ${out("s1")}")
    assert(out("s2") === ((1L, 1L, 3L, 3.0, 1.0)),
      s"OOV doc fertility: ${out("s2")}")
  }

  test("lang classifier: planted vocab split learns perfectly, fallback routes, corpus held-out at least matches the heuristic") {
    // planted: two "languages" with disjoint vocabulary — when signal
    // exists, the trained tier must find it
    val docs = ((1L to 10L).map(i =>
        (i, "aaa bbb ccc ddd aaa bbb ccc", "xx")) ++
      (11L to 20L).map(i =>
        (i, "qqq rrr sss ttt qqq rrr sss", "yy")))
      .toDF("doc_id", "text", "lang")
    val trainLabels = docs.filter($"doc_id" % 2 === 0)
      .select($"doc_id", $"lang")
    val model = TextAnalysis.langClassifierModel(docs, trainLabels)
    val served = TextAnalysis.langClassifierServe(docs, model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 10L).foreach(i => assert(served(i) === "xx", s"doc $i: $served"))
    (11L to 20L).foreach(i => assert(served(i) === "yy", s"doc $i: $served"))
    // evidence-free doc (< 2 tokens): routes through the E3 heuristic,
    // flagged as such
    val one = Seq((99L, "bonjour", "fr")).toDF("doc_id", "text", "lang")
    val fb = TextAnalysis.langClassifierServe(one, model).collect().head
    assert(fb.getBoolean(2), "one-token doc must take the fallback route")
    val heurGuess = one.select(
      graft.functions.TextFunctions.langId($"text")).collect().head.getString(0)
    assert(fb.getString(1) === heurGuess,
      "fallback must be the E3 heuristic's guess verbatim")
    // Driver corpus: the synthetic text carries NO language signal
    // (all 31 vocabulary words shared across the 5 langs at near-equal
    // frequency — verified against the generator's output), so CHANCE
    // is the majority-class share and no content-based tier can beat
    // it reliably. The honest pin: the trained tier's held-out
    // accuracy is at least the heuristic's measured number on the
    // same docs (the upgrade never regresses the tier it replaces) —
    // on a REAL corpus the planted test above is the capability proof.
    val drv = TextAnalysis.langClassifier(spark, sf).collect()
    val held = drv.filter(_.getString(4) != "train")
    val acc = held.count(r => r.getString(1) === r.getString(2)).toDouble /
      held.length
    val heur = TextAnalysis.textLangId(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1) == r.getString(2))).toMap
    val heldIds = held.map(_.getLong(0)).toSet
    val heurAcc = heldIds.count(heur(_)).toDouble / heldIds.size
    assert(acc >= heurAcc,
      f"trained held-out accuracy $acc%.3f regressed below the " +
        f"heuristic's $heurAcc%.3f")
    // report entry: E19's frame shape over the held-out slice,
    // row-shares normalize per lang
    val rep = TextAnalysis.langClassifierReport(spark, sf).collect()
    val byLang = rep.groupBy(_.getString(0))
    byLang.foreach { case (l, rs) =>
      val share = rs.map(_.getDouble(3)).sum
      assert(math.abs(share - 1.0) < 0.01, s"lang $l shares: $share") }
    assert(rep.map(_.getLong(2)).sum === held.length,
      "report mass != held-out docs")
  }

  test("lang model artifact: round trip bit-exact, torn per-class table fails by name") {
    val docs = ((1L to 6L).map(i => (i, "aaa bbb ccc aaa bbb", "xx")) ++
      (11L to 16L).map(i => (i, "qqq rrr sss qqq rrr", "yy")))
      .toDF("doc_id", "text", "lang")
    val model = TextAnalysis.langClassifierModel(docs,
      docs.select($"doc_id", $"lang"), nBuckets = 64)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-langmodel-spec").toString
    TextAnalysis.writeLangModel(spark, model, dir)
    val back = TextAnalysis.readLangModel(spark, dir)
    assert(back.langs.toSeq === model.langs.toSeq)
    assert(back.nBuckets === model.nBuckets)
    assert(back.logPrior.toSeq === model.logPrior.toSeq)
    model.weights.zip(back.weights).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq, "weights drifted through the artifact") }
    // serve-from-disk == serve-from-session
    val s1 = TextAnalysis.langClassifierServe(docs, model)
      .collect().map(_.toString).sorted.toSeq
    val s2 = TextAnalysis.langClassifierServe(docs, back)
      .collect().map(_.toString).sorted.toSeq
    assert(s1 === s2)
    // torn: truncate the weights table behind the meta
    spark.read.parquet(s"$dir/weights").limit(10).write
      .mode("overwrite").parquet(s"$dir/w2")
    spark.read.parquet(s"$dir/w2").write
      .mode("overwrite").parquet(s"$dir/weights")
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.readLangModel(spark, dir)
    }
    assert(ex.getMessage.contains("torn"),
      s"torn model must fail by name: ${ex.getMessage}")
    // served entry: deterministic, covers every doc
    val drv = TextAnalysis.langClassifierIndexed(spark, sf).collect()
    assert(drv.length === Tables.documents(spark, sf).count())
    val again = TextAnalysis.langClassifierIndexed(spark, sf).collect()
    assert(drv.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("tokenizer artifact: apply-from-disk is bit-exact with apply-from-cache, both families") {
    // BPE: the served indexed entry routes through the staged artifact
    val bpeCached = TextAnalysis.bpeApply(spark, sf).collect()
    val bpeDisk = TextAnalysis.bpeApplyIndexed(spark, sf).collect()
    assert(bpeCached.toSeq === bpeDisk.toSeq,
      "BPE apply from the re-opened artifact drifted from the cache")
    // unigram: full-precision logp round trip — bit-exact scores
    val uniCached = TextAnalysis.unigramApply(spark, sf).collect()
    val uniDisk = TextAnalysis.unigramApplyIndexed(spark, sf).collect()
    assert(uniCached.toSeq === uniDisk.toSeq,
      "unigram apply from the re-opened artifact drifted from the cache")
    // cross-session shape: a DIFFERENT corpus applies under the staged
    // vocab (the artifact's reason to exist) — counts follow the
    // artifact's vocabulary, not the target corpus's
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tok-spec").toString
    TextAnalysis.writeTokenizer(spark, sf, dir, "bpe")
    val other = Seq((900001L, "s", "completely fresh vocabulary here"))
      .toDF("doc_id", "source", "text")
    val applied = TextAnalysis.bpeApplyFrom(spark, dir, other).collect()
    assert(applied.length === 1 && applied.head.getLong(1) === 4L,
      s"cross-corpus apply must count the doc's 4 words: ${applied.toSeq}")
    // family mismatch fails by name, not with a mis-shaped join
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.unigramApplyFrom(spark, dir, other)
    }
    assert(ex.getMessage.contains("family"),
      s"family mismatch must fail by name: ${ex.getMessage}")
  }

  /** A fully hand-controlled BPE artifact in the staged layout —
    * the spec owns the vocab, so the fertility envelope is exact
    * arithmetic: "alpha" segments to 2 pieces, "beta" to 1, anything
    * else is OOV and falls back to char pieces. */
  private def handTokenizer(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-handtok").toString
    Seq(("alpha", 1L, Seq("al", "pha")), ("beta", 1L, Seq("beta")))
      .toDF("term", "cnt", "syms")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/pieces")
    Seq(("bpe", "hand", "bpe:hand", 6))
      .toDF("family", "corpus_stamp", "params", "max_piece_len")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    dir
  }

  test("tokenizer profile + fertility gate: hand envelope exact, drifted batch flags, missing evidence never flags") {
    import graft.operators.TextAnalysis
    val dir = handTokenizer()
    // envelope by hand: doc 1 "alpha beta alpha" -> 5 pieces / 3 words
    // = 1.666667 ppt; doc 2 "beta beta" -> 1.0 ppt
    val train = Seq((1L, "alpha beta alpha"), (2L, "beta beta"))
      .toDF("doc_id", "text")
    val profile = TextAnalysis.tokenizerProfileOf(spark, dir, train)
      .localCheckpoint(true)
    val p = profile.head()
    assert(p.getLong(2) === 2L)
    assert(math.abs(p.getDouble(0) - (1.666667 + 1.0) / 2) < 1e-5,
      s"ref_fertility off: $p")
    assert(math.abs(p.getDouble(1) - (1.666667 - 1.0) / 2) < 1e-5,
      s"ref_fertility_std off: $p")
    // in-envelope batch: ppt 1.0, |1.0 - 1.333| <= 3 sigma -> sails
    val ok = TextAnalysis.fertilityGate(spark, dir,
      Seq((11L, "beta beta beta")).toDF("doc_id", "text"), profile)
      .collect()
    assert(ok.length === 1 && !ok.head.getBoolean(5),
      s"in-envelope batch flagged: ${ok.toSeq}")
    assert(math.abs(ok.head.getDouble(4) - 1.0) < 1e-6,
      s"batch_fertility off: ${ok.toSeq}")
    // OOV-heavy batch: "gamma" is unseen -> 5 char pieces, ppt 5.0,
    // |5.0 - 1.333| = 3.667 > 3 * 0.333 -> drift
    val bad = TextAnalysis.fertilityGate(spark, dir,
      Seq((21L, "gamma gamma")).toDF("doc_id", "text"), profile)
      .collect()
    assert(bad.length === 1 && bad.head.getBoolean(5),
      s"OOV-heavy batch not flagged: ${bad.toSeq}")
    assert(bad.head.getLong(2) === 10L, s"char fallback: ${bad.toSeq}")
    // missing evidence never flags: an empty batch has no rows to
    // flag, and an all-NULL-text batch carries NULL ppt (count 0)
    assert(TextAnalysis.fertilityGate(spark, dir,
      train.limit(0), profile).collect().isEmpty)
    val nulls = TextAnalysis.fertilityGate(spark, dir,
      Seq((31L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      profile).collect()
    assert(nulls.length === 1 && !nulls.head.getBoolean(5),
      s"null-text batch should flag nothing: ${nulls.toSeq}")
    // an empty profile frame fails by name, not NoSuchElement
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.fertilityGate(spark, dir, train, profile.limit(0))
    }
    assert(ex.getMessage.contains("profile frame is empty"),
      ex.getMessage)
    // family routing: an unknown family in meta fails by name
    Seq(("wordpiece", "hand", "x", 6))
      .toDF("family", "corpus_stamp", "params", "max_piece_len")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val fx = intercept[IllegalArgumentException] {
      TextAnalysis.tokenizerProfileOf(spark, dir, train)
    }
    assert(fx.getMessage.contains("family"), fx.getMessage)
    // family-generic for real: the SAME monitor through a staged
    // UNIGRAM artifact (meta routes the apply), plus the served BPE
    // driver entry — both one-row envelopes
    val udir = java.nio.file.Files
      .createTempDirectory("graft-unitok-spec").toString
    TextAnalysis.writeTokenizer(spark, sf, udir, "unigram")
    val uni = TextAnalysis.tokenizerProfileOf(spark, udir,
      Seq((1L, "alpha beta"), (2L, "gamma delta epsilon"))
        .toDF("doc_id", "text"))
    assert(uni.count() === 1 && uni.head().getLong(2) === 2L)
    assert(TextAnalysis.tokenizerProfile(spark, sf).count() === 1)
  }

  test("fertility gate stream: in-envelope batch sails, OOV batch flags, twin matches the batch gate") {
    import graft.operators.TextAnalysis
    val dir = handTokenizer()
    val train = Seq((1L, "alpha beta alpha"), (2L, "beta beta"))
      .toDF("doc_id", "text")
    val profile = TextAnalysis.tokenizerProfileOf(spark, dir, train)
      .localCheckpoint(true)
    val input = new org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](230, spark, None)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double, Boolean)]
    val q = TextAnalysis.fertilityGateStream(
        input.toDS().toDF("doc_id", "text"), dir, profile) { (b, _) =>
        got ++= b.collect().map(r =>
          (r.getLong(0), r.getLong(2), r.getDouble(4), r.getBoolean(5)))
      }.start()
    try {
      input.addData((11L, "beta beta beta"))
      q.processAllAvailable()
      input.addData((21L, "gamma gamma"))
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSeq === Seq((11L, 3L, 1.0, false),
      (21L, 10L, 5.0, true)), s"stream gate: $got")
    // twin parity: the batch gate on the same slices agrees row-wise
    val batch = Seq((11L, "beta beta beta"), (21L, "gamma gamma"))
      .map { case (id, txt) =>
        val r = TextAnalysis.fertilityGate(spark, dir,
          Seq((id, txt)).toDF("doc_id", "text"), profile).head()
        (r.getLong(0), r.getLong(2), r.getDouble(4), r.getBoolean(5))
      }
    assert(got.toSeq === batch, s"batch/stream twin parity: $batch")
  }

  test("code score: code flagged, prose not, keyword-in-word immune, empty text NULL") {
    val python =
      "def main(args):\n  import sys\n  x = compute(args[0]);\n" +
        "  if x > 0:\n    return x\n  return 0\n"
    val cish =
      "static void run(struct ctx *c) {\n  const int n = c->n;\n" +
        "  printf(\"%d\", n);\n  return;\n}\n"
    val prose =
      "The classic importance of classification in modern lambda " +
        "calculus defies a functional definition, but the debate " +
        "continues peacefully across decades of careful scholarship."
    val docs = Seq((1L, python), (2L, cish), (3L, prose), (4L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.textCodeScoreOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(4),
        if (r.isNullAt(7)) None else Some(r.getDouble(7)),
        if (r.isNullAt(8)) None else Some(r.getBoolean(8)))).toMap
    assert(out(1L)._3 === Some(true), s"python not flagged: ${out(1L)}")
    assert(out(2L)._3 === Some(true), s"c not flagged: ${out(2L)}")
    assert(out(3L)._3 === Some(false), s"prose flagged: ${out(3L)}")
    // keyword INSIDE words must not count: classic/importance/
    // classification/lambda-as-noun — the prose doc still hits the
    // standalone 'lambda', so its count is exactly 1
    assert(out(3L)._1 === 1L, s"prose keyword count: ${out(3L)}")
    assert(out(4L)._2 === None && out(4L)._3 === None,
      s"empty doc must score NULL: ${out(4L)}")
    // the by-source ledger prices the same flags
    val drv = TextAnalysis.codeBySource(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"n_code > n_docs: $r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"share: $r")
    }
  }

  test("html extract: script/style never leak, chrome lines drop, body survives with entities decoded, line audit counts") {
    val html =
      """<html><head><title>My Page</title><script type="text/js">var secret = 42;</script><style>.x { color: red }</style></head>
        |<body><nav>Home | About</nav>
        |<h1>Header</h1>
        |<p>The quick brown fox jumps over the lazy dog &amp; friends.</p>
        |<p>Second paragraph with &lt;tags&gt; and &quot;quotes&quot; runs long enough here.</p>
        |<ul><li>Buy</li><li>Sell</li></ul>
        |<footer>Copyright 2026 Corp</footer></body></html>""".stripMargin
    val out = TextAnalysis.htmlExtractOf(
      Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html").head()
    val extracted = out.getAs[String]("extracted")
    // script/style CONTENT must vanish whole, not just the tags
    assert(!extracted.contains("secret") && !extracted.contains("color"),
      s"script/style leaked: $extracted")
    // chrome: nav crumbs, headers, list buttons, footer — all short
    // unpunctuated lines — drop
    Seq("Home", "Header", "Buy", "Sell", "Copyright").foreach(c =>
      assert(!extracted.contains(c), s"chrome '$c' kept: $extracted"))
    // the two body paragraphs survive, entities decoded
    assert(extracted.contains(
      "The quick brown fox jumps over the lazy dog & friends."),
      s"body lost: $extracted")
    assert(extracted.contains("<tags>") && extracted.contains("\"quotes\""),
      s"entities not decoded: $extracted")
    assert(out.getAs[Long]("n_lines_kept") === 2L, s"line audit: $out")
    // a chrome-only page extracts to EMPTY (the downstream gates see
    // nothing — a crawl of pure navigation yields no training text)
    val chromeOnly = TextAnalysis.htmlExtractOf(
      Seq((2L, "<html><body><nav>Home | About | Login</nav></body></html>"))
        .toDF("doc_id", "html"), "doc_id", "html").head()
    assert(chromeOnly.getAs[String]("extracted") === "" &&
      chromeOnly.getAs[Long]("n_lines_kept") === 0L, s"$chromeOnly")
    // driver entry: the template wrap recovers the corpus body for
    // every doc long enough to clear the chrome filter
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val drv = TextAnalysis.htmlExtract(spark, sf).collect()
    assert(drv.length === docs.size)
    drv.foreach { r =>
      val body = docs(r.getLong(0)).trim.replaceAll("[ \t\r\f]+", " ")
      val toks = "[a-z0-9]+".r.findAllIn(body.toLowerCase).size
      if (toks > 4 && !body.contains("\n"))
        assert(r.getAs[String]("extracted") === body,
          s"body not recovered for doc ${r.getLong(0)}")
    }
  }

  test("html extract robust: clean pages byte-match E42, lists/tables flatten, broken markup quarantines with reasons") {
    def robust(id: Long, html: String) = TextAnalysis.htmlExtractRobustOf(
      Seq((id, html)).toDF("doc_id", "html"), "doc_id", "html").head()
    // 1. a well-formed, core-entity, list-free page extracts
    //    BYTE-IDENTICALLY to the base extractor and stays clean
    val clean = "<html><head><script>var s = 1;</script></head><body>" +
      "<nav>Home | About</nav><p>The quick brown fox jumps over the " +
      "lazy dog &amp; friends again today.</p>" +
      "<footer>Copyright Corp</footer></body></html>"
    val base = TextAnalysis.htmlExtractOf(
      Seq((1L, clean)).toDF("doc_id", "html"), "doc_id", "html").head()
    val rb = robust(1L, clean)
    assert(rb.getAs[String]("extracted") === base.getAs[String]("extracted"),
      s"robust drifted from E42 on a clean page:\n${rb}\n${base}")
    assert(!rb.getAs[Boolean]("quarantine") &&
      rb.isNullAt(rb.fieldIndex("quarantine_reason")), s"clean page flagged: $rb")
    // 2. lists flatten to bullets, table cells to pipe-joined lines
    val structured = "<body><ul><li>alpha beta gamma delta epsilon." +
      "</li><li>zeta eta theta iota kappa.</li></ul>" +
      "<table><tr><td>one two</td><td>three four</td>" +
      "<td>five six seven.</td></tr></table></body>"
    val st = robust(2L, structured)
    val lines = st.getAs[String]("extracted").split("\n").toSeq
    assert(lines.exists(_.startsWith("- alpha beta gamma")),
      s"li not bulleted: $lines")
    assert(lines.exists(l => l.contains("one two |") &&
      l.contains("| five six seven.")), s"cells not pipe-joined: $lines")
    assert(!st.getAs[Boolean]("quarantine"), s"structure flagged: $st")
    // 3. quarantine detectors, each with its reason, extraction still
    //    shipped best-effort
    val unclosed = robust(3L,
      "<body><p>good prose sentence stays right here.</p><script>var leak = 9;")
    assert(unclosed.getAs[Boolean]("quarantine") &&
      unclosed.getAs[String]("quarantine_reason") === "unclosed_block",
      s"$unclosed")
    assert(unclosed.getAs[String]("extracted")
      .contains("good prose sentence"), s"best-effort lost: $unclosed")
    val unknown = robust(4L,
      "<body><p>price is &euro;42 in the shop catalog today.</p></body>")
    assert(unknown.getAs[Boolean]("quarantine") &&
      unknown.getAs[String]("quarantine_reason") === "unknown_entity",
      s"$unknown")
    val truncated = robust(5L,
      "<body><p>hello world this page ends mid tag.</p><div class=")
    assert(truncated.getAs[Boolean]("quarantine") &&
      truncated.getAs[String]("quarantine_reason") === "stray_markup",
      s"$truncated")
    // a decoded &lt;div&gt; literal must NOT false-flag stray markup
    val decodedLt = robust(6L,
      "<body><p>use the &lt;div&gt; element for layout blocks here.</p></body>")
    assert(!decodedLt.getAs[Boolean]("quarantine"), s"$decodedLt")
    assert(decodedLt.getAs[String]("extracted").contains("<div>"),
      s"entity decode lost: $decodedLt")
    // 4. extended entity table renders ASCII
    val ent = robust(7L,
      "<body><p>alpha &ndash; beta &hellip; gamma &copy; delta corp.</p></body>")
    assert(ent.getAs[String]("extracted")
      .contains("alpha - beta ... gamma (c) delta corp."), s"$ent")
    // 5. the driver wrap stays clean-page-equal to E42 wherever E42
    //    extracted (quarantine flags ride alongside, never change text)
    val e42 = TextAnalysis.htmlExtract(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("extracted")).toMap
    TextAnalysis.htmlExtractRobust(spark, sf).collect().foreach { r =>
      assert(r.getAs[String]("extracted") === e42(r.getLong(0)),
        s"driver robust extraction drifted for doc ${r.getLong(0)}")
    }
  }

  test("html extract report: per-source yield matches the per-doc frame exactly") {
    val perDoc = TextAnalysis.htmlExtract(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getAs[String]("extracted").length.toLong)).toMap
    val srcOf = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rep = TextAnalysis.htmlExtractReport(spark, sf).collect()
    assert(rep.map(_.getString(0)).toSet === srcOf.values.toSet)
    rep.foreach { r =>
      val ids = srcOf.filter(_._2 == r.getString(0)).keys.toSeq
      assert(r.getLong(1) === ids.size.toLong, s"n_docs: $r")
      assert(r.getLong(2) === ids.map(perDoc(_)._1).sum, s"lines_raw: $r")
      assert(r.getLong(3) === ids.map(perDoc(_)._2).sum, s"lines_kept: $r")
      assert(r.getLong(5) === ids.map(perDoc(_)._3).sum, s"chars_out: $r")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, s"share: $r")
    }
  }

  test("lang classifier vs heuristic: per-language ledger matches an independent recomputation") {
    val rep = TextAnalysis.langClassifierVsHeuristic(spark, sf).collect()
    // one row per corpus language — the inventory is data-derived
    val corpusLangs = graft.Tables.documents(spark, sf)
      .select($"lang").distinct().collect().map(_.getString(0)).toSet
    assert(rep.map(_.getString(0)).toSet === corpusLangs,
      s"ledger langs != corpus inventory")
    // recompute both accuracies from the driver frames it composes
    val cls = TextAnalysis.langClassifier(spark, sf).collect()
      .filter(_.getString(4) != "train")
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val heur = TextAnalysis.textLangId(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rep.foreach { r =>
      val lang = r.getString(0)
      val ids = cls.filter(_._2._1 == lang).keys.toSeq
      assert(r.getLong(1) === ids.size.toLong, s"n_heldout: $r")
      val accT = ids.count(i => cls(i)._2 == lang).toDouble / ids.size
      val accH = ids.count(i => heur(i) == lang).toDouble / ids.size
      assert(r.getDouble(2) === math.rint(accT * 1e6) / 1e6,
        s"acc_trained drifted: $r vs $accT")
      assert(r.getDouble(3) === math.rint(accH * 1e6) / 1e6,
        s"acc_heuristic drifted: $r vs $accH")
      assert(math.abs(r.getDouble(4) -
        (r.getDouble(2) - r.getDouble(3))) < 1e-5, s"lift: $r")
    }
  }
}
