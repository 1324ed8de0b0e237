package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.TopK

/** Property-based checks: the custom operator and sketch kernels hold
  * their contracts on arbitrary generated data, not just fixtures.
  * Cases come from ScalaCheck generators driven by FIXED seeds so runs
  * are deterministic (no scalatestplus bridge in the offline deps).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val rowsGen: Gen[List[(Long, Long, Double)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(0L, 4L)
      id <- Gen.choose(0L, 1000L)
      score <- Gen.choose(-100, 100).map(_ / 7.0)
    } yield (key, id, score))
  } yield rows

  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 12)
    // small vocabulary + short docs force duplicated runs to appear
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 60)
      toks <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("property: bloom decontamination equals exact decontamination on arbitrary corpora") {
    // zero false negatives + exact confirm ⇒ the bloom path is a pure
    // execution-strategy change; any divergence is a bug, not a trade
    for (seed <- 1L to 6L) {
      val all = sample(docsGen, seed * 31L).toDF("doc_id", "text")
      val docs = all.filter($"doc_id" % 3 =!= 0)
      val bench = all.filter($"doc_id" % 3 === 0)
      val exact = graft.operators.Curation
        .decontaminate(docs, bench, n = 5)
        .collect().map(_.getLong(0)).toSet
      val bloom = graft.operators.Curation
        .decontaminateBloom(docs, bench, n = 5, fpp = 0.01)
        .collect().map(_.getLong(0)).toSet
      assert(bloom === exact, s"bloom path diverged at seed=$seed")
    }
  }

  test("property: classifier serve matches the batch scorer on arbitrary corpora") {
    for (seed <- 1L to 6L) {
      val docs = sample(docsGen, seed * 17L).toDF("doc_id", "text")
        .withColumn("source", lit("s"))
      val labels = docs.select($"doc_id", ($"doc_id" % 2 === 0).as("is_pos"))
      val model = graft.operators.Curation
        .qualityClassifierModel(docs, labels, nBuckets = 64)
      val batch = graft.operators.Curation
        .qualityClassifierOf(docs, labels, nBuckets = 64)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val served = graft.operators.Curation
        .classifierServe(docs, model)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      batch.foreach { case (id, z) =>
        assert(math.abs(served(id) - z) <= 1e-6,
          s"doc $id served ${served(id)} vs batch $z seed=$seed")
      }
    }
  }

  test("property: substring ranges disjoint+ordered, scrub accounts every token") {
    for (seed <- 1L to 6L) {
      val docs = sample(docsGen, seed).toDF("doc_id", "text")
      val l = 5
      // the SAME tokenizer the operators use — an inlined regex copy
      // would drift if the shared definition ever changes
      val nTokens = docs
        .select($"doc_id",
          size(graft.operators.TextAnalysis.tokens("text")).cast("long"))
        .as[(Long, Long)].collect().toMap
      val ranges = graft.operators.Dedup.substrDupRanges(docs, "doc_id", "text", l)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      ranges.groupBy(_._1).foreach { case (id, rs) =>
        val sorted = rs.sortBy(_._2)
        // maximal disjoint covered intervals: ordered, length >= l,
        // inside the doc, with a real gap between consecutive ranges
        sorted.foreach { case (_, s, e) =>
          assert(s >= 0 && e <= nTokens(id) && e - s >= l, s"bad range ($s,$e) seed=$seed")
        }
        sorted.sliding(2).foreach {
          case Array((_, _, e1), (_, s2, _)) =>
            assert(s2 > e1, s"ranges overlap or abut: $sorted seed=$seed")
          case _ =>
        }
      }
      // C19 <-> C19b accounting: kept tokens == total minus covered
      val covered = ranges.groupBy(_._1).view
        .mapValues(_.map(r => r._3 - r._2).sum).toMap
      graft.operators.Dedup.substrScrub(docs, "doc_id", "text", l)
        .collect().foreach { r =>
          val id = r.getLong(0)
          assert(r.getLong(1) === nTokens(id) - covered.getOrElse(id, 0L),
            s"scrub kept-count drifted from ranges for doc $id seed=$seed")
        }
    }
  }

  test("property: TopKPerKey equals sort-based top-k on arbitrary data") {
    for (seed <- 1L to 6L) {
      val data = sample(rowsGen, seed).distinctBy(r => (r._1, r._2))
      val k = (seed % 5 + 1).toInt
      val df = data.toDF("key", "id", "score")
      val got = TopK.perKey(df, Seq("key"), Seq($"score".desc, $"id".asc), k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = data.groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(k)
      }.map(r => (r._1, r._2)).toSet
      assert(got === want, s"seed=$seed k=$k")
    }
  }

  test("property: boundedSelfPairs equals naive block self-join on arbitrary data") {
    import graft.operators.Scale
    for (seed <- 1L to 5L) {
      val data = sample(rowsGen, seed).distinctBy(_._2) // unique ids
      val target = (seed % 4 + 1).toInt * 4
      val df = data.toDF("key", "id", "score")
      val got = Scale
        .boundedSelfPairs(df, Seq("key"), "id", Seq("score"), targetSubRows = target)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      val want = (for {
        a <- data; b <- data
        if a._1 == b._1 && a._2 < b._2
      } yield (a._2, b._2, a._3, b._3)).toSet
      assert(got === want, s"seed=$seed target=$target")
    }
  }

  private val vocab = Vector("red", "blue", "green", "fast", "slow", "data",
    "spark", "query", "join", "scan", "merge", "sort", "hash", "table", "row")
  private val docGen: Gen[String] = Gen.choose(30, 80).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))

  test("property: verified minhash jaccard equals exact shingle-set jaccard") {
    for (seed <- 1L to 5L) {
      val (a, b) = (sample(docGen, seed), sample(docGen, seed + 100))
      val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      val est = graft.operators.Dedup
        .minhashPairs(docs, "doc_id", "text", threshold = 0.0)
        .collect().headOption.map(_.getDouble(2))
      val sh = docs
        .withColumn("toks", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .select(graft.functions.TextFunctions.shingleHashes($"toks", 5).as("sh"))
        .as[Seq[Long]].collect()
      val exact = sh(0).toSet.intersect(sh(1).toSet).size.toDouble /
        sh(0).toSet.union(sh(1).toSet).size
      est match {
        // minhashPairs verifies candidates with EXACT jaccard on the
        // same shingle sets, so any surfaced pair must match exactly
        case Some(j) => assert(math.abs(j - math.rint(exact * 1e6) / 1e6) < 1e-9,
          s"seed=$seed est=$j exact=$exact")
        case None => // LSH may legitimately miss low-jaccard pairs
          assert(exact < 0.9, s"seed=$seed high-jaccard pair ($exact) missed by LSH")
      }
    }
  }

  test("property: split assignment is a pure function of id — any subset agrees") {
    import graft.operators.Curation
    val idsGen: Gen[List[Long]] =
      Gen.choose(5, 80).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 100000L)))
    for (seed <- 1L to 6L) {
      val ids = sample(idsGen, seed).distinct
      val docs = ids.map(id => (id, s"src${id % 3}", id * 7))
        .toDF("doc_id", "source", "n_chars")
      val full = Curation.splitAssign(docs).collect()
        .map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(full.keySet === ids.toSet)
      // ANY subset (a later ingest batch, a re-partition, a filter)
      // assigns identically — the ingest-stability contract
      val subset = Curation.splitAssign(
        docs.filter($"doc_id" % 3 === seed % 3).repartition(3)).collect()
        .map(r => r.getLong(0) -> r.getString(3))
      subset.foreach { case (id, s) =>
        assert(full(id) === s, s"seed=$seed doc $id reassigned")
      }
    }
  }

  test("property: oversample conserves docs, bounds copies, and is subset-stable") {
    import graft.operators.Curation
    val corpusGen: Gen[List[(Long, String)]] =
      Gen.choose(10, 120).flatMap(n => Gen.listOfN(n, for {
        id <- Gen.choose(0L, 100000L)
        src <- Gen.oneOf("a", "b", "c", "d")
      } yield (id, src)))
    for (seed <- 1L to 6L) {
      val rows = sample(corpusGen, seed).distinctBy(_._1)
      val docs = rows.toDF("doc_id", "source")
      val out = Curation.oversampleRare(docs, maxFactor = 4.0).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // every doc survives with 1..ceil(maxFactor) copies, indices 1..n
      assert(out.map(_._1).distinct.length === rows.length,
        s"seed=$seed dropped docs")
      out.groupBy(_._1).foreach { case (id, copies) =>
        val n = copies.head._3
        assert(n >= 1L && n <= 4L, s"seed=$seed doc $id copies $n")
        assert(copies.map(_._4).sorted.sameElements(1L to n))
      }
      // a doc's copy count is a pure function of (its id, its source's
      // factor): re-running on a reshuffled frame agrees exactly
      val again = Curation.oversampleRare(docs.repartition(5)).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      out.foreach { case (id, _, n, _) =>
        assert(again(id) === n, s"seed=$seed doc $id copies unstable")
      }
    }
  }

  test("property: regression moments are order-blind — forecast invariant under shuffles") {
    import graft.operators.Monitoring
    val base = 1704067200000L
    val seriesGen: Gen[List[(Long, Int, Double)]] =
      Gen.choose(6, 60).flatMap(n => Gen.listOfN(n, for {
        dev <- Gen.choose(1L, 3L)
        hour <- Gen.choose(0, 500)
        v <- Gen.choose(0, 40000).map(_ / 100.0)
      } yield (dev, hour, v)))
    for (seed <- 1L to 5L) {
      val rows = sample(seriesGen, seed)
        .distinctBy(t => (t._1, t._2))
        .map { case (d, h, v) =>
          (d, new java.sql.Timestamp(base + h * 3600000L), "purchase", v) }
      val df = rows.toDF("user_id", "ts", "event_type", "value")
      val a = Monitoring.capacityForecastOf(df).collect().map(_.toSeq)
      val b = Monitoring.capacityForecastOf(
        df.repartition(7).sortWithinPartitions($"value")).collect()
        .map(_.toSeq)
      assert(a.toSeq === b.toSeq, s"seed=$seed forecast depends on row order")
    }
  }

  test("property: gap fill never fabricates beyond the cap, observed rows survive") {
    import graft.operators.Monitoring
    val evGen: Gen[List[(Long, Long, Double)]] = for {
      n <- Gen.choose(2, 50)
      rows <- Gen.listOfN(n, for {
        dev <- Gen.choose(1L, 3L)
        h <- Gen.choose(0L, 40L)
        v <- Gen.choose(1, 100).map(_.toDouble)
      } yield (dev, h, v))
    } yield rows
    val hourUs = 3600000000L
    for (seed <- 1L to 6L) {
      val rows = sample(evGen, seed)
      val events = rows
        .map { case (d, h, v) => (d, new java.sql.Timestamp(h * hourUs / 1000), v) }
        .toDF("user_id", "ts", "value")
      val out = Monitoring.gapFillOf(events, maxFillHours = 3, horizonHours = 30)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1) / hourUs, r.getDouble(2), r.getBoolean(3)))
      // horizon start, as the operator derives it
      val cut = rows.map(_._2).max - 29
      val byDev = out.groupBy(_._1)
      byDev.foreach { case (dev, series) =>
        val hours = series.map(_._2).sorted
        assert(hours.distinct.length === hours.length, s"seed=$seed dup hour")
        // every filled hour's LOCF source is a real INPUT observation
        // at most maxFill-1 hours back (possibly just before the cut)
        val inputHours = rows.filter(_._1 == dev).map(_._2).toSet
        series.filter(_._4).foreach { case (_, h, _, _) =>
          assert((1L to 2L).exists(d => inputHours.contains(h - d)),
            s"seed=$seed fill at $h has no nearby observation")
          assert(h >= cut, s"seed=$seed fill before the horizon")
        }
        // runs of consecutive fills never exceed cap - 1
        val fills = series.filter(_._4).map(_._2).sorted
        var run = 1
        fills.sliding(2).foreach { w =>
          if (w.length == 2 && w(1) == w(0) + 1) {
            run += 1; assert(run <= 2, s"seed=$seed fill run too long")
          } else run = 1
        }
      }
    }
  }

  test("property: distributed BPE equals a driver-side reference replay") {
    // short words over a 2-char alphabet force overlapping runs and
    // count ties — the two places a merge implementation goes wrong
    val corpusGen: Gen[List[String]] = Gen.choose(5, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 6).flatMap(l =>
        Gen.listOfN(l, Gen.oneOf("a", "b")).map(_.mkString))))
    def replay(words: Map[String, Long], nMerges: Int)
        : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
      var syms = words.keys.map(w => w -> w.map(_.toString).toVector).toMap
      val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
      var stop = false
      while (out.length < nMerges && !stop) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for ((w, ss) <- syms; i <- 0 until ss.length - 1)
          counts((ss(i), ss(i + 1))) =
            counts.getOrElse((ss(i), ss(i + 1)), 0L) + words(w)
        if (counts.isEmpty) stop = true
        else {
          val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
          out += ((a, b, c))
          syms = syms.map { case (w, ss) =>
            val nb = Vector.newBuilder[String]
            var i = 0
            while (i < ss.length) {
              if (i + 1 < ss.length && ss(i) == a && ss(i + 1) == b) {
                nb += (a + b); i += 2
              } else { nb += ss(i); i += 1 }
            }
            w -> nb.result()
          }
        }
      }
      (out.toSeq, syms)
    }
    for (seed <- 1L to 5L) {
      val words = sample(corpusGen, seed)
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val (got, vocab) = graft.operators.TextAnalysis.bpeLearnOf(docs, 5)
      val wc = words.groupBy(identity).map { case (w, v) => w -> v.size.toLong }
      val (want, wantSyms) = replay(wc, 5)
      assert(got == want, s"seed $seed: merges $got != reference $want")
      val gotSyms = vocab.select(col("term"), col("syms")).collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
      assert(gotSyms == wantSyms, s"seed $seed: symbolization diverged")
      gotSyms.foreach { case (t, ss) =>
        assert(ss.mkString == t, s"seed $seed: reconstruction broke on $t")
      }
      // apply: pieces = Σ tf·|syms| against the reference symbolization
      val applied = graft.operators.TextAnalysis.bpeApplyOf(docs, vocab)
        .collect().map(r => (r.getLong(1), r.getLong(2))).head
      val wantPieces = wc.map { case (w, n) => n * wantSyms(w).length }.sum
      assert(applied == ((wc.values.sum, wantPieces)), s"seed $seed: $applied")
    }
  }

  test("property: repetition fracs equal a driver-side reference on arbitrary docs") {
    import graft.operators.Curation
    def reference(text: String): Map[Int, (Option[Long], Long)] = {
      val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector
      (2 to 5).map { n =>
        val grams = toks.sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toVector
        val byGram = grams.groupBy(identity).view
          .mapValues(_.size.toLong).toMap
        def mass(g: String, c: Long) = c * (g.length - (n - 1))
        val top = byGram.collect { case (g, c) if c > 1 => mass(g, c) }
          .reduceOption(_ max _)
        val dup = byGram.collect { case (g, c) if c > 1 => mass(g, c) }.sum
        n -> ((top, dup))
      }.toMap
    }
    for (seed <- 1L to 6L) {
      val text = sample(docGen, seed + 300)
      val tokChars = "[a-z0-9]+".r.findAllIn(text.toLowerCase)
        .map(_.length).sum.toLong
      val ref = reference(text)
      val row = Curation.repetitionRules(Seq((1L, text)).toDF("doc_id", "text"))
        .collect().head
      def want(o: Option[Long]): Option[Double] =
        o.map(m => math.rint(m.toDouble / tokChars * 1e6) / 1e6)
      Seq((1, 2), (2, 3), (3, 4)).foreach { case (idx, n) =>
        val got = if (row.isNullAt(idx)) None else Some(row.getDouble(idx))
        assert(got === want(ref(n)._1), s"seed $seed top$n: $got vs ref")
      }
      val gotDup = if (row.isNullAt(4)) None else Some(row.getDouble(4))
      val wantDup = // NULL only when the doc has no 5-grams at all
        if ("[a-z0-9]+".r.findAllIn(text.toLowerCase).size < 5) None
        else Some(math.rint(ref(5)._2.toDouble / tokChars * 1e6) / 1e6)
      assert(gotDup === wantDup, s"seed $seed dup5: $gotDup vs $wantDup")
    }
  }

  test("property: curriculum stages are balanced and monotone in difficulty") {
    import graft.operators.Curation
    val lensGen: Gen[List[Int]] =
      Gen.choose(4, 60).flatMap(n => Gen.listOfN(n, Gen.choose(0, 40)))
    for (seed <- 1L to 5L) {
      val lens = sample(lensGen, seed + 500)
      val docs = lens.zipWithIndex.map { case (len, i) =>
        (i.toLong, Seq.fill(len)("w").mkString(" ")) }.toDF("doc_id", "text")
      val stages = 4
      val out = Curation.curriculumOrder(docs, stages).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
      val n = out.length
      // stage sizes differ by at most 1 (equal rank cuts)
      val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
      assert(sizes.values.max - sizes.values.min <= 1,
        s"seed $seed: unbalanced stages $sizes")
      // stage is monotone in rank, difficulty monotone in rank
      out.sortBy(_._2).sliding(2).foreach {
        case Array((t1, _, s1), (t2, _, s2)) =>
          assert(s1 <= s2 && t1 <= t2, s"seed $seed: monotonicity broke")
        case _ =>
      }
      assert(out.map(_._2).sorted.sameElements(1L to n))
    }
  }

  // markup soup: tags (closed, unclosed, stray), entities (known and
  // unknown), raw angle brackets, plain words — the space a crawl
  // actually draws from, not just the planted template
  private val markupGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 10)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 30)
      parts <- Gen.listOfN(len, Gen.oneOf(
        "<div>", "</div>", "<p>", "</p>", "<li>", "</li>", "<td>x</td>",
        "<script>", "</script>", "<script>var a=1;</script>",
        "<style>.x{}</style>", "&amp;", "&lt;", "&zzz;", "&#9999999;",
        "words flow here", "quick brown fox", "<", ">", "<br", "<!--",
        "sentence ends now.", "<b>bold</b>"))
    } yield parts.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("property: robust extractor is total — every page extracts or quarantines, never throws") {
    import graft.operators.TextAnalysis
    for (seed <- 1L to 8L) {
      val docs = sample(markupGen, seed * 13L).toDF("doc_id", "text")
      val rows = TextAnalysis.htmlExtractRobustCols(docs, "text")
        .select($"doc_id", $"extracted", $"quarantine",
          $"quarantine_reason").collect()
      assert(rows.length === docs.count())
      rows.foreach { r =>
        assert(!r.isNullAt(1), s"seed $seed: null extraction")
        assert(!r.isNullAt(2), s"seed $seed: null quarantine flag")
        // the reason column IS the flag: populated iff quarantined
        assert(r.isNullAt(3) === !r.getBoolean(2),
          s"seed $seed doc ${r.getLong(0)}: reason/flag disagree")
      }
    }
  }

  test("property: mm pack lands every doc once, respects capacity, bounds pad, flags truncation") {
    import graft.operators.Multimodal
    val (seqLen, g) = (1024, 64)
    for (seed <- 1L to 6L) {
      val docs = sample(docsGen, seed * 23L).toDF("doc_id", "text")
      val packed = Multimodal.mmPackInterleavedOf(docs, seqLen, g).collect()
      // every doc exactly once
      assert(packed.map(_.getLong(0)).sorted
        .sameElements(docs.collect().map(_.getLong(0)).sorted))
      packed.foreach { r =>
        val (n, bucket, slot, pad, trunc) = (r.getLong(4), r.getLong(5),
          r.getLong(7), r.getLong(8), r.getBoolean(9))
        assert(slot < seqLen / bucket, s"seed $seed: slot past capacity")
        // pad < g except the empty-cost doc, which still occupies one
        // bucket-g slot (pad exactly g — the kernel's stated edge)
        assert(pad >= 0 && (pad < g || (pad == g && n == 0)),
          s"seed $seed: pad $pad outside bounds (n=$n, g=$g)")
        assert(trunc === (n > seqLen), s"seed $seed: truncation flag wrong")
      }
      // the report's accounting closes on arbitrary corpora too
      Multimodal.mmPackReportOf(docs, seqLen, g).collect().foreach { r =>
        assert(r.getLong(5) + r.getLong(6) + r.getLong(8) + r.getLong(9)
          === seqLen.toLong, s"seed $seed: accounting leak")
      }
    }
  }

  test("property: adaptive ladder never exceeds the fixed packer's cost, truncates only past the coarsest rung") {
    import graft.operators.Multimodal
    val (seqLen, g) = (1024, 64)
    for (seed <- 1L to 6L) {
      val docs = sample(docsGen, seed * 29L).toDF("doc_id", "text")
      val fixed = Multimodal.mmPackInterleavedOf(docs, seqLen, g)
        .select($"doc_id", $"n_tokens").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      Multimodal.mmPackAdaptiveOf(docs, seqLen, g).collect().foreach { r =>
        val (id, nImg, cost, patch, down, trunc) = (r.getLong(0),
          r.getLong(2), r.getLong(6), r.getInt(4), r.getBoolean(5),
          r.getBoolean(11))
        assert(cost <= fixed(id),
          s"seed $seed doc $id: ladder raised the cost")
        assert(down === (patch > 16 && nImg > 0))
        // downsampling exists to fit: a doc that still flags truncated
        // must be over the window even at the coarsest rung's cost
        if (trunc) assert(patch === 64 && cost > seqLen)
        // and a doc that fits at full resolution was left untouched
        if (fixed(id) <= seqLen)
          assert(patch === 16 && cost === fixed(id),
            s"seed $seed doc $id: needless downsample")
      }
    }
  }
}
