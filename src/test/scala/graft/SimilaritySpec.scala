package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine kernel: self-similarity is 1, anti-parallel is -1") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(-1.0f, 0.0f, 0.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    ).toDF("a", "b")
    val got = df.select(VectorFunctions.cosineSim($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1) + 1.0) < 1e-12)
    assert(math.abs(got(2)) < 1e-12)
  }

  test("cosine kernel: dimension mismatch yields null, not a truncated score") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
    ).toDF("a", "b")
    val got = df.select(VectorFunctions.cosineSim($"a", $"b").as("c"),
      VectorFunctions.dotProduct($"a", $"b").as("d")).collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1))
    assert(!got(1).isNullAt(0) && math.abs(got(1).getDouble(0) - 1.0) < 1e-12)
  }

  test("cosine kernel: interpreted eval and codegen agree") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val pairs = e.select($"vec_id".as("i"), $"embedding".as("a"))
      .crossJoin(e.select($"vec_id".as("j"), $"embedding".as("b")))
      .filter($"i" < $"j")
    val viaKernel = pairs
      .select(VectorFunctions.cosineSim($"a", $"b").as("c")).as[Double].collect()
    // reference: SQL aggregate-lambda formulation (non-codegen path)
    val viaSql = pairs.select(expr(
      """aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (s, v) -> s + v) /
        |(sqrt(aggregate(a, 0D, (s, v) -> s + cast(v as double) * cast(v as double))) *
        | sqrt(aggregate(b, 0D, (s, v) -> s + cast(v as double) * cast(v as double))))""".stripMargin)
      .as("c")).as[Double].collect()
    viaKernel.zip(viaSql).foreach { case (k, s) => assert(math.abs(k - s) < 1e-12) }
  }

  test("brute-force topk: ranks 1..k per query, cosine non-increasing") {
    val rows = Similarity.annBruteTopK(spark, sf).collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).sameElements(1 to sorted.length))
      val cs = sorted.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
  }

  test("LSH: planted duplicate vector is always found (same bucket by construction)") {
    val e = Tables.embeddings(spark, sf)
    // duplicate vec 0 as vec 9999 → identical embedding → identical bucket
    val dup = e.filter($"vec_id" === 0)
      .select(lit(9999L).as("vec_id"), $"embedding", $"label")
    val aug = e.unionByName(dup)
    val bucketed = aug.withColumn("bucket",
      VectorFunctions.hyperplaneLsh($"embedding", 6))
    val b0 = bucketed.filter($"vec_id" === 0).select($"bucket").as[Long].head()
    val b9 = bucketed.filter($"vec_id" === 9999).select($"bucket").as[Long].head()
    assert(b0 === b9)
  }

  test("LSH ANN: every neighbor shares the query's bucket and beats random recall") {
    val lsh = Similarity.annLsh(spark, sf).collect()
    assert(lsh.nonEmpty)
    val brute = Similarity.annBruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lshPairs = lsh.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (lshPairs & brute).size.toDouble / brute.size
    // random 5-of-500 recall ≈ 1%; bucketed search must do much better than 0
    assert(recall > 0.0, s"LSH recall was zero")
  }

  test("IVF ANN: neighbors share the query's cell, recall beats zero") {
    val ivf = Similarity.annIvf(spark, sf).collect()
    assert(ivf.nonEmpty)
    // all neighbors in the query's cell by construction of the join
    val brute = Similarity.annBruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pairs = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert((pairs & brute).nonEmpty, "IVF recall was zero")
    // deterministic across runs (fixed seed)
    val again = Similarity.annIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again === pairs)
  }

  test("persisted IVF index: partition-pruned probe matches in-memory IVF") {
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.writeIvfIndex(spark, sf, idxDir)
    val indexed = Similarity.annIvfIndexed(spark, idxDir)
    // same trainer, same seed → identical search results
    val want = Similarity.annIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = indexed.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
    // and the probe scan actually prunes cell= partitions at planning time
    val vectors = spark.read.parquet(s"$idxDir/vectors")
    val probed = vectors.filter($"cell".isin(0, 1))
    probed.collect()
    val p = probed.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("cell"),
      s"no partition pruning on cell:\n$p")

    // index lifecycle: append a batch (twice — the dynamic partition
    // overwrite must make the retry a no-op), then probe again
    val baseCount = vectors.count()
    // the appended vector clones query 0's embedding under a fresh id:
    // it lands in that query's own (first-probed) cell with cos = 1.0,
    // so it must surface as the query's new top-1 neighbor
    val q0 = Tables.embeddings(spark, sf).filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0)
    val batch = Seq((9999991L, q0)).toDF("vec_id", "embedding")
    Similarity.appendToIvfIndex(spark, batch, idxDir, "w1")
    Similarity.appendToIvfIndex(spark, batch, idxDir, "w1")
    val after = spark.read.parquet(s"$idxDir/vectors")
    assert(after.count() === baseCount + 1,
      "retried append duplicated vectors")
    val res = Similarity.annIvfIndexed(spark, idxDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(res.map(t => (t._1, t._3)).distinct.length === res.length,
      "duplicate (query, neighbor) candidates after append")
    val top0 = res.filter(_._1 == 0L).minBy(_._2)
    assert(top0._3 === 9999991L && top0._4 === 1.0,
      s"appended twin not query 0's top-1: $top0")
    // compaction: batches fold into batch=base in a fresh dir with the
    // SAME centroids; search results are identical
    val cdir = java.nio.file.Files.createTempDirectory("graft-ivf-compact")
      .toString + "/idx"
    Similarity.compactIvfIndex(spark, idxDir, cdir)
    val resC = Similarity.annIvfIndexed(spark, cdir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(resC.toSeq === res.toSeq, "compacted IVF index search diverged")
    val batchDirs = new java.io.File(s"$cdir/vectors").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(batchDirs === Set("batch=base"),
      s"IVF compaction left multiple batch partitions: $batchDirs")
  }

  test("ann_recall report: one row per method, recall at or above the family's spec bounds") {
    val rows = Similarity.annRecall(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows.keySet === Set("int8", "ivf", "ivf_int8_rerank",
      "ivf_int8_serve", "ivf_pq", "lsh", "pq"))
    val expected = rows.values.head._2
    assert(expected > 0L)
    rows.foreach { case (m, (hits, exp, recall)) =>
      assert(exp === expected, s"per-method denominators diverged: $rows")
      assert(recall >= 0.0 && recall <= 1.0 && hits <= exp, s"$m out of range: $rows")
    }
    // the bounds the family's own specs pin — the report must agree
    assert(rows("lsh")._3 > 0.0, s"lsh recall zero: $rows")
    assert(rows("ivf")._3 > 0.0, s"ivf recall zero: $rows")
    assert(rows("int8")._3 >= 0.6, s"int8 recall below spec bound: $rows")
    assert(rows("ivf_int8_serve")._3 >= 0.6,
      s"int8 serving snapshot recall below spec bound: $rows")
    assert(rows("pq")._3 > 0.0, s"pq recall zero: $rows")
    assert(rows("ivf_pq")._3 >= 0.1,
      s"PQ serving snapshot recall below the family bound: $rows")
    // exact refine can only fix order within the surfaced pool — the
    // two-stage tier must not fall below the quantized tier it refines
    assert(rows("ivf_int8_rerank")._3 >= rows("ivf_int8_serve")._3 - 0.2,
      s"rerank far below the tier it refines: $rows")
    assert(rows("ivf_int8_rerank")._3 >= 0.6,
      s"rerank recall below the family bound: $rows")
  }

  test("embed_project: JL envelope holds, exact 2x homogeneity, seeds diverge, deterministic") {
    val d = 64; val m = 32
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 20).map(i =>
      (i.toLong, Array.fill(d)(rnd.nextGaussian().toFloat)))
    val e = vecs.toDF("vec_id", "embedding")
    val proj = Similarity.embedProjectOf(e, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(proj.size === 20 && proj.values.forall(_.length === m))
    // JL: pairwise squared distances preserved within the √(2/m)
    // envelope — per-pair inside a generous 3σ band, mean tight
    def sq(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- vecs.indices; j <- vecs.indices if i < j
    } yield {
      val exact = sq(vecs(i)._2.map(_.toDouble), vecs(j)._2.map(_.toDouble))
      sq(proj(vecs(i)._1), proj(vecs(j)._1)) / exact
    }
    assert(ratios.forall(r => r > 0.2 && r < 2.5),
      s"pairwise distortion out of band: ${ratios.min} .. ${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"mean distortion $mean")
    // linearity: doubling the input doubles the projection EXACTLY
    // (scaling by a power of two is lossless in IEEE)
    val doubled = Similarity.embedProjectOf(
        vecs.map { case (id, v) => (id, v.map(_ * 2f)) }
          .toDF("vec_id", "embedding"), m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    vecs.foreach { case (id, _) =>
      assert(doubled(id).toSeq === proj(id).map(_ * 2).toSeq,
        s"homogeneity broken for vec $id")
    }
    // a different seed is a different matrix
    val other = Similarity.embedProjectOf(e, m, seed = 99L).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(vecs.exists { case (id, _) =>
      other(id).toSeq != proj(id).toSeq }, "seed ignored")
    // deterministic replay, and the driver entry projects the corpus
    val again = Similarity.embedProjectOf(e, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    vecs.foreach { case (id, _) =>
      assert(again(id).toSeq === proj(id).toSeq, "not deterministic") }
    val drv = Similarity.embedProject(spark, sf).collect()
    assert(drv.nonEmpty && drv.forall(_.getSeq[Double](1).length === 16))
    // the driver DUMP shape (the A58 rule): flat round-6 per-component
    // columns the harness can sort/hash — values are the projection's,
    // rounded, in component order
    val dump = Similarity.embedProjectDump(spark, sf)
    assert(dump.columns.toSeq ===
      ("vec_id" +: (0 until 16).map(j => s"p$j")), dump.columns.toSeq)
    val flat = dump.collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getDouble).toSeq).toMap
    drv.foreach { r =>
      val want = r.getSeq[Double](1)
        .map(v => math.rint(v * 1e6) / 1e6).toSeq
      assert(flat(r.getLong(0)) === want,
        s"dump diverges from the projection for vec ${r.getLong(0)}")
    }
  }

  test("knn graph refined: hop-2 candidates recover the missed edge, deterministic, recall never below raw") {
    // planted geometry: A's true 2nd neighbor C is absent from A's raw
    // edge list but reachable through B (A→B, B→C) — one NN-descent
    // round must recover it; D is a far decoy that must NOT displace
    // anything
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),          // A
      (2L, Array(0.9f, 0.1f, 0.0f)),          // B — A's raw neighbor
      (3L, Array(0.95f, 0.05f, 0.0f)),        // C — true neighbor, missed
      (4L, Array(0.0f, 0.0f, 1.0f))           // D — far decoy
    ).toDF("vec_id", "embedding")
    val rawEdges = Seq((1L, 2L), (2L, 3L), (3L, 2L), (4L, 1L))
      .toDF("vec_id", "neighbor_id")
    val refined = Similarity.refineRound(e, rawEdges, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val aEdges = refined.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(aEdges.toSeq === Seq(3L, 2L),
      s"A must gain C via the B hop and rank it first: ${refined.toSeq}")
    // determinism: bit-identical replay
    val again = Similarity.refineRound(e, rawEdges, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.toSeq === refined.toSeq, "refine round not deterministic")
    // corpus report: refined recall never below the raw IVF row (the
    // candidate set is a superset and both are exact-scored)
    val rep = Similarity.knnGraphRecall(spark, sf).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toMap
    assert(rep.keySet === Set("ivf_graph", "ivf_graph_refined"), rep)
    assert(rep("ivf_graph_refined") >= rep("ivf_graph") - 1e-9,
      s"refinement lost recall: $rep")
  }

  test("sampled graph recall audit: frac=1 matches the full report, sub-sample bounded and deterministic") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1.0 else r.getDouble(5))).toSeq
    val full = Similarity.knnGraphRecall(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val all = rows(Similarity.knnGraphRecallSampled(spark, sf, frac = 1.0))
    // frac=1: every vertex sampled — same edges, same counts
    assert(all.map(t => (t._1, t._3, t._4, t._5)) === full,
      s"frac=1 must reproduce the full report: $all vs $full")
    val part = rows(Similarity.knnGraphRecallSampled(spark, sf,
      frac = 0.3))
    assert(part.map(_._1) === Seq("ivf_graph", "ivf_graph_refined"))
    part.foreach { t =>
      assert(t._2 > 0 && t._2 < all.head._2,
        s"sample size out of range: $t")
      assert(t._5 <= math.min(t._3, t._4), s"matched out of bounds: $t")
    }
    assert(rows(Similarity.knnGraphRecallSampled(spark, sf, frac = 0.3))
      === part, "sampled audit not deterministic")
  }

  test("ann_projected: two-stage recall beats chance, refine scores are the exact kernel, wider m buys recall") {
    def sets(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => r.getLong(0) -> r.getLong(2)).groupBy(_._1)
      .map { case (q, ps) => q -> ps.map(_._2).toSet }
    val brute = Similarity.annBruteTopK(spark, sf).collect()
    val bruteSets = sets(brute)
    val bruteCos = brute.map(r =>
      (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val p16 = Similarity.annProjected(spark, sf, m = 16).collect()
    val p16Sets = sets(p16)
    assert(p16Sets.keySet === bruteSets.keySet, "query sets differ")
    def recall(got: Map[Long, Set[Long]]) = {
      val (h, b) = bruteSets.toSeq.map { case (q, s) =>
        (s.intersect(got(q)).size, s.size) }
        .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      h.toDouble / b
    }
    val r16 = recall(p16Sets)
    // chance for 10-of-100 is 0.1; the projection must do far better
    assert(r16 >= 0.4, f"m=16 recall $r16%.3f < 0.4")
    // surfaced pairs carry the EXACT float kernel's score — stage two
    // is the same arithmetic as D1, so overlapping pairs agree to the
    // rounded bit
    p16.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      bruteCos.get(key).foreach(c => assert(c === r.getDouble(3),
        s"refine score drifted from the exact kernel at $key"))
    }
    // more projected dims can only sharpen the candidate stage
    val r48 = recall(sets(Similarity.annProjected(spark, sf, m = 48)
      .collect()))
    assert(r48 >= r16 - 0.05, f"m=48 recall $r48%.3f far below m=16 $r16%.3f")
    // deterministic; degenerate cand fails by name
    val again = Similarity.annProjected(spark, sf, m = 16).collect()
    assert(p16.map(_.toString).toSeq === again.map(_.toString).toSeq)
    val ex = intercept[IllegalArgumentException] {
      Similarity.annProjected(spark, sf, k = 10, cand = 5)
    }
    assert(ex.getMessage.contains("cand"), ex.getMessage)
  }

  test("ann_projected_ivf: staged scale path recalls the brute baseline, exact refine scores, deterministic") {
    def sets(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => r.getLong(0) -> r.getLong(2)).groupBy(_._1)
      .map { case (q, ps) => q -> ps.map(_._2).toSet }
    val brute = Similarity.annBruteTopK(spark, sf).collect()
    val bruteSets = sets(brute)
    val bruteCos = brute.map(r =>
      (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf = Similarity.annProjectedIvf(spark, sf, m = 32, nProbe = 8)
      .collect()
    val ivfSets = sets(ivf)
    assert(ivfSets.keySet === bruteSets.keySet, "query sets differ")
    val (h, b) = bruteSets.toSeq.map { case (q, s) =>
      (s.intersect(ivfSets(q)).size, s.size) }
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    val recall = h.toDouble / b
    info(f"projected-IVF recall@10: $recall%.3f")
    // probe-geometry floor: 8 probes of ~√n cells over a 32-dim
    // projection on the near-uniform fixture; chance is ~0.1
    assert(recall >= 0.4, f"projected-IVF recall $recall%.3f < 0.4")
    // surfaced pairs carry the exact float kernel's score
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      bruteCos.get(key).foreach(c => assert(c === r.getDouble(3),
        s"refine score drifted at $key"))
    }
    val again = Similarity.annProjectedIvf(spark, sf, m = 32, nProbe = 8)
      .collect()
    assert(ivf.map(_.toString).toSeq === again.map(_.toString).toSeq,
      "projected-IVF serve not deterministic")
  }

  test("ivf ingest stream: corpus dups drop, fresh keep-first, index moves, replay converges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-ingest").toString
    // nCells=1: every probe scans the whole (tiny) index, so admission
    // decisions are exact and the spec is fully hand-checkable
    val base = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    Similarity.writeIvfIndexOf(base, dir, nCells = 1)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    val input = MemoryStream[(Long, Array[Float])](232, spark, None)
    val q = Similarity.ivfIngestStream(
        input.toDS().toDF("vec_id", "embedding"), dir) { (adm, id) =>
        got += ((id, adm.collect().map(_.getLong(0)).toSet))
      }.start()
    try {
      // 10 duplicates corpus vec 1 → drops; 11 is novel → admits;
      // 12 duplicates FRESH 11 → keep-first drops the larger id
      input.addData((10L, Array(1f, 0f, 0f, 0f)),
        (11L, Array(0f, 0f, 0f, 1f)), (12L, Array(0f, 0f, 0f, 1f)))
      q.processAllAvailable()
      // 20 duplicates 11 — which ingest just appended: the index MOVED
      // and the gate reads it; 21 sits at cos .5 from everyone → admits
      input.addData((20L, Array(0f, 0f, 0f, 1f)),
        (21L, Array(0.5f, 0.5f, 0.5f, 0.5f)))
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSeq === Seq((0L, Set(11L)), (1L, Set(21L))),
      s"admission log: $got")
    val staged = spark.read.parquet(s"$dir/vectors")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(staged === Set(1L, 2L, 3L, 11L, 21L),
      s"index is not base + admitted: $staged")
    // the replay fence: re-running a delivered trigger converges — the
    // same admitted set, no duplicate rows in the index
    var replayAdmitted = Set.empty[Long]
    Similarity.ivfIngestBatch(
      Seq((10L, Array(1f, 0f, 0f, 0f)), (11L, Array(0f, 0f, 0f, 1f)),
        (12L, Array(0f, 0f, 0f, 1f))).toDF("vec_id", "embedding"),
      0L, dir,
      sink = (adm, _) =>
        replayAdmitted = adm.collect().map(_.getLong(0)).toSet)
    assert(replayAdmitted === Set(11L), s"replay drifted: $replayAdmitted")
    val after = spark.read.parquet(s"$dir/vectors")
      .groupBy().count().head().getLong(0)
    assert(after === 5L, s"replay duplicated index rows: $after")
  }

  test("ann_recall_curve: probes buy recall monotonically per tier, serve floors hold, deterministic") {
    val rows = Similarity.annRecallCurve(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val byTier = rows.groupBy(_._1)
    assert(byTier.keySet === Set("int8", "pq"), s"tiers: ${rows.toSeq}")
    val expected = rows.head._4
    rows.foreach { case (t, p, hits, exp, recall) =>
      assert(exp === expected, s"denominators diverged: ${rows.toSeq}")
      assert(recall >= 0.0 && recall <= 1.0 && hits <= exp,
        s"$t probe $p out of range: ${rows.toSeq}")
    }
    byTier.foreach { case (t, tr) =>
      assert(tr.map(_._2).toSeq === Seq(1, 2, 4, 8, 16),
        s"$t curve rows out of order: ${tr.toSeq}")
      // more probes can only grow the candidate pool; quantization
      // score noise allows only marginal local dips — wider for PQ,
      // whose ADC mis-ranking can displace true pairs the larger
      // candidate pool surfaces (the D8 report's pq-vs-int8 gap)
      val dipTol = if (t == "pq") 0.06 else 0.02
      tr.sliding(2).foreach { case Array(a, b) =>
        assert(b._5 >= a._5 - dipTol,
          s"$t recall fell from nProbe ${a._2} to ${b._2}: ${tr.toSeq}")
      }
      assert(tr.last._5 >= tr.head._5 - (if (t == "pq") 0.06 else 0.0),
        s"$t curve top below its start: ${tr.toSeq}")
    }
    // the 8-probe points are D8's production rows — same floors apply
    assert(byTier("int8").find(_._2 == 8).get._5 >= 0.6,
      s"int8 8-probe recall below the serve floor: ${rows.toSeq}")
    assert(byTier("pq").find(_._2 == 8).get._5 >= 0.1,
      s"pq 8-probe recall below the family bound: ${rows.toSeq}")
    // a deterministic audit replays identically
    val again = Similarity.annRecallCurve(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.toSeq === again.toSeq, "curve not deterministic")
    // degenerate probe/tier lists fail by name
    val ex = intercept[IllegalArgumentException] {
      Similarity.annRecallCurve(spark, sf, probes = Seq(0))
    }
    assert(ex.getMessage.contains("probes"), ex.getMessage)
    val tx = intercept[IllegalArgumentException] {
      Similarity.annRecallCurve(spark, sf, tiers = Seq("float16"))
    }
    assert(tx.getMessage.contains("tiers"), tx.getMessage)
  }

  test("PQ ANN: codebook-exact vectors score cos 1.0, recall beats random, deterministic") {
    // a vector that IS a concatenation of its own codebook centroids
    // reconstructs exactly — pin that the encoder picks those codes by
    // scoring a corpus vector against itself through the ADC tables:
    // self pairs are excluded by the query filter, so probe the
    // deterministic top-k + recall properties instead
    val out = Similarity.annPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // per query: exactly k ranked rows, ranks 1..k, cos non-increasing
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length).toSeq)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4
        case _ => true
      }, s"query $q not ranked by score")
    }
    // deterministic across invocations (seeded KMeans + cached codes)
    val again = Similarity.annPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(again.toSeq === out.toSeq, "PQ result not deterministic")
    // recall vs the exact baseline must beat random guessing (5 of 500
    // ≈ 1%) by an order of magnitude
    val brute = Similarity.annBruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pqPairs = out.map(t => (t._1, t._3)).toSet
    val recall = (pqPairs & brute).size.toDouble / brute.size
    assert(recall >= 0.1, s"PQ recall $recall below sanity bound")
  }

  test("PQ serving snapshot: cell-pruned ADC probe, recall bound, delete-after-snapshot") {
    val root = java.nio.file.Files.createTempDirectory("graft-pq-serve").toString
    Similarity.writeIvfIndex(spark, sf, s"$root/float")
    Similarity.compactIvfIndexPq(spark, s"$root/float", s"$root/pq")
    // snapshot schema: m codes per vector, NO float embedding column —
    // probing it brute-force is structurally impossible, which is the
    // point (the serving path has no pair-ceiling require anywhere)
    val vecs = spark.read.parquet(s"$root/pq/vectors")
    assert(vecs.columns.toSet === Set("vec_id", "code", "batch", "cell"),
      s"snapshot columns: ${vecs.columns.toSeq}")
    assert(vecs.select(size($"code")).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(Similarity.PqM))
    assert(spark.read.parquet(s"$root/pq/codebooks").count() ===
      Similarity.PqM.toLong * Similarity.PqK)
    val queries = Tables.embeddings(spark, sf).filter($"vec_id" < 10L)
      .select($"vec_id".as("query_id"), $"embedding")
    val got = Similarity.annPqServe(queries, s"$root/pq", k = 11, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // recall@10 vs the exact baseline, self pairs dropped (external
    // serving mode keeps them) — must clear the PQ family bound
    val brute = Similarity.annBruteTopK(spark, sf, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val servePairs = got.filter(t => t._1 != t._2).toSet
    val recall = (servePairs & brute).size.toDouble / brute.size
    assert(recall >= 0.1, s"ivf_pq recall $recall below the family bound")
    // deterministic across invocations (stored codebooks + stored codes)
    val again = Similarity.annPqServe(queries, s"$root/pq", k = 11, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(again.toSeq === got.toSeq, "PQ serve not deterministic")
    // post-snapshot tombstones are honored: the clearest signal is a
    // query's own self pair (ADC scores it near 1.0 — top of its list)
    Similarity.deleteFromIvfIndex(Seq(0L).toDF("vec_id"), "vec_id",
      s"$root/pq", "t1")
    val afterDel = Similarity.annPqServe(queries, s"$root/pq",
      k = 11, nProbe = 8).collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(!afterDel.exists(_._2 == 0L),
      "tombstoned vector still served from the PQ snapshot")
    assert(afterDel.exists(_._1 == 0L),
      "deleting a corpus vector must not silence it as an external query")
  }

  test("PQ codebooks and IVF centroids are partition-layout invariant (exact sample cut)") {
    // maxTrain below the corpus size so the cut is BINDING — the round-7
    // verdict's nondeterminism window was exactly this regime (limit
    // without ordering takes arrival order)
    val e = Tables.embeddings(spark, sf)
    def flat(b: Array[Array[Array[Double]]]): Seq[Seq[Seq[Double]]] =
      b.map(_.map(_.toSeq).toSeq).toSeq
    val b1 = Similarity.trainPqCodebooks(e.repartition(3), 8, 16, 300)
    val b2 = Similarity.trainPqCodebooks(e.repartition(11), 8, 16, 300)
    assert(flat(b1) === flat(b2),
      "PQ codebooks depend on the corpus partition layout")
  }

  test("IVF index deletion: tombstoned vector vanishes; compaction folds it in") {
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ivf-del").toString
    Similarity.writeIvfIndex(spark, sf, idxDir)
    // plant a deletion target: clone query 0's embedding under a fresh
    // id — it becomes the query's top-1 (cos = 1.0), the clearest
    // possible signal if deletion leaks
    val q0 = Tables.embeddings(spark, sf).filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0)
    Similarity.appendToIvfIndex(spark,
      Seq((9999991L, q0)).toDF("vec_id", "embedding"), idxDir, "w1")
    val top0 = Similarity.annIvfIndexed(spark, idxDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .filter(_._1 == 0L).minBy(_._2)
    assert(top0._3 === 9999991L, s"appended twin not top-1: $top0")
    // takedown: the vector must vanish from every later probe
    Similarity.deleteFromIvfIndex(Seq(9999991L).toDF("vec_id"), "vec_id",
      idxDir, "t1")
    val got = Similarity.annIvfIndexed(spark, idxDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(!got.exists(_._3 == 9999991L), "tombstoned vector still a candidate")
    // delete exactly undoes the append: results match the plain corpus
    val want = Similarity.annIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want, "post-delete probe diverged from the corpus search")
    // compaction makes it physical: no tombstone table, no rows, same
    // results from the compacted index
    val cdir = java.nio.file.Files.createTempDirectory("graft-ivf-del-c")
      .toString + "/idx"
    Similarity.compactIvfIndex(spark, idxDir, cdir)
    assert(!new java.io.File(s"$cdir/tombstones").exists,
      "compaction copied the tombstone table instead of folding it in")
    assert(spark.read.parquet(s"$cdir/vectors")
      .filter($"vec_id" === 9999991L).count() === 0L,
      "tombstoned vector survived compaction")
    val gotC = Similarity.annIvfIndexed(spark, cdir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(gotC === want)
  }

  test("int8 ANN: self-similarity ~1, small per-pair error, high recall vs exact") {
    import graft.functions.VectorFunctions
    val e = Tables.embeddings(spark, sf).limit(50)
    // per-pair error bound: quantized cosine within 5% of exact, and a
    // vector against itself scores ~1 (dequantized norms make the
    // numerator and denominator consistent)
    val scored = e.select($"vec_id", $"embedding",
        VectorFunctions.quantize8($"embedding").as("q8"))
      .crossJoin(e.select($"vec_id".as("id2"), $"embedding".as("e2"),
        VectorFunctions.quantize8($"embedding").as("p8")).limit(10))
      .select($"vec_id", $"id2",
        VectorFunctions.cosineSim($"embedding", $"e2").as("exact"),
        VectorFunctions.int8CosineSim($"q8", $"p8").as("approx"))
      .collect()
    scored.foreach { r =>
      val (ex, ap) = (r.getDouble(2), r.getDouble(3))
      assert(math.abs(ex - ap) < 0.05,
        s"pair (${r.getLong(0)}, ${r.getLong(1)}): exact $ex vs int8 $ap")
      if (r.getLong(0) == r.getLong(1))
        assert(math.abs(ap - 1.0) < 0.01, s"self-sim drifted: $ap")
    }
    // recall@k of the full quantized search vs the exact baseline
    val exact = Similarity.annBruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val int8 = Similarity.annBruteInt8(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (int8 & exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"int8 recall only $recall")
    // deterministic across runs
    val again = Similarity.annBruteInt8(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again === int8)
  }

  test("knn join: neighbors stay within the query's label block") {
    val labels = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    Similarity.knnJoin(spark, sf).collect().foreach { r =>
      assert(labels(r.getLong(0)) === labels(r.getLong(2)))
    }
  }

  test("vec norms: positive, self_dot = norm^2") {
    Similarity.vecNorms(spark, sf).collect().foreach { r =>
      val (norm, selfDot) = (r.getDouble(3), r.getDouble(4))
      assert(norm > 0)
      assert(math.abs(selfDot - norm * norm) < 1e-3) // both rounded to 6dp
    }
  }

  test("multimodal frame features feed the generic ANN end to end") {
    import graft.operators.Multimodal
    // media 1 and 3 share a payload; every query frame from media 1
    // must retrieve its byte-identical twin frame in media 3 at cos 1.0
    // — the decode → embed → search composition the F4 bridge exists for
    val p = "the same long payload used by two distinct media items".getBytes("UTF-8")
    val other = "completely different bytes for the third media entry!!".getBytes("UTF-8")
    val media = Seq((1L, p), (2L, other), (3L, p.clone())).toDS()
    val feats = Multimodal.frameFeatures(media, frameSize = 16, stride = 1, dim = 8).toDF()
    def keyed(df: org.apache.spark.sql.DataFrame, as: String) =
      df.select(($"media_id" * 1000 + $"frame_idx").as(as), $"feature".as("embedding"))
    val corpus = keyed(feats.filter($"media_id" =!= 1L), "vec_id")
    val queries = keyed(feats.filter($"media_id" === 1L), "query_id")
    val top1 = Similarity.bruteTopKFrames(corpus, queries, k = 1, excludeSelf = false)
      .collect()
    assert(top1.nonEmpty)
    top1.foreach { r =>
      assert(r.getLong(2) === 3000 + (r.getLong(0) - 1000),
        s"twin frame is not the top hit: $r")
      assert(r.getDouble(3) === 1.0)
    }
  }

  test("int8 serving snapshot: quantized schema, recall vs float probe, deletes honored") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-int8").toString
    val (src, dst) = (s"$tmp/float", s"$tmp/int8")
    Similarity.writeIvfIndex(spark, sf, src)
    Similarity.compactIvfIndexInt8(spark, src, dst)
    // the snapshot really is re-encoded: q8 struct, no float embedding
    val names = spark.read.parquet(s"$dst/vectors").schema.fieldNames
    assert(names.contains("q8") && !names.contains("embedding"))
    // same query panel as the float probe (ids < QueryIdBound)
    val queries = Tables.embeddings(spark, sf)
      .filter($"vec_id" < Similarity.QueryIdBound)
      .select($"vec_id".as("query_id"), $"embedding")
    val serve = Similarity.annIvfServe(queries, dst, k = 6, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // external-query mode keeps the self pair — it must score ~1.0 at rank 1
    queries.collect().map(_.getLong(0)).foreach { qid =>
      val self = serve.filter(t => t._1 == qid && t._2 == qid)
      assert(self.nonEmpty && self.head._3 > 0.99, s"query $qid self pair: $self")
    }
    // int8 scoring agrees with the float index probe on most neighbors
    // (same centroids → same probed cells; only the scoring is lossy)
    val floatTop = Similarity.annIvfIndexed(spark, src, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val serveNoSelf = serve.filter(t => t._1 != t._2)
      .groupBy(_._1).toSeq.flatMap { case (_, xs) =>
        xs.sortBy(t => (-t._3, t._2)).take(5).map(t => (t._1, t._2)).toSeq
      }.toSet
    val recall = (serveNoSelf & floatTop).size.toDouble / floatTop.size
    assert(recall >= 0.6, s"int8 recall vs float probe: $recall")
    // a takedown staged against the snapshot is honored at serve time
    val victim = serveNoSelf.head._2
    Similarity.deleteFromIvfIndex(Seq(victim).toDF("vec_id"), "vec_id",
      dst, "takedown-1")
    val after = Similarity.annIvfServe(queries, dst, k = 6, nProbe = 2)
      .collect().map(_.getLong(2))
    assert(!after.contains(victim), s"deleted $victim still served")
  }

  test("annStream: per-batch results equal the batch search, stateless across triggers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = Tables.embeddings(spark, sf).limit(80)
      .select($"vec_id", $"embedding")
    val queryPool = Tables.embeddings(spark, sf)
      .filter($"vec_id" >= 80 && $"vec_id" < 86)
      .select($"vec_id".as("query_id"), $"embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[(Long, Seq[Float])](300, spark, None)
    val got = scala.collection.mutable.Map.empty[Long, Array[(Long, Long)]]
    val q = Similarity.annStream(
      input.toDF().toDF("query_id", "embedding"), corpus, k = 3) {
      (res, id) => got(id) = res.collect()
        .map(r => (r.getLong(0), r.getLong(2)))
    }.start()
    try {
      input.addData(queryPool.take(3).toSeq)
      q.processAllAvailable()
      input.addData(queryPool.drop(3).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.keySet === Set(0L, 1L))
    // each batch independently equals the batch-mode search over
    // exactly its own queries — nothing leaks between triggers
    def want(qs: Array[(Long, Seq[Float])]): Array[(Long, Long)] = {
      val qdf = qs.toSeq.toDF("query_id", "embedding")
      Similarity.bruteTopKFrames(corpus, qdf, k = 3, excludeSelf = false)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
    }
    assert(got(0L).sorted.toSeq === want(queryPool.take(3)).sorted.toSeq)
    assert(got(1L).sorted.toSeq === want(queryPool.drop(3)).sorted.toSeq)
  }

  test("embed cluster: planted separable groups land pure, sizes add up") {
    // three tight groups around axis-aligned centers; labels track the
    // group except one deliberate impostor in group 0
    def v(base: Array[Double], jitter: Double) =
      base.map(x => (x + jitter).toFloat).toSeq
    val c0 = Array(10.0, 0.0, 0.0); val c1 = Array(0.0, 10.0, 0.0)
    val c2 = Array(0.0, 0.0, 10.0)
    val rows = (0 until 5).map(i => (i.toLong, v(c0, i * 0.01), 0L)) ++
      Seq((5L, v(c0, 0.06), 7L)) ++ // impostor label in cluster 0
      (6 until 10).map(i => (i.toLong, v(c1, (i - 6) * 0.01), 1L)) ++
      (10 until 14).map(i => (i.toLong, v(c2, (i - 10) * 0.01), 2L))
    val e = rows.toDF("vec_id", "embedding", "label")
    val centroids = Array(c0, c1, c2)
    val out = Similarity.embedClusterOf(e, centroids).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(out.keySet === Set(0, 1, 2))
    assert(out(0) === ((6L, 0L, 5L, 5.0 / 6.0)))
    assert(out(1) === ((4L, 1L, 4L, 1.0)))
    assert(out(2) === ((4L, 2L, 4L, 1.0)))
    // partition-layout determinism: identical report bit-for-bit
    val rep = Similarity.embedClusterOf(e.repartition(7), centroids).collect()
    assert(rep.map(_.toString).toSeq ===
      Similarity.embedClusterOf(e, centroids).collect().map(_.toString).toSeq)
  }

  test("filtered ANN: predicate pure on both paths, ivf over-fetch recall >= 0.6") {
    val exact = Similarity.annFiltered(spark, sf).collect()
    assert(exact.nonEmpty)
    val evenIds = Tables.embeddings(spark, sf)
      .filter(col("label") % 2 === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    exact.foreach(r => assert(evenIds.contains(r.getLong(2)),
      s"exact path returned odd-labeled neighbor ${r.getLong(2)}"))
    val ivf = Similarity.annFilteredIvf(spark, sf).collect()
    ivf.foreach(r => assert(evenIds.contains(r.getLong(2)),
      s"ivf path returned odd-labeled neighbor ${r.getLong(2)}"))
    val want = exact.map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (want & got).size.toDouble / want.size
    assert(recall >= 0.6, s"filtered ivf recall $recall < 0.6")
  }

  test("embed-search pipeline: chunks indexed, self-retrieval nearly perfect") {
    val r = Similarity.pipelineEmbedSearch(spark, sf).collect().head
    val (nChunks, nQueries, hits, rate) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nChunks > 0 && nQueries > 0)
    assert(hits <= nQueries)
    // the panel is a FIXED cut, not corpus-proportional: at this SF
    // the auto-route must stay on the exact path and the panel must
    // be capped
    assert(r.getString(4) === "exact")
    assert(nQueries <= 128)
    // identical twin chunks (near-dup docs) can outrank self on id
    // ties; anything below this bound means the encode or key scheme
    // broke, not the corpus
    assert(rate >= 0.9, s"self-hit rate $rate")
  }

  test("embed-search pipeline: IVF serving path runs cell-pruned with bounded recall loss") {
    // the scale path the auto-route takes past the brute pair guard:
    // index built FROM the chunk frame, probe through annIvfServe.
    // A panel query IS its own vector, so its nearest centroid == its
    // assigned cell — self always sits in the top probed cell; the
    // only loss vs exact is int8 scoring letting a twin outrank.
    val r = Similarity.pipelineEmbedSearch(spark, sf,
      viaIndex = Some(true)).collect().head
    assert(r.getString(4) === "ivf")
    assert(r.getLong(1) <= 128)
    assert(r.getDouble(3) >= 0.85, s"ivf self-hit rate ${r.getDouble(3)}")
  }

  test("embed cluster: corpus report sizes sum to corpus count, purity bounded") {
    val out = Similarity.embedCluster(spark, sf, nClusters = 8).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.map(_.getLong(1)).sum === n)
    out.foreach { r =>
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) >= 0.0) // mean_dist
      assert(r.getLong(3) <= r.getLong(1))
    }
  }

  test("index health: hot cell flagged, tombstones counted dead, payload never read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-health").toString
    // 60 vectors piled near (1,0), 4 near (0,1): with 2 cells the pile
    // is a hot cell (share*2 > hotFactor=1.5) and the sparse cell cold
    val vecs = ((0L until 60L).map(i =>
      (i, Array(1f, (i % 7).toFloat / 100f))) ++
      (100L until 104L).map(i => (i, Array(0.01f, 1f))))
      .toDF("vec_id", "embedding")
    Similarity.writeIvfIndexOf(vecs, dir, nCells = 2)
    val h0 = Similarity.annIndexHealth(spark, dir, hotFactor = 1.5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(h0.length === 2)
    assert(h0.head._1 === 60L && h0.head._5, s"hot cell not flagged: ${h0.toSeq}")
    assert(!h0.last._5)
    assert(h0.forall(_._3 === 0L)) // no deletions yet
    assert(math.abs(h0.map(_._4).sum - 1.0) < 1e-9)
    // tombstone 10 of the hot cell's ids: dead count rises, live share
    // rebalances, rows stay physical until compaction
    Similarity.deleteFromIvfIndex(
      (0L until 10L).toDF("vec_id"), "vec_id", dir, "d1")
    val h1 = Similarity.annIndexHealth(spark, dir, hotFactor = 1.5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(h1.head === ((60L, 50L, 10L)), s"dead not counted: ${h1.toSeq}")
  }

  test("embed drift stream: identical mix scores zero, shifted mix flagged, baseline cells fixed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // two cells from baseline ids 0/1; ref cell mass {0: 3, 1: 1}
    val baseline = Seq(
      (0L, Array(1f, 0f), "b"), (1L, Array(0f, 1f), "b"),
      (2L, Array(0.9f, 0.1f), "b"), (3L, Array(0.95f, 0.05f), "b"))
      .toDF("vec_id", "embedding", "label")
    val input = MemoryStream[(Long, Array[Float], String)](33, spark, None)
    val got = scala.collection.mutable.Map.empty[(Long, String), Double]
    val q = Similarity.embedDriftStream(
      input.toDS().toDF("vec_id", "embedding", "label"), baseline,
      nCentroids = 2) { (report, id) =>
      report.collect().foreach(r => got((id, r.getString(0))) = r.getDouble(3))
    }.start()
    try {
      input.addData(
        // "same": cell mix {0: 3, 1: 1} — exactly the baseline mix
        (10L, Array(1f, 0f), "same"), (11L, Array(0.9f, 0.1f), "same"),
        (12L, Array(0.95f, 0.05f), "same"), (13L, Array(0f, 1f), "same"),
        // "shift": all mass in cell 1 — a new dominant content cluster
        (20L, Array(0f, 1f), "shift"), (21L, Array(0.1f, 0.9f), "shift"))
      q.processAllAvailable()
      assert(math.abs(got((0L, "same"))) < 1e-15,
        s"identical mix drifted: $got")
      assert(got((0L, "shift")) > 0.1, s"shifted mix not flagged: $got")
      // a second trigger scores against the SAME pinned baseline
      input.addData((30L, Array(1f, 0f), "same2"))
      q.processAllAvailable()
      assert(got.contains((1L, "same2")))
      assert(got((1L, "same2")) > 0.0) // all mass in cell 0 vs 3:1 ref
    } finally q.stop()
  }

  test("embed drift: bounds hold, masses conserve, deterministic") {
    val out = Similarity.embedDrift(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val n = Tables.embeddings(spark, sf).count()
    assert(out.map(_._2).sum === n, "vectors lost in the cell rollup")
    val ln2 = math.log(2.0)
    out.foreach { case (_, nv, nc, j) =>
      assert(nc >= 1 && nc <= 64 && nv >= nc)
      assert(j >= 0.0 && j <= ln2 + 1e-12, s"JSD out of range: $out")
    }
    val again = Similarity.embedDrift(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(3)))
    assert(again.toSeq === out.map(t => (t._1, t._4)).toSeq, "nondeterministic")
  }

  test("knn eval: one verdict per query, honest on chance labels, perfect on planted clusters") {
    val out = Similarity.knnEval(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getBoolean(4)))
    val panel = Tables.embeddings(spark, sf)
      .filter($"vec_id" < Similarity.QueryIdBound).count()
    assert(out.length === panel.toInt, "a query lost its verdict")
    out.foreach { case (_, t, p, votes, correct) =>
      assert(votes >= 1 && votes <= 10)
      assert(correct === (t == p))
    }
    // the driver corpus assigns labels independently of geometry, so
    // the honest verdict is chance-level accuracy — the probe's value
    // is that it SAYS so; the planted frame below proves it can also
    // say the opposite
    def v(base: Double, jitter: Double, i: Int) =
      Array.tabulate(8)(d => (base + (if (d == i % 3) jitter else 0.0)).toFloat)
    val planted = (
      (0L until 6L).map(i => (i, v(1.0, 0.05, i.toInt), 1)) ++
        (6L until 12L).map(i => (i, v(-1.0, 0.05, i.toInt), 2))
      ).toDF("vec_id", "embedding", "label")
    val pv = Similarity.knnEvalOf(planted, k = 3).collect()
      .map(r => (r.getLong(0), r.getBoolean(4)))
    // panel = vec_id < 10: queries 0-5 are label 1, 6-9 label 2 — two
    // antipodal clusters, so every majority vote lands on the truth
    assert(pv.length === 10 && pv.forall(_._2), s"planted eval: ${pv.toSeq}")
  }

  test("serve stream: per-batch results equal direct snapshot serving, stateless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("graft-serve-st").toString
    val (src, dst) = (s"$tmp/float", s"$tmp/int8")
    Similarity.writeIvfIndex(spark, sf, src)
    Similarity.compactIvfIndexInt8(spark, src, dst)
    val panel = Tables.embeddings(spark, sf)
      .filter($"vec_id" < Similarity.QueryIdBound)
      .select($"vec_id".as("query_id"), $"embedding")
    val want = Similarity.annIvfServe(panel, dst, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val qrows = panel.as[(Long, Array[Float])].collect()
    val input = MemoryStream[(Long, Array[Float])](41, spark, None)
    val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Int, Long)]]
    val q = Similarity.annServeStream(
      input.toDS().toDF("query_id", "embedding"), dst, k = 5, nProbe = 2) {
      (res, id) =>
        got(id) = res.collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    }.start()
    try {
      val (a, b) = qrows.splitAt(qrows.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      assert((got(0L) ++ got(1L)) === want,
        "streamed serving diverged from the direct snapshot probe")
      // stateless across triggers: re-sending a query reproduces its rows
      input.addData(a.toSeq); q.processAllAvailable()
      assert(got(2L) === got(0L), "snapshot serving not stateless")
    } finally q.stop()
  }

  test("radius search: threshold honored, IVF path is a subset with usable recall") {
    val exact = Similarity.annRadius(spark, sf, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(exact.nonEmpty, "sf corpus must contain 0.3-neighborhoods")
    assert(exact.forall(_._3 >= 0.3), "sub-threshold neighbor emitted")
    val exactSet = exact.map(t => (t._1, t._2)).toSet
    val ivf = Similarity.annRadiusIvf(spark, sf, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(ivf.forall(_._3 >= 0.3))
    val ivfSet = ivf.map(t => (t._1, t._2)).toSet
    // probe results never invent neighbors the exact scan lacks
    assert(ivfSet.subsetOf(exactSet),
      s"IVF radius invented pairs: ${ivfSet -- exactSet}")
    val recall = ivfSet.size.toDouble / exactSet.size
    assert(recall >= 0.5, s"radius recall $recall below the family bound")
  }

  test("lloyd refinement: planted clusters recovered from a bad init; deterministic; dead centroid kept") {
    import spark.implicits._
    // two tight planted clusters on the x axis; init is WORST-CASE:
    // both live centroids inside cluster A, a third far from everything
    val vecs = ((0 until 20).map(i => (i.toLong,
        Array.tabulate(4)(d =>
          (if (d == 0) 1.0 + 0.01 * (i % 5) else 0.001 * d).toFloat), "a")) ++
      (20 until 40).map(i => (i.toLong,
        Array.tabulate(4)(d =>
          (if (d == 0) -1.0 - 0.01 * (i % 5) else 0.001 * d).toFloat), "b")))
      .toDF("vec_id", "embedding", "label")
    val init = Array(Array(1.0, 0, 0, 0), Array(1.1, 0, 0, 0),
      Array(50.0, 50, 50, 50))
    val (c, iters) = Similarity.lloydRefine(vecs, init,
      maxIter = 10, eps = 1e-9)
    assert(iters >= 2 && iters <= 10, s"iteration count $iters")
    // the empty centroid never moves (dead-centroid rule)
    assert(c(2).sameElements(init(2)), s"dead centroid drifted: ${c(2).toSeq}")
    // the two live centroids end up one per planted cluster — the
    // recovery a single assignment pass from this init cannot produce
    val xs = Seq(c(0)(0), c(1)(0)).sorted
    assert(xs.head < -0.9 && xs.last > 0.9,
      s"clusters not recovered: centroids at $xs")
    // perfect purity under the refined centroids
    val report = Similarity.embedClusterOf(vecs, c).collect()
    report.filter(_.getLong(1) > 0).foreach { r =>
      assert(r.getDouble(4) === 1.0, s"impure cluster: $r")
    }
    // bit-identical trajectory across partition layouts (decimal sums)
    val (c2, iters2) = Similarity.lloydRefine(vecs.repartition(7), init,
      maxIter = 10, eps = 1e-9)
    assert(iters2 === iters)
    c.indices.foreach(i => assert(c(i).sameElements(c2(i)),
      s"centroid $i differs across partitionings"))
    // eps = infinity converges in one round; maxIter = 0 is the identity
    assert(Similarity.lloydRefine(vecs, init, maxIter = 10,
      eps = Double.MaxValue)._2 === 1)
    val (id0, it0) = Similarity.lloydRefine(vecs, init, maxIter = 0)
    assert(it0 === 0 && id0.indices.forall(i => id0(i).sameElements(init(i))))
    // the sf driver query runs and reports its rounds
    val out = Similarity.embedClusterLloyd(spark, sf, maxIter = 3).collect()
    assert(out.nonEmpty && out.forall(r => r.getInt(6) <= 3))
  }

  test("hybrid search: fusion surfaces the keyword-only AND embedding-only twins") {
    import spark.implicits._
    // id 0 is the query. id 1 shares its rare keywords but points the
    // OPPOSITE way in embedding space; id 2 shares nothing lexically
    // but carries the identical embedding; 3-5 are noise on both axes.
    val docs = Seq(
      (0L, "zebra quantum flux calibration manifold"),
      (1L, "zebra quantum flux calibration manifold report"),
      (2L, "completely unrelated prose about gardening and soup"),
      (3L, "noise alpha beta gamma delta epsilon"),
      (4L, "filler words keep the idf surface honest here"),
      (5L, "more filler so rare terms stay rare in this corpus"))
      .toDF("doc_id", "text")
    def v(x: Double, y: Double) = Array.tabulate(8)(i =>
      if (i == 0) x.toFloat else if (i == 1) y.toFloat else 0.0f)
    val emb = Seq(
      (0L, v(1, 0)), (1L, v(-1, 0.1)), (2L, v(1, 0)),
      (3L, v(0, 1)), (4L, v(0.1, 1)), (5L, v(-0.1, 1)))
      .toDF("vec_id", "embedding")
    val out = Similarity.annHybridOf(docs, emb, nDocs = 6, nVecs = 6,
      queryBound = 1L, k = 2, poolN = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(out.forall(_._1 == 0L))
    val byCand = out.map(t => t._3 -> t).toMap
    assert(byCand.keySet === Set(1L, 2L),
      s"fusion must surface both twins, got ${byCand.keySet}")
    // the keyword twin leads the text list but misses the vector pool
    assert(byCand(1L)._5.contains(1L) && byCand(1L)._6.isEmpty,
      s"keyword twin ranks wrong: ${byCand(1L)}")
    // the embedding twin leads the vector list but misses the text list
    assert(byCand(2L)._5.isEmpty && byCand(2L)._6.contains(1L),
      s"embedding twin ranks wrong: ${byCand(2L)}")
    // rrf is exactly the reciprocal-rank sum with absent lists as zero
    out.foreach { case (_, _, _, rrf, tr, vr) =>
      val want = tr.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        vr.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(math.abs(rrf - want) < 1e-6, s"rrf $rrf != $want")
    }
    // deterministic tie-break: equal rrf orders by candidate id
    val sf01 = Similarity.annHybrid(spark, sf).collect()
    assert(sf01.length == 10 * Similarity.HybridK)
    val ranks = sf01.map(r => (r.getLong(0), r.getLong(1)))
    assert(ranks.sameElements(ranks.sorted), "rank order broken on sf data")
  }

  test("hybrid routing: the IVF serving path fuses at driver SF with recall vs the brute fusion") {
    // force the serving leg at a size where the brute leg is exact:
    // the routed run must complete, keep the fused-output contract,
    // and overlap the exact fusion on most of its picks (the text half
    // is identical — only the vector pool degrades to approximate)
    val exact = Similarity.annHybrid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-hyb-ivf").toString
    val routed = Similarity.annHybrid(spark, sf,
      viaIndex = Some(true), indexDir = Some(dir)).collect()
    assert(routed.length == 10 * Similarity.HybridK,
      s"routed fusion lost rows: ${routed.length}")
    val ranks = routed.map(r => (r.getLong(0), r.getLong(1)))
    assert(ranks.sameElements(ranks.sorted), "routed rank order broken")
    val routedSet = routed.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (routedSet & exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"routed fusion recall $recall vs brute fusion")
    // a second run against the SAME indexDir reuses the int8 snapshot
    // (the production built-once-at-ingest case) and agrees with itself
    val again = Similarity.annHybrid(spark, sf,
      viaIndex = Some(true), indexDir = Some(dir)).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again === routedSet, "index reuse changed the fusion")
    // auto-routing below the ceiling stays on the exact leg
    val auto = Similarity.annHybrid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(auto === exact)
  }

  test("two-stage rerank: pool order is exactly the brute kernel's, recall within the family bound") {
    val exact = Similarity.annBruteTopK(spark, sf, k = 10).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3)))
    val exactMap = exact.toMap
    val out = Similarity.annRerank(spark, sf, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    // ranks dense per query, order = (cos desc, id)
    out.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to sorted.length.toLong),
        s"ranks not dense for query $q")
      assert(sorted.sameElements(
        rs.sortBy(t => (-t._4, t._3)).zipWithIndex
          .map { case (t, i) => (t._1, i + 1L, t._3, t._4) }),
        s"rerank order not (cos desc, id) for query $q")
    }
    // stage 2 is EXACT: every surfaced pair carries the brute cosine
    out.foreach { case (q, _, n, cos) =>
      exactMap.get((q, n)).foreach(want =>
        assert(cos === want, s"rerank cos $cos != brute $want for ($q,$n)"))
    }
    // probe-recall contract vs the exact top-k
    val recall = (out.map(t => (t._1, t._3)).toSet &
      exact.map(_._1).toSet).size.toDouble / exact.length
    assert(recall >= 0.6, s"rerank recall $recall below the family bound")
  }

  test("hybrid serve stream: streamed postings+int8 probe equals the batch routed fusion row-for-row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("graft-hyb-serve").toString
    val (vdir, pdir) = (s"$tmp/vec", s"$tmp/text")
    // the batch routed fusion builds the int8 snapshot at vdir and IS
    // the expected answer; the postings index is the new D27 artifact
    val want = Similarity.annHybrid(spark, sf,
      viaIndex = Some(true), indexDir = Some(vdir)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5))).toSet
    Similarity.writePostingsIndex(Tables.documents(spark, sf),
      nDocs = Tables.documents(spark, sf).count(), pdir, nBuckets = 16)
    val qrows = Tables.documents(spark, sf)
      .filter($"doc_id" < Similarity.QueryIdBound)
      .select($"doc_id".as("query_id"), $"text")
      .join(Tables.embeddings(spark, sf)
        .select($"vec_id".as("query_id"), $"embedding"), Seq("query_id"))
      .as[(Long, String, Array[Float])].collect()
    val input = MemoryStream[(Long, String, Array[Float])](43, spark, None)
    val got = scala.collection.mutable.Map
      .empty[Long, Set[(Long, Long, Long, Double, Long, Long)]]
    val q = Similarity.hybridServeStream(
      input.toDS().toDF("query_id", "text", "embedding"),
      pdir, s"$vdir/int8", excludeSelf = true) { (res, id) =>
      got(id) = res.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) -1L else r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5))).toSet
    }.start()
    try {
      // two triggers: the tier is stateless per query batch
      val (a, b) = qrows.splitAt(qrows.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      assert((got(0L) ++ got(1L)) === want,
        "streamed hybrid fusion diverged from the batch routed fusion")
    } finally q.stop()
  }

  test("MMR routing: the IVF-pooled re-rank matches the brute pool's picks on most queries") {
    val exact = Similarity.annMmr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val routed = Similarity.annMmr(spark, sf, viaIndex = Some(true))
      .collect()
    assert(routed.length == 10 * Similarity.HybridK)
    val routedSet = routed.map(r => (r.getLong(0), r.getLong(2))).toSet
    val overlap = (routedSet & exact).size.toDouble / exact.size
    assert(overlap >= 0.6, s"IVF-pooled MMR overlap $overlap vs brute pool")
  }

  test("MMR re-rank: coverage beats redundancy, lambda=1 is the plain cosine order") {
    import spark.implicits._
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    // query 0 at (1,0,0). Candidates 1-3: near-identical paraphrases
    // hugging the query; candidate 4: moderately relevant, orthogonal
    // to the paraphrase cluster's residual direction; 5: weak.
    val emb = Seq(
      (0L, v(1, 0, 0)),
      (1L, v(1, 0.10, 0)), (2L, v(1, 0.11, 0)), (3L, v(1, 0.12, 0)),
      (4L, v(0.9, 0, 0.9)), (5L, v(0.2, 1, 0))).toDF("vec_id", "embedding")
    val pool = Similarity.bruteTopKFrames(emb,
      emb.filter($"vec_id" === 0L)
        .select($"vec_id".as("query_id"), $"embedding"),
      k = 5).select($"query_id", $"neighbor_id", $"cos")
    // plain relevance order: the three paraphrases fill the top 3
    val plain = pool.orderBy($"cos".desc).collect().map(_.getLong(1)).take(3)
    assert(plain.toSet === Set(1L, 2L, 3L), s"setup broken: ${plain.toSeq}")
    // MMR at lambda .5: after one paraphrase, the diverse candidate 4
    // must displace the remaining paraphrases
    val mmr = Similarity.annMmrOf(pool, emb, k = 3, lambda = 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(mmr.map(_._1).sameElements(Seq(1L, 2L, 3L)), "ranks not 1..k")
    val picked = mmr.map(_._2)
    // pick 1 is pure relevance (a paraphrase); pick 2 must be the
    // diverse candidate, displacing the near-identical runners-up that
    // plain cosine put at ranks 2-3
    assert(picked(0) == 1L && picked(1) == 4L,
      s"MMR kept ${picked.toSeq} — paraphrase cluster not diversified")
    // lambda = 1 degenerates to the cosine order exactly
    val deg = Similarity.annMmrOf(pool, emb, k = 5, lambda = 1.0)
      .collect().map(_.getLong(2))
    val want = pool.orderBy($"cos".desc, $"neighbor_id").collect()
      .map(_.getLong(1))
    assert(deg.sameElements(want), s"λ=1 drifted: ${deg.toSeq} vs ${want.toSeq}")
    // the sf-data driver query: k rows per query, ranks contiguous
    val sfOut = Similarity.annMmr(spark, sf).collect()
    assert(sfOut.length == 10 * Similarity.HybridK)
  }

  test("source-capped ANN: cap respected, order is the capped pool's score prefix") {
    import spark.implicits._
    val out = Similarity.annCapped(spark, sf, perSource = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty)
    // never more than perSource per (query, source); src_rank honest
    out.groupBy(t => (t._1, t._4)).foreach { case (k, rows) =>
      assert(rows.length <= 2, s"cap broken for $k: ${rows.length}")
      assert(rows.map(_._5).forall(_ <= 2L))
    }
    // within each query: ranks contiguous from 1, cos non-increasing
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to sorted.length),
        s"query $q ranks not contiguous")
      assert(sorted.map(_._6).sliding(2).forall(p =>
        p.length < 2 || p(0) >= p(1)), s"query $q cos order broken")
    }
    // the cap actually bound somewhere: some query has a source at the
    // cap AND a pool candidate from that source was displaced (20
    // sources x cap 2 = 40 < pool 50, so this must occur on sf data)
    val atCap = out.groupBy(t => (t._1, t._4)).count(_._2.length == 2)
    assert(atCap > 0, "cap never binds on sf data — test is vacuous")
  }

  test("knn graph: every node has k ranked edges, no self loops; IVF path recalls the exact graph") {
    val exact = Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val n = exact.map(_._1).distinct.length
    assert(n > 100, "fixture lost its vectors")
    exact.groupBy(_._1).foreach { case (v, edges) =>
      assert(edges.length == 5, s"node $v has ${edges.length} edges")
      assert(edges.map(_._2).sorted.sameElements(1 to 5))
      assert(edges.forall(_._3 != v), s"self loop at $v")
      val cs = edges.sortBy(_._2).map(_._4)
      assert(cs.sameElements(cs.sorted.reverse), s"ranks not by cos at $v")
    }
    val exactPairs = exact.map(t => (t._1, t._3)).toSet
    val ivf = Similarity.knnGraphIvf(spark, sf, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (ivf & exactPairs).size.toDouble / exactPairs.size
    // the synthetic corpus is near-uniform on the sphere — hostile
    // geometry for IVF (neighbors scatter across cells); the bound is
    // the honest floor, far above the ~1% random baseline
    assert(recall > 0.2, s"IVF graph recall $recall")
  }

  test("knn clusters: planted groups recovered, hub not mutual, noise singleton") {
    import spark.implicits._
    def v(a: Float, b: Float, c: Float, d: Float) = Array(a, b, c, d)
    val e = (
      (1L to 4L).map(i => (i, v(1f, i * 0.01f, 0f, 0f))) ++      // cluster A
      (11L to 14L).map(i => (i, v((i - 10) * 0.01f, 1f, 0f, 0f))) ++ // cluster B
      Seq((21L, v(0f, 0f, 1f, 0f)), (22L, v(0f, 0f, 0f, 1f)),    // noise
        (30L, v(1f, 1f, 0f, 0f)))                                 // hub: ~0.707 to both
      ).toDF("vec_id", "embedding")
    val graph = Similarity.knnGraphCore(e, 3)
    val out = Similarity.knnClustersOf(e, graph, threshold = 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // two 4-clusters labeled by their min id; hub and noise singletons —
    // WITHOUT the mutuality cut the hub's 0.707 edges to both groups
    // would wire A, B, and the hub into one 9-blob
    assert(out == Map(1L -> 4L, 11L -> 4L, 21L -> 1L, 22L -> 1L, 30L -> 1L),
      s"census: $out")
  }

  test("embed outliers: planted far vector flags, cluster core does not, cell-relative") {
    // centroids = vec_id < 2: two axis clusters; members hug their
    // centroid at dist 0.1 except one planted junk vector far away
    def v(x: Float, y: Float) = Array(x, y, 0f, 0f)
    val e = (Seq(
      (0L, v(1f, 0f)), (1L, v(0f, 1f)),             // the pinned centroids
      (10L, v(1.1f, 0f)), (11L, v(0.9f, 0f)),        // cluster-0 core
      (12L, v(5f, 0f)),                              // cluster-0 junk
      (20L, v(0f, 1.1f)), (21L, v(0f, 0.9f))))       // cluster-1 core
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", lit(0))
    val out = Similarity.embedOutliersOf(e, nCentroids = 2, mult = 1.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getBoolean(4)))).toMap
    assert(out(12L)._1 === 0 && out(12L)._3, s"junk vector not flagged: $out")
    Seq(10L, 11L, 20L, 21L).foreach { id =>
      assert(!out(id)._3, s"cluster core $id flagged: $out") }
    // cell-relative: cluster-1's mean excludes cluster-0's junk — its
    // 0.1-distance members sit at ratio ~1.5/... below the cut even
    // though the GLOBAL mean is dragged up by the planted vector
    assert(out(20L)._1 === 1 && out(21L)._1 === 1)
    // the planted distance is exact: |5-1| = 4.0
    assert(out(12L)._2 === 4.0, s"junk distance: ${out(12L)._2}")
  }

  test("pagerank: matches a driver power-iteration replay, handles dangling mass, conserves on the corpus") {
    // star + dangling node: 1,2,3 all point at 0; 0 points at 1; 4
    // points at 0 but nothing points back and 4 has no IN-edges from
    // the star — and node 5 is DANGLING (appears only as a dst)
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L), (4L, 0L),
        (0L, 5L))
      .toDF("vec_id", "neighbor_id")
    val (prDf, iters) = Similarity.pagerankOf(edges, damping = 0.85,
      maxIter = 30, tol = 1e-10)
    val got = prDf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // driver-side reference replay: identical update rule, plain loops
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 5L)
    val out = Map(0L -> Seq(1L, 5L), 1L -> Seq(0L), 2L -> Seq(0L),
      3L -> Seq(0L), 4L -> Seq(0L))
    var ref = nodes.map(_ -> 1.0 / 6).toMap
    for (_ <- 1 to iters) {
      val dangling = ref.filterKeys(k => !out.contains(k)).values.sum
      val base = 0.15 / 6 + 0.85 * dangling / 6
      val in = nodes.map { v =>
        v -> out.collect { case (u, ds) if ds.contains(v) =>
          ref(u) / ds.length }.sum
      }.toMap
      ref = nodes.map(v => v -> (base + 0.85 * in(v))).toMap
    }
    nodes.foreach { v =>
      assert(math.abs(got(v) - ref(v)) < 1e-9,
        s"node $v: ${got(v)} vs replay ${ref(v)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9,
      s"mass leaked: ${got.values.sum}")
    // the hub out-ranks every spoke
    assert(got(0L) > got(2L) && got(0L) > got(4L), s"star inverted: $got")
    // driver entry: mass conserved on the corpus graph, deterministic
    val drv = Similarity.knnPagerank(spark, sf).collect()
    assert(drv.nonEmpty)
    val mass = drv.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"corpus mass $mass")
    val drv2 = Similarity.knnPagerank(spark, sf).collect()
    assert(drv.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      drv2.map(r => (r.getLong(0), r.getDouble(1))).toSeq,
      "pagerank not deterministic")
  }

  test("pagerank select: kept set is exactly the top fraction, cut monotone with id tiebreak") {
    // the selection now serves the IVF rank frame (the scale path the
    // r11 verdict required wired) — the cut must equal the collected
    // top fraction of the SAME frame
    val all = Similarity.knnPagerankIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val n = all.length
    val expectKeep = all.sortBy { case (id, pr) => (-pr, id) }
      .take(n / 5).map(_._1).toSet
    val kept = Similarity.pagerankSelect(spark, sf, num = 1, den = 5)
      .collect().map(_.getLong(0)).toSet
    assert(kept === expectKeep,
      s"cut mismatch: ${kept.size} kept vs expected ${expectKeep.size}")
    // fraction edges: 0/1 keeps nothing, 1/1 keeps everything
    assert(Similarity.pagerankSelect(spark, sf, num = 0, den = 1)
      .count() === 0L)
    assert(Similarity.pagerankSelect(spark, sf, num = 1, den = 1)
      .count() === n.toLong)
  }

  test("pagerank ivf: mass conserved, deterministic, top-fraction ranks agree with the exact graph") {
    val ivf = Similarity.knnPagerankIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.nonEmpty)
    val mass = ivf.map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"ivf corpus mass $mass")
    val again = Similarity.knnPagerankIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.toSeq === again.toSeq, "ivf pagerank not deterministic")
    // recall-bounded edges move ranks a little; the SELECTION consumer
    // (D34b) only needs the top-fraction SET to agree — pin the overlap
    // the way D25b pins edge recall. Same honest-floor caveat as D25b:
    // the synthetic corpus is near-uniform on the sphere (hostile IVF
    // geometry — edge recall itself is only pinned > 0.2 here), and
    // near-uniform graphs have near-FLAT ranks, so top-20% membership
    // rides on micro-differences. Observed 0.48 at sf0.001 — pinned
    // well above the 0.2 random baseline; clustered real corpora (the
    // geometry IVF exists for) agree far more tightly.
    val n = ivf.length
    val topIvf = ivf.sortBy { case (id, pr) => (-pr, id) }
      .take(n / 5).map(_._1).toSet
    val topExact = Similarity.knnPagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, pr) => (-pr, id) }
      .take(n / 5).map(_._1).toSet
    val overlap =
      topIvf.intersect(topExact).size.toDouble / math.max(1, topExact.size)
    assert(overlap >= 0.35,
      s"ivf top-fraction overlap $overlap vs exact-graph ranks " +
        s"(|ivf∩exact|=${topIvf.intersect(topExact).size} of ${topExact.size})")
  }

  test("label propagation ivf / knn clusters ivf: served scale paths — coverage, determinism, agreement") {
    // D32b: seeds immutable, every vector labeled or carried, verdicts
    // agree with the exact-graph run well above chance. Same
    // near-uniform-sphere caveat as the D34c/D25b floors, compounded:
    // on this geometry the neighbor labels an UNSEEDED vector hears
    // are close to uniform over the 10 classes, so exact-vs-IVF
    // agreement has a ~0.19 chance baseline (10% seeds always agree +
    // 0.9 × 1/10); observed 0.42 at sf0.001 — >2× chance; clustered
    // real corpora (where label prop is actually useful) agree far
    // more tightly because votes there are lopsided, not knife-edge.
    val exact = Similarity.labelPropagation(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getInt(1)))).toMap
    val ivf = Similarity.labelPropagationIvf(spark, sf).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None
        else Some(r.getInt(1)), r.getBoolean(2)))
    assert(ivf.map(_._1).toSet === exact.keySet, "coverage differs")
    val seeds = ivf.filter(_._3)
    assert(seeds.nonEmpty && seeds.forall(t => exact(t._1) == t._2),
      "a seed's label moved under IVF edges")
    val agree = ivf.count(t => exact(t._1) == t._2).toDouble / ivf.length
    assert(agree >= 0.3, s"label agreement $agree vs exact run " +
      "(chance baseline ~0.19 on the near-uniform fixture)")
    val ivf2 = Similarity.labelPropagationIvf(spark, sf).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None
        else Some(r.getInt(1)), r.getBoolean(2)))
    assert(ivf.toSeq === ivf2.toSeq, "label propagation ivf not deterministic")
    // D26b: every vector in exactly one cluster, deterministic census
    val n = exact.size.toLong
    val census = Similarity.knnClustersIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(census.map(_._2).sum === n,
      s"membership ${census.map(_._2).sum} != corpus $n")
    assert(census.map(_._1).distinct.length === census.length,
      "duplicate cluster ids in the census")
    val census2 = Similarity.knnClustersIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(census.toSeq === census2.toSeq, "ivf census not deterministic")
  }

  test("knn graph recall report: driver-visible edge recall holds the D25b floor") {
    val r = Similarity.knnGraphRecall(spark, sf).collect()
    assert(r.map(_.getString(0)).toSeq ===
      Seq("ivf_graph", "ivf_graph_refined"), r.toSeq)
    r.foreach { row =>
      val (found, base, matched) =
        (row.getLong(1), row.getLong(2), row.getLong(3))
      assert(matched <= math.min(found, base),
        s"matched $matched exceeds found=$found/baseline=$base")
      // the D25b spec-time floor, now a recorded number: same
      // near-uniform-sphere caveat (hostile IVF geometry)
      assert(!row.isNullAt(4) && row.getDouble(4) > 0.2,
        s"edge recall ${row.getDouble(4)} under the D25b floor")
    }
    val again = Similarity.knnGraphRecall(spark, sf).collect()
    assert(again.map(_.getDouble(4)).toSeq ===
      r.map(_.getDouble(4)).toSeq, "recall report not deterministic")
  }

  test("label propagation: planted chains fill from one seed each, ties to smaller label, bounded rounds") {
    // two directed 3-chains + a bridge vertex hearing both sides
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),    // cluster A: 1-2-3
      (4L, 5L), (5L, 4L), (5L, 6L), (6L, 5L),    // cluster B: 4-5-6
      (7L, 3L), (7L, 6L))                        // bridge: votes tie
      .toDF("vec_id", "neighbor_id")
    val init = Seq(
      (1L, Some(10), true), (2L, None, false), (3L, None, false),
      (4L, Some(20), true), (5L, None, false), (6L, None, false),
      (7L, None, false))
      .toDF("vec_id", "label", "is_seed")
    val (out, iters) = Similarity.labelPropagationOf(edges, init, maxIter = 10)
    val got = out.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got(2L) === Some(10) && got(3L) === Some(10), s"chain A: $got")
    assert(got(5L) === Some(20) && got(6L) === Some(20), s"chain B: $got")
    assert(got(7L) === Some(10), s"tie must break to the smaller label: $got")
    assert(got(1L) === Some(10) && got(4L) === Some(20), "seeds changed")
    assert(iters <= 4, s"chains of depth 2 + bridge must settle fast: $iters")
    // driver entry: every vector labeled or an isolated unlabeled tail,
    // seeds retain their true labels
    val drv = Similarity.labelPropagation(spark, sf).collect()
    val seeds = drv.filter(_.getBoolean(2))
    val truth = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    seeds.foreach { r =>
      assert(r.getInt(1) === truth(r.getLong(0)), "seed label drifted") }
    assert(drv.count(r => !r.isNullAt(1)) > seeds.length,
      "propagation labeled nothing beyond the seeds")
  }

  test("knn graph from the IVF store: append-then-refresh is bit-exact with a frozen-quantizer rebuild") {
    import graft.operators.Dedup
    val dir = java.nio.file.Files
      .createTempDirectory("graft-graph-store").toString
    val all = Tables.embeddings(spark, sf)
    val base = all.filter($"vec_id" % 5 =!= 0L)
    val grown = all.filter($"vec_id" % 5 === 0L)
    // stage the base corpus, then INGEST the remainder as a batch
    Similarity.writeIvfIndexOf(base.select($"vec_id", $"embedding"),
      dir, nCells = 8)
    Similarity.appendToIvfIndex(spark,
      grown.select($"vec_id", $"embedding"), dir, "ingest-1")
    val refreshed = Similarity.knnGraphFromIndex(spark, dir, nProbe = 4)
      .collect().map(_.toString).sorted.toSeq
    // from-scratch twin under the SAME frozen quantizer: assign every
    // vector with the store's own centroids and run the shared core —
    // identical cells → identical candidates → identical graph
    val centroidDf = spark.read.parquet(s"$dir/centroids")
    val centroids = centroidDf.orderBy($"cell").collect()
      .map(_.getSeq[Double](1).toArray)
    val cells = all.select($"vec_id", $"embedding",
      graft.functions.VectorFunctions
        .nearestCentroid($"embedding", centroids).as("cell"))
    val scratch = Similarity.knnGraphProbeCore(cells,
        centroidDf.select($"cell".as("pcell"), $"cvec"), 5, 4)
      .collect().map(_.toString).sorted.toSeq
    assert(refreshed === scratch,
      "append-then-refresh drifted from the frozen-quantizer rebuild")
    // every vector — base AND ingested — has edges
    val nodes = Similarity.knnGraphFromIndex(spark, dir, nProbe = 4)
      .select($"vec_id").distinct().count()
    assert(nodes === all.count(), s"nodes $nodes != corpus")
    // tombstoned vectors vanish from both sides of the refreshed graph
    val victim = all.limit(1).select($"vec_id").collect().head.getLong(0)
    Dedup.deleteFromLshIndex( // same tombstone table shape
      Seq(victim).toDF("vec_id"), "vec_id", dir, "rm-1")
    val after = Similarity.knnGraphFromIndex(spark, dir, nProbe = 4)
    assert(after.filter($"vec_id" === victim ||
      $"neighbor_id" === victim).count() === 0,
      "tombstoned vector still in the refreshed graph")
  }

  test("graph artifacts: a fresh session re-opens from disk without rebuilding") {
    // warm every family once, then drop the session handles — the next
    // serves must come from the staged artifacts, not a rebuild
    val g1 = Similarity.knnGraphIvf(spark, sf, nProbe = 4).collect()
    val p1 = Similarity.knnPagerankIvf(spark, sf).collect()
    val l1 = Similarity.labelPropagationIvf(spark, sf).collect()
    Similarity.clearArtifactHandles()
    val builds0 = Similarity.artifactBuilds.get()
    val g2 = Similarity.knnGraphIvf(spark, sf, nProbe = 4).collect()
    val p2 = Similarity.knnPagerankIvf(spark, sf).collect()
    val l2 = Similarity.labelPropagationIvf(spark, sf).collect()
    assert(Similarity.artifactBuilds.get() === builds0,
      "a fresh session rebuilt instead of re-opening the disk artifact")
    assert(g1.toSeq === g2.toSeq, "graph drifted across sessions")
    assert(p1.toSeq === p2.toSeq, "pagerank drifted across sessions")
    assert(l1.toSeq === l2.toSeq, "labels drifted across sessions")
  }

  test("graph artifact meta: stamp or variant mismatch fails by name") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-knn-artifact").toString
    val edges = Seq((1L, 1, 2L, 0.5)).toDF("vec_id", "rank", "neighbor_id", "cos")
    Similarity.writeKnnGraphIndex(edges, dir, 42L, "exact:5")
    // matching stamp + variant round-trips the data exactly
    val back = Similarity.readKnnGraphIndex(spark, dir, 42L, "exact:5")
    assert(back.collect().toSeq === edges.collect().toSeq)
    val exStamp = intercept[IllegalArgumentException] {
      Similarity.readKnnGraphIndex(spark, dir, 43L, "exact:5").collect()
    }
    assert(exStamp.getMessage.contains("stale kNN graph index"),
      s"stamp mismatch must fail by name: ${exStamp.getMessage}")
    val exVar = intercept[IllegalArgumentException] {
      Similarity.readKnnGraphIndex(spark, dir, 42L, "exact:7").collect()
    }
    assert(exVar.getMessage.contains("stale kNN graph index"),
      s"variant mismatch must fail by name: ${exVar.getMessage}")
  }
}
