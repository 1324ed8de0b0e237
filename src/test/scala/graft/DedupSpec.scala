package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** A corpus with planted near-duplicates: docs 100/101 differ by one
    * word; 200/201 are identical; the rest are unrelated. */
  private val base = "the quick brown fox jumps over the lazy dog while the " +
    "morning sun rises slowly over the quiet green valley and birds sing in " +
    "the tall old trees near the winding river that flows gently toward the sea"

  private lazy val planted = Seq(
    (100L, base),
    (101L, base.replace("lazy dog", "lazy cat")),
    (200L, "spark catalyst optimizer pushes filters below joins for scan pruning at scale"),
    (201L, "spark catalyst optimizer pushes filters below joins for scan pruning at scale"),
    (300L, "completely unrelated text about cooking pasta with tomatoes and basil leaves"),
    (301L, "quarterly financial report revenue increased by twelve percent year over year"),
  ).toDF("doc_id", "text")

  test("minhash LSH finds planted near-dups, skips unrelated") {
    val pairs = Dedup.minhashPairs(planted, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((200L, 201L)), s"identical pair missed: $pairs")
    assert(pairs.contains((100L, 101L)), s"near-dup pair missed: $pairs")
    assert(!pairs.exists(p => p._1 >= 300L), s"false positive: $pairs")
  }

  test("simhash finds planted near-dups within hamming 3") {
    val pairs = Dedup.simhashPairs(planted, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((200L, 201L)))
    assert(pairs.contains((100L, 101L)))
    assert(!pairs.exists(p => p._1 == 300L && p._2 == 301L))
  }

  test("exact dedup on real corpus: n_dups = n_docs - n_distinct, all >= 0") {
    Dedup.dedupExact(spark, sf).collect().foreach { r =>
      assert(r.getLong(1) >= r.getLong(2))
      assert(r.getLong(3) === r.getLong(1) - r.getLong(2))
    }
  }

  test("keep-best: normalization-equal copies cluster, the cleanest copy wins") {
    val docs = Seq(
      // one normalized cluster, three copies of descending cleanliness:
      // same tokens, punctuation load differs -> quality differs
      (1L, "The;; quick,, brown!! fox?? jumps;; over!! the¶¶ lazy©© dog¶¶ now!!", "s1"),
      (2L, "The quick brown fox jumps over the lazy dog now", "s1"),
      (3L, "The, quick brown fox jumps over the lazy dog now!", "s2"),
      // singleton cluster
      (4L, "a completely different document about spark physical planning", "s1"),
      // token-free docs share the empty normal form: one cluster
      (5L, "???", "s1"),
      (6L, "!!!", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.dedupKeepBestOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // the punctuation-free copy wins its 3-copy cluster — NOT the
    // lowest id (that's what separates keep-best from keep-first)
    assert(out.keySet === Set(2L, 4L, 5L), s"winners: $out")
    assert(out(2L)._2 === 3L)
    assert(out(4L)._2 === 1L)
    // token-free copies: NULL quality ties -> lowest id, cluster of 2
    assert(out(5L)._2 === 2L)
    // cluster sizes sum to the corpus
    assert(out.values.map(_._2).sum === docs.count())
  }

  test("minhash jaccard estimates exact jaccard on identical docs as 1.0") {
    val dupOnly = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val rows = Dedup.minhashPairs(dupOnly, "doc_id", "text").collect()
    assert(rows.length === 1)
    assert(rows.head.getDouble(2) === 1.0)
  }

  test("ngram jaccard: top pairs are symmetric-free, scores in [0,1] descending") {
    val rows = Dedup.ngramJaccard(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    val scores = rows.map(_.getDouble(2))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
  }

  test("hot LSH bucket: chain-capping keeps the dup cluster connected in O(m)") {
    // 30 identical docs land in one bucket per band; with maxBucket=8
    // the all-pairs C(30,2)=435 candidates collapse to the 29 chain
    // pairs (i, i+1) that still connect the whole cluster for keep-min
    // dedup, each verified at jaccard 1.0. A chain, not a star: under a
    // star one hub failing verification would fragment the cluster.
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val chain = (1L to 29L).map(i => (i, i + 1)).toSet
    val cluster = (1L to 30L).map(i => (i, text)).toDF("doc_id", "text")
    val capped = Dedup.minhashPairs(cluster, "doc_id", "text", maxBucket = 8).collect()
    assert(capped.length === 29, s"expected 29 chain pairs, got ${capped.length}")
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet === chain)
    assert(capped.forall(_.getDouble(2) === 1.0))
    // simhash: same cluster, same chain shape, hamming 0
    val sh = Dedup.simhashPairs(cluster, "doc_id", "text", maxBucket = 8).collect()
    assert(sh.map(r => (r.getLong(0), r.getLong(1))).toSet === chain)
    assert(sh.forall(_.getInt(2) === 0))
    // below the cap nothing changes: exact all-pairs
    val small = (1L to 5L).map(i => (i, text)).toDF("doc_id", "text")
    assert(Dedup.minhashPairs(small, "doc_id", "text").count() === 10L)
  }

  test("ngram df-cap: corpus-common gram pruned, true dups still found") {
    // 30 docs share one boilerplate prefix (its grams hit df=30); each
    // doc otherwise has unique words. Docs 1/2 are genuine near-dups.
    val boiler = "standard corpus header line"
    val docs = ((1L to 2L).map(i => i ->
      s"$boiler identical payload words repeated across the duplicate pair") ++
      (3L to 30L).map(i => i ->
        s"$boiler unique${i}a unique${i}b unique${i}c unique${i}d unique${i}e unique${i}f"))
      .map { case (id, text) =>
        (id, text, "s", text.length.toLong)
      }.toDF("doc_id", "text", "source", "n_chars")
    // Uncapped: every boilerplate-only pair becomes a candidate — the
    // quadratic hot-posting blowup (C(30,2) = 435 pairs from one gram).
    val uncapped = Dedup.ngramJaccardFrame(docs, maxDf = 1000, topN = 10000).count()
    assert(uncapped > 400L, s"expected the hot gram to inflate pairs, got $uncapped")
    // Capped: the df=30 grams are dropped before the self-join, so only
    // the true near-dup pair (which shares plenty of rare grams) remains.
    val capped = Dedup.ngramJaccardFrame(docs, maxDf = 5, topN = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSet === Set((1L, 2L)),
      s"df-cap should leave only the true dup pair, got ${capped.toSeq}")
  }

  test("persisted LSH index: incremental sweep matches the in-memory pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-idx").toString
    val corpus = Seq(
      (100L, base),
      (200L, "spark catalyst optimizer pushes filters below joins for scan pruning at scale"),
      (300L, "completely unrelated text about cooking pasta with tomatoes and basil leaves"),
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (101L, base.replace("lazy dog", "lazy cat")), // near-dup of corpus 100
      (201L, "spark catalyst optimizer pushes filters below joins for scan pruning at scale"), // exact dup of corpus 200
      (400L, "quarterly financial report revenue increased by twelve percent year over year"), // unique
      (500L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"),
      (501L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"), // fresh×fresh dup
    ).toDF("doc_id", "text")
    Dedup.writeLshIndex(corpus, "doc_id", "text", dir)
    val indexed = Dedup.minhashPairsIndexed(spark, dir, fresh, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val full = Dedup.minhashPairs(corpus.unionByName(fresh), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every near-dup pair here involves a fresh doc, so the incremental
    // sweep must reproduce the full re-sweep bit-for-bit — without
    // re-shingling the corpus
    assert(indexed.toSet === full.toSet)
    assert(indexed.map(p => (p._1, p._2)).toSet
      === Set((100L, 101L), (200L, 201L), (500L, 501L)))
    // index lifecycle: fold the swept batch in, next week's batch then
    // probes corpus + batch — a dup of LAST week's doc is still caught.
    // Appended TWICE with the same batch id: the dynamic partition
    // overwrite must make the retry a no-op (a plain append would
    // double bucket sizes and emit duplicate pairs).
    Dedup.appendToLshIndex(fresh, "doc_id", "text", dir, batchId = "week1")
    Dedup.appendToLshIndex(fresh, "doc_id", "text", dir, batchId = "week1")
    val nextWeek = Seq(
      (600L, base.replace("lazy dog", "lazy cat")), // dup of appended 101
      (601L, "entirely new topic discussing mountain weather patterns and seasonal snowfall"),
    ).toDF("doc_id", "text")
    val swept = Dedup.minhashPairsIndexed(spark, dir, nextWeek, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(swept.toSet === Set((100L, 600L), (101L, 600L)),
      s"append-then-probe missed last week's near-dup or duplicated rows: ${swept.toSeq}")
    assert(swept.length === 2, s"retried append duplicated pairs: ${swept.toSeq}")
    // compaction folds the appended batches into one base partition set
    // in a FRESH dir; probes of the compacted index are identical
    val cdir = java.nio.file.Files.createTempDirectory("graft-lsh-compact")
      .toString + "/idx"
    Dedup.compactLshIndex(spark, dir, cdir)
    val sweptC = Dedup.minhashPairsIndexed(spark, cdir, nextWeek, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sweptC.toSet === swept.toSet, "compacted index probe diverged")
    val batchDirs = new java.io.File(s"$cdir/bands").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(batchDirs === Set("batch=base"),
      s"compaction left multiple batch partitions: $batchDirs")
  }

  test("lsh ingest stream: admitted batches fold into the staged index exactly once; replay converges") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lsh-ingest").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-lsh-ingest-ck").toString
    val corpus = Seq(
      (100L, base),
      (300L, "completely unrelated text about cooking pasta with tomatoes and basil leaves"),
    ).toDF("doc_id", "text")
    Dedup.writeLshIndex(corpus, "doc_id", "text", dir)
    val uniq = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val fin = "quarterly financial report revenue increased by twelve percent year over year"
    val b0 = Seq((400L, uniq), (101L, base.replace("lazy dog", "lazy cat")))
    val b1 = Seq((401L, uniq.replace("nu xi", "nu pi")), (402L, fin))
    val admitted = scala.collection.concurrent.TrieMap.empty[Long, Set[Long]]
    val input = new org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](106, spark, None)
    val q = Dedup.lshIngestStream(
        input.toDS().toDF("doc_id", "text"), dir) { (adm, bid) =>
        admitted(bid) = adm.collect().map(_.getLong(0)).toSet
      }.option("checkpointLocation", ckpt).start()
    try {
      input.addData(b0); q.processAllAvailable()
      input.addData(b1); q.processAllAvailable()
    } finally q.stop()
    // batch 0: 101 near-dups corpus 100 → dropped; 400 admitted
    assert(admitted(0L) === Set(400L), s"batch0 admitted: $admitted")
    // batch 1: 401 near-dups 400 — which lives in the INDEX (appended
    // by batch 0), not in any stream state: the cross-batch catch this
    // operator exists for
    assert(admitted(1L) === Set(402L), s"batch1 admitted: $admitted")
    def bandRows(d: String) = spark.read.parquet(s"$d/bands")
      .collect().map(_.toSeq.toString).sorted.toSeq
    // exactly-once equivalence: staged state == base + batch
    // appendToLshIndex over the same admitted slices
    val twin = java.nio.file.Files
      .createTempDirectory("graft-lsh-twin").toString
    Dedup.writeLshIndex(corpus, "doc_id", "text", twin)
    Dedup.appendToLshIndex(Seq((400L, uniq)).toDF("doc_id", "text"),
      "doc_id", "text", twin, "ingest-0")
    Dedup.appendToLshIndex(Seq((402L, fin)).toDF("doc_id", "text"),
      "doc_id", "text", twin, "ingest-1")
    assert(bandRows(dir) === bandRows(twin),
      "streamed index != batch-appended twin")
    // replay batch 1 after a simulated crash: the probe's own-batch
    // exclusion keeps the decision identical, the idempotent append
    // keeps the state identical
    val before = bandRows(dir)
    Dedup.lshIngestBatch(b1.toDF("doc_id", "text"), 1L, dir,
      sink = (adm, _) =>
        assert(adm.collect().map(_.getLong(0)).toSet === Set(402L),
          "replayed decision drifted"))
    assert(bandRows(dir) === before, "replay changed the staged state")
  }

  test("persisted SimHash index: incremental sweep matches the in-memory pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sim-idx").toString
    val corpus = Seq(
      (100L, base),
      (200L, "spark catalyst optimizer pushes filters below joins for scan pruning at scale"),
      (300L, "completely unrelated text about cooking pasta with tomatoes and basil leaves"),
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (101L, base.replace("lazy dog", "lazy cat")), // near-dup of corpus 100
      (201L, "spark catalyst optimizer pushes filters below joins for scan pruning at scale"), // exact dup of 200
      (400L, "quarterly financial report revenue increased by twelve percent year over year"),
    ).toDF("doc_id", "text")
    Dedup.writeSimhashIndex(corpus, "doc_id", "text", dir)
    val indexed = Dedup.simhashPairsIndexed(spark, dir, fresh, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val full = Dedup.simhashPairs(corpus.unionByName(fresh), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every near-dup pair here involves a fresh doc, so the incremental
    // sweep must reproduce the full re-sweep — without re-signing the
    // corpus side
    assert(indexed.toSet === full.toSet)
    assert(indexed.map(p => (p._1, p._2)).toSet.contains((200L, 201L)))
    // lifecycle: double-append with the same batch id must be a no-op
    // (dynamic partition overwrite), and next week's dup of an appended
    // doc must still surface
    Dedup.appendToSimhashIndex(fresh, "doc_id", "text", dir, batchId = "week1")
    Dedup.appendToSimhashIndex(fresh, "doc_id", "text", dir, batchId = "week1")
    val nextWeek = Seq(
      (600L, base.replace("lazy dog", "lazy cat")), // dup of appended 101 (and of 100)
      (601L, "entirely new topic discussing mountain weather patterns and seasonal snowfall"),
    ).toDF("doc_id", "text")
    val swept = Dedup.simhashPairsIndexed(spark, dir, nextWeek, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(swept.toSet === Set((100L, 600L), (101L, 600L)),
      s"append-then-probe missed last week's near-dup or duplicated rows: ${swept.toSeq}")
    val cdir = java.nio.file.Files.createTempDirectory("graft-sim-compact")
      .toString + "/idx"
    Dedup.compactSimhashIndex(spark, dir, cdir)
    val sweptC = Dedup.simhashPairsIndexed(spark, cdir, nextWeek, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sweptC.toSet === swept.toSet, "compacted SimHash index probe diverged")
  }

  test("LSH index deletion: tombstoned doc stops pairing; append + compact preserve it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-del").toString
    val corpus = Seq(
      (100L, base),
      (200L, "spark catalyst optimizer pushes filters below joins for scan pruning at scale"),
      (300L, "completely unrelated text about cooking pasta with tomatoes and basil leaves"),
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (101L, base.replace("lazy dog", "lazy cat")), // near-dup of corpus 100
      (201L, "spark catalyst optimizer pushes filters below joins for scan pruning at scale"), // dup of 200
    ).toDF("doc_id", "text")
    Dedup.writeLshIndex(corpus, "doc_id", "text", dir)
    def probe(batch: org.apache.spark.sql.DataFrame, in: String = dir) =
      Dedup.minhashPairsIndexed(spark, in, batch, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe(fresh) === Set((100L, 101L), (200L, 201L)))
    // an EMPTY takedown (a day's feed that filtered to nothing) is a
    // no-op — a zero-row write would create a data-file-less
    // tombstones dir that bricks every later probe on schema inference
    Dedup.deleteFromLshIndex(Seq.empty[Long].toDF("doc_id"), "doc_id", dir, "t0")
    assert(probe(fresh) === Set((100L, 101L), (200L, 201L)))
    // takedown of 100: its staged postings stop pairing at the next probe
    Dedup.deleteFromLshIndex(Seq(100L).toDF("doc_id"), "doc_id", dir, "t1")
    assert(probe(fresh) === Set((200L, 201L)),
      "tombstoned doc still emits pairs")
    // retried takedown with the same batch id is a no-op
    Dedup.deleteFromLshIndex(Seq(100L).toDF("doc_id"), "doc_id", dir, "t1")
    assert(probe(fresh) === Set((200L, 201L)))
    // append-after-delete: folding a swept batch in must not resurrect
    // the deletion — next week's dup of 100/101 pairs only with 101
    Dedup.appendToLshIndex(fresh, "doc_id", "text", dir, "week1")
    val nextWeek = Seq((600L, base.replace("lazy dog", "lazy cat")))
      .toDF("doc_id", "text")
    assert(probe(nextWeek) === Set((101L, 600L)),
      "deleted doc resurfaced after an append")
    // compact-after-delete: the deletion becomes PHYSICAL — dst carries
    // no tombstone table, holds no rows for the id, probes identically
    val cdir = java.nio.file.Files.createTempDirectory("graft-lsh-del-c")
      .toString + "/idx"
    Dedup.compactLshIndex(spark, dir, cdir)
    assert(probe(nextWeek, cdir) === Set((101L, 600L)))
    assert(!new java.io.File(s"$cdir/tombstones").exists,
      "compaction copied the tombstone table instead of folding it in")
    assert(spark.read.parquet(s"$cdir/shingles")
      .filter(col("id") === 100L).count() === 0L,
      "tombstoned shingles survived compaction")
    assert(spark.read.parquet(s"$cdir/bands")
      .filter(col("id") === 100L).count() === 0L,
      "tombstoned band postings survived compaction")
    // a full REBUILD at the same dir replaces the staged set wholesale
    // and must forget prior deletions — a stale tombstone set would
    // silently filter the re-licensed doc out of the new index forever
    Dedup.writeLshIndex(corpus, "doc_id", "text", dir)
    assert(probe(fresh) === Set((100L, 101L), (200L, 201L)),
      "stale tombstones filtered the rebuilt index")
  }

  test("SimHash index deletion: tombstoned doc stops pairing; compaction folds it in") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sim-del").toString
    val corpus = Seq(
      (100L, base),
      (200L, "spark catalyst optimizer pushes filters below joins for scan pruning at scale"),
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (101L, base.replace("lazy dog", "lazy cat")),
      (201L, "spark catalyst optimizer pushes filters below joins for scan pruning at scale"),
    ).toDF("doc_id", "text")
    Dedup.writeSimhashIndex(corpus, "doc_id", "text", dir)
    def probe(in: String) =
      Dedup.simhashPairsIndexed(spark, in, fresh, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe(dir) === Set((100L, 101L), (200L, 201L)))
    Dedup.deleteFromSimhashIndex(Seq(200L).toDF("doc_id"), "doc_id", dir, "t1")
    assert(probe(dir) === Set((100L, 101L)),
      "tombstoned signature still pairs")
    val cdir = java.nio.file.Files.createTempDirectory("graft-sim-del-c")
      .toString + "/idx"
    Dedup.compactSimhashIndex(spark, dir, cdir)
    assert(probe(cdir) === Set((100L, 101L)))
    assert(!new java.io.File(s"$cdir/tombstones").exists)
    assert(spark.read.parquet(s"$cdir/sigs")
      .filter(col("id") === 200L).count() === 0L,
      "tombstoned signature survived compaction")
  }

  test("dedup_simhash_indexed driver query: every pair touches the fresh batch") {
    Dedup.dedupSimhashIndexed(spark, sf).collect().foreach { r =>
      assert(r.getLong(0) % 10 === 0 || r.getLong(1) % 10 === 0,
        s"corpus-only pair leaked into the incremental SimHash sweep: $r")
    }
  }

  test("compaction refuses equivalent spellings of the same directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-same").toString
    val alias = dir + "/../" + new java.io.File(dir).getName
    val e = intercept[IllegalArgumentException] {
      Dedup.compactLshIndex(spark, dir, alias)
    }
    assert(e.getMessage.contains("dst must differ"), e.getMessage)
  }

  test("index rebuilt at the same path: meta re-read, never served stale") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-lsh-rebuild").toString
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val fresh = Seq((101L, base.replace("lazy dog", "lazy cat"))).toDF("doc_id", "text")
    Dedup.writeLshIndex(corpus, "doc_id", "text", dir) // params (5, 64, 16)
    assert(Dedup.minhashPairsIndexed(spark, dir, fresh, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === Set((100L, 101L)))
    // Simulate ANOTHER JVM rebuilding the index at the same path with
    // different params: build elsewhere and move the files in — an
    // external rebuild never touches this JVM's meta cache, so only the
    // (path, mtime) keying makes the next probe see the new params.
    // With stale (5, 64, 16) params the batch would be shingled and
    // banded incompatibly with the 3-shingle 8-band index — no pairs.
    val dir2 = Files.createTempDirectory("graft-lsh-rebuild2").toString
    Dedup.writeLshIndex(corpus, "doc_id", "text", dir2,
      shingleSize = 3, numHashes = 32, bands = 8)
    def rmrf(root: java.nio.file.Path): Unit = {
      val w = Files.walk(root)
      try w.iterator().asScala.toSeq.reverseIterator.foreach(Files.deleteIfExists(_))
      finally w.close()
    }
    rmrf(Paths.get(dir))
    Files.move(Paths.get(dir2), Paths.get(dir))
    assert(Dedup.minhashPairsIndexed(spark, dir, fresh, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === Set((100L, 101L)),
      "rebuilt index probed with stale cached params")
  }

  test("dedup_minhash_indexed driver query: every pair touches the fresh batch") {
    Dedup.dedupMinhashIndexed(spark, sf).collect().foreach { r =>
      assert(r.getLong(0) % 10 === 0 || r.getLong(1) % 10 === 0,
        s"corpus-only pair leaked into the incremental sweep: $r")
    }
  }

  test("embedding dedup: cosine in [-1,1], pairs within same label") {
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    Dedup.dedupEmbedding(spark, sf).collect().foreach { r =>
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
      assert(e(r.getLong(0)) === e(r.getLong(1)))
    }
  }

  test("semantic dedup: transitive cluster collapses to one rep, distinct stay") {
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup").toString
    def onArc(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat) ++ Array.fill(6)(0f)
    }
    // Trio 0-1-2 is a CHAIN: cos(0°,18°) = cos(18°,36°) ≈ 0.951 ≥ 0.95
    // but cos(0°,36°) ≈ 0.809 < 0.95 — only connected components (not
    // pairwise keep-min) resolve all three to rep 0. Vectors 3/4 sit on
    // the same arc but past the threshold from everyone; ids 10-39 are
    // an opposite-facing 3°-spaced fan forming one long chain. nCells=1
    // runs the full quantizer machinery while keeping cell assignment
    // out of the assertions — where cells land is k-means' recall
    // trade, pinned on the real corpus by the driver-query test below,
    // not something a 35-vector fixture should depend on.
    val arc = Seq(0L -> 0.0, 1L -> 18.0, 2L -> 36.0, 3L -> 60.0, 4L -> 85.0)
      .map { case (id, deg) => (id, onArc(deg), 0) }
    val blob2 = (10L to 39L).map { id =>
      (id, onArc(180.0 + 3.0 * (id - 10)), 1)
    }
    (arc ++ blob2).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Dedup.dedupSemantic(spark, dir, threshold = 0.95, nCells = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(out.length === 35, s"one row per corpus vector, got ${out.length}")
    val rep = out.map(t => (t._1, t._2)).toMap
    assert(rep(0L) === 0L && rep(1L) === 0L && rep(2L) === 0L,
      s"chain 0-1-2 should collapse to rep 0: ${out.filter(_._1 < 3).toSeq}")
    assert(out.filter(t => t._1 < 3 && t._1 > 0).forall(_._3),
      "chain members 1,2 must be flagged is_dup")
    assert(rep(3L) === 3L && rep(4L) === 4L,
      s"below-threshold arc vectors must survive: ${out.filter(_._1 < 5).toSeq}")
    // opposite blob: 3°-spaced fan, adjacent cos ≈ 0.9986 ≥ 0.95 — one
    // transitive component labeled by its minimum id
    assert((10L to 39L).forall(rep(_) === 10L),
      "blob2 fan should form one transitive component with rep 10")
    // deterministic end to end (fixed-seed quantizer, exact kernels)
    val again = Dedup.dedupSemantic(spark, dir, threshold = 0.95, nCells = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(again.toSeq === out.toSeq)
  }

  test("positional shingle kernel: text order, duplicates kept, short docs empty") {
    import graft.functions.TextFunctions
    val df = Seq(
      (1L, Seq("a", "b", "a", "b", "a")), // windows: ab ba ab ba — dups kept
      (2L, Seq("a")),                     // shorter than n → EMPTY
    ).toDF("id", "toks")
    val out = df.select($"id",
        TextFunctions.positionalShingleHashes($"toks", 2).as("ph"),
        TextFunctions.shingleHashes($"toks", 2).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    val (ph, sh) = out(1L)
    assert(ph.length === 4, "one hash per window, in order, duplicates kept")
    assert(ph(0) === ph(2) && ph(1) === ph(3), "equal windows must hash equal")
    assert(ph(0) !== ph(1))
    // positional values are exactly the set variant's members
    assert(ph.toSet === sh.toSet, "positional and set kernels disagree")
    assert(out(2L)._1.isEmpty, "doc shorter than n has no positional grams")
  }

  test("substring dedup: planted 60-token shared run flagged in both docs") {
    val shared = (1 to 60).map(i => s"tok$i").mkString(" ")
    // doc 1: 4 unique tokens, the shared run at positions 4..63, 3 more
    // doc 2: 5 unique tokens, the shared run at positions 5..64, 2 more
    // doc 3: no overlap — must not appear at all
    val docs = Seq(
      (1L, s"unique alpha opening words $shared closing alpha end"),
      (2L, s"different beta preamble text here $shared final words"),
      (3L, "entirely separate document about garden soil and seasonal vegetables growing"),
    ).toDF("doc_id", "text")
    val runs = Dedup.substrDupRanges(docs, "doc_id", "text", l = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(runs.toSet === Set((1L, 4L, 64L, 60L), (2L, 5L, 65L, 60L)),
      s"expected exactly the planted run as one maximal range per doc: ${runs.toSeq}")
  }

  test("substring dedup: within-doc repeat and sub-l runs handled") {
    val run = (1 to 30).map(i => s"w$i").mkString(" ")
    // doc 1 repeats a 30-token run twice within itself (separated by a
    // spacer) — both occurrences must be flagged; doc 2 shares only a
    // 20-token (< l) fragment — nothing dup at l = 25
    val docs = Seq(
      (1L, s"$run spacer0 spacer1 spacer2 $run"),
      (2L, (1 to 20).map(i => s"w$i").mkString(" ") + " tail0 tail1 tail2 tail3 tail4 tail5"),
    ).toDF("doc_id", "text")
    val runs = Dedup.substrDupRanges(docs, "doc_id", "text", l = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 tokens: w1..w30 (0..29), spacers (30..32), w1..w30 (33..62)
    // flagged windows: 0..5 (inside first run) and 33..38 (second run)
    assert(runs.toSet === Set((1L, 0L, 30L), (1L, 33L, 63L)),
      s"within-doc repeat should yield both maximal ranges: ${runs.toSeq}")
  }

  test("substring dedup: overlapping islands merge into one covered range") {
    // A shares w1..w30 with B and w16..w40 with C: A's flagged position
    // islands {0..5} and {15} cover token ranges [0,30) and [15,40),
    // which OVERLAP on [15,30) — they must coalesce to one [0,40) range
    // (n_tokens 40, not a double-counted 30+25)
    def w(r: Range, p: String) = r.map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, w(1 to 40, "w")),
      (2L, w(1 to 30, "w") + " " + w(1 to 10, "b")),
      (3L, w(1 to 5, "c") + " " + w(16 to 40, "w")),
    ).toDF("doc_id", "text")
    val runs = Dedup.substrDupRanges(docs, "doc_id", "text", l = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(runs.toSet === Set((1L, 0L, 40L, 40L), (2L, 0L, 30L, 30L), (3L, 5L, 30L, 25L)),
      s"overlapping covered ranges must merge: ${runs.toSeq}")
  }

  test("substring scrub: flagged run cut from every doc, clean docs intact") {
    val shared = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"unique alpha opening words $shared closing alpha end"),
      (2L, s"different beta preamble text here $shared final words"),
      (3L, "entirely separate document about garden soil and seasonal vegetables growing"),
    ).toDF("doc_id", "text")
    val out = Dedup.substrScrub(docs, "doc_id", "text", l = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out.map(t => (t._1, t._2)) === Seq((1L, 7L), (2L, 7L), (3L, 10L)))
    // the run is cut from BOTH docs (all occurrences — the ExactSubstr
    // rule), the surrounding tokens survive in order
    assert(out(0)._3 === "unique alpha opening words closing alpha end")
    assert(out(1)._3 === "different beta preamble text here final words")
    assert(out(2)._3.startsWith("entirely separate document"))
  }

  test("ExactSubstr at production l=50: planted boilerplate found at sf0.1, drop policy fires") {
    // Production parameters over real-corpus volume: Lee et al.'s
    // l=50 window on the 5000-doc sf0.1 corpus, with a 60-token
    // boilerplate footer planted on every 20th doc (the shared-footer
    // shape the pass exists to catch) and ten boilerplate-DOMINATED
    // short docs for the drop policy.
    val footer = (1 to 60).map(i => s"bplate$i").mkString(" ")
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(20)) === 0,
          concat(col("text"), lit(" " + footer)))
          .otherwise(col("text")).as("text"))
    val shorties = (0 until 10).map(i =>
      (90000000L + i, s"$footer unique${i}a unique${i}b unique${i}c"))
      .toDF("doc_id", "text")
    val docs = real.unionByName(shorties)
    val ranges = Dedup.substrDupRanges(docs, "doc_id", "text", l = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = ranges.groupBy(_._1)
    val nToks = docs.select(col("doc_id"), size(
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // every planted doc carries a flagged range reaching its final
    // token (the footer sits at the end) of at least the footer's 60
    val planted = nToks.keys.filter(id => id % 20 == 0 && id < 90000000L)
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val rs = byDoc.getOrElse(id, Array.empty)
      assert(rs.exists(r => r._3 == nToks(id) && r._4 >= 60L),
        s"planted footer not flagged to the end of doc $id: ${rs.toSeq}")
    }
    // drop policy at the 50% coverage cut: the boilerplate-dominated
    // docs (60 of 63 tokens covered) are dropped
    val drop = Dedup.substrDropDocs(docs, "doc_id", "text",
        l = 50, maxCoveredFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    val verdicts = drop.map(t => t._1 -> t).toMap
    (0 until 10).foreach { i =>
      val v = verdicts(90000000L + i)
      assert(!v._5 && v._3 >= 60L, s"boilerplate-dominated doc kept: $v")
    }
    // accounting: covered_tokens is exactly the sum of the doc's
    // maximal disjoint ranges, and the verdict matches the fraction
    drop.foreach { case (id, _, cov, frac, keep) =>
      val sumR = byDoc.getOrElse(id, Array.empty).map(_._4).sum
      assert(cov === sumR, s"coverage accounting drifted for doc $id: $cov vs $sumR")
      assert(keep === (frac <= 0.5), s"keep verdict inconsistent for doc $id")
    }
  }

  test("semantic dedup (fixed centroids): planted chain collapses to one rep") {
    val dir = java.nio.file.Files.createTempDirectory("graft-semfixed").toString
    def onArc(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat) ++ Array.fill(6)(0f)
    }
    val arc = Seq(0L -> 0.0, 1L -> 18.0, 2L -> 36.0, 3L -> 60.0, 4L -> 85.0)
      .map { case (id, deg) => (id, onArc(deg), 0) }
    (arc).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    // ONE pinned centroid (vector 0) → a single cell: the chain 0-1-2
    // collapses transitively to rep 0; 3 and 4 are below threshold
    val out = Dedup.dedupSemanticFixed(spark, dir, threshold = 0.95, nCentroids = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    val rep = out.map(t => (t._1, t._2)).toMap
    assert(rep === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L),
      s"fixed-centroid chain resolution wrong: ${out.toSeq}")
    assert(out.filter(t => t._1 == 1L || t._1 == 2L).forall(_._3))
  }

  test("dedup_semantic_fixed driver query: full corpus labeled, rep is min") {
    val out = Dedup.dedupSemanticFixed(spark, sf).collect()
    assert(out.length.toLong === Tables.embeddings(spark, sf).count())
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(0), "rep must be the component minimum")
      assert(r.getBoolean(3) === (r.getLong(2) != r.getLong(0)))
    }
  }

  test("dedup_semantic driver query: full corpus labeled, deterministic") {
    val out = Dedup.dedupSemantic(spark, sf).collect()
    assert(out.length.toLong === Tables.embeddings(spark, sf).count())
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(0), "rep must be the component minimum")
      assert(r.getBoolean(3) === (r.getLong(2) != r.getLong(0)))
    }
  }

  test("dedup recall report: planted true pairs counted, sub-threshold excluded, perfect recall on exact dups") {
    val base = "the quick brown fox jumps over seven lazy dogs while " +
      "autumn rivers carry golden leaves toward distant villages"
    // long doc: one changed token in the middle keeps 5-gram jaccard
    // well above 0.5 (a changed token in SHORT base would land 9/19)
    val long1 = base + " where ancient stone bridges cross quiet water " +
      "and morning light settles on empty market squares before dawn"
    val long2 = long1.replace("market", "harbor")
    val docs = Seq(
      (1L, base), (2L, base),     // exact dup: jaccard 1.0
      (4L, long1), (5L, long2),   // near dup: high-jaccard long pair
      (10L, "completely unrelated text about database query planning " +
        "with partitions exchanges and adaptive execution stages"),
      (11L, "another singleton document covering streaming watermarks " +
        "state stores and checkpoint recovery semantics"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupRecallReportOf(docs, threshold = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    // truth: (1,2) at 1.0 and (4,5) high; (1,4)-class containments sit
    // ~0.39 below threshold; singletons pair with nothing
    val (f, b, m, rec) = out("minhash_lsh")
    assert(b === 2L, s"baseline must hold exactly the planted pairs: $out")
    assert(m === f && m === 2L && rec === Some(1.0),
      s"minhash must recover all planted pairs: $out")
    val (_, b2, m2, rec2) = out("simhash")
    assert(b2 === 2L && m2 >= 1L && rec2.exists(_ > 0.0),
      s"simhash must at least pair the exact dup: $out")
  }

  test("sampled dedup recall audit: frac=1 is the full report, sub-sample deterministic with shrunken baseline") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSeq
    val full = rows(Dedup.dedupRecallReport(spark, sf))
    val all = rows(Dedup.dedupRecallReportSampled(spark, sf, frac = 1.0))
    assert(all === full,
      s"frac=1 must reproduce the full report: $all vs $full")
    val half = rows(Dedup.dedupRecallReportSampled(spark, sf, frac = 0.5))
    assert(half.map(_._1) === full.map(_._1), "method rows missing")
    // the sampled baseline can only shrink (pair needs both ends in)
    half.zip(full).foreach { case (s, f) =>
      assert(s._3 <= f._3, s"sampled baseline grew: $s vs $f")
      assert(s._4 <= math.min(s._2, s._3), s"matched out of bounds: $s")
    }
    // deterministic replay (cache-independent: different threshold key
    // forces a fresh build of the same sample)
    assert(rows(Dedup.dedupRecallReportSampled(spark, sf, frac = 0.5))
      === half, "sampled audit not deterministic")
    // degenerate frac fails by name
    val ex = intercept[IllegalArgumentException] {
      Dedup.dedupRecallReportSampled(spark, sf, frac = 0.0)
    }
    assert(ex.getMessage.contains("frac"), ex.getMessage)
  }
}
