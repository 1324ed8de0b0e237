package graft

import org.apache.spark.sql.functions._

import graft.operators.Monitoring
import graft.sources.EventSource
import graft.streaming.IncidentBoard

class IncidentBoardSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(1), r.getString(2))).toSet

  test("incident board: replayed history equals batch A58, fence holds, epochs advance") {
    val staging = tmp("graft-ib-in")
    val ledger = tmp("graft-ib-led")
    val board = tmp("graft-ib-brd")
    val ckpt = tmp("graft-ib-ck")
    val stream = EventSource.replayTable(spark, sf, staging, parts = 3)
    // screening threshold 0.3 — the driver row's reasoning: real edges
    // at spec SF so the full pair→component path executes live
    val q = IncidentBoard.start(stream, ledger, board, ckpt,
      corrThreshold = 0.3)
    try q.processAllAvailable() finally q.stop()

    val live = IncidentBoard.board(spark, board)
    val batch = Monitoring.incidentGroups(spark, sf, corrThreshold = 0.3)
    assert(rows(live) === rows(batch),
      s"board != batch A58: ${rows(live)} vs ${rows(batch)}")
    assert(live.count() > 0, "replay produced an empty board")

    // replay fence: re-invoking a delivered trigger (same id, same
    // content — checkpoint determinism) must leave board AND ledger
    // ledger semantics unchanged (epoch overwrite, not append)
    // pin: the replay below OVERWRITES batch=0 while this plan would
    // lazily read it — materialize before the rewrite
    val b0 = spark.read.parquet(s"$ledger/batch=0").localCheckpoint(true)
    val ledgerBefore = spark.read.parquet(ledger).count()
    IncidentBoard.applyBatch(b0, 0L, ledger, board, 0.3, 2.0, 50.0,
      2.5, 200.0, 24, 24L, regroupEvery = 1)
    assert(spark.read.parquet(ledger).count() === ledgerBefore,
      "replayed trigger grew the ledger — epoch overwrite broken")
    assert(rows(IncidentBoard.board(spark, board)) === rows(batch),
      "replayed trigger changed the board")

    // the board reader keys on the newest COMMITTED epoch: an epoch
    // directory without _SUCCESS (torn regroup) must stay invisible
    val fs = new org.apache.hadoop.fs.Path(board)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val torn = new org.apache.hadoop.fs.Path(s"$board/epoch=999999")
    fs.mkdirs(torn)
    assert(rows(IncidentBoard.board(spark, board)) === rows(batch),
      "uncommitted epoch leaked into the board")
    fs.delete(torn, true)

    // regroupEvery > 1: only regroup triggers move the board epoch —
    // intermediate batches land in the ledger but the board holds the
    // last regroup (staleness is the stated knob, not a bug)
    val board2 = tmp("graft-ib-brd2")
    val ledger2 = tmp("graft-ib-led2")
    (0L until 3L).foreach { b =>
      IncidentBoard.applyBatch(
        spark.read.parquet(s"$ledger/batch=$b"), b, ledger2, board2,
        0.3, 2.0, 50.0, 2.5, 200.0, 24, 24L, regroupEvery = 2)
    }
    val epochs = fs.listStatus(new org.apache.hadoop.fs.Path(board2))
      .map(_.getPath.getName).filter(_.startsWith("epoch=")).sorted
    assert(epochs.toSeq === Seq("epoch=0", "epoch=2"),
      s"regroupEvery=2 epochs: ${epochs.toSeq}")
    // and the final epoch (full ledger) still matches batch A58
    assert(rows(IncidentBoard.board(spark, board2)) === rows(batch),
      "cadenced board drifted from batch A58 at the final regroup")
  }

  test("ledger prune: old batches drop, next regroup covers the retained window, newest epoch survives") {
    val ledger = tmp("graft-lp-led")
    val board = tmp("graft-lp-brd")
    // three batches of the real table, then retention cuts batch 0
    val parts = Tables.events(spark, sf).repartition(3)
      .localCheckpoint(true)
    val staged = parts.withColumn("__p",
      org.apache.spark.sql.functions.spark_partition_id())
    (0 until 3).foreach { b =>
      graft.streaming.LedgerBoard.applyBatch(
        staged.filter($"__p" === b).drop("__p"), b.toLong, ledger, board,
        regroupEvery = 1)(h =>
        Monitoring.anomalyEnsembleOf(h))
    }
    val fs = new org.apache.hadoop.fs.Path(ledger)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.streaming.LedgerBoard.pruneLedger(spark, ledger,
      keepFromBatchId = 1L, boardDir = Some(board))
    val batches = fs.listStatus(new org.apache.hadoop.fs.Path(ledger))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted
    assert(batches.toSeq === Seq("batch=1", "batch=2"),
      s"retained: ${batches.toSeq}")
    // epoch 0 pruned, newest (2) survives; epoch 1 also < keepFrom? no:
    // keepFrom=1 keeps epoch 1 and 2
    val epochs = fs.listStatus(new org.apache.hadoop.fs.Path(board))
      .map(_.getPath.getName).filter(_.startsWith("epoch=")).sorted
    assert(epochs.toSeq === Seq("epoch=1", "epoch=2"), s"epochs: ${epochs.toSeq}")
    // the next regroup covers exactly the retained window
    graft.streaming.LedgerBoard.applyBatch(
      staged.filter($"__p" === 99).drop("__p") /* empty */, 3L, ledger,
      board, regroupEvery = 1)(h => Monitoring.anomalyEnsembleOf(h))
    val live = graft.streaming.LedgerBoard.board(spark, board)
    val retained = Monitoring.anomalyEnsembleOf(
      spark.read.parquet(ledger).drop("batch"))
    assert(live.exceptAll(retained).count() === 0 &&
      retained.exceptAll(live).count() === 0,
      "post-prune regroup did not cover exactly the retained window")
    // prune everything below the newest epoch: the newest must survive
    graft.streaming.LedgerBoard.pruneLedger(spark, ledger, 99L, Some(board))
    assert(graft.streaming.LedgerBoard.board(spark, board).count() ===
      live.count(), "prune deleted the newest committed epoch")
  }

  test("ledger board is schema-generic: a DOCUMENT stream boards with its own column set") {
    // the r11 verdict's item 5: the "generic" cadence must board
    // non-event frames — ledgerCols carries the boarded stream's own
    // projection instead of the hardcoded events schema
    val ledger = tmp("graft-gd-led")
    val board = tmp("graft-gd-brd")
    val docCols = Seq("doc_id", "text", "source")
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "source")
      .localCheckpoint(true)
    (0 until 2).foreach { b =>
      graft.streaming.LedgerBoard.applyBatch(
        docs.filter($"doc_id" % 2 === b), b.toLong, ledger, board,
        regroupEvery = 1, ledgerCols = docCols)(h =>
        graft.operators.Curation.gopherRules(h))
    }
    val live = graft.streaming.LedgerBoard.board(spark, board)
    val batch = graft.operators.Curation.gopherRules(docs)
    assert(live.count() > 0, "document board came up empty")
    assert(live.exceptAll(batch).count() === 0 &&
      batch.exceptAll(live).count() === 0,
      "boarded gopher verdict != batch verdict over the same docs")
    // the event boards keep working unchanged through the default
    val evLedger = tmp("graft-gd-eled")
    val evBoard = tmp("graft-gd-ebrd")
    graft.streaming.LedgerBoard.applyBatch(
      Tables.events(spark, sf).limit(200), 0L, evLedger, evBoard,
      regroupEvery = 1)(h => Monitoring.anomalyEnsembleOf(h))
    assert(graft.streaming.LedgerBoard.board(spark, evBoard).columns
      .nonEmpty)
  }

  test("mix board: a replayed document stream's weight table equals batch C62") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ledger = tmp("graft-mxb-led")
    val board = tmp("graft-mxb-brd")
    val ckpt = tmp("graft-mxb-ck")
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").localCheckpoint(true)
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val input = MemoryStream[(Long, String, String)](106, spark, None)
    val q = graft.streaming.MixBoard.start(
      input.toDS().toDF("doc_id", "source", "text"), ledger, board, ckpt)
    try {
      input.addData(rows.take(rows.length / 2))
      q.processAllAvailable()
      input.addData(rows.drop(rows.length / 2))
      q.processAllAvailable()
    } finally q.stop()
    val live = graft.streaming.MixBoard.board(spark, board)
    val batch = graft.operators.Curation.mixReweightOf(docs, "source")
    assert(live.count() > 0, "mix board came up empty")
    assert(live.exceptAll(batch).count() === 0 &&
      batch.exceptAll(live).count() === 0,
      "boarded weight table != batch C62 on replayed history")
  }

  test("card board: a replayed document stream's datasheet equals batch C68") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ledger = tmp("graft-cdb-led")
    val board = tmp("graft-cdb-brd")
    val ckpt = tmp("graft-cdb-ck")
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "lang", "text").localCheckpoint(true)
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq
    val input = MemoryStream[(Long, String, String, String)](107, spark, None)
    val q = graft.streaming.CardBoard.start(
      input.toDS().toDF("doc_id", "source", "lang", "text"),
      ledger, board, ckpt)
    try {
      input.addData(rows.take(rows.length / 2))
      q.processAllAvailable()
      input.addData(rows.drop(rows.length / 2))
      q.processAllAvailable()
    } finally q.stop()
    val live = graft.streaming.CardBoard.board(spark, board)
    val batch = graft.operators.Curation.dataCardOf(docs)
    assert(live.count() > 0, "card board came up empty")
    assert(live.exceptAll(batch).count() === 0 &&
      batch.exceptAll(live).count() === 0,
      "boarded datasheet != batch C68 on replayed history")
  }

  test("card sketch board: merged partials match batch C68, dup cell within sketch error, exact cells exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ledger = tmp("graft-csb-led")
    val ckpt = tmp("graft-csb-ck")
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "lang", "text").localCheckpoint(true)
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq
    val input = MemoryStream[(Long, String, String, String)](108, spark, None)
    val q = graft.streaming.CardSketchBoard.start(
      input.toDS().toDF("doc_id", "source", "lang", "text"),
      ledger, ckpt)
    try {
      input.addData(rows.take(rows.length / 3))
      q.processAllAvailable()
      input.addData(rows.slice(rows.length / 3, 2 * rows.length / 3))
      q.processAllAvailable()
      input.addData(rows.drop(2 * rows.length / 3))
      q.processAllAvailable()
    } finally q.stop()
    val live = graft.streaming.CardSketchBoard.board(spark, ledger)
      .collect().map(r => r.getString(0) -> r).toMap
    val batch = graft.operators.Curation.dataCardOf(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(live.keySet === batch.keySet, "source sets differ")
    batch.foreach { case (src, b) =>
      val l = live(src)
      // additive cells merge EXACTLY across triggers
      assert(l.getLong(1) === b.getLong(1), s"$src n_docs")
      assert(l.getLong(2) === b.getLong(2), s"$src total_tokens")
      assert(l.getDouble(3) === b.getDouble(3), s"$src avg_tokens")
      assert(l.getDouble(5) === b.getDouble(5), s"$src pii_frac")
      assert(l.getDouble(6) === b.getDouble(6), s"$src gopher_pass_frac")
      assert(l.getString(7) === b.getString(7), s"$src top_lang")
      assert(l.getDouble(8) === b.getDouble(8), s"$src top_lang_share")
      // the one estimated cell: HLL union vs exact distinct, ~1% lgK 12
      assert(math.abs(l.getDouble(4) - b.getDouble(4)) <= 0.03,
        s"$src dup_rate_approx ${l.getDouble(4)} vs exact ${b.getDouble(4)}")
    }
    // exactly-once: replaying a delivered trigger converges, never adds
    graft.streaming.CardSketchBoard.applyBatch(
      rows.take(rows.length / 3)
        .toDF("doc_id", "source", "lang", "text"), 0L, ledger)
    val replayed = graft.streaming.CardSketchBoard.board(spark, ledger)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    batch.foreach { case (src, b) =>
      assert(replayed(src) === b.getLong(1),
        s"$src n_docs drifted after a replayed trigger") }
    // compaction: the folded ledger boards IDENTICALLY (sketch union
    // is associative), from one base partial set
    val compacted = tmp("graft-csb-cmp")
    graft.streaming.CardSketchBoard.compact(spark, ledger, compacted)
    val cmp = graft.streaming.CardSketchBoard.board(spark, compacted)
    val full = graft.streaming.CardSketchBoard.board(spark, ledger)
    assert(cmp.exceptAll(full).count() === 0 &&
      full.exceptAll(cmp).count() === 0,
      "compacted ledger boards differently")
    assert(spark.read.parquet(compacted).select("batch").distinct()
      .collect().map(_.getString(0)).toSeq === Seq("base"),
      "compaction left more than the base batch")
  }

  test("ensemble board: replayed history equals batch A63 row for row") {
    val staging = tmp("graft-eb-in")
    val ledger = tmp("graft-eb-led")
    val board = tmp("graft-eb-brd")
    val ckpt = tmp("graft-eb-ck")
    val stream = EventSource.replayTable(spark, sf, staging, parts = 3)
    val q = graft.streaming.EnsembleBoard.start(stream, ledger, board, ckpt)
    try q.processAllAvailable() finally q.stop()
    val live = graft.streaming.EnsembleBoard.board(spark, board)
    val batch = Monitoring.anomalyEnsemble(spark, sf)
    assert(live.count() > 0, "replay produced an empty ensemble board")
    assert(live.exceptAll(batch).count() === 0 &&
      batch.exceptAll(live).count() === 0,
      "ensemble board != batch A63 on replayed history")
  }
}
