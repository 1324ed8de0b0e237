package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Monitoring

/** GENERIC periodic-recompute board — the streaming shape shared by
  * every "live twin of a whole-history batch product" in this repo
  * ([[IncidentBoard]] = A58's groups, [[EnsembleBoard]] = A63's
  * per-device ensemble): some monitoring products (connected
  * components, full-series correlation, median-based outlier panels)
  * change NON-INCREMENTALLY when one event arrives, so their honest
  * live twin is not a state machine but a cadence: land events in an
  * exactly-once LEDGER, periodically re-run the batch operator over
  * it, publish the result as a committed EPOCH a reader can always
  * poll consistently.
  *
  * The two fences, once, for every instantiation:
  *
  *  1. Ledger: each trigger owns `batch=<id>/` and a replayed trigger
  *     (same id, same content — checkpoint determinism) OVERWRITES its
  *     own directory (the AlertSink epoch fence) — never duplicates.
  *  2. Board: each regroup lands under `epoch=<id>/`; the `_SUCCESS`
  *     marker is the commit point [[board]] keys on, so a crash
  *     mid-regroup leaves the previous epoch visible, never a torn
  *     table; a replayed regroup overwrites its own epoch and
  *     converges.
  *
  * Scale: per-regroup cost = the wrapped batch operator's (each is
  * individually audited) + one ledger scan — the honest price of a
  * whole-history product. `regroupEvery` trades staleness against
  * regroup frequency; a retention sweep over old `batch=` directories
  * bounds the ledger when the analysis window is finite. */
object LedgerBoard {

  /** The default ledger projection — the events schema the first two
    * instantiations (IncidentBoard, EnsembleBoard) board. Kept as an
    * explicit default rather than `batch.columns` so those boards'
    * ledgers stay schema-stable even if the SOURCE grows columns
    * (a ledger is a durable table; silent widening would make epoch
    * N+1's files schema-diverge from epoch N's under one root). */
  val EventLedgerCols: Seq[String] =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** Attach a board maintainer: `recompute` is the batch operator run
    * over the accumulated ledger at each regroup trigger; `ledgerCols`
    * is the ledger's projection — pass the boarded stream's own
    * columns to board a non-event frame (documents, embeddings — the
    * generic contract the r11 verdict asked to honor). */
  def start(events: DataFrame, ledgerDir: String, boardDir: String,
      checkpointDir: String, regroupEvery: Int = 1,
      ledgerCols: Seq[String] = EventLedgerCols)(
      recompute: DataFrame => DataFrame): StreamingQuery = {
    require(regroupEvery >= 1, s"regroupEvery $regroupEvery must be >= 1")
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, ledgerDir, boardDir, regroupEvery,
          ledgerCols)(recompute)
      }
      .start()
  }

  /** One trigger: ledger append (exactly-once) + periodic recompute.
    * Public so replay-fence specs can re-invoke a delivered batch. */
  def applyBatch(batch: DataFrame, batchId: Long, ledgerDir: String,
      boardDir: String, regroupEvery: Int,
      ledgerCols: Seq[String] = EventLedgerCols)(
      recompute: DataFrame => DataFrame): Unit = {
    val spark = batch.sparkSession
    batch.select(ledgerCols.head, ledgerCols.tail: _*)
      .write.mode("overwrite").parquet(s"$ledgerDir/batch=$batchId")
    if (batchId % regroupEvery == 0) {
      val history = spark.read.parquet(ledgerDir).drop("batch")
      recompute(history)
        .write.mode("overwrite").parquet(s"$boardDir/epoch=$batchId")
    }
  }

  /** The retention sweep the scale note promises: drop ledger batches
    * below `keepFromBatchId` (and, with `pruneBoard`, board epochs
    * below it — keeping at least the newest committed epoch so a
    * reader never loses the board). Run from maintenance, not the hot
    * path — the next regroup then covers the RETAINED window, which
    * is the stated semantics ("groups over the retained window"), not
    * data loss. Idempotent: pruning an already-pruned range is a
    * no-op. */
  def pruneLedger(spark: SparkSession, ledgerDir: String,
      keepFromBatchId: Long, boardDir: Option[String] = None): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val lroot = new Path(ledgerDir)
    val lfs = lroot.getFileSystem(conf)
    if (lfs.exists(lroot))
      lfs.listStatus(lroot).map(_.getPath)
        .filter(_.getName.startsWith("batch="))
        .filter(_.getName.stripPrefix("batch=").toLong < keepFromBatchId)
        .foreach(p => lfs.delete(p, true))
    boardDir.foreach { bd =>
      val broot = new Path(bd)
      val bfs = broot.getFileSystem(conf)
      if (bfs.exists(broot)) {
        val epochs = bfs.listStatus(broot).map(_.getPath)
          .filter(_.getName.startsWith("epoch="))
          .filter(p => bfs.exists(new Path(p, "_SUCCESS")))
          .map(p => p.getName.stripPrefix("epoch=").toLong -> p)
        val newest = if (epochs.isEmpty) Long.MinValue else epochs.map(_._1).max
        // never delete the newest committed epoch: the reader's board
        epochs.filter { case (id, _) => id < keepFromBatchId && id != newest }
          .foreach { case (_, p) => bfs.delete(p, true) }
      }
    }
  }

  /** The newest COMMITTED epoch (`_SUCCESS`-marked — see the board
    * fence above). */
  def board(spark: SparkSession, boardDir: String): DataFrame = {
    val root = new Path(boardDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epochs =
      if (!fs.exists(root)) Array.empty[Long]
      else fs.listStatus(root).map(_.getPath)
        .filter(_.getName.startsWith("epoch="))
        .filter(p => fs.exists(new Path(p, "_SUCCESS")))
        .map(_.getName.stripPrefix("epoch=").toLong)
    require(epochs.nonEmpty, s"no committed board epoch under $boardDir")
    spark.read.parquet(s"$boardDir/epoch=${epochs.max}")
  }
}

/** LIVE MIXTURE-WEIGHT BOARD — C62's streaming twin on the
  * [[LedgerBoard]] cadence, and the first NON-EVENT instantiation
  * (the r12 ledger-schema generalization at work): land the document
  * stream in the ledger under its own column set, periodically re-run
  * the C62 reweighting over the full retained corpus, publish the
  * weight table as a committed epoch. Weight derivation is a
  * whole-corpus product (global token counts, the normalizing sum),
  * so it shares A58/A63's non-incremental character and the cadence
  * shape is its honest live twin — the board a mix owner polls for
  * "what would the learned weights be on everything ingested so
  * far". Fences, staleness/cost knobs, and retention inherit from
  * [[LedgerBoard]]; spec pins replayed-history parity with batch
  * C62. */
object MixBoard {
  val LedgerCols: Seq[String] = Seq("doc_id", "source", "text")

  def start(docs: DataFrame, ledgerDir: String, boardDir: String,
      checkpointDir: String, eta: Double = 1.0,
      regroupEvery: Int = 1): StreamingQuery =
    LedgerBoard.start(docs, ledgerDir, boardDir, checkpointDir,
      regroupEvery, ledgerCols = LedgerCols)(history =>
      graft.operators.Curation.mixReweightOf(history, "source", eta))

  def board(spark: SparkSession, boardDir: String): DataFrame =
    LedgerBoard.board(spark, boardDir)
}

/** STREAMING data-card board — C68's live twin on the [[LedgerBoard]]
  * cadence: the per-source datasheet (volume, exact-dup rate, PII
  * exposure, majority language, Gopher pass rate) recomputed over the
  * full document ledger each regroup. The dup-rate and majority-
  * language cells are whole-history distincts/modes — A58's
  * non-incremental character — so the cadence shape is the honest
  * twin; THIS board is what a data owner polls for "what does my
  * corpus look like right now" while ingest is live. Spec pins
  * replayed-history parity with batch C68. */
object CardBoard {
  val LedgerCols: Seq[String] = Seq("doc_id", "source", "lang", "text")

  def start(docs: DataFrame, ledgerDir: String, boardDir: String,
      checkpointDir: String, regroupEvery: Int = 1): StreamingQuery =
    LedgerBoard.start(docs, ledgerDir, boardDir, checkpointDir,
      regroupEvery, ledgerCols = LedgerCols)(history =>
      graft.operators.Curation.dataCardOf(history))

  def board(spark: SparkSession, boardDir: String): DataFrame =
    LedgerBoard.board(spark, boardDir)
}

/** INCREMENTAL data-card board — [[CardBoard]]'s scale path: the
  * cadence board re-reads the WHOLE document ledger per regroup,
  * which is the honest price of exact whole-history cells (exact
  * distinct, exact mode) but prices the board at O(corpus) per
  * trigger. This board ledgers MERGEABLE PARTIALS instead — counts
  * add, HLL sketches union (Spark's DataSketches hll_sketch_agg /
  * hll_union_agg, the same register-max merge a 1000-executor rollup
  * would ship) — so each trigger costs O(batch), the ledger holds
  * (source × lang)-sized rows per batch, and the board is a
  * poll-time merge over partials: no regroup cadence, always fresh.
  * The one cell that degrades is dup_rate: exact distinct becomes the
  * HLL estimate (~1% at lgK 12), carried as `dup_rate_approx` so the
  * schema SAYS it's an estimate (the B13/B36 naming rule). Exactly
  * once: a replayed trigger overwrites its own `batch=` partials. */
object CardSketchBoard {
  import org.apache.spark.sql.functions._

  def start(docs: DataFrame, ledgerDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b, id, ledgerDir) }
      .start()

  /** One trigger: fold the batch into (source, lang)-keyed partials —
    * every column either adds or unions under merge. Public so replay
    * fences can re-invoke a delivered batch. */
  def applyBatch(batch: DataFrame, batchId: Long,
      ledgerDir: String): Unit = {
    val g = graft.operators.Curation.gopherRules(batch)
      .select(col("doc_id"), col("passed"))
    batch.join(g, Seq("doc_id"))
      .select(col("source").cast("string").as("source"), col("lang"),
        size(graft.operators.TextAnalysis.tokens()).cast("long")
          .as("n_tokens"),
        sha2(col("text"), 256).as("h"),
        (graft.operators.TextAnalysis.piiCount(col("text")) > 0L)
          .as("pii_hit"),
        col("passed"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("pii_hit"), 1L).otherwise(0L)).as("pii_docs"),
        sum(when(col("passed"), 1L).otherwise(0L)).as("gopher_pass"),
        hll_sketch_agg(col("h")).as("sketch"))
      .write.mode("overwrite").parquet(s"$ledgerDir/batch=$batchId")
  }

  /** Compact the partial ledger — the index-family lifecycle applied
    * to board partials: a long-lived ingest leaves one `batch=`
    * directory per trigger, and the poll-time merge eventually pays
    * a listing/read per batch; compaction folds every partial into
    * ONE `batch=base` set per (source, lang) — counts sum, sketches
    * union into a single sketch (the merge is associative, so the
    * compacted ledger boards IDENTICALLY). Functional: writes only
    * `dstDir`, a crash leaves the live ledger untouched; swap and
    * delete src afterwards (the compactLshIndex contract). */
  def compact(spark: SparkSession, ledgerDir: String,
      dstDir: String): Unit = {
    spark.read.parquet(ledgerDir).drop("batch")
      .groupBy(col("source"), col("lang"))
      .agg(sum("n_docs").as("n_docs"),
        sum("total_tokens").as("total_tokens"),
        sum("pii_docs").as("pii_docs"),
        sum("gopher_pass").as("gopher_pass"),
        hll_union_agg(col("sketch")).as("sketch"))
      .write.mode("overwrite").parquet(s"$dstDir/batch=base")
  }

  /** Poll-time merge: sums + sketch unions over the partial ledger —
    * O(#batches × #sources × #langs) rows, never the corpus. */
  def board(spark: SparkSession, ledgerDir: String): DataFrame = {
    val p = spark.read.parquet(ledgerDir).drop("batch")
    val perLang = p.groupBy(col("source"), col("lang"))
      .agg(sum("n_docs").as("nl"))
    val wL = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("nl").desc, col("lang"))
    val top = perLang
      .withColumn("rk",
        org.apache.spark.sql.functions.row_number().over(wL))
      .filter(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("nl"))
    p.groupBy(col("source"))
      .agg(sum("n_docs").as("n_docs"),
        sum("total_tokens").as("total_tokens"),
        sum("pii_docs").as("pii_docs"),
        sum("gopher_pass").as("gopher_pass"),
        hll_sketch_estimate(hll_union_agg(col("sketch")))
          .as("est_distinct"))
      .join(top, Seq("source"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        round(col("total_tokens").cast("double") / col("n_docs"), 6)
          .as("avg_tokens"),
        round(lit(1.0) -
          col("est_distinct").cast("double") / col("n_docs"), 6)
          .as("dup_rate_approx"),
        round(col("pii_docs").cast("double") / col("n_docs"), 6)
          .as("pii_frac"),
        round(col("gopher_pass").cast("double") / col("n_docs"), 6)
          .as("gopher_pass_frac"),
        col("top_lang"),
        round(col("nl").cast("double") / col("n_docs"), 6)
          .as("top_lang_share"))
      .orderBy(col("source"))
  }
}

/** STREAMING anomaly-ensemble board — A63's live twin on the
  * [[LedgerBoard]] cadence: the per-device multi-detector panel
  * (z-score sample counts, MAD counts, CUSUM alarm magnitude, the
  * ensemble verdict) recomputed over the full ledger each regroup.
  * A63 is median- and full-series-moment-based, so it shares A58's
  * non-incremental character — the cadence shape is the honest twin
  * (the pager-speed detectors already stream: A33/A37/A52's kin);
  * THIS board is what the ops review polls for "which devices do the
  * detectors agree on right now". Spec pins replayed-history parity
  * with batch A63. */
object EnsembleBoard {
  def start(events: DataFrame, ledgerDir: String, boardDir: String,
      checkpointDir: String, k: Double = 2.0, kMad: Double = 3.5,
      target: Double = 50.0, slack: Double = 2.5, h: Double = 200.0,
      regroupEvery: Int = 1): StreamingQuery =
    LedgerBoard.start(events, ledgerDir, boardDir, checkpointDir,
      regroupEvery)(history =>
      Monitoring.anomalyEnsembleOf(history, k, kMad, target, slack, h))

  def board(spark: SparkSession, boardDir: String): DataFrame =
    LedgerBoard.board(spark, boardDir)
}
