package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DELETION lifecycle shared by the three persisted indexes (LSH,
  * SimHash, IVF). Takedowns, licensing retractions, and
  * right-to-be-forgotten requests are routine curation events at
  * corpus scale, and a deleted doc's staged postings must stop
  * emitting pairs/results WITHOUT a full index rebuild — rebuilding
  * 100 TB of signatures to forget one document is not a deletion
  * story.
  *
  * Model: a `tombstones/` table of deleted ids inside the index dir,
  * written in `batch=` partitions exactly like index appends
  * (idempotent per batchId via dynamic partition overwrite — a
  * retried takedown replaces its own partition instead of duplicating
  * rows, though duplicates would be harmless to an anti-join). Probes
  * subtract the set from the staged scan with a LEFT ANTI join on id:
  * the tombstone side is tiny relative to the index, so AQE plans a
  * broadcast hash anti-join — a map-side filter over the staged rows,
  * no extra shuffle of the big side. Compaction applies the
  * subtraction PHYSICALLY and writes no tombstone table to the
  * destination: the rewrite it already pays folds deletions in, so
  * tombstone growth is bounded by the compaction cadence and the
  * deleted bytes are actually gone (the right-to-be-forgotten
  * requirement — an anti-join hides rows; only the compact rewrite
  * erases them). */
private[operators] object Tombstones {

  /** Record deleted ids. Ids are longs in every index (doc_id /
    * vec_id); the set is deduplicated and written as one file per
    * batch (takedown lists are small — a huge deletion is a rebuild,
    * not a tombstone). An EMPTY takedown is a no-op: writing zero rows
    * would create a data-file-less tombstones directory that every
    * later probe fails to schema-infer — bricking the index over a
    * day's takedown feed that filtered to nothing. */
  def write(ids: DataFrame, idCol: String, indexDir: String,
      batchId: String): Unit = {
    require(batchId.nonEmpty,
      "batchId must be a unique label (e.g. the takedown date)")
    val dedup = ids.select(col(idCol).cast("long").as("id")).distinct()
      .coalesce(1)
      .localCheckpoint(true) // one evaluation: the emptiness probe IS the write input
    try {
      if (!dedup.isEmpty) {
        dedup.withColumn("batch", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch").parquet(s"$indexDir/tombstones")
      }
    } finally graft.Tables.unpinCheckpoint(dedup)
  }

  /** Drop any recorded deletions — called by every full index REBUILD
    * (write*Index over an existing dir): the staged tables are
    * replaced wholesale, and a stale tombstone set surviving the
    * rebuild would silently filter legitimately re-ingested ids out of
    * the brand-new index forever. */
  def clear(spark: SparkSession, indexDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** The deleted-id set, or None when no deletion was ever recorded —
    * the common case, which must stay a zero-cost existence check, not
    * an error-handled read. */
  def read(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString).select(col("id")))
    else None
  }

  /** Subtract recorded deletions from a staged index scan (no-op when
    * none are recorded). */
  def applyTo(staged: DataFrame, spark: SparkSession, indexDir: String,
      idCol: String = "id"): DataFrame =
    read(spark, indexDir) match {
      case Some(t) =>
        staged.join(t.select(col("id").as(idCol)), Seq(idCol), "left_anti")
      case None => staged
    }
}
