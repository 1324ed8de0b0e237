package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out utilities (SURVEY.md §5): skew-salted joins and bucketed
  * layouts — the knobs a 100 TB deployment turns when AQE alone isn't
  * enough.
  */
object Scale {

  /** Inner equi-join resilient to heavy key skew: the (big, skewed)
    * left side gets a random salt in [0, salts); the (smaller) right
    * side is replicated once per salt value. A key holding 30% of all
    * rows then spreads over `salts` reducers instead of melting one.
    *
    * Semantically identical to `left.join(right, keys)` — every left
    * row meets every matching right row exactly once (it carries one
    * salt; the right copy with that salt exists exactly once).
    *
    * Use when runtime skew stats aren't available (AQE skew-join
    * handles the adaptive case; salting handles the planned case,
    * e.g. streaming joins where AQE doesn't apply).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int = 8): DataFrame = {
    require(salts >= 1)
    val saltedLeft = left.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
    val saltRange = right.sparkSession.range(salts.toLong)
      .select(col("id").cast("int").as("__salt"))
    val saltedRight = right.crossJoin(broadcast(saltRange))
    saltedLeft.join(saltedRight, keys :+ "__salt").drop("__salt")
  }

  /** Write a DataFrame bucketed+sorted by join keys. Two tables
    * bucketed the same way join WITHOUT a shuffle — at 100 TB,
    * pre-bucketing the fact tables turns every repeated key-join into
    * a map-side zip. (Bucketing requires saveAsTable; path-only
    * parquet cannot carry bucket metadata.) */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit = {
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Write a time-series DataFrame partitioned by day (`dt=yyyy-MM-dd`
    * directories). At 100 TB this is the layout decision that matters
    * most: a date-filtered query then prunes whole partitions at
    * planning time (`PartitionFilters` in the scan, zero I/O for
    * excluded days) instead of scanning everything. */
  def writePartitionedByDay(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("dt").parquet(path)

  /** Deterministic fingerprint of a DataFrame's content (order-free,
    * multiplicity-sensitive): decimal sum of per-row xxhash64 over all
    * columns. The cheap way to assert two hundred-terabyte pipelines
    * produced identical results without collecting either. (Not xor —
    * xor cancels rows with even multiplicity.) */
  def contentFingerprint(df: DataFrame): String = {
    val cols = df.columns.map(col)
    df.select(xxhash64(cols: _*).cast("decimal(38,0)").as("h"))
      .agg(sum(col("h")))
      .collect()(0) match {
        case r if r.isNullAt(0) => "0"
        case r => r.getDecimal(0).toBigInteger.toString
      }
  }
}
