package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Custom imperative aggregates (sketch-style: fixed-size mutable
  * buffer, map-side partial merge — the aggregation shape that scales:
  * state is O(buckets), never O(rows)).
  */
object AggFunctions {

  /** Fixed-bucket histogram over a double column: `nBuckets` equal
    * buckets on [lo, hi); out-of-range values clamp into the edge
    * buckets; NULL and NaN values are excluded. Emits array<long> of
    * counts. The CloudWatch
    * metric-distribution analog (percentile charts without a full
    * sort), and the TypedImperativeAggregate reference implementation
    * for this engine: a 10-bucket histogram over 100 TB costs 80 bytes
    * of state per group. */
  case class HistogramAgg(
      child: Expression,
      nBuckets: Int,
      lo: Double,
      hi: Double,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    private val width = (hi - lo) / nBuckets

    override def children: Seq[Expression] = child :: Nil
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == DoubleType && nBuckets >= 1 && hi > lo)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "value_histogram needs (double, nBuckets>=1, hi>lo)")

    override def createAggregationBuffer(): Array[Long] = new Array[Long](nBuckets)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null && !v.asInstanceOf[Double].isNaN) {
        val d = v.asInstanceOf[Double]
        var b = math.floor((d - lo) / width).toInt
        if (b < 0) b = 0
        if (b >= nBuckets) b = nBuckets - 1
        buf(b) += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < nBuckets) { a(i) += b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * nBuckets)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(nBuckets)(bb.getLong)
    }

    override def withNewMutableAggBufferOffset(o: Int): HistogramAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HistogramAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c.head)
    override def prettyName: String = "value_histogram"
  }

  def valueHistogram(c: Column, nBuckets: Int, lo: Double, hi: Double): Column =
    GraftColumn.apply(
      HistogramAgg(GraftColumn.expression(c), nBuckets, lo, hi)
        .toAggregateExpression())

  /** Misra-Gries heavy hitters over a string column: approximate top-k
    * with a HARD state bound of `capacity = slack·k` counters per
    * group, fully mergeable — the 100 TB answer to "top words/devices/
    * URLs" when an exact groupBy would shuffle every distinct key.
    *
    * Guarantees (classic MG): every estimate is an UNDERCOUNT by at
    * most n/capacity (n = rows seen by the group), and any key with
    * true count > n/capacity is guaranteed to be present in the
    * sketch. Merge subtracts the (capacity+1)-th largest counter from
    * all (Agarwal et al.'s mergeable-summaries rule), preserving both
    * bounds. Estimates may vary ±n/capacity with partition merge
    * order; rank-1 on a skewed corpus does not (spec-pinned).
    *
    * Emits the top-k as array<struct<word, est>> sorted by
    * (est DESC, word) for a deterministic surface. Deterministic
    * GIVEN a merge order, though: once distinct keys exceed capacity,
    * shuffle-fetch order changes the exact est values and can flip
    * membership at the k-th rank boundary run-to-run. That is WHY
    * word_freq_topk_approx (vocabulary ≫ capacity at every SF) is
    * declared rows-only in SURVEY §2 and must never be promoted to
    * the hash gate — the sketch's contract there is the error bound,
    * not a stable byte-for-byte output. EXCEPTION — the provably-exact
    * regime: while a consumer's distinct-key count stays under
    * capacity, no compaction fires in any buffer or merge, every est
    * is the exact count, and the output IS merge-order invariant;
    * mon_top_error_devices_approx sizes its sketch (8k counters) so
    * driver fleets sit in that regime and is hash-gated there, with
    * the precondition spec-pinned (MonitoringSpec). */
  case class HeavyHittersAgg(
      child: Expression,
      k: Int,
      slack: Int = 8,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.HashMap[org.apache.spark.unsafe.types.UTF8String, Long]] {

    private type Sketch =
      scala.collection.mutable.HashMap[org.apache.spark.unsafe.types.UTF8String, Long]
    private val capacity = k * slack

    override def children: Seq[Expression] = child :: Nil
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("word", StringType, nullable = false),
        StructField("est", LongType, nullable = false))),
      containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType && k >= 1 && slack >= 2)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "approx_top_k needs (string, k>=1, slack>=2)")

    override def createAggregationBuffer(): Sketch =
      scala.collection.mutable.HashMap.empty

    /** Drop every counter to `keep` at most `capacity` survivors: the
      * shared compaction of update (decrement-by-1 when full) and
      * merge (subtract the (capacity+1)-th largest). */
    private def compact(buf: Sketch): Unit = {
      if (buf.size <= capacity) return
      // update path: exactly one over — the (capacity+1)-th largest is
      // the min, no sort needed (O(capacity) per saturated insert)
      val cut =
        if (buf.size == capacity + 1) buf.values.min
        else {
          val counts = buf.values.toArray
          java.util.Arrays.sort(counts)
          counts(counts.length - capacity - 1) // (capacity+1)-th largest
        }
      buf.filterInPlace { case (_, c) => c > cut }
      buf.mapValuesInPlace { case (_, c) => c - cut }
    }

    override def update(buf: Sketch, input: InternalRow): Sketch = {
      val v = child.eval(input)
      if (v != null) {
        val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        val cur = buf.getOrElse(s, -1L)
        if (cur >= 0L) buf.put(s, cur + 1L) // hot path: zero allocation
        else {
          // new key: COPY before retaining — the UTF8String from eval
          // points into a row buffer the scan reuses
          buf.put(s.clone(), 1L)
          compact(buf)
        }
      }
      buf
    }

    override def merge(a: Sketch, b: Sketch): Sketch = {
      b.foreach { case (w, c) =>
        a.put(w, a.getOrElse(w, 0L) + c)
      }
      compact(a)
      a
    }

    override def eval(buf: Sketch): Any = {
      val top = buf.toArray
        .sortBy { case (w, c) => (-c, w.toString) }.take(k)
      new GenericArrayData(top.map { case (w, c) => InternalRow(w, c) })
    }

    override def serialize(buf: Sketch): Array[Byte] = {
      val entries = buf.toArray
      val byteLens = entries.map(_._1.getBytes)
      val bb = ByteBuffer.allocate(4 + byteLens.map(_.length + 12).sum)
      bb.putInt(entries.length)
      entries.zip(byteLens).foreach { case ((_, c), wb) =>
        bb.putInt(wb.length); bb.put(wb); bb.putLong(c)
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Sketch = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf: Sketch = scala.collection.mutable.HashMap.empty
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val wb = new Array[Byte](len)
        bb.get(wb)
        buf.put(org.apache.spark.unsafe.types.UTF8String.fromBytes(wb), bb.getLong)
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression = copy(child = c.head)
    override def prettyName: String = "approx_top_k"
  }

  def approxTopK(c: Column, k: Int, slack: Int = 8): Column =
    GraftColumn.apply(
      HeavyHittersAgg(GraftColumn.expression(c), k, slack)
        .toAggregateExpression())
}
