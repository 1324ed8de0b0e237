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
}
