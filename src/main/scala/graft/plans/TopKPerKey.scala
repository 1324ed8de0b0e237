package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumn}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator custom plan (SURVEY.md §2.G): exact top-k rows per
  * key, as a native LogicalPlan + Strategy + SparkPlan.
  *
  * The composed alternative — `row_number().over(partitionBy(keys)
  * .orderBy(o)) <= k` — shuffles EVERY row, then fully sorts every
  * partition. This operator keeps a bounded k-row heap per key:
  *
  *  - partial pass (map side, pre-shuffle): each input partition
  *    reduces to ≤ k rows per key it has seen, so the exchange moves
  *    O(keys·k), not O(rows);
  *  - final pass (post-shuffle, clustered by key): exact top-k per key.
  *
  * At 100 TB with a bounded key space this turns the dominant shuffle
  * into a rounding error. Memory is O(distinct-keys-per-partition · k)
  * — the same bound as any hash aggregation.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // "row a sorts before row b" — top-k keeps the first k in this order
      val lt = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap on sort position: head = worst kept row, evicted first.
      // Rows stay InternalRow — a non-Unsafe child (DSv2 readers emit
      // GenericInternalRow) must not crash; only the projected key
      // needs Unsafe equality/hashing for the map.
      val heapOrd: Ordering[InternalRow] =
        (a: InternalRow, b: InternalRow) => lt.compare(a, b)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, heapOrd.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(row.copy())
        } else if (lt.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values.forEach { h => h.forEach { r => out += r } }
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Plans TopKPerKeyNode as partial → (exchange inserted by
  * EnsureRequirements) → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      val partialExec = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

/** User-facing API. */
object TopK {
  /** Exact top-`k` rows per key group, ordered by `orderBy` (include a
    * unique tie-breaker for deterministic results). */
  def perKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val keyExprs: Seq[Expression] = keyCols.map(c => GraftColumn.expression(df(c)))
    val order: Seq[SortOrder] = orderBy.map { c =>
      GraftColumn.expression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, Ascending)
      }
    }
    GraftColumn.ofRows(spark,
      TopKPerKeyNode(keyExprs, order, k, df.queryExecution.analyzed))
  }
}
