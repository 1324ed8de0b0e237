package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumn}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** OPTIMIZER FENCE — a zero-cost evaluation barrier (SURVEY.md §2.G).
  *
  * The r15 expression-duplication cure ([[graft.operators.Scale.evalOnce]])
  * was an RDD round-trip: `createDataFrame(df.rdd, schema)` plants a
  * `LogicalRDD` leaf the optimizer cannot see through. It works, but
  * the mechanism pays for what it does NOT need: `df.rdd` decodes every
  * InternalRow to an external `Row`, the re-wrap encodes every `Row`
  * back — two full conversions of the corpus per pass — and each call
  * creates a fresh RDD object, so two plans sharing a barriered stage
  * can never match for `ReusedExchange`.
  *
  * What the cure actually requires is only that predicate pushdown,
  * project collapse, and column pruning not cross a boundary. Those
  * rules match on KNOWN node types (Project/Filter/Aggregate/… and a
  * whitelist of pushable unary nodes); a custom `UnaryNode` they have
  * never heard of is, by construction, opaque to all of them. So the
  * fence is the minimal barrier: a custom logical node planned to a
  * physical pass-through whose `doExecute` IS `child.execute()` — zero
  * per-row work, no re-encode, no RDD identity. The physical node does
  * not implement `CodegenSupport`, so it also splits whole-stage
  * codegen exactly where the barrier sits (each side codegens
  * normally; the seam costs one iterator hop per row).
  *
  * MEASURED VERDICT (r16): the library's barriers KEEP the RDD
  * round-trip. The A/B on the curate family at sf0.1 ran the fence
  * slower warm on six of seven slots (crawl 2.95 vs 2.34 s, robust
  * 3.72 vs 2.88, full 2.23 vs 1.85; prod a wash) and 2–3× slower
  * cold — the unified single query pays one giant whole-stage-codegen
  * compile and stats-driven re-planning above the barrier, which
  * outweighs the two per-row conversions the RDD mechanism spends.
  * The fence stays as §2.G machinery with its PlanSpec proof
  * (pushdown blocked, zero conversion, result-identical), for plans
  * where the trade runs the other way: very wide rows (conversion
  * dominates), cheap short plans (compile mass negligible), or
  * barriered stages that must stay ReusedExchange-compatible —
  * identical fence subtrees still match, where two evalOnce calls
  * never can (fresh RDD identity each).
  *
  * Other observable differences from the RDD barrier: plans PRINT the
  * full tree below a fence (the RDD barrier truncates at a scan
  * leaf), so expression-copy audits see below-barrier projection
  * prints; partitioning/ordering propagate through, so a fence never
  * inserts an exchange the plan did not already have.
  */
case class FenceNode(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class FenceExec(child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def doExecute(): RDD[InternalRow] = child.execute()
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

object FenceStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case FenceNode(child) => FenceExec(planLater(child)) :: Nil
    case _ => Nil
  }
}

object Fence {
  /** `df` with an optimizer fence on top: consumers above see plain
    * attributes; no predicate, projection, or pruning crosses down. */
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(FenceStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ FenceStrategy
    }
    GraftColumn.ofRows(spark, FenceNode(df.queryExecution.analyzed))
  }
}
