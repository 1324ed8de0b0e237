package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen'd predicate.
  *
  * The filter rides along as a plan reference object (task-serialized
  * once per executor, like the IVF centroid table) so the probe is a
  * branch-free per-row check inside whole-stage codegen — the building
  * block of [[graft.operators.Scale.bloomPrefilterJoin]], where it
  * discards non-joining rows BEFORE the shuffle.
  */
object BloomFunctions {

  /** might_contain(key): false ⇒ key definitely absent from the set the
    * filter was built on; true ⇒ present or false positive (rate fpp).
    * Long keys only — the join-key type this engine pre-filters. */
  case class BloomMightContain(child: Expression, filter: BloomFilter)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"might_contain needs a bigint key, got ${child.dataType.sql}")

    override def nullSafeEval(v: Any): Any =
      filter.mightContainLong(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val ref = ctx.addReferenceObj("bloom", filter,
          classOf[BloomFilter].getName)
        s"${ev.value} = $ref.mightContainLong($v);"
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "might_contain"
  }

  def mightContain(key: Column, filter: BloomFilter): Column =
    GraftColumn.apply(BloomMightContain(GraftColumn.expression(key), filter))
}
