package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Data-layout expressions: the per-row kernels behind
  * [[graft.operators.Scale.writeZOrdered]].
  */
object LayoutFunctions {

  /** Morton (Z-order) interleave of two 32-bit values into one long:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1, so
    * sorting by the result clusters rows that are close in BOTH
    * dimensions — the multi-column analog of sorting by one column.
    * Inputs are masked to their low 32 bits; the classic parallel
    * bit-spreading ladder keeps this a handful of ALU ops in codegen. */
  case class InterleaveBits(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"interleave_bits needs (bigint, bigint), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")

    private def spread(x: Long): Long = {
      var v = x & 0xFFFFFFFFL
      v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
      v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
      v = (v | (v << 2)) & 0x3333333333333333L
      v = (v | (v << 1)) & 0x5555555555555555L
      v
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        // the spreading ladder is inlined — a nested companion object has
        // no static forwarder, so a method call here would fail Janino
        // compilation and silently fall back to interpreted eval
        def ladder(in: String, v: String): String =
          s"""long $v = $in & 0xFFFFFFFFL;
             |$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
             |$v = ($v | ($v << 8)) & 0x00FF00FF00FF00FFL;
             |$v = ($v | ($v << 4)) & 0x0F0F0F0F0F0F0F0FL;
             |$v = ($v | ($v << 2)) & 0x3333333333333333L;
             |$v = ($v | ($v << 1)) & 0x5555555555555555L;""".stripMargin
        val (va, vb) = (ctx.freshName("za"), ctx.freshName("zb"))
        s"""
           |${ladder(a, va)}
           |${ladder(b, vb)}
           |${ev.value} = $va | ($vb << 1);
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "interleave_bits"
  }

  def interleaveBits(a: Column, b: Column): Column =
    GraftColumn.apply(InterleaveBits(
      GraftColumn.expression(a), GraftColumn.expression(b)))
}
