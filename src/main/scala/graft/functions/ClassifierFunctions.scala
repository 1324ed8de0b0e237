package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Dense linear-model scoring as a native expression — the serving
  * kernel of the C60 quality classifier: a TRAINED model is a plain
  * `double[]` indexed by feature bucket (every bucket id is already in
  * [0, len) by the hash pipeline's pmod), so scoring a document is one
  * array-gather sum inside whole-stage codegen — no join, no shuffle,
  * no state, which is what lets the same projection score a BATCH
  * corpus and a LIVE ingest stream unchanged. */
object ClassifierFunctions {

  /** bucket_score_sum(bs): Σ weights[b] over a bucket-id array. */
  case class BucketScoreSum(child: Expression, weights: Array[Double])
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) if weights.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bucket_score_sum needs array<bigint> and a non-empty model, got ${t.sql}")
    }

    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val n = xs.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { s += weights(xs.getLong(i).toInt); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val wRef = ctx.addReferenceObj("weights", weights, "double[]")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |double $s = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  $s += $wRef[(int) $a.getLong($i)];
           |}
           |${ev.value} = $s;
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "bucket_score_sum"
  }

  def bucketScoreSum(bs: Column, weights: Array[Double]): Column =
    GraftColumn.apply(BucketScoreSum(GraftColumn.expression(bs), weights))
}
