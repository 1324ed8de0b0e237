package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<float>`
  * embedding columns. Implemented with `doGenCode` so they stay inside
  * whole-stage codegen — the ANN/dedup hot paths run these per candidate
  * pair, so a Scala UDF (boxing + serialization) would dominate the
  * profile at 100 TB scale.
  *
  * Accumulation is double-precision and strictly sequential (element 0
  * to n-1), matching DuckDB's list arithmetic on DOUBLE[] so oracle
  * comparisons stay bit-exact (SURVEY.md §4).
  */
object VectorFunctions {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** cosine(a, b) = dot / (||a|| * ||b||); 0.0 when either norm is 0;
    * NULL on dimension mismatch — a truncated score would silently
    * corrupt dedup/ANN results when a mixed-model embedding sneaks into
    * the corpus, while NULL is visible and filterable. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // dimension mismatch → null
    override def checkInputDataTypes(): TypeCheckResult =
      if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cosine_sim needs array<float> inputs, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xi = ctx.freshName("xi")
        val yi = ctx.freshName("yi")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $xi = (double) $a.getFloat($i);
           |    double $yi = (double) $b.getFloat($i);
           |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
           |  }
           |  ${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
           |    : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
           |}
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** dot(a, b) with sequential double accumulation; NULL on dimension
    * mismatch (see CosineSimilarity). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // dimension mismatch → null
    override def checkInputDataTypes(): TypeCheckResult =
      if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("dot_product needs array<float>")

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var dot = 0.0
      var i = 0
      while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $dot = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |  }
           |  ${ev.value} = $dot;
           |}
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** ||a||₂ with sequential double accumulation. */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      if (isFloatArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("l2_norm needs array<float>")

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var s = 0.0
      var i = 0
      while (i < x.numElements()) {
        val xi = x.getFloat(i).toDouble; s += xi * xi; i += 1
      }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val xi = ctx.freshName("xi")
        s"""
           |double $s = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $xi = (double) $a.getFloat($i); $s += $xi * $xi;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Random-hyperplane LSH bucket: `bits` sign bits packed into a long.
    * Hyperplane components are pseudo-random ±1 derived from
    * XXH64(plane, dim) — deterministic across the cluster with zero
    * broadcast state (re-derived inside codegen'd loop). */
  case class HyperplaneLsh(child: Expression, bits: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      if (isFloatArray(child.dataType) && bits >= 1 && bits <= 63)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("hyperplane_lsh needs array<float>, 1<=bits<=63")

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var sig = 0L
      var p = 0
      while (p < bits) {
        var dot = 0.0
        var i = 0
        while (i < n) {
          val sign = if ((org.apache.spark.sql.catalyst.expressions.XXH64
            .hashLong(p.toLong << 32 | i, 42L) & 1L) == 0L) 1.0 else -1.0
          dot += sign * x.getFloat(i)
          i += 1
        }
        if (dot >= 0) sig |= (1L << p)
        p += 1
      }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val p = ctx.freshName("p")
        val dot = ctx.freshName("dot")
        val sig = ctx.freshName("sig")
        val sign = ctx.freshName("sign")
        val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
        s"""
           |long $sig = 0L;
           |for (int $p = 0; $p < $bits; $p++) {
           |  double $dot = 0.0;
           |  for (int $i = 0; $i < $a.numElements(); $i++) {
           |    double $sign = (($xxh.hashLong(((long) $p) << 32 | $i, 42L) & 1L) == 0L) ? 1.0 : -1.0;
           |    $dot += $sign * (double) $a.getFloat($i);
           |  }
           |  if ($dot >= 0) $sig |= (1L << $p);
           |}
           |${ev.value} = $sig;
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** IVF cell assignment: index of the nearest centroid by squared
    * Euclidean distance (first wins on ties, matching k-means argmin).
    * The centroid table rides along as a plan reference object — a few
    * KB task-serialized once per executor, so assignment is a map-only
    * codegen'd pass with zero shuffle and no ML model object on the
    * hot path. NULL on dimension mismatch (see CosineSimilarity). */
  case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true // dimension mismatch → null
    override def checkInputDataTypes(): TypeCheckResult =
      if (isFloatArray(child.dataType) && centroids.nonEmpty &&
          centroids.forall(_.length == centroids.head.length))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "nearest_centroid needs array<float> and >=1 equal-length centroids")

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != centroids.head.length) return null
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val cc = centroids(c)
        var d = 0.0
        var i = 0
        while (i < n) {
          val diff = x.getFloat(i).toDouble - cc(i); d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
        val i = ctx.freshName("i")
        val c = ctx.freshName("c")
        val d = ctx.freshName("d")
        val diff = ctx.freshName("diff")
        val best = ctx.freshName("best")
        val bestD = ctx.freshName("bestD")
        val cc = ctx.freshName("cc")
        s"""
           |if ($a.numElements() != $cRef[0].length) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $best = 0; double $bestD = Double.MAX_VALUE;
           |  for (int $c = 0; $c < $cRef.length; $c++) {
           |    double[] $cc = $cRef[$c];
           |    double $d = 0.0;
           |    for (int $i = 0; $i < $cc.length; $i++) {
           |      double $diff = (double) $a.getFloat($i) - $cc[$i]; $d += $diff * $diff;
           |    }
           |    if ($d < $bestD) { $bestD = $d; $best = $c; }
           |  }
           |  ${ev.value} = $best;
           |}
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // Column-API wrappers.
  def cosineSim(a: Column, b: Column): Column =
    GraftColumn.apply(CosineSimilarity(
      GraftColumn.expression(a), GraftColumn.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    GraftColumn.apply(DotProduct(
      GraftColumn.expression(a), GraftColumn.expression(b)))

  def l2Norm(a: Column): Column =
    GraftColumn.apply(L2Norm(GraftColumn.expression(a)))

  def hyperplaneLsh(a: Column, bits: Int): Column =
    GraftColumn.apply(HyperplaneLsh(GraftColumn.expression(a), bits))

  def nearestCentroid(a: Column, centroids: Array[Array[Double]]): Column =
    GraftColumn.apply(NearestCentroid(GraftColumn.expression(a), centroids))
}
