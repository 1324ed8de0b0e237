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

  /** Per-vector INT8 scalar quantization — the memory-bound path of
    * vector search at 100 TB: a float32 corpus quartered to one byte
    * per dimension plus O(1) per-vector metadata, at ~1-2% cosine
    * error. Affine map: q[i] = round((x[i] - lo) / scale) - 128 with
    * scale = (hi - lo)/255, so x̂[i] = zero + scale·(q[i]+128).
    * The struct carries what the pair kernel needs in O(1):
    * Σ(q[i]+128) and the DEQUANTIZED norm (denominator must match the
    * approximation the numerator uses, or cosine of a vector with
    * itself drifts from 1). Build-time map pass → CodegenFallback is
    * fine ([[Int8CosineSim]], the per-pair hot path, is codegen'd). */
  case class Quantize8(child: Expression)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = Quantize8.schema
    override def checkInputDataTypes(): TypeCheckResult =
      if (isFloatArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"quantize8 needs array<float>, got ${child.dataType.catalogString}")

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val n = v.numElements()
      var lo = Float.MaxValue
      var hi = Float.MinValue
      var i = 0
      while (i < n) {
        val x = v.getFloat(i)
        if (x < lo) lo = x
        if (x > hi) hi = x
        i += 1
      }
      if (n == 0) { lo = 0f; hi = 0f }
      val scale = if (hi > lo) (hi - lo) / 255f else 0f
      val q = new Array[Byte](n)
      var sumq = 0L
      var norm = 0.0
      i = 0
      while (i < n) {
        val u = if (scale > 0f)
          math.round((v.getFloat(i) - lo) / scale) else 0
        q(i) = (u - 128).toByte
        sumq += u
        val xh = lo + scale * u
        norm += xh.toDouble * xh.toDouble
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](
          new org.apache.spark.sql.catalyst.util.GenericArrayData(q),
          lo, scale, sumq, math.sqrt(norm)))
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
  object Quantize8 {
    val schema: StructType = StructType(Seq(
      StructField("q", ArrayType(ByteType, containsNull = false), nullable = false),
      StructField("zero", FloatType, nullable = false),
      StructField("scale", FloatType, nullable = false),
      StructField("sumq", LongType, nullable = false),
      StructField("norm", DoubleType, nullable = false)))

    /** Nullability-insensitive schema match: a parquet round-trip (the
      * int8 serving snapshot) re-reads the struct with nullable fields,
      * but the VALUES are produced non-null by [[Quantize8]]. Field
      * NAMES still must match — `equalsStructurally` alone ignores
      * them, so any five-field struct of the same shape (e.g. one with
      * zero/scale swapped) would pass the check and score garbage
      * silently instead of failing type-check. */
    def isQuantize8Struct(t: DataType): Boolean = t match {
      case s: StructType =>
        s.fieldNames.sameElements(schema.fieldNames) &&
          DataType.equalsStructurally(s, schema, ignoreNullability = true)
      case _ => false
    }
  }

  /** Cosine over two [[Quantize8]] structs — the int8 pair kernel.
    * dot(x̂, ŷ) expands to
    * n·z1·z2 + z1·s2·Σb + z2·s1·Σa + s1·s2·Σ(a_i·b_i) with
    * a_i = q1[i]+128: the inner loop is a pure INTEGER multiply-add
    * over byte arrays (SIMD-friendly, no float loads), the three
    * correction terms are O(1) from the struct metadata, and the
    * denominator uses the stored dequantized norms. Codegen'd — this
    * is the per-candidate-pair hot path. NULL on dimension mismatch,
    * like [[CosineSimilarity]]. */
  case class Int8CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (Quantize8.isQuantize8Struct(left.dataType) &&
        Quantize8.isQuantize8Struct(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "int8_cosine_sim needs two quantize8 structs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

    override def nullSafeEval(a: Any, b: Any): Any = {
      val ra = a.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val rb = b.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val qa = ra.getArray(0)
      val qb = rb.getArray(0)
      val n = qa.numElements()
      if (n != qb.numElements()) return null
      var di = 0L
      var i = 0
      while (i < n) {
        di += (qa.getByte(i) + 128).toLong * (qb.getByte(i) + 128).toLong
        i += 1
      }
      val (z1, s1, sum1, n1) =
        (ra.getFloat(1).toDouble, ra.getFloat(2).toDouble, ra.getLong(3), ra.getDouble(4))
      val (z2, s2, sum2, n2) =
        (rb.getFloat(1).toDouble, rb.getFloat(2).toDouble, rb.getLong(3), rb.getDouble(4))
      val dot = n * z1 * z2 + z1 * s2 * sum2 + z2 * s1 * sum1 + s1 * s2 * di
      if (n1 == 0.0 || n2 == 0.0) 0.0 else dot / (n1 * n2)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val qa = ctx.freshName("qa")
        val qb = ctx.freshName("qb")
        val n = ctx.freshName("n")
        val di = ctx.freshName("di")
        val i = ctx.freshName("i")
        val z1 = ctx.freshName("z1")
        val s1 = ctx.freshName("s1")
        val z2 = ctx.freshName("z2")
        val s2 = ctx.freshName("s2")
        val n1 = ctx.freshName("n1")
        val n2 = ctx.freshName("n2")
        val dot = ctx.freshName("dot")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $qa = $a.getArray(0);
           |org.apache.spark.sql.catalyst.util.ArrayData $qb = $b.getArray(0);
           |int $n = $qa.numElements();
           |if ($n != $qb.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  long $di = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $di += ((long) ($qa.getByte($i) + 128)) * ((long) ($qb.getByte($i) + 128));
           |  }
           |  double $z1 = (double) $a.getFloat(1), $s1 = (double) $a.getFloat(2);
           |  double $z2 = (double) $b.getFloat(1), $s2 = (double) $b.getFloat(2);
           |  double $n1 = $a.getDouble(4), $n2 = $b.getDouble(4);
           |  double $dot = $n * $z1 * $z2 + $z1 * $s2 * $b.getLong(3)
           |    + $z2 * $s1 * $a.getLong(3) + $s1 * $s2 * $di;
           |  ${ev.value} = ($n1 == 0.0 || $n2 == 0.0) ? 0.0 : $dot / ($n1 * $n2);
           |}
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
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

  def quantize8(a: Column): Column =
    GraftColumn.apply(Quantize8(GraftColumn.expression(a)))

  def int8CosineSim(a: Column, b: Column): Column =
    GraftColumn.apply(Int8CosineSim(
      GraftColumn.expression(a), GraftColumn.expression(b)))
}
