package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Welford online mean/variance state. */
case class WelfordState(n: Long, mean: Double, m2: Double)

/** Result: count, mean, sample variance, sample stddev. */
case class WelfordResult(n: Long, mean: Double, var_samp: Double, stddev_samp: Double)

/** Numerically-stable streaming mean/variance as a typed
  * `Aggregator[IN, BUF, OUT]` — the user-facing typed-aggregation API
  * (vs. [[AggFunctions.HistogramAgg]]'s lower-level
  * TypedImperativeAggregate). Welford's update never subtracts large
  * near-equal sums, so it stays accurate where the naive
  * sum-of-squares formula catastrophically cancels — the property that
  * matters when a 100 TB column has mean ≫ stddev.
  *
  * Merge uses the parallel (Chan et al.) combination, so map-side
  * partials combine exactly like any other aggregate.
  */
object WelfordAgg extends Aggregator[Double, WelfordState, WelfordResult] {

  override def zero: WelfordState = WelfordState(0L, 0.0, 0.0)

  override def reduce(s: WelfordState, x: Double): WelfordState = {
    val n = s.n + 1
    val d = x - s.mean
    val mean = s.mean + d / n
    WelfordState(n, mean, s.m2 + d * (x - mean))
  }

  override def merge(a: WelfordState, b: WelfordState): WelfordState = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      val mean = a.mean + d * b.n / n
      val m2 = a.m2 + b.m2 + d * d * a.n * b.n / n
      WelfordState(n, mean, m2)
    }
  }

  override def finish(s: WelfordState): WelfordResult =
    if (s.n < 2) WelfordResult(s.n, s.mean, Double.NaN, Double.NaN)
    else {
      val v = s.m2 / (s.n - 1)
      WelfordResult(s.n, s.mean, v, math.sqrt(v))
    }

  override def bufferEncoder: Encoder[WelfordState] = Encoders.product[WelfordState]
  override def outputEncoder: Encoder[WelfordResult] = Encoders.product[WelfordResult]
}
