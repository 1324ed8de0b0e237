package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.plans.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("custom TopKPerKey matches the window-function formulation exactly") {
    val custom = Relational.qTopKCustom(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val window = Relational.qWindowRank(spark, sf)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(custom.sorted.sameElements(window.sorted))
  }

  test("map-side partial prunes before the shuffle (two exec stages, exchange between)") {
    val df = Relational.qTopKCustom(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val lines = p.linesIterator.toIndexedSeq
    val topkLines = lines.zipWithIndex.filter(_._1.contains("TopKPerKey "))
    assert(topkLines.nonEmpty, s"custom exec missing:\n$p")
    val finalIdx = topkLines.find(_._1.trim.endsWith("false")).map(_._2)
    val partialIdx = topkLines.find(_._1.trim.endsWith("true")).map(_._2)
    assert(finalIdx.isDefined && partialIdx.isDefined && finalIdx.get < partialIdx.get,
      s"expected final above partial:\n$p")
    val between = lines.slice(finalIdx.get, partialIdx.get).mkString("\n")
    assert(between.contains("Exchange") || between.contains("ShuffleQueryStage"),
      s"no exchange between partial and final:\n$p")
  }

  test("ties broken deterministically, k respected with duplicate order values") {
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), // three-way tie
      (2L, 20L, 1.0)
    ).toDF("key", "id", "score")
    val got = TopK.perKey(df, Seq("key"), Seq($"score".desc, $"id".asc), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.sameElements(Array((1L, 10L), (1L, 11L), (2L, 20L))))
  }

  test("k larger than group size returns whole group") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 4.0)).toDF("key", "id", "score")
    val got = TopK.perKey(df, Seq("key"), Seq($"score".desc), 5).count()
    assert(got === 2)
  }
}
