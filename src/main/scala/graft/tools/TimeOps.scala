package graft.tools

/** Dev-only warm-timing harness for individual operators. */
object TimeOps {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("time-ops", cores = 32)
    val sf = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $name min=${times.min}%.2f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    t("text_lm_score") { graft.operators.TextAnalysis.textLmScore(spark, sf).count() }
    t("lm_buckets") { graft.operators.Curation.lmBuckets(spark, sf).count() }
    t("budget_select") { graft.operators.Curation.budgetSelectQuery(spark, sf).count() }
    spark.stop()
  }
}
