package graft.tools
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("plan-audit", cores = 4)
    val sf = "/root/testdata/sf0.001"
    for ((n, df) <- Seq(
      "mon_status_flaps" -> graft.operators.Monitoring.statusFlaps(spark, sf),
      "q_funnel" -> graft.operators.Relational.qFunnel(spark, sf),
      "q_retention_cohorts" -> graft.operators.Relational.qRetentionCohorts(spark, sf),
      "chunk_documents" -> graft.operators.Curation.chunkDocumentsQuery(spark, sf),
      "text_bm25" -> graft.operators.TextAnalysis.textBm25(spark, sf))) {
      val p = df.queryExecution.executedPlan.toString
      def c(s: String) = s.r.findAllIn(p).length
      println(s"AUDIT $n: hashEx=${c("Exchange hashpartitioning")} rangeEx=${c("Exchange rangepartitioning")} single=${c("SinglePartition")} bcast=${c("BroadcastExchange")} generate=${c("Generate")}")
    }
    spark.stop()
  }
}
