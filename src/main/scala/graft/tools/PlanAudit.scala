package graft.tools
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("plan-audit", cores = 4)
    val sf = "/root/testdata/sf0.001"
    for ((n, df) <- Seq(
      "q_late_orders" -> graft.operators.Relational.qLateOrders(spark, sf),
      "q_promo_share" -> graft.operators.Relational.qPromoShare(spark, sf),
      "q_order_count_dist" -> graft.operators.Relational.qOrderCountDist(spark, sf),
      "q_large_orders" -> graft.operators.Relational.qLargeOrders(spark, sf),
      "q_idle_customers" -> graft.operators.Relational.qIdleCustomers(spark, sf))) {
      val p = df.queryExecution.executedPlan.toString
      def c(s: String) = s.r.findAllIn(p).length
      println(s"AUDIT $n: hashEx=${c("Exchange hashpartitioning")} rangeEx=${c("Exchange rangepartitioning")} single=${c("SinglePartition")} bcast=${c("BroadcastExchange")} generate=${c("Generate")}")
    }
    spark.stop()
  }
}
