package graft

/** Dump `explain("formatted")` for named driver queries — the tool
  * that feeds PLANS.md entries (run via
  * `Test/runMain graft.PlanDump <query name>...`). Uses the shared
  * test session and sf0.001 so a dump costs seconds. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sf = "/root/testdata/sf0.001"
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      println(s"\n## $name\n\n```")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      println("```")
    }
  }
}
