package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: a SparkSession.Builder preconfigured the
  * way every graft deployment should start —
  *
  *  - GraftExtensions installed (custom strategy + SQL functions)
  *  - AQE on (runtime re-planning, skew-join handling)
  *  - shuffle partitions sized to the actual parallelism, not the
  *    200-partition default that drowns local/small clusters in tiny
  *    tasks
  *  - UTC session timezone (cross-engine determinism; SURVEY.md §4)
  *
  * Callers can continue chaining `.config(...)`/`.master(...)` before
  * `getOrCreate()`.
  */
object GraftSession {

  def builder(appName: String = "graft",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")

  /** Local session for tools/examples. */
  def local(appName: String = "graft", cores: Int = 8): SparkSession = {
    val s = builder(appName, cores)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
