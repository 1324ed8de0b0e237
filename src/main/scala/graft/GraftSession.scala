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
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Static conf, so it must land before the first session exists.
      // The default generated-class cache holds 100 entries; a graft
      // deployment runs a BROAD mix of plans (the driver suite alone
      // is 100+ queries x several codegen stages each), and once the
      // working set exceeds the cache every execution Janino-recompiles
      // its stages (~100ms+ per stage) — which shows up as every slot
      // slowly inflating as the suite grows, not as any one plan being
      // wrong. Entries are weak-referenced class objects; thousands are
      // cheap.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
    // On a cluster the right shuffle-partition count depends on total
    // executor cores, which the driver-side builder cannot know — leave
    // Spark's default + AQE coalescing unless the caller sizes it.
    // local() passes the core count explicitly.
    shufflePartitions.fold(b)(n => b.config("spark.sql.shuffle.partitions", n.toString))
  }

  /** Local session for tools/examples. */
  def local(appName: String = "graft", cores: Int = 8): SparkSession = {
    val s = builder(appName, Some(cores))
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
