package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query runs four times: the first pass absorbs one-time
  * JVM/codegen compilation (1–5 s/stage on a cold JVM), then THREE
  * timed passes. The headline `queries` map reports the MIN — the
  * query's steady-state cost, isolated from neighboring-query noise
  * (GC pauses, JIT recompilation triggered by a previous query's
  * generated classes), the number that scales with data volume. The
  * `queries_median` map carries the median of the same three passes so
  * single-slot noise is DIAGNOSABLE round-over-round: a min that moves
  * while the median holds (or vice versa) is slot noise; both moving
  * together on an unchanged plan is a real regression worth chasing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Slot hygiene: a previous query's construction can leave orphaned
      // localCheckpoint blocks pinned until their RDDs are GC-collected
      // (ContextCleaner releases them on reference collection). A GC +
      // short settle between slots releases that storage so its
      // block-manager pressure and GC pauses don't land in THIS query's
      // timed passes — observed: q1 timed 2.7× slower when it ran right
      // after the pipeline_* block's pins.
      System.gc()
      Thread.sleep(300)
      def once(): Unit = fn(spark, sfDir).count()
      try once() catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
      def timed(): Double =
        try {
          val t0 = System.nanoTime()
          once()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0 // a failing query reports -1, never a fake timing
        }
      val a = timed()
      val b = if (a < 0) a else timed() // don't re-run a known failure
      val c = if (a < 0 || b < 0) -1.0 else timed()
      if (a < 0 || b < 0 || c < 0) name -> (-1.0, -1.0)
      else name -> (Seq(a, b, c).min, Seq(a, b, c).sorted.apply(1))
    }
    val qs = results.map { case (k, (mn, _)) => "\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val qsMed = results.map { case (k, (_, md)) => "\"" + k + "\":" + md }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_median":$qsMed,"sf":"$sfDir"}"""
    println(line)
    // also persist the line to a file: the stdout artifact rides through
    // sbt/driver log capture, which has truncated a round's JSON tail
    // before — the file survives regardless of log buffering
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
