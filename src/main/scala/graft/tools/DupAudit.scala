package graft.tools

import org.apache.spark.sql.SparkSession

/** EXPRESSION-DUPLICATION AUDIT — the r15 lesson as a standing tool.
  *
  * Catalyst's predicate pushdown and project collapse INLINE a
  * column's defining expression into every consumer. For cheap
  * expressions that is free; for heavy ones (a corpus tokenizer, a
  * regex battery, a classifier gather) it silently multiplies the
  * dominant per-row cost: r15 found the crawl chain's extraction
  * cloned 44× and the v2 gate chain's tokenizer 24× — 3× slot
  * slowdowns that no plan PIN caught, because the pins counted
  * exchanges, not expression copies.
  *
  * This main counts occurrences of the library's known-heavy
  * expression markers in every driver slot's EXECUTED plan and prints
  * one line per slot that duplicates any of them past the threshold.
  * Run it after adding an operator whose plan composes heavy columns
  * through filters; a hit usually wants [[graft.operators.Scale.evalOnce]]
  * or a reformulated predicate, and the fix should land with a
  * PlanSpec pin.
  *
  * Usage: sbt "runMain graft.tools.DupAudit [sfDir] [threshold]"
  */
object DupAudit {
  /** Markers for the expensive per-row kernels: each is priced O(len)
    * or worse per evaluation, so N plan copies ≈ N× the map cost. */
  val HeavyMarkers: Seq[(String, String)] = Seq(
    "tokenize" -> "regexp_extract_all",
    "normalize" -> "normalize_text|normalizetext",
    "bigram_gather" -> "bigram",
    "simhash" -> "simhash",
    "shingle" -> "shingle",
    "deflate" -> "deflate",
    "tokencounts" -> "token_?counts",
    "html_block_regex" -> "\\(\\?is\\)<\\(script")

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val threshold = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = graft.GraftSession.local("dupaudit", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val p = fn(spark, sf).queryExecution.executedPlan.toString
            .toLowerCase
          val counts = HeavyMarkers.map { case (label, re) =>
            label -> re.r.findAllIn(p).size
          }.filter(_._2 >= threshold)
          if (counts.nonEmpty) {
            println(s"DUP $name: " + counts.map { case (l, n) =>
              s"$l=$n" }.mkString(" "))
            Seq(name)
          } else Nil
        } catch { case e: Throwable =>
          println(s"SKIP $name: ${e.getClass.getSimpleName}")
          Nil
        }
    }
    println(s"AUDIT ${offenders.size} slots at or over ${threshold} " +
      s"copies of a heavy marker (of ${graft.SparkEntry.queries.size})")
    spark.stop()
  }
}
