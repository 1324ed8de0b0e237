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
    * or worse per evaluation, so N plan copies ≈ N× the map cost.
    * Every marker is anchored to CALL position (`name(`) — an
    * attribute named after the kernel's output (`dup_bigram_ratio#12`,
    * `sh#7`) is a free reference, not a re-evaluation, and counting it
    * would drown the real signal (r16: the unanchored `bigram` marker
    * read 7 on a plan whose only bigram work priced once). */
  val HeavyMarkers: Seq[(String, String)] = Seq(
    // the corpus tokenizer SPECIFICALLY (regexp_extract_all over
    // lower()): a bare regexp_extract_all marker also matched the PII
    // counters — three DIFFERENT single-shot regexes in one projection
    // that read as tokenize=3 on every curate/pii slot
    "tokenize" -> "regexp_extract_all\\(lower",
    "normalize" -> "normalize_text\\(|normalizetext\\(",
    "bigram_gather" -> "bigrambuckets\\(",
    "simhash" -> "simhash64\\(",
    "shingle" -> "shinglehashes\\(|positionalshinglehashes\\(",
    "deflate" -> "deflate_ratio\\(|deflateratio\\(",
    "tokencounts" -> "token_counts\\(|tokencounts\\(",
    "html_block_regex" -> "\\(\\?is\\)<\\(script")

  /** Marker counts over a plan string (already lowercased by us). */
  def markerCounts(plan: String): Seq[(String, Int)] = {
    val lp = plan.toLowerCase
    HeavyMarkers.map { case (label, re) =>
      label -> re.r.findAllIn(lp).size
    }.filter(_._2 > 0)
  }

  /** Any slot whose count is allowed above [[DefaultAllowance]] needs
    * an entry HERE, with its number pinned exactly — a +1 drift is a
    * regression the gate (DupGateSpec) must catch, because that is
    * precisely how the r15 pathology grew: one more gate conjunct, one
    * more silent clone, for ~8 rounds. Two structural causes account
    * for every entry (verified slot by slot, r16):
    *
    *  - TWO-SIDED gram ops (decontaminate family, leak/contamination
    *    audits, gram_memorization): the train and eval branches each
    *    tokenize+shingle their OWN rows — plan copies in disjoint row
    *    paths, each priced once per its rows, not a multiplier.
    *  - SELF-JOIN consumers (ngram_jaccard, text_keywords, substring
    *    dedup, LSH, simhash): the pre-execution AQE plan prints the
    *    shared subtree at every consumer site; at runtime ONE exchange
    *    computes it and the rest are ReusedExchange (pinned by
    *    PlanSpec) — ngram_jaccard prints 20, executes 10 sites of
    *    which the hot subtree prices once.
    *
    * Neither cause is the same-row-path cloning the barrier exists
    * for; all 16 slots run sub-second at sf0.1 (BENCH_r15_idle). */
  val DefaultAllowance = 2
  val Allowances: Map[String, Int] = Map(
    "chunk_documents" -> 4,
    "contamination_report" -> 10,
    "decontaminate" -> 10,
    "decontaminate_bloom" -> 5,
    "decontaminate_fuzzy" -> 9,
    "dedup_minhash_lsh" -> 5,
    "dedup_simhash" -> 3,
    "dedup_substring" -> 4,
    "dedup_substring_drop" -> 5,
    "dedup_substring_scrub" -> 5,
    "gram_memorization" -> 3,
    // a THIRD structural cause, unique to this slot: the quarantine
    // flags and the kept-lines column each reference the regex chain,
    // but with no predicates to push they all collapse into ONE
    // Project where whole-stage codegen CSE prices the chain once —
    // measured r16: robust 0.072 s vs base E42 0.074 s at sf0.1,
    // identical despite 5 printed copies vs 2
    "html_extract_robust" -> 5,
    // same single-operator-CSE cause, in aggregate expressions: the
    // three per-detector counters + the quarantine counter each
    // reference the flag chain, all inside ONE hash aggregate whose
    // codegen CSE prices the chain once — measured r16: 0.063 s warm
    // at sf0.1 vs the flag-free E42b report's 0.137 s
    "crawl_quarantine_report" -> 4,
    "ngram_jaccard" -> 20,
    "pipeline_massivetext" -> 3,
    "quality_rank_cut" -> 3,
    "split_leak_audit" -> 10,
    "text_keywords" -> 20)

  /** The gate predicate: markers whose copy count exceeds the slot's
    * committed allowance. Empty = the plan is clean. */
  def violations(slot: String, plan: String): Seq[(String, Int)] = {
    val cap = Allowances.getOrElse(slot, DefaultAllowance)
    markerCounts(plan).filter(_._2 > cap)
  }

  /** The plan string REAL per-row evaluation copies should be counted
    * on: the AQE FINAL plan after execution, where runtime exchange
    * reuse has collapsed repeated subtrees into ReusedExchange /
    * ReusedSubquery references. The pre-execution (initial) plan
    * prints the full subtree at EVERY consumer of a self-joined frame
    * — ngram_jaccard reads tokenize=20 there but only 4 after reuse —
    * so initial-plan counts overstate exactly the plans that were
    * engineered correctly. */
  def finalExecutedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val threshold = args.lift(1).map(_.toInt).getOrElse(4)
    val exec = args.contains("--exec")
    val spark = graft.GraftSession.local("dupaudit", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, sf)
          val p = (if (exec) finalExecutedPlan(df)
                   else df.queryExecution.executedPlan.toString).toLowerCase
          val counts = markerCounts(p).filter(_._2 >= threshold)
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
