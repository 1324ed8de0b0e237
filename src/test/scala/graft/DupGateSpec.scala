package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamPlanAccess}

import graft.operators.Curation
import graft.tools.DupAudit

/** THE EXPRESSION-DUPLICATION GATE — the r15 lesson as infrastructure.
  *
  * Catalyst's predicate pushdown and project collapse INLINE a heavy
  * column's defining expression into every consumer; the r15 audit
  * found the crawl extraction cloned 44× and the gate tokenizer 24–38×
  * — a 3× slot cost that sat invisible for ~8 rounds because the plan
  * pins counted exchanges, not expression copies. This suite makes the
  * copy count a FAILING assertion, three ways:
  *
  *  1. every batch driver slot's plan stays at or under its committed
  *     allowance ([[DupAudit.Allowances]] — tight pins, +1 fails);
  *  2. the streaming curate micro-batch EXECUTED plans price the
  *     tokenizer once behind [[graft.operators.Scale.evalOnceStream]]
  *     (r16 measured 20/22 copies before the object barrier);
  *  3. a deliberately-duplicated probe plan FAILS the gate predicate —
  *     the gate is proven able to catch the pathology, not just pass
  *     today's plans.
  */
class DupGateSpec extends SparkSpec {

  private def at(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
  private val good = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"

  /** Last DATA micro-batch's executed plan (no-data watermark batches
    * disabled — they would overwrite lastExecution with an empty
    * LocalTableScan plan). */
  private def streamPlan(mk: DataFrame => DataFrame, name: String): String = {
    import spark.implicits._
    val input = MemoryStream[StreamDoc](9000 + name.hashCode.abs % 1000, spark, None)
    val noData = "spark.sql.streaming.noDataMicroBatches.enabled"
    val saved = spark.conf.get(noData)
    spark.conf.set(noData, "false")
    try {
      val q = mk(input.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData(Seq(
          StreamDoc(1L, at(1), good, "en", "s"),
          StreamDoc(2L, at(2), ("buy now " * 30).trim, "en", "s")))
        q.processAllAvailable()
        StreamPlanAccess.lastExecutedPlan(q)
      } finally q.stop()
    } finally spark.conf.set(noData, saved)
  }

  private def tokenizeCopies(plan: String): Int =
    DupAudit.markerCounts(plan).toMap.getOrElse("tokenize", 0)

  test("curateStream microbatch prices the tokenizer once behind the object barrier") {
    val p = streamPlan(Curation.curateStream(_), "dupgate_curate")
    // 20 copies before the r16 evalOnceStream barrier; ≤2 after (the
    // below-barrier projection holds one, CollapseProject may keep a
    // second for a cheap single-use site)
    assert(tokenizeCopies(p) <= 2,
      s"streaming curate gate chain re-tokenizes: ${DupAudit.markerCounts(p)}\n$p")
  }

  test("curateRoutedStream microbatch prices the tokenizer once behind the object barrier") {
    val p = streamPlan(Curation.curateRoutedStream(_), "dupgate_routed")
    // 22 copies before the barrier
    assert(tokenizeCopies(p) <= 2,
      s"streaming routed gate chain re-tokenizes: ${DupAudit.markerCounts(p)}\n$p")
  }

  test("crawlCurateStream microbatch prices extraction and tokenizer once each") {
    val p = streamPlan(Curation.crawlCurateStream(_), "dupgate_crawl")
    val counts = DupAudit.markerCounts(p).toMap
    // the E42c extraction sits below its own object barrier in ONE
    // Project, where kept/f1/f2/f3 share the regex chain: 5 PRINTED
    // copies that whole-stage-codegen CSE prices once — the exact
    // structure behind the batch html_extract_robust allowance of 5
    // (measured there: 0.072 s with flags vs 0.074 s without at
    // sf0.1). A 6th copy means a NEW consumer escaped the Project.
    assert(counts.getOrElse("html_block_regex", 0) <= 5,
      s"streaming crawl chain re-extracts: $counts\n$p")
    // 1 chrome-filter tokenize inside the extraction Project + the
    // gate chain's ≤2 behind the signal barrier
    assert(counts.getOrElse("tokenize", 0) <= 3,
      s"streaming crawl gate chain re-tokenizes: $counts\n$p")
  }

  test("every driver slot's heavy-marker copy count stays at its committed allowance") {
    // planning-time counts: deterministic (no AQE re-plan flake), and
    // an UPPER bound on the executed plan's copies — runtime exchange
    // reuse only removes subtree prints, never adds them. A slot that
    // needs more than DefaultAllowance must pin its exact number in
    // DupAudit.Allowances with the structural reason.
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val v = DupAudit.violations(name, plan)
        if (v.nonEmpty) Seq(s"$name: " + v.map { case (l, n) =>
          s"$l=$n (allowance ${DupAudit.Allowances.getOrElse(name,
            DupAudit.DefaultAllowance)})" }.mkString(" "))
        else Nil
    }
    assert(bad.isEmpty,
      s"heavy-expression duplication over committed allowances:\n" +
        bad.mkString("\n"))
  }

  test("the gate CATCHES a deliberately-duplicated plan (probe must fail)") {
    // reconstruct the r15 pathology on purpose: heavy tokenizer column
    // consumed by several pushed-down predicates with NO barrier —
    // pushdown inlines the expression into each conjunct
    import graft.operators.TextAnalysis
    val probe = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("toks", TextAnalysis.tokens("text"))
      .withColumn("n", size(col("toks")))
      .withColumn("u", size(array_distinct(col("toks"))))
      .withColumn("f", element_at(col("toks"), 1))
      .withColumn("l", element_at(col("toks"), -1))
      .drop("toks")
      .filter(col("n") >= 3).filter(col("u") >= 2)
      .filter(col("f") =!= col("l"))
      .select(col("doc_id"), col("n"), col("u"))
    val plan = probe.queryExecution.executedPlan.toString
    val v = DupAudit.violations("dupgate_probe_slot", plan)
    assert(v.exists { case (l, n) => l == "tokenize" && n > 2 },
      s"the probe plan was expected to trip the gate; counts: " +
        s"${DupAudit.markerCounts(plan)}\n$plan")
  }
}
