package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the coverage contract the driver's judge reads line
  * by line; `SparkEntry.queries`/`oracleSql` are what the driver runs.
  * This spec pins the three to each other so they cannot drift:
  *
  *  - every `queries` key has a §2 inventory row,
  *  - every backticked snake_case operator name in §2 has a `queries`
  *    entry (streaming/typed rows use CamelCase and are exempt),
  *  - every §2 row marked ✓oracle has an `oracleSql` entry and vice
  *    versa (an oracle entry without a ✓oracle row is undeclared
  *    coverage; a ✓oracle row without SQL silently weakens the gate),
  *  - every `oracleSql` key is also a `queries` key.
  */
class ContractSpec extends AnyFunSuite {

  private lazy val section2: String = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val start = text.indexOf("## §2")
    val end = text.indexOf("## §3")
    assert(start >= 0 && end > start, "SURVEY.md must contain §2 and §3")
    text.substring(start, end)
  }

  /** §2 table rows: (backticked names in the row, row text). */
  private lazy val rows: Seq[(Seq[String], String)] =
    section2.linesIterator
      .filter(l => l.startsWith("| ") && !l.startsWith("| #"))
      .map { l =>
        ("`([A-Za-z0-9_]+)`".r.findAllMatchIn(l).map(_.group(1)).toSeq, l)
      }.toSeq

  private lazy val surveyNames: Set[String] = rows.flatMap(_._1).toSet

  test("every SparkEntry.queries key has a SURVEY §2 row") {
    val missing = SparkEntry.queries.keySet.filterNot(surveyNames.contains)
    assert(missing.isEmpty,
      s"queries without a SURVEY §2 inventory row: ${missing.toSeq.sorted}")
  }

  test("every snake_case §2 operator has a queries entry") {
    // snake_case backticked names are runnable operators; CamelCase
    // names (HealthMonitor, WelfordAgg, AlertSink, …) are streaming or
    // typed components covered by ScalaTest instead.
    val runnable = surveyNames.filter(n => n.exists(_ == '_') && n.toLowerCase == n)
    val missing = runnable.filterNot(SparkEntry.queries.keySet.contains)
    assert(missing.isEmpty,
      s"SURVEY §2 operators without a queries entry: ${missing.toSeq.sorted}")
  }

  test("oracle declarations match oracleSql exactly") {
    val declaredOracle = rows
      .filter(_._2.contains("✓oracle"))
      .flatMap(_._1)
      .filter(SparkEntry.queries.keySet.contains)
      .toSet
    val missingSql = declaredOracle.filterNot(SparkEntry.oracleSql.keySet.contains)
    assert(missingSql.isEmpty,
      s"✓oracle rows without oracleSql (gate silently weakened): ${missingSql.toSeq.sorted}")
    val undeclared = SparkEntry.oracleSql.keySet.filterNot(declaredOracle.contains)
    assert(undeclared.isEmpty,
      s"oracleSql entries not declared ✓oracle in SURVEY §2: ${undeclared.toSeq.sorted}")
  }

  test("every oracleSql key is a queries key") {
    val orphan = SparkEntry.oracleSql.keySet.filterNot(SparkEntry.queries.keySet.contains)
    assert(orphan.isEmpty, s"oracleSql without queries entry: ${orphan.toSeq.sorted}")
  }

  test("truncating Misra-Gries queries stay excluded from the hash gate") {
    // HeavyHittersAgg estimates are merge-order dependent once distinct
    // keys exceed capacity: shuffle-fetch order changes est values and
    // can flip k-th-rank membership run-to-run. word_freq_topk_approx
    // runs over a vocabulary far beyond its capacity at every SF, so it
    // must stay rows-only forever. (mon_top_error_devices_approx is the
    // deliberate exception: its 8k-counter capacity exceeds any driver
    // fleet, no compaction can fire, and the exact-regime result is
    // merge-order invariant — hash-gated, see the next test.)
    Seq("word_freq_topk_approx").foreach { q =>
      assert(!SparkEntry.oracleSql.contains(q),
        s"$q is merge-order nondeterministic and must not be hash-gated")
    }
  }

  test("A29 carries its exact-regime oracle") {
    // the data-side precondition (distinct error devices < capacity)
    // is pinned in MonitoringSpec, which owns a SparkSession
    assert(SparkEntry.oracleSql.contains("mon_top_error_devices_approx"))
  }
}
