package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: word_tokens <= ws_tokens <= re_tokens envelope holds") {
    TextAnalysis.textTokens(spark, sf).collect().foreach { r =>
      val (ws, re, words) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ws >= 1)
      assert(re >= ws) // regex splits punctuation off, never merges
      assert(words >= 1)
    }
  }

  test("quality: ratios in [0,1], score in [0,1]") {
    TextAnalysis.textQuality(spark, sf).collect().foreach { r =>
      Seq(4, 5, 6, 7).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0, s"col $i out of range: $v")
      }
    }
  }

  test("langid: deterministic, known label set, CJK short-circuit") {
    val out1 = TextAnalysis.textLangId(spark, sf).collect().map(_.getString(1))
    val out2 = TextAnalysis.textLangId(spark, sf).collect().map(_.getString(1))
    assert(out1.sameElements(out2))
    assert(out1.forall(Set("en", "de", "es", "fr", "zh").contains))
    val zh = Seq((1L, "这是一个中文句子")).toDF("doc_id", "text")
      .select(TextFunctions.langId($"text")).as[String].head()
    assert(zh === "zh")
    val de = Seq((1L, "der hund und die katze sind schnell")).toDF("doc_id", "text")
      .select(TextFunctions.langId($"text")).as[String].head()
    assert(de === "de")
  }

  test("fingerprints: identical docs hash identically, different docs differ") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "utterly different content with other words entirely here now")
    ).toDF("doc_id", "text")
      .withColumn("toks", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .select($"doc_id",
        TextFunctions.rollingHashMin($"toks", 8).as("fp"),
        TextFunctions.simhash64($"toks").as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) === m(2L))
    assert(m(1L)._1 !== m(3L)._1)
  }

  test("simhash of near-identical docs has small hamming distance") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the morning light"),
      (2L, "the quick brown fox jumps over the lazy cat in the morning light"))
      .toDF("doc_id", "text")
      .withColumn("toks", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .select(TextFunctions.simhash64($"toks")).as[Long].collect()
    val hamming = java.lang.Long.bitCount(df(0) ^ df(1))
    assert(hamming <= 16, s"hamming=$hamming")
  }

  test("word freq: counts positive and non-increasing") {
    val rows = TextAnalysis.wordFreqTopK(spark, sf).collect()
    assert(rows.length === 20)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }
}
