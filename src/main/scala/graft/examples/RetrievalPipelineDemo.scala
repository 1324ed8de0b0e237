package graft.examples

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** The retrieval stack end to end — what a RAG/search tier actually
  * runs over the corpus, each stage one graft operator:
  *
  *   lexical candidates   BM25 doc-as-query over the inverted index
  *   vector candidates    cosine top-k (brute here; the IVF/PQ serving
  *                        snapshots at corpus scale — same fusion after)
  *   FUSE                 reciprocal-rank fusion (D22 ann_hybrid)
  *   DIVERSIFY            MMR re-rank — coverage over paraphrases (D23)
  *   CAP BY SOURCE        at most m per source (D24)
  *   AUDIT                recall report + index health on the serving
  *                        snapshot the scale path would probe
  *
  * Run: sbt "runMain graft.examples.RetrievalPipelineDemo [sfDir]"
  */
object RetrievalPipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local("retrieval-pipeline-demo")
    import spark.implicits._
    def show(title: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n=== $title")
      df.show(10, truncate = false)
    }

    // 1. The two single-mode rankers, side by side for query 0: each
    //    finds what the other misses (exact keywords vs paraphrase).
    show("vector-only top-k (query 0)")(
      Similarity.annBruteTopK(spark, sfDir).filter($"query_id" === 0L))

    // 2. Fusion: RRF over both rank lists — no score calibration, the
    //    modern hybrid-search default.
    val fused = Similarity.annHybrid(spark, sfDir)
    show("hybrid RRF top-k (query 0)")(fused.filter($"query_id" === 0L))
    show("fusion provenance: candidates only ONE ranker surfaced")(
      fused.filter($"text_rank".isNull || $"vec_rank".isNull)
        .groupBy($"query_id").agg(count(lit(1)).as("single_ranker_hits"))
        .orderBy($"query_id"))

    // 3. Diversity: MMR trades relevance against similarity-to-chosen;
    //    a top-k of near-duplicates becomes coverage.
    show("MMR-diversified (query 0)")(
      Similarity.annMmr(spark, sfDir).filter($"query_id" === 0L))

    // 4. Metadata diversity: never more than m results per source.
    show("source-capped (query 0)")(
      Similarity.annCapped(spark, sfDir).filter($"query_id" === 0L))

    // 5. Serving-path audit: the recall each index family delivers vs
    //    the exact baseline, and whether the IVF layout needs a rebuild.
    show("recall report (all methods)")(Similarity.annRecall(spark, sfDir))
    show("IVF index health")(Similarity.annIndexHealthQuery(spark, sfDir))

    println(s"\ncorpus: ${Tables.cachedCount(spark, s"$sfDir/documents.parquet")} docs, " +
      s"${Tables.cachedCount(spark, s"$sfDir/embeddings.parquet")} vectors")
    spark.stop()
  }
}
