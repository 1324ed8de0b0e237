package graft.examples

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Curation, Relational, TextAnalysis}

/** The TRAINING-DATA story end to end, as a runnable walkthrough of
  * the C/E-family composition — what a pipeline operator would run,
  * in the order they would run it, with the observability row printed
  * at each stage:
  *
  *   corpus dashboard → dup-depth histogram → curation funnel →
  *   train/val/test split → cross-split leak audit → drift report →
  *   LM buckets → tokenizer (BPE train/apply + length buckets) →
  *   epoch-weighted end-to-end pipeline → packed shards →
  *   shuffle-order audit
  *
  * Run: sbt "runMain graft.examples.TrainingDataPipelineDemo [sfDir]"
  */
object TrainingDataPipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local("training-data-demo")
    import spark.implicits._

    def show(title: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n=== $title")
      df.show(10, truncate = false)
    }

    // 1. What do we have? One-row volume dashboard + how DEEP the
    //    duplication runs (noise vs a repeated template).
    show("corpus stats")(TextAnalysis.corpusStats(spark, sfDir))
    show("dup-depth histogram")(Curation.dedupClusterStats(spark, sfDir))

    // 2. Where would the gates cut? The funnel says which stage eats
    //    what BEFORE any sweep runs for real.
    show("curation funnel")(Curation.curateFunnel(spark, sfDir))

    // 3. Split, then audit the split: near-dups straddling the
    //    boundary inflate eval scores silently.
    val split = Curation.splitAssign(Tables.documents(spark, sfDir))
    show("split sizes")(
      split.groupBy($"split").agg(count(lit(1)).as("docs")).orderBy($"split"))
    show("cross-split leaks")(Curation.splitLeakAudit(spark, sfDir))

    // 4. Distribution health: which sources drift from the pooled
    //    corpus, and where does the quality cut land per language?
    show("per-source drift (JSD)")(TextAnalysis.corpusDrift(spark, sfDir))
    show("LM buckets per lang")(
      Curation.lmBuckets(spark, sfDir)
        .groupBy($"lang", $"bucket").agg(count(lit(1)).as("docs"))
        .orderBy($"lang", $"bucket"))

    // 4b. The tokenizer: learn the merge table from the corpus, then
    //     price every doc in LEARNED pieces (what the packer budgets
    //     by once the tokenizer is subword), and read the pad-vs-pack
    //     tradeoff off the length histogram.
    show("BPE merge table (first 10)")(
      TextAnalysis.bpeTrain(spark, sfDir, nMerges = 10))
    show("BPE pieces per doc (head)")(
      TextAnalysis.bpeApply(spark, sfDir, nMerges = 10).limit(10))
    show("length buckets (padding waste)")(Curation.lengthBuckets(spark, sfDir))

    // 5. The production pipeline: gates + dedup + decontamination →
    //    epoch weights → seeded shuffle → packing, then shards where
    //    every training sequence lives whole in exactly one file.
    val packed = Curation.pipelineTrainEpochs(spark, sfDir)
    show("epoch-weighted packed corpus (head)")(packed.limit(10))
    // shard writer packs from raw docs itself (one shared definition)
    val shardDir = java.nio.file.Files.createTempDirectory("demo-shards").toString
    Curation.writePackedShards(Tables.documents(spark, sfDir), shardDir,
      shards = 4)
    println(s"\nshards at $shardDir:")
    new java.io.File(shardDir).listFiles().sortBy(_.getName)
      .foreach(f => println(s"  ${f.getName}"))

    // 6. Audit the training ORDER the shards encode: Spearman rank
    //    correlation of ingestion order vs the seeded shuffle key —
    //    a degenerate key reads 1, healthy reads near 0.
    show("shuffle-order audit")(Curation.shuffleAudit(spark, sfDir))

    // 7. Is the join-side data skewed enough to need salting?
    show("skew report (events join key)")(Relational.qSkewReport(spark, sfDir))

    spark.stop()
  }
}
