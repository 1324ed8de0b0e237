package graft.examples

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The MULTIMODAL story end to end — the F-family composition a
  * VLM-training data operator would run, in order, with the
  * observability row printed at each stage:
  *
  *   media data card (trust the batch?) → fragment-loss SLA →
  *   interleaved packing (window costs with images intact) →
  *   modality-mix report (images or padding?) → adaptive-resolution
  *   re-pack of the overflowers → certified training shards
  *
  * Run: sbt "runMain graft.examples.MultimodalPipelineDemo [sfDir]"
  */
object MultimodalPipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local("multimodal-demo")
    import spark.implicits._

    def show(title: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n=== $title")
      df.show(10, truncate = false)
    }

    // 1. Trust the batch? Per-source inventory, codec mix, delivery
    //    and sync health — NULL means mark unmeasured, not healthy.
    show("media data card")(Multimodal.mmDataCard(spark, sfDir))

    // 2. The streams behind the worst loss numbers, by name.
    show("worst fragment loss")(Multimodal.mmFragmentLoss(spark, sfDir)
      .orderBy($"loss_share".desc, $"media_id").limit(10))

    // 3. Pack at a tight window so the cost model bites: image blocks
    //    never straddle a cut, over-window docs flag truncated.
    val packed = Multimodal.mmPackInterleaved(spark, sfDir, seqLen = 2048)
    show("packed (mixed text+image token costs)")(
      packed.orderBy($"n_tokens".desc))
    println(s"truncated at full resolution: " +
      packed.filter($"truncated").count())

    // 4. Are the context windows carrying images or padding?
    show("modality-mix report")(
      Multimodal.mmPackReport(spark, sfDir, seqLen = 2048)
        .orderBy($"image_token_share".desc))

    // 5. The adaptive ladder downsamples the overflowers instead of
    //    cutting them — the resolution spend is a column.
    val adaptive = Multimodal.mmPackAdaptive(spark, sfDir, seqLen = 2048)
    show("adaptive re-pack (downsampled docs)")(
      adaptive.filter($"downsampled").orderBy($"n_tokens".desc))
    println(s"still truncated after the coarsest rung: " +
      adaptive.filter($"truncated").count())

    // 6. Ship it: whole sequences per shard, manifested, verified.
    show("certified shard manifest")(Multimodal.mmPackCertified(spark, sfDir))

    spark.stop()
  }
}
