package graft

import org.apache.spark.sql.functions._

import graft.streaming.{DeviceEvent, HealthMonitor}

class EventReplaySourceSpec extends SparkSpec {
  import spark.implicits._

  private def stream(eventsPerTrigger: Int = 200) =
    spark.readStream
      .format("graft-replay")
      .option("path", s"$sf/events.parquet")
      .option("eventsPerTrigger", eventsPerTrigger.toString)
      .load()

  test("replay source delivers every event exactly once across micro-batches") {
    val q = stream().writeStream
      .format("memory").queryName("replay_all").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("replay_all")
      val want = Tables.events(spark, sf)
      assert(got.count() === want.count())
      assert(got.select(sum($"event_id")).as[Long].head()
        === want.select(sum($"event_id")).as[Long].head())
    } finally q.stop()
  }

  test("bounded advancement: batches respect eventsPerTrigger per shard") {
    val q = stream(eventsPerTrigger = 10).writeStream
      .format("memory").queryName("replay_bounded").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("replay_bounded").count()
        === Tables.events(spark, sf).count())
      // multiple batches must have run (1000 events, 15 shards × 10/trigger)
      assert(q.recentProgress.length > 1)
    } finally q.stop()
  }

  test("per-shard ordering is preserved across micro-batches") {
    // capture the ACTUAL delivery order batch by batch — re-sorting the
    // final table would make the assertion tautological
    val perBatch = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)] // (batchId, user_id, minUs, maxUs)
    val q = stream(eventsPerTrigger = 50).writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        df.groupBy($"user_id")
          .agg(min(expr("unix_micros(ts)")).as("mn"),
            max(expr("unix_micros(ts)")).as("mx"))
          .collect()
          .foreach(r => perBatch.synchronized {
            perBatch += ((batchId, r.getLong(0), r.getLong(1), r.getLong(2)))
          })
        ()
      }
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(perBatch.map(_._1).distinct.size > 1, "need multiple batches")
    // per device: every batch's max ts <= the next batch's min ts
    perBatch.groupBy(_._2).values.foreach { rows =>
      val ordered = rows.sortBy(_._1)
      ordered.zip(ordered.tail).foreach { case ((b1, d, _, mx), (b2, _, mn, _)) =>
        assert(mx <= mn, s"device $d: batch $b1 max $mx > batch $b2 min $mn")
      }
    }
  }

  test("checkpoint restart: shards resume, nothing lost, bounded redelivery") {
    val ck = java.nio.file.Files.createTempDirectory("graft-replay-ck").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    def run() = spark.readStream
      .format("graft-replay")
      .option("path", s"$sf/events.parquet")
      .option("eventsPerTrigger", "20")
      .load()
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val arr = df.select($"event_id").as[Long].collect()
        batches.synchronized { batches += arr }
        ()
      }
      .start()
    // run 1: let at least one micro-batch commit, then kill mid-stream
    val q1 = run()
    val deadline = System.currentTimeMillis + 60000
    while (System.currentTimeMillis < deadline && batches.synchronized(batches.size) < 2)
      Thread.sleep(100)
    q1.stop()
    assert(batches.synchronized(batches.nonEmpty), "run 1 processed no batch")
    // run 2: fresh stream instance (re-stages), same checkpoint → resume
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    val all = batches.synchronized(batches.toArray).flatten
    val want = Tables.events(spark, sf).select($"event_id").as[Long].collect()
    // exactly-once modulo foreachBatch's at-least-once on the epoch in
    // flight at stop: nothing lost, redelivery bounded by ~2 epochs
    // (15 shards × 20/trigger), NOT a from-scratch replay
    assert(all.toSet === want.toSet, "events lost across restart")
    assert(all.length - want.length <= 2 * 15 * 20,
      s"unbounded redelivery: ${all.length} delivered for ${want.length} events")
  }

  test("health monitor runs end-to-end on the custom source") {
    val events = stream().as[DeviceEvent]
    val q = HealthMonitor.monitor(events).writeStream
      .format("memory").queryName("replay_alerts").outputMode("append").start()
    try {
      q.processAllAvailable()
      val alerts = spark.table("replay_alerts")
      // batch replay over the same table is the ground truth
      val expected = HealthMonitor.replayBatch(spark, sf)
      assert(alerts.count() === expected.count())
    } finally q.stop()
  }
}
