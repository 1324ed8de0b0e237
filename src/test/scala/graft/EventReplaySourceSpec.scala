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

  test("per-shard ordering is preserved (ts non-decreasing within device)") {
    val q = stream().writeStream
      .format("memory").queryName("replay_order").outputMode("append").start()
    try {
      q.processAllAvailable()
      // within each device the replayed ts sequence must be sorted
      val bad = spark.table("replay_order")
        .withColumn("prev", lag($"ts", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id").orderBy($"ts", $"event_id")))
        .filter($"prev" > $"ts")
      assert(bad.count() === 0)
    } finally q.stop()
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
