package graft.sources.v2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, row_number}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 micro-batch streaming source: replays the
  * `events` parquet as a sharded stream with Kinesis-shaped semantics —
  * one shard per device, a per-shard sequence offset, and bounded
  * `eventsPerTrigger` advancement per micro-batch.
  *
  *   spark.readStream.format("graft-replay")
  *     .option("path", "/root/testdata/sf0.01/events.parquet")
  *     .option("eventsPerTrigger", "500")
  *     .load()
  *
  * This is the full V2 connector contract (TableProvider → Table →
  * ScanBuilder → Scan → MicroBatchStream → PartitionReaderFactory);
  * a production Kinesis integration replaces [[EventReplayStream]]'s
  * staged shard log with shard-iterator polling and keeps everything
  * else — offsets, partition planning, row decoding — unchanged.
  *
  * Scale design — the driver never materializes event data:
  *
  *  1. On first use the stream STAGES the input once as a per-shard
  *     sorted log: a cluster-side job writes the events partitioned by
  *     device (`user_id=<shard>/` directories, one sorted file each)
  *     with an explicit 1-based `seq` position column — the stand-in
  *     for Kinesis's per-shard sequence-numbered log. The driver keeps
  *     only the per-shard row COUNT and file list (a few bytes per
  *     shard), exactly like a Kinesis consumer tracking ListShards +
  *     end sequence numbers.
  *  2. Each micro-batch plans one [[ShardSlicePartition]] per advancing
  *     shard carrying (files, shard id, seq range). EXECUTORS read
  *     their slice straight from the staged parquet with a seq-range
  *     predicate (row-group stats prune non-overlapping groups), so a
  *     100 TB replay streams through the cluster while the driver
  *     holds O(shards) state.
  *
  * Offsets are per-shard sequence numbers, so checkpoint/restart
  * resumes each shard independently; parallelism tracks shard count
  * exactly as with a real Kinesis stream.
  */
class EventReplaySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-replay"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.sources.EventSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new EventReplayTable(properties.asScala.toMap)
}

class EventReplayTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft-replay(${options.getOrElse("path", "?")})"
  override def schema(): StructType = graft.sources.EventSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema()
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new EventReplayStream(options)
      }
    }
}

/** Kinesis-shaped offset: shard (device) → next sequence number. */
private[v2] case class ShardOffsets(seq: Map[String, Long]) extends Offset {
  override def json(): String =
    seq.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
}

private[v2] object ShardOffsets {
  def parse(json: String): ShardOffsets = ShardOffsets(
    json.stripPrefix("{").stripSuffix("}").split(",").filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split(":")
      k.replaceAll("\"", "") -> v.toLong
    }.toMap)
}

/** Driver-side view of the staged shard log: per shard, the staged
  * parquet files and the total event count — O(shards) memory, no
  * event payloads. */
private[v2] case class StagedShard(files: Array[String], count: Long)

class EventReplayStream(options: Map[String, String])
    extends MicroBatchStream with SupportsAdmissionControl {
  private val path = options.getOrElse("path",
    throw new IllegalArgumentException("graft-replay requires option 'path'"))
  private val eventsPerTrigger =
    options.getOrElse("eventsPerTrigger", "1000").toLong

  /** Caller-provided staging dir survives stop(); a self-created temp
    * dir is owned by this stream and deleted on stop(). */
  private val explicitStagingDir = options.get("stagingDir")
  private lazy val stagingDir: String = explicitStagingDir.getOrElse(
    java.nio.file.Files.createTempDirectory("graft-replay-staged").toString)



  /** Stage the input as a per-shard sequence-numbered sorted log (one
    * distributed job, once per stream). Replay order within a shard is
    * (ts, event_id) — the per-shard ordering a partitioned log
    * guarantees — frozen into the explicit `seq` column so every later
    * micro-batch is a pure positional range read. */
  private lazy val staged: Map[String, StagedShard] = {
    val spark = SparkSession.active
    val dir = stagingDir
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    graft.Tables.eventsAt(spark, path)
      .withColumn("seq", row_number().over(w).cast("long"))
      .selectExpr("event_id", "unix_micros(ts) AS ts_us", "user_id",
        "event_type", "value", "props", "seq")
      // one spark partition per shard → exactly one sorted file per
      // user_id=<shard>/ directory
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "seq")
      .write.mode("overwrite").partitionBy("user_id").parquet(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    fs.listStatus(new Path(dir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("user_id="))
      .map { s =>
        val shard = s.getPath.getName.stripPrefix("user_id=")
        val files = fs.listStatus(s.getPath)
          .filter(f => f.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toString).sorted
        val count = files.map(ParquetSlice.rowCount(_, conf)).sum
        shard -> StagedShard(files, count)
      }.toMap
  }

  override def initialOffset(): Offset =
    ShardOffsets(staged.keys.map(_ -> 0L).toMap)

  /** Admission control (the rate-limited path the engine actually
    * uses): advance each shard by at most eventsPerTrigger past the
    * engine-provided start — the Kinesis GetRecords `Limit` analog. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ShardOffsets]
    ShardOffsets(staged.map { case (k, sh) =>
      k -> math.min(sh.count, s.seq.getOrElse(k, 0L) + eventsPerTrigger)
    })
  }

  /** True end of the stream — lets processAllAvailable()/AvailableNow
    * keep scheduling batches until every shard is drained. */
  override def reportLatestOffset(): Offset =
    ShardOffsets(staged.map { case (k, sh) => k -> sh.count })

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used via SupportsAdmissionControl")

  override def deserializeOffset(json: String): Offset = ShardOffsets.parse(json)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardOffsets]
    val e = end.asInstanceOf[ShardOffsets]
    staged.toArray.flatMap { case (shard, sh) =>
      val from = s.seq.getOrElse(shard, 0L)
      val to = e.seq.getOrElse(shard, 0L)
      if (to > from) Some(ShardSlicePartition(shard.toLong, sh.files, from, to))
      else None
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ShardSliceReaderFactory(new org.apache.spark.util.SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration))

  /** Self-created staging is torn down with the stream; an explicit
    * stagingDir is the caller's to manage (it may be a shared,
    * pre-staged log). */
  override def stop(): Unit = if (explicitStagingDir.isEmpty) {
    try {
      val p = new Path(stagingDir)
      p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
        .delete(p, true)
    } catch { case _: Exception => () } // best-effort cleanup
    ()
  }
}

/** One shard's seq range (from, to] for one micro-batch; executors read
  * the slice from the staged parquet themselves. */
case class ShardSlicePartition(
    userId: Long, files: Array[String], from: Long, to: Long)
    extends InputPartition

/** Carries the driver's Hadoop conf (Spark's SerializableConfiguration,
  * serialized once with the factory) so a staging dir on s3a/hdfs/...
  * resolves with the session's spark.hadoop.* settings instead of
  * executor-side defaults. */
case class ShardSliceReaderFactory(
    hadoopConf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ShardSliceReader(p.asInstanceOf[ShardSlicePartition], hadoopConf.value)
}

/** Executor-side reader: parquet-mr record reader with a seq-range
  * filter (row-group statistics prune non-overlapping groups, then
  * record-level filtering trims the rest), emitting rows in seq order.
  * Memory is one parquet row at a time — a slice never buffers. */
private[v2] class ShardSliceReader(p: ShardSlicePartition,
    conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {
  private val filter = FilterCompat.get(FilterApi.and(
    FilterApi.gt(FilterApi.longColumn("seq"), java.lang.Long.valueOf(p.from)),
    FilterApi.ltEq(FilterApi.longColumn("seq"), java.lang.Long.valueOf(p.to))))
  private var fileIdx = 0
  private var reader: ParquetReader[org.apache.parquet.example.data.Group] = _
  private var current: org.apache.parquet.example.data.Group = _

  private def nextReader(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (fileIdx >= p.files.length) return false
    reader = ParquetReader
      .builder(new GroupReadSupport(), new Path(p.files(fileIdx)))
      .withConf(conf)
      .withFilter(filter)
      .build()
    fileIdx += 1
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (reader == null && !nextReader()) return false
      current = reader.read()
      if (current != null) return true
      reader.close(); reader = null
    }
    false
  }

  override def get(): InternalRow = {
    val g = current
    def str(field: String): UTF8String =
      if (g.getFieldRepetitionCount(field) == 0) null
      else UTF8String.fromString(g.getString(field, 0))
    new GenericInternalRow(Array[Any](
      g.getLong("event_id", 0), g.getLong("ts_us", 0), p.userId,
      str("event_type"), g.getDouble("value", 0), str("props")))
  }

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}

private[v2] object ParquetSlice {
  /** Footer-only row count of one parquet file (no column data read). */
  def rowCount(file: String, conf: org.apache.hadoop.conf.Configuration): Long = {
    val input = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new Path(file), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(input)
    try r.getRecordCount finally r.close()
  }
}
