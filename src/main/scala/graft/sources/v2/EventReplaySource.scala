package graft.sources.v2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
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
  * in-memory shard map with shard-iterator polling and keeps
  * everything else — offsets, partition planning, row decoding —
  * unchanged.
  *
  * Scale notes: one InputPartition per shard per batch → parallelism
  * tracks shard count exactly as with a real Kinesis stream; offsets
  * are per-shard sequence numbers so checkpoint/restart resumes each
  * shard independently.
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

/** One event in wire form (all JVM-serializable primitives; ts in
  * epoch micros). */
private[v2] case class WireEvent(
    eventId: Long, tsUs: Long, userId: Long,
    eventType: String, value: Double, props: String)

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

class EventReplayStream(options: Map[String, String])
    extends MicroBatchStream with SupportsAdmissionControl {
  private val path = options.getOrElse("path",
    throw new IllegalArgumentException("graft-replay requires option 'path'"))
  private val eventsPerTrigger =
    options.getOrElse("eventsPerTrigger", "1000").toLong

  /** Shard map loaded once on the driver at stream construction (the
    * stand-in for Kinesis ListShards + iterators). Replay order within
    * a shard is (ts, event_id) — the per-shard ordering a partitioned
    * log guarantees. */
  private lazy val shards: Map[String, Array[WireEvent]] =
    loadRaw(SparkSession.active)

  private def loadRaw(spark: SparkSession): Map[String, Array[WireEvent]] = {
    graft.Tables.eventsAt(spark, path)
      .selectExpr("event_id", "unix_micros(ts) AS ts_us", "user_id",
        "event_type", "value", "props")
      .collect()
      .map(r => WireEvent(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4), r.getString(5)))
      .groupBy(_.userId.toString)
      .map { case (k, evs) => k -> evs.sortBy(e => (e.tsUs, e.eventId)) }
  }

  override def initialOffset(): Offset =
    ShardOffsets(shards.keys.map(_ -> 0L).toMap)

  /** Admission control (the rate-limited path the engine actually
    * uses): advance each shard by at most eventsPerTrigger past the
    * engine-provided start — the Kinesis GetRecords `Limit` analog. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ShardOffsets]
    ShardOffsets(shards.map { case (k, evs) =>
      k -> math.min(evs.length.toLong, s.seq.getOrElse(k, 0L) + eventsPerTrigger)
    })
  }

  /** True end of the stream — lets processAllAvailable()/AvailableNow
    * keep scheduling batches until every shard is drained. */
  override def reportLatestOffset(): Offset =
    ShardOffsets(shards.map { case (k, evs) => k -> evs.length.toLong })

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used via SupportsAdmissionControl")

  override def deserializeOffset(json: String): Offset = ShardOffsets.parse(json)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardOffsets]
    val e = end.asInstanceOf[ShardOffsets]
    shards.toArray.flatMap { case (shard, evs) =>
      val from = s.seq.getOrElse(shard, 0L).toInt
      val to = e.seq.getOrElse(shard, 0L).toInt
      if (to > from) Some(EventReplayPartition(evs.slice(from, to)))
      else None
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val rows = p.asInstanceOf[EventReplayPartition].events
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = {
            val ev = rows(i)
            new GenericInternalRow(Array[Any](
              ev.eventId, ev.tsUs, ev.userId,
              UTF8String.fromString(ev.eventType), ev.value,
              UTF8String.fromString(ev.props)))
          }
          override def close(): Unit = ()
        }
      }
    }

  override def stop(): Unit = ()
}

case class EventReplayPartition(events: Array[WireEvent]) extends InputPartition
