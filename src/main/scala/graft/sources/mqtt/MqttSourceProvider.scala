package graft.sources.mqtt

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** S1 — MQTT streaming source as a DataSource V2 MicroBatchStream:
  *
  *   spark.readStream.format("mqtt")
  *     .option("url", "tcp://host:1883")
  *     .option("topics", "a/+/c,b/#")        // wildcards per MQTT spec
  *     .load()                               // topic, payload, arrival_ts
  *
  * Mirrors the reference's subscription surface (bin/mqtt-streamr.js:
  * 119-139: connect, per-topic subscribe incl. +/# wildcards) with its
  * delivery guarantee (QoS 0 / at-most-once, fire-and-forget): messages
  * buffer on the driver between micro-batches and ship to executors
  * inside the planned partitions (the MemoryStream/rate-source pattern —
  * MQTT has no replayable log, so there is nothing an executor could
  * re-read; a durable deployment puts a log in front, and the
  * reconnect-on-idle watchdog lives INSIDE the client, SURVEY §7.4#4).
  * Offsets are cumulative received counts; commit() trims the buffer.
  */
class MqttSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mqtt"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.streaming.GraftPipeline.envelopeSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MqttTable(schema, properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap)
}

class MqttTable(schema: StructType, options: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"mqtt(${options.getOrElse("url", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new MqttMicroBatchStream(options)
      }
    }
}

case class MqttOffset(count: Long) extends Offset {
  override def json(): String = count.toString
}

case class MqttInputPartition(rows: Array[(String, Array[Byte], Long)]) extends InputPartition

class MqttMicroBatchStream(options: Map[String, String]) extends MicroBatchStream {
  private val url = options.getOrElse("url",
    throw new IllegalArgumentException("mqtt source requires option 'url'"))
  private val topics = options.getOrElse("topics", "#").split(",").map(_.trim).toSeq
  private val timeoutMs =
    options.get("datatimeoutsecs").map(_.toLong * 1000).getOrElse(900000L)
  // admission control: cap records admitted per micro-batch so a burst
  // doesn't produce one giant batch (backlog drains over later triggers)
  // AND bounds the driver buffer between triggers
  private val maxPerBatch =
    options.get("maxrecordsperbatch").map(_.toInt).getOrElse(Int.MaxValue)
  // batch parallelism: slice each admitted range into ~this many records
  // per task so one large drain doesn't serialize the downstream pipeline
  // into a single task
  private val targetPerPartition =
    math.max(1, options.get("targetrecordsperpartition").map(_.toInt).getOrElse(2000))

  // driver-side state: total received count = offset; buffer holds
  // [committedBase, received) pending messages
  private var client: MqttClient = _
  private val buffer = scala.collection.mutable.ArrayBuffer.empty[MqttMessage]
  private var committedBase = 0L
  private var received = 0L

  private def ensureClient(): MqttClient = synchronized {
    if (client == null) {
      client = new MqttClient(url, topics, dataTimeoutMillis = timeoutMs).start()
      client.awaitConnected()
    }
    client
  }

  override def initialOffset(): Offset = MqttOffset(0)

  override def latestOffset(): Offset = synchronized {
    val drained = ensureClient().poll(maxPerBatch)
    buffer ++= drained
    received += drained.length
    MqttOffset(received)
  }

  /** Restart re-base: a deserialized checkpoint offset strictly ahead of
    * this (fresh) instance's counters means we restarted — the messages
    * numbered [received, o) belong to the previous incarnation and are
    * gone at QoS 0. Shift both counters so pending buffered messages
    * renumber to [o, o + buffer.length): offsets stay monotonic in the
    * checkpoint log and nothing received after restart is silently
    * dropped by the slice in planInputPartitions. In-session offsets are
    * always <= received, so this never fires mid-stream.
    */
  private def rebase(o: Long): Unit = synchronized {
    if (o > received) {
      committedBase = o
      received = o + buffer.length
    }
  }

  override def deserializeOffset(json: String): Offset = {
    val o = json.toLong
    rebase(o)
    MqttOffset(o)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[MqttOffset].count
      rebase(s) // belt-and-braces if deserializeOffset was bypassed
      val e = end.asInstanceOf[MqttOffset].count
      // offsets before the committed base are gone (no replay at QoS 0)
      val from = math.max(s, committedBase)
      // payload ships as raw bytes (reference fidelity: the Buffer reaches
      // JSON.parse undecoded, bin/mqtt-streamr.js:144); the pipeline
      // decodes in-plan and drop-counts malformed UTF-8
      val rows = buffer.slice((from - committedBase).toInt, (e - committedBase).toInt)
        .map(m => (m.topic, m.payload, m.arrivalMillis * 1000L))
        .toArray
      // one task per ~targetPerPartition records: a large drained batch
      // fans out across executor threads instead of serializing the
      // whole downstream pipeline into a single task
      if (rows.length <= targetPerPartition) Array(MqttInputPartition(rows))
      else rows.grouped(targetPerPartition).map(MqttInputPartition(_)).toArray[InputPartition]
    }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val rows = partition.asInstanceOf[MqttInputPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val (topic, payload, micros) = rows(i)
        InternalRow(UTF8String.fromString(topic), payload, micros)
      }
      override def close(): Unit = ()
    }

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[MqttOffset].count
    if (e > committedBase) {
      buffer.dropInPlace((e - committedBase).toInt)
      committedBase = e
    }
  }

  override def stop(): Unit = synchronized {
    if (client != null) client.close()
  }
}
