package graft.sources.clustered

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.ClusteredTable

/** STREAMING TAIL of a clustered table UNDER THE SAME FORMAT STRING —
  * `spark.readStream.format("graft-clustered").option("root", …)` —
  * the unified read the r14 verdict asked for: one connector serves
  * the batch snapshot (with pruning + aggregate pushdown) AND the
  * append feed. Semantics match [[ClusteredTable.tail]]: each
  * `append()`/`sink()` batch surfaces exactly once, `optimize` folds
  * into `base/` (outside this listing) and `vacuum` only ever removes
  * delta directories already past the committed offset — the
  * maintenance lifecycle runs at any cadence under a live tail.
  * Delta rows present exactly as the batch read's unfolded tail does:
  * `zfile = -1`, `zkey = NULL`, so one schema serves both modes.
  *
  * OFFSETS ARE SEQUENCE NAMES: the table contract already requires
  * artifact names to be lexicographically monotonic (zero-padded batch
  * ids), so the stream's offset is simply the highest delta name seen,
  * and a micro-batch is the name range (start, end] — no per-file seen
  * log at all (the file source's log grows with history; a name
  * watermark is O(1)). An append named at or below the committed
  * offset is therefore INVISIBLE to the stream — that is the sequence
  * contract, not a quirk; `sink()`'s zero-padded batch ids satisfy it
  * by construction. The offset is clamped monotone against the
  * checkpoint (SupportsAdmissionControl hands us the start offset), so
  * a vacuum that empties the delta namespace can never regress the
  * log and re-serve a folded-but-unvacuumed delta.
  *
  * Equality deletes are invisible here (the append feed only — a
  * consumer that must retract reads `changes()`), identical to tail().
  *
  * EXECUTOR-SIDE DECODE: partitions are parquet files; the reader
  * decodes records through parquet-hadoop's example Group API — the
  * supported tail schema is the primitive core (boolean, int32/64,
  * float/double, string), validated loudly at stream construction;
  * a table with fancier column types streams through
  * [[ClusteredTable.tail]]'s file source instead. Pushed filters are
  * re-evaluated per record (cheap, and correct whether or not the
  * planner chose to push them in streaming mode); required-column
  * pruning maps straight onto the Group field lookup.
  *
  * Scale: the per-trigger driver cost is one listing of the
  * un-vacuumed delta namespace (bounded by the vacuum cadence, not
  * table size) — the same bill tail() pays, minus the file source's
  * ever-growing seen-file log. Decode parallelism is one task per
  * delta file.
  */
class ClusteredTailStream(root: String, prunedSchema: StructType,
    filters: Array[Filter], maxDeltasPerTrigger: Option[Int] = None)
    extends MicroBatchStream with SupportsAdmissionControl {

  ClusteredTailStream.validate(prunedSchema)
  maxDeltasPerTrigger.foreach(n => require(n > 0,
    s"maxfilespertrigger must be positive, got $n"))

  // names sort below every zero-padded id and every [a-z0-9] name
  private val Genesis = "-"

  /** A BRAND-NEW consumer starts at the RECLAIM HORIZON, not Genesis:
    * the max ledger delta name whose directory vacuum already removed
    * (the ledger's manifests survive vacuum, so reclaimed names are
    * exactly ledger-minus-disk). Starting at Genesis would make the
    * first planInputPartitions see every vacuumed folded delta as
    * "lost" and kill the stream on any table that has ever been folded
    * and vacuumed — contradicting the documented contract that a fresh
    * tail observes the un-reclaimed `d=` namespace (the r15 ADVICE
    * finding). The loud data-loss guard below stays fully armed for
    * REAL checkpointed ranges: once an offset is logged, a vacuum
    * racing past an uncommitted range still fails the stream instead
    * of silently shrinking it.
    */
  override def initialOffset(): Offset = {
    val present = ClusteredTable.deltaArtifacts(root).map(_._1).toSet
    val reclaimed = ClusteredTable.artifactNames(root)
      .filter(_.startsWith("d=")).map(_.stripPrefix("d="))
      .filterNot(present.contains)
    TailOffset(reclaimed.foldLeft(Genesis)((a, b) => if (b > a) b else a))
  }

  override def deserializeOffset(json: String): Offset = TailOffset(json)

  /** ADMISSION CONTROL: `maxfilespertrigger` bounds how many delta
    * artifacts one micro-batch admits (the MQTT source's
    * maxRecordsPerBatch discipline, in the tail's unit of work). A
    * consumer attaching to a 10k-delta backlog drains it across
    * ceil(10k/n) bounded batches instead of one giant batch 0 — at
    * 100 TB an unbounded first batch is a driver OOM and a checkpoint
    * all-or-nothing; bounded batches commit incremental progress.
    */
  override def getDefaultReadLimit: ReadLimit =
    maxDeltasPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  /** The next batch's end offset: the highest delta name admitted by
    * `limit` past `start`, in sequence order — never below `start` (a
    * vacuumed-empty namespace must not regress the log; a regressed
    * offset would re-serve every folded-but-unvacuumed delta after the
    * next append).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[TailOffset].name
    val pending = ClusteredTable.deltaArtifacts(root).map(_._1)
      .filter(_ > s).sorted
    val admitted = ClusteredTailStream.maxFilesOf(limit) match {
      case Some(n) => pending.take(n)
      case None => pending
    }
    TailOffset(admitted.lastOption.getOrElse(s))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[TailOffset].name, end.asInstanceOf[TailOffset].name)
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val onDisk = ClusteredTable.deltaArtifacts(root)
      .filter { case (name, _) => name > s && name <= e }
    // LOUD DATA LOSS (the failOnDataLoss contract): a replanned batch —
    // a restart of a logged-but-uncommitted range — whose deltas were
    // meanwhile folded AND vacuumed must fail, never silently shrink.
    // The artifact ledger still names every ingested delta (manifests
    // survive vacuum), so the gap is detectable: ledger names in range
    // with no directory on disk are exactly the reclaimed ones.
    val present = onDisk.map(_._1).toSet
    val lost = ClusteredTable.artifactNames(root)
      .filter(_.startsWith("d=")).map(_.stripPrefix("d="))
      .filter(n => n > s && n <= e && !present.contains(n))
    if (lost.nonEmpty) throw new IllegalStateException(
      s"graft-clustered tail: delta artifact(s) ${lost.toSeq.sorted.mkString(", ")} " +
        s"in offset range ($s, $e] were vacuumed before this consumer committed " +
        "them — the table's vacuum cadence must lag the slowest consumer; " +
        "restart the stream from a fresh checkpoint (re-seed) to continue")
    onDisk.flatMap { case (_, dir) =>
        val p = new Path(dir)
        val fs = p.getFileSystem(conf)
        fs.listStatus(p).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet") &&
            !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
          .map(st => TailFilePartition(st.getPath.toString): InputPartition)
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TailReaderFactory(prunedSchema, filters)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[clustered] case class TailOffset(name: String) extends Offset {
  override def json(): String = name
}

private[clustered] case class TailFilePartition(file: String) extends InputPartition

private[clustered] object ClusteredTailStream {
  /** The max-files component of a ReadLimit, if any: ReadMaxFiles
    * directly, or inside the composite Spark builds when several
    * admission hints combine. Rate/row limits don't map onto a
    * directory-granular source and read as unbounded.
    */
  private[clustered] def maxFilesOf(limit: ReadLimit): Option[Int] = {
    import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadMaxFiles}
    limit match {
      case m: ReadMaxFiles => Some(m.maxFiles())
      case c: CompositeReadLimit =>
        c.getReadLimits.toSeq.flatMap(maxFilesOf).reduceOption(_ min _)
      case _ => None
    }
  }

  private[clustered] val supported: Set[DataType] =
    Set(BooleanType, ByteType, ShortType, IntegerType, LongType,
      FloatType, DoubleType, StringType)

  private[clustered] def validate(schema: StructType): Unit = {
    val bad = schema.fields
      .filterNot(f => f.name == "zkey" || f.name == "zfile") // synthetic
      .filterNot(f => supported.contains(f.dataType))
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"graft-clustered streaming tail supports primitive columns only; " +
        s"unsupported: ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")} " +
        "— stream such tables through ClusteredTable.tail's file source instead")
  }
}

private[clustered] class TailReaderFactory(schema: StructType,
    filters: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TailFileReader(partition.asInstanceOf[TailFilePartition].file, schema, filters)
}

/** One parquet delta file → InternalRows of the pruned schema, pushed
  * filters re-applied per record. Decode goes through the example
  * Group API: adequate for the validated primitive schema, and the
  * whole reader stays free of Spark-internal parquet machinery.
  */
private[clustered] class TailFileReader(file: String, schema: StructType,
    filters: Array[Filter]) extends PartitionReader[InternalRow] {
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport

  private val reader: ParquetReader[Group] = {
    val conf = new Configuration()
    ParquetReader.builder(new GroupReadSupport(), new Path(file))
      .withConf(conf).build()
  }
  private var current: Group = _

  /** Raw field value (null when absent or unset — schema evolution). */
  private def raw(g: Group, name: String): Any = {
    if (name == "zfile") return -1
    if (name == "zkey") return null
    val t = g.getType
    if (!t.containsField(name)) return null
    val idx = t.getFieldIndex(name)
    if (g.getFieldRepetitionCount(idx) == 0) return null
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    t.getType(idx).asPrimitiveType().getPrimitiveTypeName match {
      case BOOLEAN => g.getBoolean(idx, 0)
      case INT32 => g.getInteger(idx, 0)
      case INT64 => g.getLong(idx, 0)
      case FLOAT => g.getFloat(idx, 0)
      case DOUBLE => g.getDouble(idx, 0)
      case BINARY => g.getString(idx, 0)
      case other => throw new IllegalStateException(
        s"unsupported parquet type $other for tail column $name")
    }
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(x.compareTo(y))
    case (x: Number, y: Number) =>
      (x, y) match {
        case (_: java.lang.Double, _) | (_, _: java.lang.Double) |
             (_: java.lang.Float, _) | (_, _: java.lang.Float) =>
          Some(x.doubleValue().compareTo(y.doubleValue()))
        case _ => Some(java.lang.Long.compare(x.longValue(), y.longValue()))
      }
    case _ => None
  }

  private def eval(g: Group, f: Filter): Boolean = f match {
    case EqualTo(c, v) => cmp(raw(g, c), v).contains(0)
    case GreaterThan(c, v) => cmp(raw(g, c), v).exists(_ > 0)
    case GreaterThanOrEqual(c, v) => cmp(raw(g, c), v).exists(_ >= 0)
    case LessThan(c, v) => cmp(raw(g, c), v).exists(_ < 0)
    case LessThanOrEqual(c, v) => cmp(raw(g, c), v).exists(_ <= 0)
    case In(c, vs) => vs.exists(v => cmp(raw(g, c), v).contains(0))
    case IsNull(c) => raw(g, c) == null
    case IsNotNull(c) => raw(g, c) != null
    case _ => true // never pushed (unhandledFilters contract)
  }

  override def next(): Boolean = {
    var g = reader.read()
    while (g != null && !filters.forall(eval(g, _))) g = reader.read()
    current = g
    g != null
  }

  override def get(): InternalRow = {
    val values = schema.fields.map { fld =>
      (raw(current, fld.name), fld.dataType) match {
        case (null, _) => null
        case (v: Int, ByteType) => v.toByte
        case (v: Int, ShortType) => v.toShort
        case (v: Int, LongType) => v.toLong // synthetic zfile into a long schema
        case (v: String, _) => UTF8String.fromString(v)
        case (v, _) => v
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = reader.close()
}
