package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StringType

/** Destination control-plane: get-or-create a named output stream and
  * optionally grant public read. The reference calls
  * client.getOrCreateStream + grantPermission once per distinct stream id,
  * memoized for the process lifetime (bin/mqtt-streamr.js:10,168-184).
  * Implementations are driver-side only. ensure() MUST be idempotent —
  * the memo in [[RoutingSink]] is a bounded LRU, so an id can be
  * re-ensured after eviction.
  */
trait StreamRegistry extends Serializable {
  def ensure(streamId: String, publicRead: Boolean): Unit
}

/** Stream registry writing one directory per stream (the parquet-backed
  * stand-in for the remote streaming service). Idempotent: mkdirs and
  * marker creation are no-ops when already present.
  *
  * `owner` is the authenticated principal derived from the reference's
  * --private-key credential (bin/mqtt-streamr.js:22-25,67): created
  * streams record it — the ownership analog of creating a stream under
  * an authenticated account.
  */
class FsStreamRegistry(root: String, owner: Option[String] = None) extends StreamRegistry {
  override def ensure(streamId: String, publicRead: Boolean): Unit = {
    val dir = new java.io.File(root, java.net.URLEncoder.encode(streamId, "UTF-8"))
    dir.mkdirs()
    owner.foreach { o =>
      val f = new java.io.File(dir, "_owner")
      if (!f.exists()) java.nio.file.Files.writeString(f.toPath, o)
    }
    if (publicRead) {
      // K2 — the "grant anonymous read" analog: a marker the sink layer
      // (or an object-store ACL in a real deployment) can act on
      new java.io.File(dir, "_public").createNewFile()
    }
  }
}

object FsStreamRegistry {
  /** Principal derivation: the public "address" of a private key,
    * modeled as a hex digest — never the key itself on disk.
    */
  def principalOf(privateKey: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(privateKey.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(16).map(b => f"$b%02x").mkString
  }
}

/** K3 — the publish step as an engine surface. The reference publishes
  * each record to a remote streaming service (bin/mqtt-streamr.js:191-198);
  * deployments plug their transport in here. foreachBatch delivery is
  * at-least-once, so implementations MUST be idempotent per batchId —
  * a replayed batch must not duplicate records downstream.
  */
trait StreamPublisher extends Serializable {
  /** Publish one micro-batch of routed records
    * (columns: topic, arrival_ts, value_json, stream_id).
    */
  def publish(routed: DataFrame, batchId: Long): Unit
}

/** Filesystem publisher: parquet fan-out partitioned by
  * (stream_id, batch_id). Including batchId in the partitioning and
  * writing with dynamic partition overwrite makes a replayed micro-batch
  * overwrite exactly its own partitions — idempotent under foreachBatch's
  * at-least-once replay, without touching other batches' output.
  *
  * Small-files control (SURVEY §7.4#2): without `coalescePerStream`, a
  * batch writes up to tasks × |stream ids| files; repartitioning on
  * stream_id first costs one bounded-by-batch shuffle and writes ONE file
  * per (stream, batch) — the right trade once id cardinality is real.
  * `maxRecordsPerFile` re-splits any hot stream's file so a skewed id
  * can't produce an unboundedly large file.
  */
class FsStreamPublisher(
    outDir: String,
    coalescePerStream: Boolean = true,
    maxRecordsPerFile: Long = 5000000L) extends StreamPublisher {
  override def publish(routed: DataFrame, batchId: Long): Unit = {
    val laidOut = if (coalescePerStream) routed.repartition(col("stream_id")) else routed
    laidOut
      .withColumn("batch_id", lit(batchId))
      .write
      .partitionBy("stream_id", "batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(outDir)
  }
}

/** K1/K2/K3/K4 — the routing sink. Per micro-batch (or per batch run):
  *   1. drop invalid records (the reference already logged+counted them);
  *   2. driver-side: distinct stream ids → ensure each exists via the
  *      registry, memoized like the reference's module-scope cache
  *      (bin/mqtt-streamr.js:10) but LRU-BOUNDED: an unbounded id space
  *      cannot grow driver memory without limit (SCALE.md). Eviction is
  *      safe because ensure() is idempotent — a re-sighted id just
  *      re-ensures.
  *   3. hand all records to the [[StreamPublisher]] (default: partitioned
  *      parquet fan-out, idempotent per batch).
  *
  * Scale notes: the ensure step moves |distinct new ids| strings to the
  * driver per batch — bounded by the id space, not the record count; the
  * data path never collects.
  */
class RoutingSink(
    registry: StreamRegistry,
    publisher: StreamPublisher,
    cfg: GraftConfig,
    memoCap: Int = 10000) extends Serializable {

  def this(registry: StreamRegistry, outDir: String, cfg: GraftConfig) =
    this(registry, new FsStreamPublisher(outDir), cfg)

  // driver-side LRU memo (access-ordered): one ensure per distinct stream
  // id while it stays resident; re-ensure (idempotent) after eviction
  private val ensured = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, java.lang.Boolean](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
        size() > memoCap
    })

  private val ensureCount = new AtomicLong(0L)

  /** Number of ensure() calls actually performed (for tests/metrics). */
  def ensureCalls: Long = ensureCount.get()

  def processBatch(batch: Dataset[Row], batchId: Long): Unit = {
    // Two actions consume this batch (distinct-ids collect, then the
    // partitioned write). Persist so the source isn't re-executed — which
    // would both redo the parse/transform work AND double-count the
    // pipeline's observe() metrics (CollectMetrics accumulates per
    // execution, not per batch).
    batch.persist()
    try doProcess(batch, batchId) finally batch.unpersist()
  }

  private def doProcess(batch: Dataset[Row], batchId: Long): Unit = {
    val routed = batch.filter(col("valid")).drop("valid")
    if (cfg.verbose) {
      // K4 verbose: log a bounded sample of routed records, never collect all
      routed.limit(20).collect().foreach(r => println(s"[graft][$batchId] $r"))
    }
    if (!cfg.dryRun) {
      val cap = cfg.maxStreamIdsPerBatch
      // sort+limit compiles to TakeOrderedAndProject — bounded driver
      // memory (cap+1 rows) whatever the id cardinality; the +1 row is
      // the overflow probe. Lexicographic order makes the sampled ensure
      // set deterministic under replay.
      val ids = routed.select("stream_id").distinct()
        .orderBy("stream_id").limit(cap + 1).collect().map(_.getString(0))
      if (ids.length > cap) cfg.streamIdOverflow match {
        case "sample" =>
          System.err.println(s"[graft][$batchId] distinct stream ids exceed " +
            s"max-stream-ids=$cap; ensuring the first $cap (overflow ids " +
            "ensure on re-sight; check the stream-id template)")
        case _ =>
          throw new IllegalStateException(s"batch $batchId: distinct stream " +
            s"ids exceed max-stream-ids=$cap — the stream-id template is " +
            "likely deriving ids from unbounded message content; fix the " +
            "template or set --stream-id-overflow sample")
      }
      ids.take(cap).foreach { id =>
        // get() touches the LRU access order; only a miss pays an ensure
        if (ensured.get(id) == null) {
          registry.ensure(id, cfg.publicStreams) // K1 + K2
          ensureCount.incrementAndGet()
          ensured.put(id, java.lang.Boolean.TRUE)
        }
      }
      // routing-only pipelines carry the raw payload string as `value`;
      // schema'd pipelines carry a struct — serialize those to JSON
      val valueJson =
        if (routed.schema("value").dataType == StringType) col("value")
        else to_json(col("value"))
      publisher.publish(
        routed.withColumn("value_json", valueJson).drop("value"), batchId)
    }
  }

  /** Attach as a foreachBatch streaming sink. */
  def attach(writer: DataStreamWriter[Row]): DataStreamWriter[Row] =
    writer.foreachBatch((df: Dataset[Row], id: Long) => processBatch(df, id))
}
