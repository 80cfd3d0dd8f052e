package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Destination control-plane: get-or-create a named output stream and
  * optionally grant public read. The reference calls
  * client.getOrCreateStream + grantPermission once per distinct stream id,
  * memoized for the process lifetime (bin/mqtt-streamr.js:10,168-184).
  * Implementations are driver-side only.
  */
trait StreamRegistry extends Serializable {
  def ensure(streamId: String, publicRead: Boolean): Unit
}

/** Stream registry writing one directory per stream (the parquet-backed
  * stand-in for the remote streaming service).
  */
class FsStreamRegistry(root: String) extends StreamRegistry {
  override def ensure(streamId: String, publicRead: Boolean): Unit = {
    val dir = new java.io.File(root, java.net.URLEncoder.encode(streamId, "UTF-8"))
    dir.mkdirs()
    if (publicRead) {
      // K2 — the "grant anonymous read" analog: a marker the sink layer
      // (or an object-store ACL in a real deployment) can act on
      new java.io.File(dir, "_public").createNewFile()
    }
  }
}

/** K1/K2/K3/K4 — the routing sink. Per micro-batch (or per batch run):
  *   1. drop invalid records (the reference already logged+counted them);
  *   2. driver-side: distinct stream ids → ensure each exists exactly once
  *      per process (memoized, surviving source reconnects like the
  *      reference's module-scope cache, bin/mqtt-streamr.js:10);
  *   3. write all records partitioned by stream_id (one shuffle-free
  *      fan-out write; dynamic partition overwrite keeps idempotency).
  *
  * Scale notes: the ensure step moves |distinct new ids| strings to the
  * driver per batch — bounded by the id space, not the record count; the
  * data path never collects. Unbounded id spaces should bound the memo
  * with an LRU (SURVEY §7.4#2); creation is idempotent so eviction is
  * safe.
  */
class RoutingSink(
    registry: StreamRegistry,
    outDir: String,
    cfg: GraftConfig) extends Serializable {

  // driver-side memo: one ensure per distinct stream id per process
  private val ensured = new ConcurrentHashMap[String, java.lang.Boolean]()

  /** Number of ensure() calls actually performed (for tests/metrics). */
  @volatile var ensureCalls: Long = 0L

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
      val ids = routed.select("stream_id").distinct().collect().map(_.getString(0))
      ids.foreach { id =>
        ensured.computeIfAbsent(id, _ => {
          registry.ensure(id, cfg.publicStreams) // K1 + K2, exactly once
          ensureCalls += 1
          java.lang.Boolean.TRUE
        })
      }
      routed
        .withColumn("value_json", to_json(col("value")))
        .drop("value")
        .write
        .partitionBy("stream_id")
        .mode("append")
        .parquet(outDir)
    }
  }

  /** Attach as a foreachBatch streaming sink. */
  def attach(writer: DataStreamWriter[Row]): DataStreamWriter[Row] =
    writer.foreachBatch((df: Dataset[Row], id: Long) => processBatch(df, id))
}
