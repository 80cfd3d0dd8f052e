package graft

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.sources.mqtt.{MqttMicroBatchStream, MqttOffset}
import graft.streaming.{FsStreamPublisher, GraftPipeline}

/** EFFECTIVELY-ONCE, END TO END — the composed contract the individual
  * pieces only claim separately: QoS 1 WAL source (at-least-once, so
  * duplicates on replay/redelivery) → content-keyed streaming dedup →
  * idempotent per-batch-partition sink. One spec injects EVERY
  * at-least-once failure mode at once and asserts the final output is
  * identical to a run where nothing went wrong:
  *
  *   1. DUP redelivery: the broker re-sends all four in-flight QoS 1
  *      messages with DUP before the source drains — 8 wire deliveries
  *      of 4 distinct payloads;
  *   2. crash before checkpoint commit: the incarnation that drained
  *      (WAL-persisted + PUBACKed) all 8 dies without committing — the
  *      WAL must re-serve them at their original offsets;
  *   3. sink-visible batch replay: the recovered query's first batch
  *      publishes to the sink and THEN fails (the foreachBatch
  *      at-least-once window), so the restarted query re-runs the same
  *      batch id against already-written output.
  *
  * The no-failure run and the triple-failure run must agree row-for-row
  * on (stream_id, topic, body) — payload bytes identical, nothing lost,
  * nothing duplicated. This is the composition MqttSourceProvider's
  * header delegates to "downstream dedup" + "idempotent sink": here the
  * delegation is cashed in.
  */
class EffectivelyOnceSpec extends SparkTestBase {
  import spark.implicits._

  private val msgs = Seq(
    ("eo/alpha", """{"reading": 1}"""),
    ("eo/beta", """{"reading": 2}"""),
    ("eo/alpha", """{"reading": 3}"""),
    ("eo/beta", """{"reading": 4}"""))

  /** topic+payload → dedup-by-content → sink columns. Same plan for the
    * clean and failure runs; works on the DSv2 stream's envelope.
    */
  private def pipe(stream: DataFrame): DataFrame =
    GraftPipeline.dedupStreamByContent(
      stream.select(
        col("topic"),
        col("payload").cast("string").as("body"),
        col("arrival_ts"),
        element_at(split(col("topic"), "/"), 2).as("stream_id")),
      "body", watermark = "1 hour")
      .drop("fp")

  private def awaitSubscribed(broker: MqttTestBroker): Unit = {
    var tries = 0
    while (broker.subscriberCount == 0 && tries < 200) { Thread.sleep(20); tries += 1 }
    assert(broker.subscriberCount > 0, "source never subscribed")
  }

  private def finalRows(outDir: String): Seq[(String, String, String)] =
    spark.read.parquet(outDir)
      .select("stream_id", "topic", "body")
      .as[(String, String, String)].collect().toSeq.sorted

  test("WAL replay + DUP redelivery + batch replay collapse to the no-failure output") {
    // ---- reference run: no failures anywhere --------------------------
    val brokerA = new MqttTestBroker()
    val walA = Files.createTempDirectory("eo_wal_a").toString
    val ckA = Files.createTempDirectory("eo_ck_a").toString
    val outA = Files.createTempDirectory("eo_out_a").toString
    try {
      val pubA = new FsStreamPublisher(outA)
      val qa = pipe(spark.readStream.format("mqtt")
          .option("url", brokerA.url).option("topics", "eo/#")
          .option("qos", "1").option("waldir", walA).load())
        .writeStream
        .foreachBatch((df: DataFrame, bid: Long) => pubA.publish(df, bid))
        .option("checkpointLocation", ckA)
        .start()
      awaitSubscribed(brokerA)
      msgs.foreach { case (t, p) => brokerA.publish(t, p) }
      qa.processAllAvailable()
      qa.stop()
    } finally brokerA.close()
    val reference = finalRows(outA)
    assert(reference.size == 4, s"clean run must emit the 4 distinct messages: $reference")

    // ---- failure run ---------------------------------------------------
    val broker = new MqttTestBroker()
    val wal = Files.createTempDirectory("eo_wal_b").toString
    val ck = Files.createTempDirectory("eo_ck_b").toString
    val out = Files.createTempDirectory("eo_out_b").toString
    try {
      val opts = Map("url" -> broker.url, "topics" -> "eo/#",
        "qos" -> "1", "waldir" -> wal)

      // incarnation 1 (driven manually, like a query between triggers):
      // all four messages land, the broker redelivers all four with DUP
      // BEFORE the drain, the drain WAL-persists + acks all 8 wire
      // copies, and the incarnation dies without ever committing.
      val s1 = new MqttMicroBatchStream(opts)
      assert(s1.latestOffset() == MqttOffset(0)) // connect + subscribe
      awaitSubscribed(broker)
      msgs.foreach { case (t, p) => broker.publish(t, p) }
      assert(broker.unackedCount == 4) // in flight, none drained yet
      broker.redeliverUnacked() // session-resume redelivery: 4 DUP copies
      var tries = 0
      while (s1.latestOffset().asInstanceOf[MqttOffset].count < 8 && tries < 200) {
        Thread.sleep(20); tries += 1
      }
      assert(s1.latestOffset() == MqttOffset(8), "drain must see 4 originals + 4 DUPs")
      s1.stop() // crash: WAL holds [0,8), checkpoint never committed

      // incarnation 2: the real pipeline recovers the WAL, dedups, and
      // publishes — then dies INSIDE the foreachBatch at-least-once
      // window (after the sink write, before the batch commit).
      val publisher = new FsStreamPublisher(out)
      val failOnce = new AtomicBoolean(true)
      val publishes = new AtomicInteger(0)
      def sinkBatch(df: DataFrame, bid: Long): Unit = {
        val n = df.count()
        if (n > 0) {
          publisher.publish(df, bid)
          publishes.incrementAndGet()
          if (failOnce.getAndSet(false))
            throw new RuntimeException("injected crash after sink write")
        }
      }
      def startQuery() = pipe(spark.readStream.format("mqtt")
          .option("url", opts("url")).option("topics", opts("topics"))
          .option("qos", opts("qos")).option("waldir", opts("waldir")).load())
        .writeStream
        .foreachBatch(sinkBatch _)
        .option("checkpointLocation", ck)
        .start()

      val q1 = startQuery()
      intercept[StreamingQueryException] { q1.awaitTermination() }
      assert(publishes.get() == 1, "the crashing incarnation must have published first")

      // incarnation 3: restarts from the checkpoint, re-runs the SAME
      // batch id from the WAL (same rows, same offsets), overwrites the
      // same batch partitions idempotently, then commits and prunes.
      val q2 = startQuery()
      q2.processAllAvailable()
      q2.stop()
      assert(publishes.get() == 2, "restart must replay the uncommitted batch")
      assert(!new java.io.File(wal).listFiles().exists(_.getName.startsWith("wal-")),
        "commit must prune the fully-committed WAL segments")

      assert(finalRows(out) == reference,
        "triple-failure output must equal the no-failure output")
    } finally broker.close()
  }
}
