package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.NearDupStream

/** Streaming MinHash near-dup suppression: a re-arrival of (near-)identical
  * text within the horizon is flagged via its LSH band buckets; buckets
  * forget once the event-time watermark passes the horizon.
  */
class NearDupStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog again and again"
  private val textG = "completely different words describing other things entirely here now"

  test("near-dup within horizon flagged; new text passes; buckets expire") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "arrival_ts")

    val evidence = NearDupStream(docs, horizonMs = 10 * 60 * 1000L,
      watermark = "0 seconds")
    val q = evidence.writeStream.format("memory")
      .queryName("ndup").outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    try {
      // batch 1: two fresh docs
      mem.addData(Seq((1L, textA, t("2026-01-01 10:00:00")),
        (2L, textG, t("2026-01-01 10:00:00"))))
      q.processAllAvailable()
      // batch 2: doc 3 repeats textA within horizon; doc 4 is fresh
      mem.addData(Seq((3L, textA, t("2026-01-01 10:05:00")),
        (4L, "unrelated fresh content nobody wrote before in this stream today",
          t("2026-01-01 10:05:00"))))
      q.processAllAvailable()
      // batch 3: advance the watermark far past every horizon
      mem.addData(Seq((5L, "one more unique advancing document full of novel tokens",
        t("2026-01-01 11:00:00"))))
      q.processAllAvailable()
      // batch 4: textG re-arrives AFTER its buckets expired -> fresh again
      mem.addData(Seq((6L, textG, t("2026-01-01 11:10:00"))))
      q.processAllAvailable()

      val verdicts = NearDupStream.verdict(spark.table("ndup"))
        .as[(Long, Boolean)].collect().toMap
      assert(verdicts(1L) == false && verdicts(2L) == false) // first arrivals
      assert(verdicts(3L) == true)  // repeat inside horizon: every band occupied
      assert(verdicts(4L) == false)
      assert(verdicts(5L) == false)
      assert(verdicts(6L) == false) // horizon passed: buckets forgot textG
      // evidence granularity: doc 3 collided on ALL 4 bands (identical text)
      val doc3 = spark.table("ndup").filter($"doc_id" === 3L)
        .select("prior_seen").as[Boolean].collect()
      assert(doc3.length == 4 && doc3.forall(identity))
    } finally q.stop()
  }
}
