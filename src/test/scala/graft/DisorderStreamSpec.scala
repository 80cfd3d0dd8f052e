package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.DisorderStream

/** Streaming event-time disorder: per-user high-water-mark state emits
  * each event's lateness behind its user's already-seen event time;
  * semantics pinned to the batch pipe_lateness window over the same
  * rows; idle users expire past the horizon.
  */
class DisorderStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming disorder equals the batch running-max window; state expires") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Timestamp, Timestamp)]
    val events = mem.toDF().toDF("user_id", "event_id", "event_type", "ts", "arrival_ts")

    val q = DisorderStream(events, horizonMs = 60 * 60 * 1000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("disorder").outputMode("append").start()
    // user 1: in-order, then a 90s-late event, then in-order again;
    // user 2: all in-order — split across micro-batches so the HWM must
    // survive in state between batches
    val b1 = Seq(
      (1L, 10L, "view", t("2026-01-01 10:00:00"), t("2026-01-01 10:00:00")),
      (1L, 11L, "view", t("2026-01-01 10:02:00"), t("2026-01-01 10:02:00")),
      (2L, 20L, "click", t("2026-01-01 10:01:00"), t("2026-01-01 10:01:00")))
    val b2 = Seq(
      (1L, 12L, "click", t("2026-01-01 10:00:30"), t("2026-01-01 10:02:30")), // 90s behind hwm
      (1L, 13L, "view", t("2026-01-01 10:03:00"), t("2026-01-01 10:03:00")),
      (2L, 21L, "click", t("2026-01-01 10:04:00"), t("2026-01-01 10:04:00")))
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()

      val streamed = spark.table("disorder")
        .select("event_id", "disorder_us").as[(Long, Long)].collect().toMap
      // batch reference: the pipe_lateness window over the same rows
      val batch = (b1 ++ b2).toDF("user_id", "event_id", "event_type", "ts", "arrival_ts")
        .withColumn("us", expr("unix_micros(ts)"))
        .withColumn("hwm", max("us").over(
          Window.partitionBy("user_id").orderBy("event_id")))
        .select($"event_id", ($"hwm" - $"us").as("disorder_us"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == batch)
      assert(streamed(12L) == 90L * 1000000) // the late event, explicitly
      assert(streamed.values.count(_ == 0L) == 5)

      // horizon expiry: advance the watermark far past every user's last
      // sighting; the next event for user 1 starts from a fresh mark, so
      // an event-time far below the OLD hwm reads as in-order again
      mem.addData(Seq(
        (3L, 30L, "view", t("2026-01-01 13:00:00"), t("2026-01-01 13:00:00"))))
      q.processAllAvailable()
      mem.addData(Seq(
        (1L, 14L, "view", t("2026-01-01 09:00:00"), t("2026-01-01 13:01:00"))))
      q.processAllAvailable()
      val afterExpiry = spark.table("disorder")
        .filter($"event_id" === 14L).select("disorder_us").as[Long].head()
      assert(afterExpiry == 0L) // old mark forgotten with the state

      // the profile aggregate matches pipe_lateness's shape on the sink
      val prof = DisorderStream.profile(
          spark.table("disorder").filter($"event_id" < 30L))
        .as[(String, Long, Long, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      assert(prof("view")._2 == 4 && prof("view")._3 == 0)
      assert(prof("click")._2 == 3 && prof("click")._3 == 1)
      assert(prof("click")._5 == 90.0) // max disorder in seconds
    } finally q.stop()
  }
}
