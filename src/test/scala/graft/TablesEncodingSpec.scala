package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the `Tables.events` loader contract across every physical `ts`
  * encoding the testdata generator has shipped (the driver has changed the
  * encoding once already — round 11's red gate): each variant must load to
  * a µs `TimestampType` with identical instants, and a `unix_micros`-
  * consuming query (the class that broke) must run over each.
  *
  * Encodings (see Tables.scala):
  *   A. TIMESTAMP_MICROS isAdjustedToUTC=1 — written from TimestampType
  *   B. TIMESTAMP_MICROS isAdjustedToUTC=0 — written from TimestampNTZType;
  *      Spark reads TIMESTAMP_NTZ
  *   C. TIMESTAMP(NANOS) — Spark cannot write it, but under the pinned
  *      `nanosAsLong` conf it READS as LongType(nanos); writing an int64
  *      nanos column produces the identical post-scan shape the loader sees
  */
class TablesEncodingSpec extends SparkTestBase {

  // 20 events for 2 users spanning a session gap, micros since epoch (UTC)
  private val baseUs = 1700000000000000L // 2023-11-14T22:13:20Z
  // (event_id, us, user_id, event_type, value, props)
  private val evs: Seq[(Long, Long, Long, String, Double, String)] =
    (0L until 20L).map { i =>
      val gap = if (i == 10) 7200L * 1000000L else i * 60L * 1000000L
      (i, baseUs + gap, i % 2, if (i % 3 == 0) "view" else "click",
        i.toDouble, """{"a":1}""")
    }

  private def writeDir(): String =
    Files.createTempDirectory("graft_events_enc").toString

  /** Write `rows` as <dir>/events.parquet with the given ts column. */
  private def write(df: DataFrame): String = {
    val dir = writeDir()
    // pin the physical type: TimestampType → TIMESTAMP_MICROS adjusted=1
    // (not INT96), TimestampNTZType → TIMESTAMP_MICROS adjusted=0
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    df.repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def dirAdjustedMicros: String = {
    import spark.implicits._
    write(evs.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props"))
  }

  private def dirNtzMicros: String = {
    import spark.implicits._
    // cast through NTZ: with session TZ = UTC the wall-clock equals the
    // instant, and the writer emits TIMESTAMP_MICROS isAdjustedToUTC=0
    write(evs.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType)).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props"))
  }

  private def dirNanosAsLong: String = {
    import spark.implicits._
    write(evs.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", (col("us") * 1000L).cast(LongType)).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props"))
  }

  private def allEncodings: Seq[(String, String)] = Seq(
    "micros-adjusted" -> dirAdjustedMicros,
    "micros-ntz"      -> dirNtzMicros,
    "nanos-as-long"   -> dirNanosAsLong)

  test("events loader normalizes every shipped ts encoding to µs TimestampType") {
    for ((name, dir) <- allEncodings) {
      val loaded = Tables.events(spark, dir)
      assert(loaded.schema("ts").dataType == TimestampType, s"encoding $name")
      val got = loaded.select("event_id", "ts").collect()
        .map(r => r.getLong(0) -> (r.getTimestamp(1).getTime * 1000 +
          (r.getTimestamp(1).getNanos / 1000) % 1000)).toMap
      val want = evs.map(e => e._1 -> e._2).toMap
      assert(got == want, s"encoding $name: instants differ")
    }
  }

  test("unix_micros-consuming query (pipe_sessionize) runs over every encoding") {
    val results = allEncodings.map { case (name, dir) =>
      val out = queries.PipelineQueries.pipeSessionize(spark, dir).collect()
        .map(_.toSeq).toSeq
      assert(out.nonEmpty, s"encoding $name")
      name -> out
    }
    // and all three encodings yield bit-identical sessionization
    assert(results.map(_._2).distinct.size == 1)
    // the 2h gap at event 10 splits user 0's events into 2 sessions
    val sessions = results.head._2.map(r => (r.head, r(1))).toSet
    assert(sessions.exists { case (_, seq) => seq == 2L })
  }

  test("ntz fixture really is isAdjustedToUTC=0 (regression shape, not a stand-in)") {
    // guard the fixture itself: read WITHOUT the loader and confirm Spark
    // infers TIMESTAMP_NTZ — i.e. the test exercises the r11 break shape
    val dir = dirNtzMicros
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
  }
}
