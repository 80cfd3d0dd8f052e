package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.{ClusteredTable, ZorderLayout}

/** The clustered-table maintenance contracts that q_cluster_ingest's
  * oracle can't see: crash-point idempotency of optimize, the
  * manifest's no-double-count guarantee while folded deltas are still
  * on disk, and vacuum's safety.
  */
class ClusteredTableSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(rows: Seq[(Long, Int, Int)]) =
    rows.toDF("id", "d1", "d2")

  private def ids(root: String): Seq[Long] =
    ClusteredTable.read(spark, root).select("id").as[Long].collect().toSeq.sorted

  test("lifecycle: appends visible, optimize folds, late delta rides along") {
    val root = Files.createTempDirectory("ct_life").toString
    ClusteredTable.append(mk(Seq((1L, 0, 0), (2L, 3, 4))), root, "b0")
    ClusteredTable.append(mk(Seq((3L, 15, 11))), root, "b1")
    val v0 = ClusteredTable.optimize(spark, root, "d1", "d2", 4, 16)
    assert(v0 == 0L)
    assert(ids(root) == Seq(1L, 2L, 3L))
    // base rows carry their zfile partition; no delta rows yet
    val t = ClusteredTable.read(spark, root)
    assert(t.filter(col("zfile") < 0).count() == 0)

    ClusteredTable.append(mk(Seq((4L, 7, 2))), root, "b2")
    assert(ids(root) == Seq(1L, 2L, 3L, 4L))
    // the late delta reads as the unclustered tail
    assert(ClusteredTable.read(spark, root)
      .filter(col("zfile") === -1).select("id").as[Long].collect().toSeq == Seq(4L))

    // a second optimize folds the tail; nothing to fold after that is a no-op
    val v1 = ClusteredTable.optimize(spark, root, "d1", "d2", 4, 16)
    assert(v1 == 1L)
    assert(ids(root) == Seq(1L, 2L, 3L, 4L))
    assert(ClusteredTable.read(spark, root).filter(col("zfile") < 0).count() == 0)
    assert(ClusteredTable.optimize(spark, root, "d1", "d2", 4, 16) == 1L)
  }

  test("folded deltas still on disk are never double-counted; vacuum reclaims them") {
    val root = Files.createTempDirectory("ct_dc").toString
    ClusteredTable.append(mk(Seq((1L, 1, 1), (2L, 2, 2))), root, "b0")
    ClusteredTable.optimize(spark, root, "d1", "d2", 4, 16)
    // the folded delta directory is STILL present (no vacuum yet) —
    // the manifest must keep it out of the read
    assert(new java.io.File(root, "delta/d=b0").exists())
    assert(ids(root) == Seq(1L, 2L))
    ClusteredTable.append(mk(Seq((3L, 3, 3))), root, "b1")
    ClusteredTable.optimize(spark, root, "d1", "d2", 4, 16)
    assert(ids(root) == Seq(1L, 2L, 3L))
    val removed = ClusteredTable.vacuum(root)
    assert(removed == 3, s"2 folded deltas + 1 superseded base, got $removed")
    assert(ids(root) == Seq(1L, 2L, 3L)) // vacuum never changes results
    assert(!new java.io.File(root, "delta/d=b0").exists())
    assert(!new java.io.File(root, "base/v=0").exists())
  }

  test("optimize is idempotent from the torn-version crash point") {
    val root = Files.createTempDirectory("ct_crash").toString
    ClusteredTable.append(mk(Seq((1L, 4, 4), (2L, 8, 9))), root, "b0")
    ClusteredTable.optimize(spark, root, "d1", "d2", 4, 16)
    ClusteredTable.append(mk(Seq((3L, 12, 6))), root, "b1")
    // simulate a crash mid-optimize: v=1's parquet landed but the
    // manifest (the visibility point) did not
    val torn = new java.io.File(root, "base/v=1")
    ZorderLayout.write(
      mk(Seq((1L, 4, 4), (2L, 8, 9), (3L, 12, 6))), "d1", "d2", 4, 16, torn.getPath)
    assert(!new java.io.File(torn, "_MANIFEST").exists())
    // torn version is invisible: reads still serve v=0 + the b1 delta
    assert(ids(root) == Seq(1L, 2L, 3L))
    assert(ClusteredTable.read(spark, root)
      .filter(col("zfile") === -1).count() == 1)
    // re-running optimize overwrites the torn version and completes it
    val v = ClusteredTable.optimize(spark, root, "d1", "d2", 4, 16)
    assert(v == 1L)
    assert(ids(root) == Seq(1L, 2L, 3L))
    assert(ClusteredTable.read(spark, root).filter(col("zfile") < 0).count() == 0)
  }

  test("ingest replay: re-appending the same batch name overwrites, not duplicates") {
    val root = Files.createTempDirectory("ct_replay").toString
    ClusteredTable.append(mk(Seq((1L, 1, 1))), root, "b0")
    ClusteredTable.append(mk(Seq((1L, 1, 1))), root, "b0") // at-least-once ingest
    ClusteredTable.optimize(spark, root, "d1", "d2", 4, 16)
    assert(ids(root) == Seq(1L))
  }

  test("time travel: asOfVersion reads optimize #k's folded content, stable " +
      "under later ingest; vacuum bounds the horizon") {
    val root = Files.createTempDirectory("ct_tt").toString
    ClusteredTable.append(mk(Seq((1L, 1, 1), (2L, 2, 2))), root, "b0")
    ClusteredTable.optimize(spark, root, "d1", "d2", 4, 16) // v=0: {1,2}
    ClusteredTable.append(mk(Seq((3L, 3, 3))), root, "b1")
    ClusteredTable.optimize(spark, root, "d1", "d2", 4, 16) // v=1: {1,2,3}
    ClusteredTable.append(mk(Seq((4L, 4, 4))), root, "b2")  // live tail
    def at(v: Long): Seq[Long] = ClusteredTable.read(spark, root, Some(v))
      .select("id").as[Long].collect().toSeq.sorted
    assert(at(0L) == Seq(1L, 2L))
    assert(at(1L) == Seq(1L, 2L, 3L))
    assert(ids(root) == Seq(1L, 2L, 3L, 4L)) // live read sees the tail
    // later ingest never changes a pinned snapshot
    ClusteredTable.append(mk(Seq((5L, 5, 5))), root, "b3")
    assert(at(0L) == Seq(1L, 2L))
    // vacuum reclaims superseded versions -> the horizon shrinks loudly
    ClusteredTable.vacuum(root)
    intercept[IllegalArgumentException] { at(0L) }
    assert(at(1L) == Seq(1L, 2L, 3L))
  }

  test("streaming ingest via sink(): batches land as deltas, replay is idempotent, " +
      "out-of-band optimize folds them") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("ct_stream").toString
    val ck = Files.createTempDirectory("ct_stream_ck").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Int, Int)]
    val ingest = ClusteredTable.sink(root)
    val q = mem.toDF().toDF("id", "d1", "d2").writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, bid: Long) => ingest(df, bid))
      .option("checkpointLocation", ck).start()
    try {
      mem.addData((1L, 2, 3), (2L, 9, 9))
      q.processAllAvailable()
      mem.addData((3L, 14, 1))
      q.processAllAvailable()
      assert(ids(root) == Seq(1L, 2L, 3L))
      // at-least-once replay of batch 1 through the same sink fn
      ingest(mk(Seq((3L, 14, 1))), 1L)
      assert(ids(root) == Seq(1L, 2L, 3L))
      ClusteredTable.optimize(spark, root, "d1", "d2", 4, 16)
      assert(ids(root) == Seq(1L, 2L, 3L))
      assert(ClusteredTable.read(spark, root).filter(col("zfile") < 0).count() == 0)
    } finally q.stop()
  }
}
