package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.MaterializedViewStream

/** The IVM triptych's runtime hand-off: q_agg_merge proves the
  * partial-aggregate merge identity IN batch; this spec pins that the
  * foreachBatch materialized-view maintainer realizes it AT runtime —
  * after every micro-batch the standing view equals the direct batch
  * aggregate over all rows ingested so far (count/sum/min/max/avg per
  * key, tuple for tuple), and a replayed batch (foreachBatch's
  * at-least-once) leaves the view unchanged because versions make the
  * merge idempotent.
  */
class MaterializedViewStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def direct(rows: Seq[(String, Double)]): Set[(String, Long, Double, Double, Double, Double)] =
    rows.toDF("key", "qty")
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum("qty").as("sum_qty"),
        min("qty").as("min_qty"), max("qty").as("max_qty"),
        round(sum("qty") / count(lit(1)), 6).as("avg_qty"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet

  private def view(root: String): Set[(String, Long, Double, Double, Double, Double)] =
    MaterializedViewStream.readView(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet

  test("foreachBatch view == direct aggregate after every batch; replay idempotent") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft_mv").toString
    val ck = Files.createTempDirectory("graft_mv_ck").toString
    val mem = MemoryStream[(String, Double)]
    val q = MaterializedViewStream.attach(
        mem.toDF().toDF("key", "qty").writeStream
          .option("checkpointLocation", ck).outputMode("append"),
        root, "key", "qty").start()
    try {
      val b1 = Seq("a" -> 1.0, "a" -> 3.0, "b" -> 10.0)
      mem.addData(b1: _*)
      q.processAllAvailable()
      assert(view(root) == direct(b1))

      // new keys + updates to existing keys, including a new min
      val b2 = Seq("a" -> -2.0, "c" -> 7.5, "b" -> 4.0, "b" -> 4.0)
      mem.addData(b2: _*)
      q.processAllAvailable()
      assert(view(root) == direct(b1 ++ b2))

      val b3 = Seq("c" -> 100.0)
      mem.addData(b3: _*)
      q.processAllAvailable()
      val expected = direct(b1 ++ b2 ++ b3)
      assert(view(root) == expected)

      // at-least-once replay: re-apply the LAST batch with its own id —
      // the versioned merge reads the predecessor (< id), so the view
      // must come out byte-identical, not double-counted
      MaterializedViewStream.processBatch(
        b3.toDF("key", "qty"), batchId = 2L, root, "key", "qty")
      assert(view(root) == expected)
    } finally q.stop()
  }

  test("stop/restart from checkpoint: a batch that reached the view but " +
      "not the commit log is re-applied without double-merging") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft_mv_rs").toString
    val ck = Files.createTempDirectory("graft_mv_rs_ck").toString
    val mem = MemoryStream[(String, Double)]
    def start() = MaterializedViewStream.attach(
      mem.toDF().toDF("key", "qty").writeStream
        .option("checkpointLocation", ck).outputMode("append"),
      root, "key", "qty").start()

    val q1 = start()
    val b1 = Seq("a" -> 1.0, "b" -> 10.0)
    val b2 = Seq("a" -> 5.0, "c" -> 2.0)
    mem.addData(b1: _*)
    q1.processAllAvailable()
    mem.addData(b2: _*)
    q1.processAllAvailable()
    val expected = direct(b1 ++ b2)
    assert(view(root) == expected)
    q1.stop()
    q1.awaitTermination()
    // the checkpoint-in-use registry unhooks asynchronously of stop()
    var tries = 0
    while (spark.streams.active.exists(_.id == q1.id) && tries < 100) {
      Thread.sleep(20); tries += 1
    }

    // simulate the crash window: the view holds batch N's merge (v=N
    // exists) but the checkpoint never recorded N as committed — drop
    // the newest commit file, the restarted query must re-run batch N
    val commitsDir = new java.io.File(ck, "commits")
    val commits = commitsDir.listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    val last = commits.last.getName
    assert(commits.last.delete(), "could not remove the newest commit record")
    // and its checksum sidecar, or the re-written commit's atomic rename
    // trips over the stale CRC and masquerades as a concurrent query
    val crc = new java.io.File(commitsDir, s".$last.crc")
    if (crc.exists()) crc.delete()

    val q2 = start()
    try {
      q2.processAllAvailable() // re-runs the uncommitted batch
      assert(view(root) == expected,
        "replayed batch must overwrite its own version, not double-merge")
      // and the resumed query keeps maintaining the view
      val b3 = Seq("b" -> -1.0, "d" -> 9.0)
      mem.addData(b3: _*)
      q2.processAllAvailable()
      assert(view(root) == direct(b1 ++ b2 ++ b3))
    } finally q2.stop()
  }

  test("merge is the q_agg_merge algebra: lossless vs direct on real data") {
    val li = Tables.lineitem(spark, sf())
      .select(col("l_returnflag").as("key"), col("l_quantity").as("qty"))
    val old = li.filter(pmod(col("qty").cast("long"), lit(10)) =!= 9)
    val delta = li.filter(pmod(col("qty").cast("long"), lit(10)) === 9)
    val merged = MaterializedViewStream.merge(
        MaterializedViewStream.partial(old, "key", "qty"),
        MaterializedViewStream.partial(delta, "key", "qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val directAgg = MaterializedViewStream.partial(li, "key", "qty")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(merged == directAgg)
  }
}
