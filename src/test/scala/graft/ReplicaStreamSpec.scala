package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.ClusteredTable
import graft.streaming.ReplicaStream

/** The continuous-replication contracts q_cdc_apply's one-shot oracle
  * can't see: the derived watermark (no side state), crash-point
  * repair mid-window, convergence across the replica's own fold/vacuum
  * lifecycle, and the retention-horizon failure mode.
  */
class ReplicaStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(rows: Seq[(Long, Int, Int)]) =
    rows.toDF("id", "d1", "d2")

  private def snap(root: String, v: Option[Long] = None) =
    ClusteredTable.read(spark, root, v).select("id", "d1", "d2")

  private def converged(replica: String, primary: String): Boolean =
    snap(replica).exceptAll(snap(primary)).isEmpty &&
      snap(primary).exceptAll(snap(replica)).isEmpty

  test("catchUp: seeds once, replays multiple windows in order, is idempotent, " +
      "and the watermark is derived from the replica's own artifacts") {
    val p = Files.createTempDirectory("rs_p").toString
    val r = Files.createTempDirectory("rs_r").toString
    ClusteredTable.append(mk((1L to 6L).map(i => (i, i.toInt, 0))), p, "00")
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=0
    assert(ReplicaStream.lastApplied(r).isEmpty)
    assert(ReplicaStream.catchUp(spark, p, r, Seq("id")) == 0L)
    assert(ReplicaStream.lastApplied(r).contains(0L))
    assert(converged(r, p))
    // two more primary windows land before the next tick
    ClusteredTable.delete(Seq(Tuple1(2L), Tuple1(3L)).toDF("id"), p, "01")
    ClusteredTable.append(mk(Seq((3L, 3, 99), (7L, 7, 0))), p, "02") // resurrect 3
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=1
    ClusteredTable.delete(Seq(Tuple1(7L), Tuple1(1L)).toDF("id"), p, "03")
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=2
    assert(ReplicaStream.catchUp(spark, p, r, Seq("id")) == 2L)
    assert(converged(r, p))
    // a second tick with nothing new is a no-op, and replayable
    assert(ReplicaStream.catchUp(spark, p, r, Seq("id")) == 2L)
    assert(converged(r, p))
  }

  test("crash mid-window: tombstone landed but delta did not — the watermark " +
      "stays behind and the restarted tick repairs the pair") {
    val p = Files.createTempDirectory("rs_cp").toString
    val r = Files.createTempDirectory("rs_cr").toString
    ClusteredTable.append(mk((1L to 5L).map(i => (i, i.toInt, 0))), p, "00")
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=0
    ReplicaStream.catchUp(spark, p, r, Seq("id"))
    ClusteredTable.delete(Seq(Tuple1(4L)).toDF("id"), p, "01")
    ClusteredTable.append(mk(Seq((9L, 9, 0))), p, "02")
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=1
    ReplicaStream.catchUp(spark, p, r, Seq("id"))
    assert(converged(r, p))
    // simulate the crash point: window 1's delta vanishes, tombstone stays
    ClusteredTable.rmTree(new java.io.File(r, "delta/d=w00000000011"))
    assert(ReplicaStream.lastApplied(r).contains(0L),
      "watermark must fall back to the seed once the window delta is gone")
    assert(ReplicaStream.catchUp(spark, p, r, Seq("id")) == 1L)
    assert(converged(r, p), "replayed window must restore convergence")
  }

  test("the replica's own optimize/vacuum between ticks preserves the watermark " +
      "(manifest ledger) and convergence") {
    val p = Files.createTempDirectory("rs_fp").toString
    val r = Files.createTempDirectory("rs_fr").toString
    ClusteredTable.append(mk((1L to 8L).map(i => (i, (i % 16).toInt, 0))), p, "00")
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=0
    ReplicaStream.catchUp(spark, p, r, Seq("id"))
    // replica folds its seed and vacuums — the w-name moves into the manifest
    ClusteredTable.optimize(spark, r, "d1", "d2", 4, 16)
    ClusteredTable.vacuum(r)
    assert(ReplicaStream.lastApplied(r).contains(0L),
      "watermark must survive the replica's fold + vacuum")
    ClusteredTable.append(mk(Seq((100L, 1, 1))), p, "01")
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=1
    ReplicaStream.catchUp(spark, p, r, Seq("id"))
    assert(converged(r, p))
  }

  test("lag past the primary's vacuum horizon fails loudly (re-seed is the fix), " +
      "never silently skips a window") {
    val p = Files.createTempDirectory("rs_vp").toString
    val r = Files.createTempDirectory("rs_vr").toString
    ClusteredTable.append(mk(Seq((1L, 1, 0), (2L, 2, 0))), p, "00")
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=0
    ReplicaStream.catchUp(spark, p, r, Seq("id"))
    ClusteredTable.append(mk(Seq((3L, 3, 0))), p, "01")
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=1
    ClusteredTable.vacuum(p) // reclaims v=0 and window 1's delta artifact
    val e = intercept[Exception] {
      ReplicaStream.catchUp(spark, p, r, Seq("id"))
    }
    assert(e.getMessage.contains("vacuumed"),
      s"expected the retention-horizon failure, got: ${e.getMessage}")
  }

  test("concurrent ticks are safe: two maintainers catching up the same windows " +
      "converge to one identical artifact set — every artifact has one winner") {
    val p = Files.createTempDirectory("rs_ccp").toString
    val r = Files.createTempDirectory("rs_ccr").toString
    ClusteredTable.append(mk((1L to 6L).map(i => (i, i.toInt, 0))), p, "00")
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=0
    ClusteredTable.delete(Seq(Tuple1(2L)).toDF("id"), p, "01")
    ClusteredTable.append(mk(Seq((7L, 7, 0))), p, "02")
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=1
    ClusteredTable.append(mk(Seq((8L, 8, 0))), p, "03")
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=2
    // two overlapping ticks, both starting from a VIRGIN replica: the
    // seed version is claim-settled, every window artifact is a claimed
    // write — the racers must produce ONE seed and one pair per window
    import java.util.concurrent.{Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Long]]()
    (1 to 2).foreach { _ =>
      pool.execute(() =>
        results.add(
          try Right(ReplicaStream.catchUp(spark, p, r, Seq("id")))
          catch { case e: Throwable => Left(e) }))
    }
    pool.shutdown()
    assert(pool.awaitTermination(180, TimeUnit.SECONDS))
    val rs = results.toArray(Array.empty[Either[Throwable, Long]]).toSeq
    assert(rs.forall(_.isRight), s"a racing tick failed: $rs")
    assert(rs.collect { case Right(v) => v }.max == 2L)
    assert(converged(r, p), "racing ticks must still converge")
    // exactly one seed artifact, and at most one pair per window
    val names = ClusteredTable.artifactNames(r)
    assert(names.count(_.endsWith("s")) == 1, s"exactly one seed: $names")
    val seedV = names.find(_.endsWith("s")).get
      .stripPrefix("d=w").stripSuffix("s").toLong
    ((seedV + 1) to 2L).foreach { v =>
      assert(names.count(_ == f"d=w$v%010d1") == 1, s"window $v delta once: $names")
    }
    // a replayed tick after the race is a no-op
    assert(ReplicaStream.catchUp(spark, p, r, Seq("id")) == 2L)
    assert(converged(r, p))
  }

  test("a tick before the primary's first fold is a no-op (-1), not a " +
      "query-killing error; a later tick seeds normally") {
    val p = Files.createTempDirectory("rs_vtp").toString
    val r = Files.createTempDirectory("rs_vtr").toString
    // primary exists but has no complete version yet (delta only)
    ClusteredTable.append(mk(Seq((1L, 1, 0))), p, "00")
    assert(ReplicaStream.catchUp(spark, p, r, Seq("id")) == -1L)
    assert(ReplicaStream.lastApplied(r).isEmpty, "the no-op tick must write nothing")
    // once the primary folds, the next tick seeds and converges
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=0
    assert(ReplicaStream.catchUp(spark, p, r, Seq("id")) == 0L)
    assert(converged(r, p))
  }

  test("stale seed claim self-heals: a claim settled on a version the " +
      "primary's retention has passed — with no durable seed artifact — is " +
      "SUPERSEDED by the next generation instead of wedging every future tick") {
    val p = Files.createTempDirectory("rs_hp").toString
    val r = Files.createTempDirectory("rs_hr").toString
    ClusteredTable.append(mk(Seq((1L, 1, 0))), p, "00")
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=0
    // the crash shape: a seeder settles the claim at v=0, then dies before
    // the table-sized copy becomes durable
    ClusteredTable.claimMeta(r, "_seed.claim", "0")
    // the primary's lifecycle moves past the claimed version
    ClusteredTable.append(mk(Seq((2L, 2, 0))), p, "01")
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=1
    ClusteredTable.vacuum(p) // v=0 reclaimed: the claim is now unserviceable
    // pre-fix: read(p, Some(0)) throws forever; the heal claims generation 2
    assert(ReplicaStream.catchUp(spark, p, r, Seq("id")) == 1L)
    assert(converged(r, p), "the healed seed must converge to the live primary")
    assert(ReplicaStream.lastApplied(r).contains(1L))
    // exactly one durable seed artifact — supersession never doubles rows
    val names = ClusteredTable.artifactNames(r)
    assert(names.count(n => n.startsWith("d=w") && n.endsWith("s")) == 1,
      s"one seed only: $names")
    // the healed claim is durable: a replayed tick reuses it as a no-op
    assert(ReplicaStream.catchUp(spark, p, r, Seq("id")) == 1L)
    assert(converged(r, p))
  }

  test("attach: a driving stream's micro-batches tick the maintainer; " +
      "at-least-once batches are absorbed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = Files.createTempDirectory("rs_sp").toString
    val r = Files.createTempDirectory("rs_sr").toString
    val ck = Files.createTempDirectory("rs_ck").toString
    ClusteredTable.append(mk((1L to 4L).map(i => (i, i.toInt, 0))), p, "00")
    ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=0
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = ReplicaStream.attach(
      mem.toDF().writeStream.option("checkpointLocation", ck),
      p, r, Seq("id")).start()
    try {
      mem.addData(1L)
      q.processAllAvailable()
      assert(converged(r, p))
      // primary churns between ticks
      ClusteredTable.delete(Seq(Tuple1(1L)).toDF("id"), p, "01")
      ClusteredTable.optimize(spark, p, "d1", "d2", 4, 16) // v=1
      mem.addData(2L)
      q.processAllAvailable()
      assert(converged(r, p))
    } finally q.stop()
  }
}
