package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThanOrEqual}

import graft.functions.ClusteredTable
import graft.sources.clustered.ClusteredRelation

/** The clustered table behind `spark.read.format("graft-clustered")`:
  * full merge-on-read equality with ClusteredTable.read, pushed-filter
  * pruning decisions pinned at the bucket level (not just row results),
  * Bloom point-lookup intersection, and the tail's immunity to pruning.
  */
class ClusteredSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(rows: Seq[(Long, Int, Int)]) =
    rows.toDF("id", "d1", "d2")

  private def build(): String = {
    val root = Files.createTempDirectory("csrc").toString
    ClusteredTable.append(mk(Seq((1L, 3, 4), (2L, 9, 2), (3L, 15, 11), (4L, 4, 3))), root, "00")
    ClusteredTable.append(mk(Seq((5L, 0, 0), (6L, 12, 7))), root, "01")
    ClusteredTable.optimize(spark, root, "d1", "d2", 4, 16) // v=0
    ClusteredTable.append(mk(Seq((7L, 4, 4), (8L, 14, 1))), root, "02") // tail
    ClusteredTable.delete(Seq(Tuple1(2L)).toDF("id"), root, "03") // MoR
    root
  }

  private def src(root: String) = spark.read.format("graft-clustered")
    .option("root", root).option("d1", "d1").option("d2", "d2").load()

  test("source read equals ClusteredTable.read: base + tail + merge-on-read delete") {
    val root = build()
    val a = src(root).select("id", "d1", "d2").as[(Long, Int, Int)].collect().toSeq.sorted
    val b = ClusteredTable.read(spark, root)
      .select("id", "d1", "d2").as[(Long, Int, Int)].collect().toSeq.sorted
    assert(a == b && a.map(_._1) == Seq(1L, 3L, 4L, 5L, 6L, 7L, 8L),
      s"source must carry full MoR semantics: $a")
  }

  test("pushed box filters prune buckets inside the source; results stay exact " +
      "and the in-box tail row survives the prune") {
    val root = build()
    // the pruning DECISION, pinned directly: a (d1 in [3,5]) x (d2 in [2,5])
    // box must keep a strict subset of the occupied buckets
    val rel = new ClusteredRelation(spark.sqlContext, root, Some("d1"), Some("d2"), None)
    val keep = rel.plannedBuckets(Array(
      GreaterThanOrEqual("d1", 3), LessThanOrEqual("d1", 5),
      GreaterThanOrEqual("d2", 2), LessThanOrEqual("d2", 5))).get
    val occupied = ClusteredTable.read(spark, root)
      .filter(col("zfile") >= 0).select("zfile").distinct().count()
    assert(keep.nonEmpty && keep.size < occupied,
      s"box must skip buckets: kept $keep of $occupied")
    // the row RESULTS through the public API: exact, and the unfolded
    // tail row (7, d1=4, d2=4) appears even though it lives in no bucket
    val got = src(root).where(col("d1").between(3, 5) && col("d2").between(2, 5))
      .select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 4L, 7L), s"box read must be exact incl. the tail: $got")
    // the filter reached the source (v1 scan shows it as pushed)
    val plan = src(root).where(col("d1") >= 3 && col("d1") <= 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(d1,3)"),
      s"box predicate must reach the relation:\n$plan")
  }

  test("schema evolution rides through the source: a widened tail reads with " +
      "NULL backfill and box pruning stays exact") {
    val root = Files.createTempDirectory("csrc_evo").toString
    ClusteredTable.append(mk(Seq((1L, 3, 4), (2L, 15, 11))), root, "00")
    ClusteredTable.optimize(spark, root, "d1", "d2", 4, 16)
    ClusteredTable.append(
      Seq((3L, 4, 3, "fresh")).toDF("id", "d1", "d2", "note"), root, "01")
    val df = src(root)
    assert(df.columns.contains("note"), "the widened column must surface")
    val got = df.where(col("d1").between(3, 5) && col("d2").between(2, 5))
      .select(col("id"), col("note"))
      .as[(Long, Option[String])].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, None), (3L, Some("fresh"))),
      s"pre-evolution rows NULL-backfill, the widened tail row survives the prune: $got")
  }

  test("the pure-SQL surface: CREATE TEMPORARY VIEW ... USING graft-clustered " +
      "serves SQL with the same pruned, merge-on-read semantics") {
    val root = build()
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW clustered_sql
      USING `graft-clustered`
      OPTIONS (root '$root', d1 'd1', d2 'd2')""")
    val got = spark.sql(
      """SELECT id FROM clustered_sql
        |WHERE d1 BETWEEN 3 AND 5 AND d2 BETWEEN 2 AND 5
        |ORDER BY id""".stripMargin).as[Long].collect().toSeq
    assert(got == Seq(1L, 4L, 7L),
      s"SQL over the source must equal the DataFrame path (MoR + tail + prune): $got")
    val n = spark.sql("SELECT count(*) AS n FROM clustered_sql").as[Long].head()
    assert(n == 7L, "empty-projection count(*) must work through buildScan")
  }

  test("a Bloom-indexed point lookup intersects the bucket decision; absent " +
      "index degrades to unpruned, results always exact") {
    val root = build()
    ClusteredTable.buildIndex(spark, root, "id")
    val rel = new ClusteredRelation(spark.sqlContext, root, Some("d1"), Some("d2"), Some("id"))
    val keep = rel.plannedBuckets(Array(EqualTo("id", 3L))).get
    val occupied = ClusteredTable.read(spark, root)
      .filter(col("zfile") >= 0).select("zfile").distinct().count()
    assert(keep.size < occupied, s"point lookup must skip buckets: $keep of $occupied")
    val got = spark.read.format("graft-clustered")
      .option("root", root).option("d1", "d1").option("d2", "d2").option("indexcol", "id")
      .load().where(col("id") === 3L)
      .select("id", "d1", "d2").as[(Long, Int, Int)].collect().toSeq
    assert(got == Seq((3L, 15, 11)))
    // no index for this column -> no bloom decision, still exact
    val rel2 = new ClusteredRelation(spark.sqlContext, root, None, None, Some("d2"))
    assert(rel2.plannedBuckets(Array(EqualTo("d2", 4))).isEmpty)
  }
}
