package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{FixedKStream, GraftPipeline}

/** The streaming fixed-k sampler must CONVERGE to the batch
  * sample_fixed_k output: same hash-rank criterion, so after the stream
  * has seen the same records, its winner set equals the batch query's,
  * tuple for tuple — and a later batch displaces exactly the records
  * the batch query would drop when re-run over the union.
  */
class FixedKStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 50

  private def latestWinners(table: String): Set[(String, Long, Long)] = {
    val rows = spark.table(table).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val maxVer = rows.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    rows.filter(t => t._4 == maxVer(t._1)).map(t => (t._1, t._2, t._3)).toSet
  }

  test("fixedKStream converges to the batch sample_fixed_k; append displaces") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val mem = MemoryStream[(String, Long)]
    val q = GraftPipeline.fixedKStream(
        mem.toDF().toDF("lang", "doc_id"), "lang", "doc_id", K)
      .writeStream.format("memory").queryName("graft_fixedk")
      .outputMode("update").start()
    // phase A: the whole corpus in one batch -> winners == the batch query
    mem.addData(docs: _*)
    q.processAllAvailable()
    val batch = graft.queries.TextQueries.sampleFixedK(spark, sfDir)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2))).toSet
    assert(latestWinners("graft_fixedk") == batch)

    // phase B: append new ids -> winners == the same criterion re-applied
    // to the union (computed independently here via the shared fold)
    val extra = (100000L until 100040L).map(i => ("en", i))
    mem.addData(extra: _*)
    q.processAllAvailable()
    q.stop()
    val enIds = docs.filter(_._1 == "en").map(_._2) ++ extra.map(_._2)
    val expectEn = enIds
      .map(id => (FixedKStream.hashRank(id), id)).sorted.take(K)
      .zipWithIndex.map { case ((_, id), i) => ("en", id, i + 1L) }.toSet
    val got = latestWinners("graft_fixedk")
    assert(got.filter(_._1 == "en") == expectEn)
    // untouched groups keep their phase-A winner sets
    assert(got.filter(_._1 != "en") == batch.filter(_._1 != "en"))
    // displacement actually happened: some extra id won a slot
    assert(expectEn.exists(t => t._2 >= 100000L))
  }

  test("state bound and replay benignity of the fold") {
    val set = scala.collection.mutable.TreeSet[(Long, Long)]()
    (0L until 1000L).foreach(id => FixedKStream.fold(set, id, 50))
    assert(set.size == 50)
    val snapshot = set.toSeq
    (0L until 1000L).foreach(id => FixedKStream.fold(set, id, 50)) // replay
    assert(set.toSeq == snapshot)
  }
}
