package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{GraftPipeline, WeightedKStream}

/** The streaming weighted sampler must CONVERGE to the batch
  * sample_weighted output: same seeded uniform, same ln(u)/w A-ES key,
  * same 1e-12 rounding — so after the stream has seen the same weighted
  * records its winner set equals the batch query's tuple-for-tuple,
  * and a high-weight append displaces a low-key incumbent.
  */
class WeightedKStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 50

  private def latestWinners(table: String): Set[(String, Long, Long)] = {
    val rows = spark.table(table).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val maxVer = rows.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    rows.filter(t => t._4 == maxVer(t._1)).map(t => (t._1, t._2, t._3)).toSet
  }

  test("weightedKStream converges to the batch sample_weighted; append displaces") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // feed the stream the SAME (lang, doc_id, weight) tuples the batch
    // query derives, weights from its own output (shared quality score)
    val batchRows = graft.queries.TextQueries.sampleWeighted(spark, sfDir)
    val batch = batchRows.collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(3))).toSet
    val t = col("text")
    val weighted = graft.Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"),
        graft.functions.TextFunctions.qualityScore(t,
          graft.functions.TextFunctions.tokens(t)).as("wq"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val mem = MemoryStream[(String, Long, Double)]
    val q = GraftPipeline.weightedKStream(
        mem.toDF().toDF("lang", "doc_id", "wq"), "lang", "doc_id", "wq", K)
      .writeStream.format("memory").queryName("graft_weightedk")
      .outputMode("update").start()
    mem.addData(weighted: _*)
    q.processAllAvailable()
    assert(latestWinners("graft_weightedk") == batch)

    // a max-weight append displaces: new ids with weight 1.0 have keys
    // near 0 (ln(u)/1.01), beating most incumbents' quality-scaled keys
    val extra = (200000L until 200020L).map(i => ("en", i, 1.0))
    mem.addData(extra: _*)
    q.processAllAvailable()
    q.stop()
    val got = latestWinners("graft_weightedk")
    assert(got.filter(_._1 == "en").exists(_._2 >= 200000L))
    // untouched groups keep their converged winner sets
    assert(got.filter(t0 => t0._1 != "en") == batch.filter(t0 => t0._1 != "en"))
  }

  test("state bound and replay benignity of the weighted fold") {
    val set = scala.collection.mutable.TreeSet[(Double, Long, Double)]()
    (0L until 1000L).foreach(id => WeightedKStream.fold(set, id, 0.25 + (id % 4) * 0.2, 50))
    assert(set.size == 50)
    val snapshot = set.toSeq
    (0L until 1000L).foreach(id => WeightedKStream.fold(set, id, 0.25 + (id % 4) * 0.2, 50))
    assert(set.toSeq == snapshot)
  }

  test("a re-scored id replaces its entry — never two slots for one doc") {
    val set = scala.collection.mutable.TreeSet[(Double, Long, Double)]()
    (0L until 10L).foreach(id => WeightedKStream.fold(set, id, 0.5, 50))
    assert(set.size == 10)
    WeightedKStream.fold(set, 3L, 0.9, 50) // upstream re-score
    assert(set.size == 10)
    assert(set.count(_._2 == -3L) == 1)
    assert(set.find(_._2 == -3L).get._3 == 0.9) // latest weight wins
  }
}
