package graft

/** Every declared query runs end-to-end at sf0.001 and its schema matches
  * what the oracle compare will see (non-empty where the data guarantees
  * rows). The DuckDB hash-compare happens out-of-band (tools/check.py);
  * this spec catches analysis/runtime exceptions early.
  */
class QueriesSmokeSpec extends SparkTestBase {

  // queries whose result can legitimately be empty at sf0.001
  private val mayBeEmpty = Set("emb_neardup", "q_anti_join", "dedup_minhash_pairs")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf())
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has oracle SQL or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries missing oracleSql: $noOracle")
  }
}
