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

  test("text_bloom never misses a contamination hit text_contaminate found") {
    // the Bloom screen's one-sided error contract: false positives are
    // allowed, false negatives are not — per doc, bloom hits dominate
    // the exact equi-join's hits
    val exact = SparkEntry.queries("text_contaminate")(spark, sf())
      .select("doc_id", "n_hits").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = SparkEntry.queries("text_bloom")(spark, sf())
      .select("doc_id", "n_bloom_hits").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.keySet == bloom.keySet)
    exact.foreach { case (doc, hits) =>
      assert(bloom(doc) >= hits, s"doc $doc: bloom ${bloom(doc)} < exact $hits")
    }
  }
}
