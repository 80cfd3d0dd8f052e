package graft

/** The native kernels through pure SQL after registration. */
class SqlFunctionsSpec extends SparkTestBase {

  test("kernels callable from spark.sql after GraftFunctions.register") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       round(graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS c,
        |       graft_h32_array(array('a', 'b')) AS hs,
        |       graft_simhash(graft_h32_array(array('x', 'y', 'z'))) AS sh,
        |       size(graft_minhash16(graft_h32_array(array('p q r')))) AS m,
        |       graft_rolling_hash16(cast('abcdefghijklmnopqr' as binary)) AS rh
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getSeq[Long](2).length == 2)
    assert(r.getLong(3) >= 0 && r.getLong(3) < (1L << 32))
    assert(r.getInt(4) == 16)
    // 18 bytes, 16-byte window -> 3 window hashes, all in [0, 1e9+7)
    assert(r.getSeq[Long](5).length == 3)
    assert(r.getSeq[Long](5).forall(h => h >= 0 && h < 1000000007L))
  }

  test("SQL arguments coerce via declared input types (no ArrayData misread)") {
    GraftFunctions.register(spark)
    // plain int-literal arrays: before ImplicitCastInputTypes these reached
    // the kernels as array<int> and getDouble/getLong read garbage
    val r = spark.sql(
      """SELECT graft_dot(array(1, 2), array(3, 4)) AS d,
        |       graft_cosine(array(1, 0), array(1, 0)) AS c,
        |       size(graft_minhash16(array(7, 8, 9))) AS m,
        |       graft_simhash(array(1, 2)) AS sh
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getInt(2) == 16)
    // simhash of int-coerced hashes 1,2: bits 0 and 1 each appear once out
    // of two elements -> counts 0, never > 0 -> result 0
    assert(r.getLong(3) == 0L)
    // non-array argument is a type error at analysis, not silent garbage
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot('abc', array(1.0d))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }

  test("SQL results match the Column-API kernels") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT graft_cosine(a, b) FROM vecs").as[Double].head()
    val viaApi = df.select(graft.functions.VectorFunctions.cosine(col("a"), col("b")))
      .as[Double].head()
    assert(viaSql == viaApi)
  }
}
