package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Native codegen'd dot/cosine vs the HOF reference formulation: results
  * must be bit-identical (same left-to-right summation), and null
  * semantics must match (mismatched lengths / zero norms / null input).
  */
class VectorFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private val vecs: Seq[(Seq[Double], Seq[Double])] =
    Seq.fill(50)((Seq.fill(64)(rng.nextDouble() - 0.5), Seq.fill(64)(rng.nextDouble() - 0.5)))

  test("native dot == HOF dot bit-for-bit on random 64-dim vectors") {
    val df = vecs.toDF("a", "b")
    val rows = df.select(dot(col("a"), col("b")).as("n"), dotHof(col("a"), col("b")).as("h"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native cosine == HOF cosine bit-for-bit") {
    val df = vecs.toDF("a", "b")
    val rows = df.select(cosine(col("a"), col("b")).as("n"), cosineHof(col("a"), col("b")).as("h"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("cosine of identical vectors is 1.0 (rounded)") {
    val df = Seq(Tuple1(Seq(1.0, 2.0, 3.0))).toDF("a")
    val c = df.select(round(cosine(col("a"), col("a")), 9)).as[Double].head()
    assert(c == 1.0)
  }

  test("zero-norm vector yields NULL cosine") {
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    assert(df.select(cosine(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("mismatched lengths yield NULL dot") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(df.select(dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("NULL input array yields NULL") {
    val df = Seq(Tuple1(Seq(1.0, 2.0))).toDF("a")
    assert(df.select(dot(col("a"), lit(null).cast("array<double>"))).collect()(0).isNullAt(0))
  }

  test("dot works in non-codegen (interpreted) eval too") {
    // force interpreted path by evaluating through a filter on a tiny plan
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      assert(df.select(dot(col("a"), col("b"))).as[Double].head() == 32.0)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
