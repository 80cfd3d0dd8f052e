package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> columns using
  * built-in higher-order functions (codegen'd; no UDF, no shuffle).
  * Sums run left-to-right in both Spark's `aggregate` and the DuckDB
  * oracle, so double-precision results agree bit-for-bit at equal dims.
  */
object VectorFunctions {

  /** Elementwise product sum; casts to double first for stable precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1,1]; NULL when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0 || nb === 0, lit(null).cast("double")).otherwise(d / (na * nb))
  }

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)

  /** Deterministic random-hyperplane LSH signature of `bits` sign bits.
    * Plane j's i-th coordinate is a pseudo-random value in [-0.5, 0.5)
    * derived from h32("p<j>_<i>") — reproducible in plain SQL on any
    * engine, no RNG state. Used as the coarse bucket for ANN search.
    */
  def hyperplaneSignature(v: Column, bits: Int): Column = {
    val vd = v.cast("array<double>")
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, j) => {
        val proj = aggregate(
          zip_with(
            vd,
            sequence(lit(0), size(vd) - 1),
            (x, i) => x * (TextFunctions.h32(concat(lit("p"), j.cast("string"), lit("_"), i.cast("string")))
              .cast("double") / 4294967296.0 - 0.5)),
          lit(0.0),
          (a, x) => a + x)
        acc + when(proj > 0, pow(lit(2.0), j).cast("long")).otherwise(0L)
      })
  }
}
