package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> columns.
  *
  * The hot-path kernels (dot, cosine) are native codegen'd Catalyst
  * expressions (graft.expressions.VectorExpressions) — a tight primitive
  * loop instead of the HOF `aggregate(zip_with(...))` tree, which
  * allocates an intermediate array per row-pair. Both run the same
  * left-to-right double summation as the DuckDB oracle, so results agree
  * bit-for-bit. The HOF forms are kept (suffix `Hof`) as a reference
  * semantics oracle for tests.
  */
object VectorFunctions {
  import graft.expressions.VectorExpressions

  /** Elementwise product sum (native codegen loop). */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotNative(a, b)

  /** HOF reference implementation of dot (tests compare it to native). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1,1]; NULL when either norm is 0 (native,
    * one pass over both arrays).
    */
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosineNative(a, b)

  /** HOF reference implementation of cosine. */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dotHof(a, b)
    val na = sqrt(dotHof(a, a))
    val nb = sqrt(dotHof(b, b))
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
