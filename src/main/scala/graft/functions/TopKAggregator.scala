package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate for [[TopKByScore]]; rank order is score
  * DESC, id ASC (the deterministic tie-break every ranking query in
  * this repo uses).
  */
case class TopKIn(score: Double, id: Long)

/** PER-KEY TOP-K as a bounded-buffer typed AGGREGATOR — the
  * shuffle-frugal alternative to
  * `row_number().over(Window.partitionBy(key))` for the "top k rows per
  * key" shape (q_window_rank):
  *
  *   - the WINDOW form shuffles EVERY input row to its key's reducer
  *     and sort-buffers the whole partition, then discards all but k —
  *     at 100 TB the wire and spill bill is the full table, k/|group|
  *     of which is kept;
  *   - this aggregator's reduce/merge keep a k-bounded, rank-sorted
  *     buffer, and because Aggregators run through
  *     ObjectHashAggregate's PARTIAL mode, each map task combines
  *     locally first — at most k rows PER KEY PER INPUT PARTITION cross
  *     the shuffle, and the reducer merges ≤k-sized buffers instead of
  *     sorting raw rows. Wire bytes drop from |rows| to
  *     min(|rows|, k · |keys| · |map partitions|), spill from
  *     whole-partition sort state to k per group.
  *
  * The buffer is an insertion-sorted Vector (O(k) per row, k is small
  * by the operator's nature); merge folds one ≤k buffer into the other.
  * Output is the ranked Seq — callers posexplode it back to rows, so
  * rank = position + 1 reproduces row_number exactly, including the
  * (score DESC, id ASC) tie-break. Determinism: insertion order cannot
  * affect the result because ranking is a total order on (score, id).
  *
  * This is the same mechanics Spark's TakeOrderedAndProject applies to
  * GLOBAL limit+sort, generalized per key — Spark has no built-in
  * per-key variant, which is why the window form is the common (and at
  * scale, wrong) default.
  */
class TopKByScore(k: Int) extends Aggregator[TopKIn, Seq[TopKIn], Seq[TopKIn]] {
  require(k > 0, s"k must be positive, got $k")

  /** Total rank order: does `a` rank strictly before `b`? Scores
    * compare via Double.compare so the order stays TOTAL on the full
    * double domain — `>` alone is not (NaN compares false both ways,
    * which would make the result insertion-order-dependent and break
    * merge commutativity). NaN ranks above every number, matching
    * Spark SQL's ORDER BY ... DESC (NaN largest); -0.0 is normalized
    * to 0.0 at reduce time below, matching Spark's sort-key
    * normalization, so ±0.0 ties break by id exactly like the window
    * form.
    */
  private def outranks(a: TopKIn, b: TopKIn): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  private def norm(r: TopKIn): TopKIn =
    if (r.score == 0.0) TopKIn(0.0, r.id) else r // fold -0.0 into +0.0

  override def zero: Seq[TopKIn] = Vector.empty

  private def insert(b: Seq[TopKIn], r: TopKIn): Seq[TopKIn] =
    if (b.size >= k && !outranks(r, b.last)) b // common case: below the bar
    else {
      val i = b.indexWhere(e => outranks(r, e))
      val nb = if (i < 0) b :+ r else (b.take(i) :+ r) ++ b.drop(i)
      if (nb.size > k) nb.take(k) else nb
    }

  override def reduce(b: Seq[TopKIn], r: TopKIn): Seq[TopKIn] = insert(b, norm(r))

  override def merge(a: Seq[TopKIn], b: Seq[TopKIn]): Seq[TopKIn] =
    b.foldLeft(a)(insert) // both sides already ≤ k

  override def finish(b: Seq[TopKIn]): Seq[TopKIn] = b

  override def bufferEncoder: Encoder[Seq[TopKIn]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKIn]]()

  override def outputEncoder: Encoder[Seq[TopKIn]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKIn]]()
}

object TopKAggregator {
  /** The DataFrame-callable form: `tk(scoreCol, idCol)` → array of
    * ranked (score, id) structs.
    */
  def udafTopK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKByScore(k), Encoders.product[TopKIn])
}
