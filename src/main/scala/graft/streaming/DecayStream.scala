package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exponentially-decayed counter per key — the batch
  * `pipe_recency_weight` sum maintained incrementally. Because the decay
  * is multiplicative, the whole history compresses into one number:
  * state per key is (base event time, decayed sum AT that base, count),
  * and each batch re-bases the stored sum to the batch's newest event
  * time with a single `exp(−λ·Δ)` multiply, then adds the new rows'
  * decay terms against the new base. A reader comparing keys (or
  * re-basing to "now") applies one more multiply — no history replay,
  * ever. λ defaults to ln 2 / 7 days, the batch query's half-life.
  *
  * The fold is exact up to float association: for ANY split of the same
  * rows into micro-batches, the state equals the batch formula evaluated
  * at the key's max event time (`DecayStreamSpec` pins two different
  * splits against the closed form). Late rows are still correct — a row
  * older than the base contributes `exp(−λ·(base − ts))` directly, no
  * re-basing needed, so no watermark and no state growth: 24 bytes per
  * key forever (the [[StatefulCounters]] bound). At-least-once replay of
  * a batch double-counts its contribution (the additive-sketch caveat,
  * same class as [[GraftPipeline.cmsStream]]); exactly-once sinks or
  * idempotent batch ids restore exactness.
  */
object DecayStream {

  /** ln 2 / 7 days, in 1/µs — MUST stay the batch query's spelling. */
  private[graft] val LambdaPerUs: Double = (math.log(2) / 7.0) / 86400000000.0

  case class Ev(key: String, tsUs: Long)
  /** Persisted state-store encoding — same upgrade contract as
    * [[StatefulCounters.Counts]]: changing this schema invalidates
    * existing checkpoints.
    */
  case class DecayState(baseUs: Long, sum: Double, n: Long)
  case class Decayed(key: String, baseUs: Long, n: Long, decayedWeight: Double, ver: Long)

  /** The pure per-batch fold — exposed for property testing. n == 0
    * marks empty state: its sentinel base must not enter the rebase
    * exponent (the Long difference overflows and 0·exp(overflow) is
    * NaN, not 0).
    */
  private[graft] def fold(st: DecayState, rows: Seq[Long]): DecayState = {
    if (rows.isEmpty) return st
    val newBase = if (st.n == 0) rows.max else math.max(st.baseUs, rows.max)
    val rebased =
      if (st.n == 0) 0.0
      else st.sum * math.exp(-LambdaPerUs * (newBase - st.baseUs))
    val added = rows.iterator.map(ts => math.exp(-LambdaPerUs * (newBase - ts))).sum
    DecayState(newBase, rebased + added, st.n + rows.size)
  }

  def apply(evs: Dataset[Ev]): Dataset[Decayed] = {
    implicit val outEnc = Encoders.product[Decayed]
    implicit val stateEnc = Encoders.product[DecayState]
    implicit val keyEnc = Encoders.STRING
    evs
      .groupByKey(_.key)
      .flatMapGroupsWithState[DecayState, Decayed](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Ev], state: GroupState[DecayState]) =>
          val prev = state.getOption.getOrElse(DecayState(Long.MinValue, 0.0, 0L))
          val next = fold(prev, rows.map(_.tsUs).toSeq)
          state.update(next)
          // n only grows, so it doubles as the snapshot version a
          // reader keys "latest wins" on (the FixedKStream ver role)
          Iterator.single(Decayed(key, next.baseUs, next.n, next.sum, next.n))
      }
  }
}
