package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters via sharded SpaceSaving (Metwally, Agrawal &
  * El Abbadi, ICDT'05 "Efficient Computation of Frequent and Top-k
  * Elements in Data Streams"): tokens hash to `shards` independent
  * summaries, each keeping at most `k` (token, count, err) counters. A
  * token already resident increments its counter; a new token at a full
  * summary REPLACES the minimum counter, inheriting its count as the
  * overestimate bound (`err`) — the classic guarantees follow per shard:
  * est >= true count always, est - err <= true count, and any token with
  * true count > shardN/k is resident (a token always lands in the same
  * shard, so the per-shard guarantee is enough for a global union read).
  *
  * Scale: state is EXACTLY shards × k counters forever — like the CMS
  * and HLL streams, constant state with no watermark, where an exact
  * streaming top-k would grow with the token space. Shards keep updates
  * parallel (each summary folds its own partition of the token stream);
  * the reader unions shard summaries and takes the global top-k from
  * shards × k rows, never from the stream. Update mode re-emits a
  * shard's resident counters each batch it changes; readers keep the
  * latest snapshot per (shard, token).
  */
object TopKStream {

  case class Tok(shard: Int, token: String)
  case class Counter(token: String, count: Long, err: Long)
  /** Persisted state-store encoding — same upgrade contract as
    * [[StatefulCounters.Counts]]: changing this schema invalidates
    * existing checkpoints.
    */
  case class Summary(counters: Seq[Counter])
  case class Hit(shard: Int, token: String, count: Long, err: Long)

  /** The pure SpaceSaving fold for one summary — exposed so the
    * algorithmic guarantees are property-testable without a stream.
    */
  private[graft] def foldToken(
      m: scala.collection.mutable.LinkedHashMap[String, (Long, Long)],
      token: String, k: Int): Unit =
    m.get(token) match {
      case Some((c, e)) => m(token) = (c + 1, e)
      case None if m.size < k => m(token) = (1L, 0L)
      case None =>
        // evict the minimum counter (deterministic token tie-break);
        // the newcomer inherits its count as the overestimate bound
        val (mTok, (mCnt, _)) = m.minBy { case (t, (c, _)) => (c, t) }
        m.remove(mTok)
        m(token) = (mCnt + 1, mCnt)
    }

  def apply(toks: Dataset[Tok], k: Int): Dataset[Hit] = {
    implicit val hitEnc = Encoders.product[Hit]
    implicit val stateEnc = Encoders.product[Summary]
    implicit val keyEnc = Encoders.scalaInt
    toks
      .groupByKey(_.shard)
      .flatMapGroupsWithState[Summary, Hit](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[Tok], state: GroupState[Summary]) =>
          val m = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
          state.getOption.foreach(_.counters.foreach(c => m(c.token) = (c.count, c.err)))
          rows.foreach(r => foldToken(m, r.token, k))
          state.update(Summary(m.iterator.map {
            case (t, (c, e)) => Counter(t, c, e)
          }.toSeq))
          m.iterator.map { case (t, (c, e)) => Hit(shard, t, c, e) }
      }
  }
}
