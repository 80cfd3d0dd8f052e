package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** TRENDING heavy hitters: [[TopKStream]]'s sharded SpaceSaving applied
  * per event-time tumbling window, with watermark-driven finalization —
  * the "top tokens this hour" read, where the global stream answers
  * "top tokens ever". Each (window, shard) group holds one SpaceSaving
  * summary (≤ k counters, same fold and guarantees as the global
  * stream, scoped to the window); when the watermark passes the window
  * end the group emits its FINAL counters (`fin = true`) and drops its
  * state, so total state is bounded by windows-in-the-watermark-horizon
  * × shards × k — constant for a fixed horizon, whatever the stream
  * length or token space. Late rows for an already-finalized window are
  * dropped explicitly (never resurrect expired state), the same
  * one-way-door discipline as the watermark itself; interim update-mode
  * snapshots carry `fin = false` so readers can render a live window
  * and still trust exactly one final emission per (window, shard).
  */
object TopKWindowedStream {

  case class WTok(ts: java.sql.Timestamp, windowStart: Long, shard: Int, token: String)
  /** Persisted state-store encoding — same upgrade contract as
    * [[StatefulCounters.Counts]]: changing this schema invalidates
    * existing checkpoints.
    */
  case class WSummary(counters: Seq[TopKStream.Counter])
  case class WHit(windowStart: Long, shard: Int, token: String,
      count: Long, err: Long, fin: Boolean)

  def apply(toks: Dataset[WTok], windowMs: Long, k: Int): Dataset[WHit] = {
    implicit val hitEnc = Encoders.product[WHit]
    implicit val stateEnc = Encoders.product[WSummary]
    implicit val keyEnc = Encoders.product[(Long, Int)]
    toks
      .groupByKey(r => (r.windowStart, r.shard))
      .flatMapGroupsWithState[WSummary, WHit](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case ((ws, shard), rows: Iterator[WTok], state: GroupState[WSummary]) =>
          val windowEnd = ws + windowMs
          if (state.hasTimedOut) {
            // watermark passed the window end: final emission, state gone
            val out = state.getOption.toSeq.flatMap(_.counters)
              .map(c => WHit(ws, shard, c.token, c.count, c.err, fin = true))
            state.remove()
            out.iterator
          } else if (state.getOption.isEmpty &&
              state.getCurrentWatermarkMs() >= windowEnd) {
            // late rows for a window already finalized: drop, never
            // resurrect expired state (one final emission per group)
            Iterator.empty
          } else {
            val m = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
            state.getOption.foreach(_.counters.foreach(c => m(c.token) = (c.count, c.err)))
            rows.foreach(r => TopKStream.foldToken(m, r.token, k))
            if (state.getCurrentWatermarkMs() >= windowEnd) {
              // live state but the watermark already passed the window
              // end (e.g. the operator fed input whose event-time column
              // lost its watermark metadata in a projection, so Spark's
              // older-than-watermark row filter no longer protects us):
              // setTimeoutTimestamp(windowEnd) would throw
              // (timeout < watermark) and fail the query — finalize NOW
              // instead, same emission contract as the timeout branch.
              // AT-MOST-ONCE FINAL even in this degraded mode: rows for
              // this group arriving in LATER batches find empty state
              // with the (monotonic) watermark still past windowEnd, so
              // they take the drop branch above — state is never
              // recreated and no second fin=true can be emitted. What
              // the degraded mode trades away is completeness, not
              // uniqueness: rows after this early final are dropped, so
              // the final may undercount — the same loss semantics the
              // normal watermark contract applies to late data.
              state.remove()
              m.iterator.map { case (t, (c, e)) => WHit(ws, shard, t, c, e, fin = true) }
            } else {
              state.update(WSummary(m.iterator.map {
                case (t, (c, e)) => TopKStream.Counter(t, c, e)
              }.toSeq))
              state.setTimeoutTimestamp(windowEnd)
              m.iterator.map { case (t, (c, e)) => WHit(ws, shard, t, c, e, fin = false) }
            }
          }
      }
  }
}
