package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-time disorder monitor — the streaming form of the
  * batch `pipe_lateness` profile, for pipelines that must TRACK their
  * watermark budget as data arrives rather than audit it in a sweep: an
  * event's disorder is how far its user's already-seen event-time
  * high-water mark is ahead of it (0 for in-order events), and the p95+
  * of that distribution is the `withWatermark` delay that would have
  * kept the late data.
  *
  * Shape: ONE stateful operator keyed by user whose state is a single
  * long (the event-time high-water mark) plus the last-sighting
  * timestamp for expiry — state is 16 bytes × users-active-in-horizon,
  * independent of stream length (the NearDupStream bound, one row per
  * key). Within a micro-batch, rows apply in arrival order (event_id —
  * ingestion is sequential per device), so a checkpoint-restored replay
  * of the SAME micro-batch recomputes the same high-water marks:
  * disorders of already-seen events are reproduced, not inflated. That
  * benignity is same-batch only — an event redelivered in a LATER batch,
  * after its user's high-water mark has advanced, is assigned an
  * inflated disorder, so cross-batch redelivery needs an upstream
  * event_id dedup if it is in scope.
  *
  * Semantics pinned to the batch form: disorder here equals
  * `pipe_lateness`'s `max(us) OVER (PARTITION BY user ORDER BY
  * event_id) - us` for any in-order delivery of the same rows
  * (DisorderStreamSpec replays the same data through both).
  */
object DisorderStream {

  case class EventRow(user_id: Long, event_id: Long, event_type: String,
      ts_us: Long, arrival_ts: java.sql.Timestamp)
  case class Disorder(user_id: Long, event_id: Long, event_type: String,
      disorder_us: Long)
  case class HwmState(hwmUs: Long, lastTsMs: Long)

  /** Input: user_id LONG, event_id LONG, event_type STRING, ts TIMESTAMP
    * (event time), arrival_ts TIMESTAMP (processing/arrival time driving
    * the watermark and state expiry).
    */
  def apply(events: DataFrame, horizonMs: Long,
      watermark: String = "10 minutes"): Dataset[Disorder] = {
    val rows = events
      .withWatermark("arrival_ts", watermark)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("event_type"),
        expr("unix_micros(ts)").as("ts_us"),
        col("arrival_ts"))

    implicit val rowEnc = Encoders.product[EventRow]
    implicit val stateEnc = Encoders.product[HwmState]
    implicit val outEnc = Encoders.product[Disorder]
    implicit val keyEnc = Encoders.scalaLong

    rows.as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[HwmState, Disorder](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[EventRow], state: GroupState[HwmState]) =>
          if (state.hasTimedOut) {
            state.remove() // user idle past the horizon: forget the mark
            Iterator.empty
          } else {
            // arrival order within the batch — deterministic on replay
            val sorted = it.toSeq.sortBy(_.event_id)
            var hwm = state.getOption.map(_.hwmUs).getOrElse(Long.MinValue)
            val out = sorted.map { r =>
              // the batch window's max() includes the current row, so
              // disorder = max(hwm, us) - us = max(0, hwm - us)
              val d = if (hwm == Long.MinValue) 0L else math.max(0L, hwm - r.ts_us)
              hwm = math.max(hwm, r.ts_us)
              Disorder(r.user_id, r.event_id, r.event_type, d)
            }
            val maxArrival = math.max(sorted.map(_.arrival_ts.getTime).max,
              state.getOption.map(_.lastTsMs).getOrElse(0L))
            state.update(HwmState(hwm, maxArrival))
            state.setTimeoutTimestamp(maxArrival + horizonMs)
            out.iterator
          }
      }
  }

  /** The per-type profile mirroring pipe_lateness — batch context
    * (foreachBatch or over the collected sink), where aggregation is
    * unrestricted.
    */
  def profile(disorder: DataFrame): DataFrame =
    disorder.groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("disorder_us") > 0, 1L).otherwise(0L)).as("n_disordered"),
        round(expr("percentile(disorder_us, 0.95)") / 1e6, 6).as("p95_disorder_s"),
        round(max(col("disorder_us")).cast("double") / 1e6, 6).as("max_disorder_s"))
      .orderBy("event_type")
}
