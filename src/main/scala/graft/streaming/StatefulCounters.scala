package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A1 in its stateful-streaming form: per-stream success/error counters
  * that RESET after each report interval — the reference's
  * Logger.report() semantics (src/Logger.js:17-21) as
  * flatMapGroupsWithState custom state with a processing-time timeout:
  * a group emits (and zeroes) its counts when its interval expires, so
  * each emission is one non-overlapping interval's worth, per stream.
  *
  * UPGRADE NOTE: [[Counts]] is the persisted state-store encoding. Adding
  * `deadlineMs` changed that schema, so a stream restarted from a
  * `--checkpoint` directory written by a build without the field fails
  * state deserialization — discard the checkpoint directory when
  * upgrading across a Counts change (the counters are interval-scoped,
  * nothing durable is lost). Any future field change carries the same
  * contract; version the encoding if that ever becomes unacceptable.
  */
object StatefulCounters {

  case class In(streamId: String, valid: Boolean)
  case class Counts(success: Long, error: Long, deadlineMs: Long)
  case class Report(streamId: String, success: Long, error: Long)

  def apply(records: Dataset[In], intervalMillis: Long): Dataset[Report] = {
    implicit val reportEnc = Encoders.product[Report]
    implicit val stateEnc = Encoders.product[Counts]
    implicit val keyEnc = Encoders.STRING
    records
      .groupByKey(_.streamId)
      .flatMapGroupsWithState[Counts, Report](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (streamId: String, rows: Iterator[In], state: GroupState[Counts]) =>
          if (state.hasTimedOut) {
            // interval over: report and reset (Logger.js:17-21)
            val c = state.get
            state.remove()
            Iterator.single(Report(streamId, c.success, c.error))
          } else {
            val now = state.getCurrentProcessingTimeMs()
            val prev = state.getOption
              .getOrElse(Counts(0, 0, now + intervalMillis))
            var s = prev.success
            var e = prev.error
            rows.foreach(r => if (r.valid) s += 1 else e += 1)
            state.update(Counts(s, e, prev.deadlineMs))
            // GroupState clears the timeout on every invocation, so it
            // must be re-armed each batch — but against the ABSOLUTE
            // deadline persisted in the state value, so steady traffic
            // cannot push the interval out forever (the reference's
            // setInterval ticks regardless of traffic, src/Logger.js:17-21)
            state.setTimeoutDuration(math.max(1L, prev.deadlineMs - now))
            Iterator.empty
          }
      }
  }
}
