package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming WEIGHTED fixed-k per-group sample — the batch
  * `sample_weighted` (Efraimidis–Espirakis A-ES) as continuously
  * maintained state: per group keep the k records with the LARGEST
  * A-ES key ln(u)/w (u = seeded h32 uniform of the id, w = the
  * record's weight), the SAME criterion as the batch query down to the
  * 1e-12 key rounding — so for INSERT-ONLY input (and replay with
  * unchanged weights) the winner set equals the batch sample
  * tuple-for-tuple once the stream has seen the same weighted records
  * (WeightedKStreamSpec pins exactly this case). Re-scores that RAISE
  * a weight also converge (the id's key only improves). The one
  * best-effort edge: a re-score that LOWERS a current winner's key
  * below that of a candidate evicted earlier cannot resurrect the
  * evicted candidate (its entry is gone from the k-row state), so
  * after down-weight re-scores the maintained sample may diverge from
  * the batch recomputation by up to the number of such displaced ids —
  * the price of strict ≤k-per-group state; if exact post-rescore
  * parity matters, recompute in batch or widen state with an eviction
  * buffer. The streaming form of
  * quality-weighted corpus subsampling: records arrive with a weight
  * (e.g. the blended quality score) and the maintained sample is
  * weight-proportional without ever seeing the weight distribution.
  *
  * Scale contract identical to [[FixedKStream]]: state is at most k
  * (key, id, weight) triples per group forever, no watermark, no
  * growth with stream length; at-least-once replay is benign because
  * re-folding a seen id inserts an identical key; update-mode
  * emissions carry a state version so readers select the latest
  * snapshot.
  */
object WeightedKStream {

  case class Rec(group: String, id: Long, weight: Double)
  case class Winner(id: Long, key: Double, weight: Double)
  /** Persisted state-store encoding — same upgrade contract as
    * [[StatefulCounters.Counts]]: changing this schema invalidates
    * existing checkpoints.
    */
  case class SampleState(ver: Long, winners: Seq[Winner])
  case class Sample(group: String, id: Long, weight: Double, rnk: Long, ver: Long)

  /** The A-ES rank key — MUST stay identical to the batch query's
    * `round(ln((h32('wsamp#'||id) + 1) / 2^32) / (w + 0.01), 12)`:
    * same md5-derived uniform, same ln (both sides run
    * java.lang.Math.log), same HALF_UP rounding Spark's round() applies.
    */
  private[graft] def aesKey(id: Long, weight: Double): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(("wsamp#" + id.toString).getBytes("UTF-8"))
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val u = (h + 1L).toDouble / 4294967296.0
    java.math.BigDecimal.valueOf(math.log(u) / (weight + 0.01))
      .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  // winners are the k largest keys (smaller id wins ties); the TreeSet's
  // natural (key, -id) ordering makes `min` the eviction candidate
  private type Entry = (Double, Long, Double) // (key, -id, weight)

  /** The pure fold for one group — exposed for property testing. A
    * re-arriving id REPLACES its entry (latest weight wins) rather than
    * occupying a second slot: replay with an unchanged weight inserts an
    * identical entry (benign), and an upstream re-score updates the
    * sample instead of double-counting the doc.
    */
  private[graft] def fold(
      set: scala.collection.mutable.TreeSet[Entry], id: Long, weight: Double,
      k: Int): Unit = {
    set.find(_._2 == -id).foreach(set -= _)
    set += ((aesKey(id, weight), -id, weight))
    if (set.size > k) set -= set.min
  }

  def apply(recs: Dataset[Rec], k: Int): Dataset[Sample] = {
    implicit val sampleEnc = Encoders.product[Sample]
    implicit val stateEnc = Encoders.product[SampleState]
    implicit val keyEnc = Encoders.STRING
    recs
      .groupByKey(_.group)
      .flatMapGroupsWithState[SampleState, Sample](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (group: String, rows: Iterator[Rec], state: GroupState[SampleState]) =>
          val set = scala.collection.mutable.TreeSet[Entry]()
          val ver = state.getOption.map(_.ver).getOrElse(0L) + 1
          state.getOption.foreach(_.winners.foreach(w =>
            set += ((w.key, -w.id, w.weight))))
          rows.foreach(r => fold(set, r.id, r.weight, k))
          state.update(SampleState(ver,
            set.iterator.map { case (key, nid, w) => Winner(-nid, key, w) }.toSeq))
          // rank 1 = largest key, ties to the smaller id (= larger -id)
          set.toSeq.sorted(Ordering[Entry].reverse).zipWithIndex.iterator
            .map { case ((_, nid, w), i) => Sample(group, -nid, w, i + 1L, ver) }
      }
  }
}
