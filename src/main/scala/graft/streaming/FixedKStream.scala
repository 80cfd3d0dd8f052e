package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming fixed-k per-group sample — the batch `sample_fixed_k` as
  * continuously maintained state: per group (language), keep the k
  * records with the smallest content-independent hash rank
  * (h32(id) mod 1e6, id tiebreak — the SAME criterion as the batch
  * query), so once the stream has seen the same records its state IS
  * the batch sample (FixedKStreamSpec pins converged winners ==
  * sample_fixed_k, tuple for tuple). The eval-set construction
  * primitive for a corpus that arrives as a stream: the sample is
  * uniform within group, reproducible, and stable under append — a new
  * record displaces at most the current maximum.
  *
  * Scale: state is at most k (id, rank) pairs per group forever — the
  * topkStream bound; no watermark, no growth with stream length.
  * At-least-once replay is benign by construction: re-folding a seen id
  * inserts an identical (rank, id) pair into a set. Update mode
  * re-emits a group's full winner set each batch the group sees rows;
  * each emission carries the group's state VERSION so a reader (and the
  * spec) can select the latest snapshot without diffing appends.
  */
object FixedKStream {

  case class Rec(group: String, id: Long)
  case class Winner(id: Long, rank: Long)
  /** Persisted state-store encoding — same upgrade contract as
    * [[StatefulCounters.Counts]]: changing this schema invalidates
    * existing checkpoints.
    */
  case class SampleState(ver: Long, winners: Seq[Winner])
  case class Sample(group: String, id: Long, rnk: Long, ver: Long)

  /** The portable hash rank — MUST stay identical to the batch query's
    * `pmod(h32(doc_id.cast("string")), 1000000)` (first 4 md5 bytes of
    * the decimal string, big-endian, mod 1e6).
    */
  private[graft] def hashRank(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    h % 1000000L
  }

  /** The pure fold for one group — exposed for property testing. */
  private[graft] def fold(
      set: scala.collection.mutable.TreeSet[(Long, Long)], id: Long, k: Int): Unit = {
    set += ((hashRank(id), id))
    if (set.size > k) set -= set.max
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
          val set = scala.collection.mutable.TreeSet[(Long, Long)]()
          val ver = state.getOption.map(_.ver).getOrElse(0L) + 1
          state.getOption.foreach(_.winners.foreach(w => set += ((w.rank, w.id))))
          rows.foreach(r => fold(set, r.id, k))
          state.update(SampleState(ver,
            set.iterator.map { case (hr, id) => Winner(id, hr) }.toSeq))
          set.toSeq.zipWithIndex.iterator.map { case ((_, id), i) =>
            Sample(group, id, i + 1L, ver)
          }
      }
  }
}
