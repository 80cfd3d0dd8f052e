package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions._

/** Streaming near-duplicate suppression: the streaming form of the batch
  * MinHash+LSH dedup (`TextQueries.dedupMinhash*`), for ingest pipelines
  * that must drop near-dups as documents ARRIVE rather than in a batch
  * sweep. Same signature construction as the batch queries (word shingles
  * → hashed → MinHash → banded buckets, identical constants), so a corpus
  * deduped here agrees with the batch index.
  *
  * Shape: per-record projections (all codegen'd kernels) → explode to
  * (band, bucket) evidence keys → ONE stateful operator keyed by
  * (band, bucket) whose state is a seen-marker with an EVENT-TIME timeout:
  * a bucket forgets itself once the watermark passes `horizonMs` beyond
  * its last sighting. State size therefore follows the number of DISTINCT
  * buckets sighted inside the horizon — the streaming analog of the LSH
  * index table, not of the corpus — and is independent of stream length.
  *
  * Output is per-(doc, band) EVIDENCE (`prior_seen` = this band bucket was
  * already occupied), emitted in append mode every batch. The per-doc
  * verdict is a plain OR over a doc's bands ([[verdict]]): run it inside
  * foreachBatch (batch context, e.g. before the routing sink) — a doc is
  * near-dup iff ANY of its bands hit an occupied bucket, exactly the batch
  * LSH candidate rule. Docs with fewer than `ShingleK` tokens produce no
  * shingles, hence no evidence rows: trivially kept, as in the batch path.
  *
  * Replay note: foreachBatch is at-least-once; a replayed document
  * collides with the buckets its first delivery inserted and self-
  * suppresses — for a dedup operator that failure mode is benign (a dup
  * of a dup is still a dup).
  */
object NearDupStream {

  case class Evidence(doc_id: Long, band: Int, bucket: Long, prior_seen: Boolean)
  // public: Catalyst's generated (de)serializers need constructor access
  case class BandRow(doc_id: Long, band: Int, bucket: Long,
      arrival_ts: java.sql.Timestamp)
  case class BucketState(lastTsMs: Long)

  private val NumHashes = 16
  private val RowsPerBand = 4
  private val ShingleK = 3

  /** Input: doc_id LONG, text STRING, arrival_ts TIMESTAMP (already
    * watermarked by the caller, or pass `watermark` here).
    */
  def apply(docs: DataFrame, horizonMs: Long,
      watermark: String = "10 minutes"): Dataset[Evidence] = {
    val bands = docs
      .withWatermark("arrival_ts", watermark)
      .select(col("doc_id"), col("arrival_ts"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= ShingleK)
      .withColumn("sig",
        minhashFromHashes(hashArray(wordShingles(col("toks"), ShingleK)), NumHashes))
      .withColumn("buckets", lshBandBuckets(col("sig"), RowsPerBand))
      .select(col("doc_id"), col("arrival_ts"), col("buckets"),
        explode(sequence(lit(0), lit(NumHashes / RowsPerBand - 1))).as("band"))
      .select(col("doc_id").cast("long").as("doc_id"), col("band"),
        element_at(col("buckets"), col("band") + 1).as("bucket"),
        // the watermark-tagged event-time column must reach the stateful
        // operator, or EventTimeTimeout rejects the plan
        col("arrival_ts"))

    implicit val rowEnc = Encoders.product[BandRow]
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[Evidence]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)

    bands.as[BandRow]
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[BucketState, Evidence](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, Long), rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove() // horizon passed: bucket forgets
            Iterator.empty
          } else {
            // deterministic within-batch order: earliest arrival wins
            val sorted = rows.toSeq.sortBy(r => (r.arrival_ts.getTime, r.doc_id))
            var seen = state.exists
            val out = sorted.map { r =>
              val e = Evidence(r.doc_id, key._1, key._2, prior_seen = seen)
              seen = true
              e
            }
            val maxTs = math.max(sorted.last.arrival_ts.getTime,
              state.getOption.map(_.lastTsMs).getOrElse(0L))
            state.update(BucketState(maxTs))
            state.setTimeoutTimestamp(maxTs + horizonMs)
            out.iterator
          }
      }
  }

  /** Per-doc verdict over an evidence micro-batch (OR across bands) —
    * batch context (foreachBatch), where aggregation is unrestricted.
    */
  def verdict(evidence: DataFrame): DataFrame =
    evidence.groupBy("doc_id")
      .agg(max(col("prior_seen")).as("is_neardup"))
}
