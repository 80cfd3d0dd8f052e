package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.multimodal.Multimodal

/** Multimodal feature-extraction surface over binary payload columns
  * (graft.multimodal): typed Dataset -> per-partition batch decode ->
  * feature columns. The stub decoder is md5-derived so the DuckDB oracle
  * reproduces it exactly (real deployments plug a native decoder into the
  * same mapPartitions shape).
  */
object MultimodalQueries {

  private val Dim = 4

  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(s, dir)
    val feats = Multimodal.extractFeatures(media, new Multimodal.StubDecoder(Dim))
    feats.toDF()
      .select(
        (Seq(col("media_id"), col("kind"), col("n_bytes"), col("decode_ok")) ++
          (0 until Dim).map(i =>
            round(try_element_at(col("features"), lit(i + 1)), 6).as(s"f$i"))): _*)
      .orderBy("media_id")
  }

  private val FrameSize = 32
  private val FrameStride = 2
  private val MaxFrames = 4

  /** Frame sampling through the real plumbing: every 2nd 32-byte block,
    * at most 4 frames per asset (a video decoder samples keyframes the
    * same way; byte blocks stand in for frames in this container).
    * Frames are emitted as hex so the DuckDB oracle — whose md5/slicing
    * only operates on VARCHAR — can reproduce them byte-for-byte.
    */
  def mmFrames(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(s, dir)
    Multimodal.sampleFrames(media, FrameSize, FrameStride, MaxFrames)
      .select(col("media_id"), col("frame_index"),
        length(col("frame_bytes")).cast("int").as("n_bytes"),
        lower(hex(col("frame_bytes"))).as("frame_hex"))
      .orderBy("media_id", "frame_index")
  }

  private val PhashDim = 60        // one sign bit per adjacent-cell gradient
  private val PhashCells = PhashDim + 1
  private val PhashBlocks = 4      // 4 x 15-bit blocks, Hamming<=3 pigeonhole
  private val PhashBlockBits = PhashDim / PhashBlocks
  // hot-bucket cap (ScaleFunctions.hammingPairs): the sf10 stretch put
  // mm_dedup_cc at 4.15×/row because low-entropy fingerprint mass (empty
  // payload tails → constant gradient blocks) collides quadratically;
  // capping skips those buckets with measured-zero pair loss (every true
  // pair on this corpus also matches a content-bearing block — the
  // cap-8 sweep found all 20 pairs; 64 leaves wide margin)
  private val HotBucketCap = 64

  /** Perceptual-hash (dHash, difference hash) near-dup over the MEDIA
    * plane — the multimodal analog of dedup_simhash_pairs: decode each
    * asset to a 61-cell grid of block means ([[Multimodal.AHashDecoder]],
    * the downscale+mean step; per-partition batch decode, the real
    * plumbing), take the sign of each ADJACENT-cell gradient as one of
    * 60 hash bits, then find Hamming<=3 pairs with the same 4x15-bit
    * pigeonhole equi-join and exact popcount verify as the text-side
    * simhash pairs. Gradient bits, not mean-threshold bits, on purpose:
    * cell-vs-asset-mean bits (aHash) are heavily correlated across
    * same-distribution payloads — measured 2% of ALL pairs within
    * Hamming 3 at sf0.01, a quadratic candidate regime — while local
    * gradients track content and de-correlate (a DCT pHash or learned
    * embedding slots into the same Decoder seam). Deterministic and
    * oracle-checked end to end, decode included.
    */
  def mmPhash(s: SparkSession, dir: String): DataFrame =
    mmPhashPairs(s, dir).orderBy("id_a", "id_b")

  private def mmPhashPairs(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(s, dir)
    val feats = Multimodal.extractFeatures(media, new Multimodal.AHashDecoder(PhashCells))
      .toDF()
      .filter(col("decode_ok"))
      .select(col("media_id"), col("features"))
    val hashed = feats.select(col("media_id"),
      aggregate(
        transform(sequence(lit(0), lit(PhashDim - 1)),
          i => when(
            element_at(col("features"), i + 1) > element_at(col("features"), i + 2),
            pow(lit(2.0), i).cast("long")).otherwise(0L)),
        lit(0L), (a, x) => a + x).as("ph"))
    graft.functions.ScaleFunctions
      .hammingPairs(hashed, "media_id", "ph", PhashDim, PhashBlocks,
        maxBucket = HotBucketCap)
  }

  /** Partial-copy detection across media assets: two assets sharing at
    * least one identical sampled FRAME are partial copies (clipped /
    * re-encoded / concatenated variants share frames even when whole-
    * asset hashes and pHashes differ — the frame plane is where video
    * dedup actually runs). Frames dedup within asset first (distinct
    * frame fingerprint per asset), then a fingerprint-keyed equi-join
    * generates candidate pairs — candidates ∝ fingerprint collisions,
    * the CDC-chunk / LSH-bucket regime, never assets². Fingerprint =
    * md5 of the frame's hex (the binary→hex plane the mm oracles
    * already share, since DuckDB's md5 is VARCHAR-only).
    */
  def mmSharedFrames(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(s, dir)
    val fr = Multimodal.sampleFrames(media, FrameSize, FrameStride, MaxFrames)
      .select(col("media_id"), md5(lower(hex(col("frame_bytes")))).as("fh"))
      .distinct()
    fr.as("a")
      .join(fr.as("b"),
        col("a.fh") === col("b.fh") && col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("id_a", "id_b")
  }

  /** Media near-dup clusters: connected components over the mm_phash
    * pair graph — dedup_cc's deliverable on the media plane, closing the
    * multimodal dedup story end to end (decode → dHash → Hamming pairs →
    * transitive clusters → keep-the-minimum representative). The CC loop
    * iterates ONLY over pair-incident assets ([[graft.functions
    * .ScaleFunctions.connectedComponentsIncident]]); every asset in no
    * pair rejoins as its own singleton via the final left join, so the
    * iterative state is pair-volume-sized, never corpus-sized.
    */
  def mmDedupCc(s: SparkSession, dir: String): DataFrame = {
    val pairs = mmPhashPairs(s, dir)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comp = graft.functions.ScaleFunctions.connectedComponentsIncident(pairs)
      .withColumnRenamed("id", "cid")
    Multimodal.mediaFromDocuments(s, dir).toDF().select(col("media_id"))
      .join(comp, col("media_id") === col("cid"), "left_outer")
      .select(col("media_id"),
        coalesce(col("lbl"), col("media_id")).as("component"),
        (coalesce(col("lbl"), col("media_id")) === col("media_id")).as("keep"))
      .orderBy("media_id")
  }

  // sits at the sf0.01 transition-magnitude median (27.7), so the flag
  // discriminates rather than fires on every frame pair of iid content
  private val SceneCutThreshold = 28.0

  /** Scene-boundary detection on the sampled-frame plane — the shot
    * segmentation a video pipeline runs before per-scene dedup, captioning
    * or sampling (mm_shared_frames finds IDENTICAL frames across assets;
    * this reads CHANGE between consecutive frames within one): per
    * adjacent sampled-frame pair the mean absolute per-byte difference
    * over the shared prefix, a cut where it exceeds
    * [[SceneCutThreshold]], per asset the cut count / scene count /
    * mean / max transition magnitude. Everything after the frame
    * Generate is per-asset local: the lag window partitions by
    * media_id (an asset's ≤ MaxFrames frames colocate on one
    * partition — state bounded by frames-per-asset, never corpus), the
    * byte plane is staged hex behind the Generate barrier so the decode
    * evaluates once per frame (not once per lambda element — the
    * CollapseProject trap), and the diff itself is an exact
    * integer-sum ÷ length projection so the threshold compares
    * identically cross-engine. A real decoder swaps luma planes in for
    * byte blocks at the same seam; the difference metric and plumbing
    * are unchanged.
    */
  def mmSceneCut(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PipelineFunctions.stageBarrier
    val media = Multimodal.mediaFromDocuments(s, dir)
    val fr = Multimodal.sampleFrames(media, FrameSize, FrameStride, MaxFrames)
    val staged = stageBarrier(fr, Seq(col("media_id"), col("frame_index")),
      "fhex" -> lower(hex(col("frame_bytes"))))
    val bytes = staged.select(col("media_id"), col("frame_index"),
      transform(sequence(lit(0), (length(col("fhex")) / 2).cast("int") - 1),
        j => conv(col("fhex").substr(j * 2 + 1, lit(2)), 16, 10).cast("long")).as("bv"))
    val w = Window.partitionBy("media_id").orderBy("frame_index")
    val minLen = least(size(col("bv")), size(col("pv")))
    // ONE pass: lag first, aggregate nulls-aware — each asset's first
    // frame carries a null diff and contributes only to n_frames, so no
    // second lineage (and no second decode) exists for the frame counts
    val diffs = bytes.withColumn("pv", lag(col("bv"), 1).over(w))
      .select(col("media_id"),
        when(col("pv").isNotNull,
          aggregate(
            zip_with(slice(col("bv"), lit(1), minLen), slice(col("pv"), lit(1), minLen),
              (a, b) => abs(a - b)),
            lit(0L), (acc, x) => acc + x).cast("double") / minLen).as("d"))
    diffs.groupBy("media_id").agg(
        count(lit(1)).cast("int").as("n_frames"),
        sum(when(col("d") > SceneCutThreshold, 1L).otherwise(0L)).as("n_cuts"),
        (sum(when(col("d") > SceneCutThreshold, 1L).otherwise(0L)) + 1L).as("n_scenes"),
        coalesce(round(avg("d"), 6), lit(0.0)).as("mean_diff"),
        coalesce(round(max("d"), 6), lit(0.0)).as("max_diff"))
      .orderBy("media_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> mmFeatures,
    "mm_frames" -> mmFrames,
    "mm_phash" -> mmPhash,
    "mm_dedup_cc" -> mmDedupCc,
    "mm_shared_frames" -> mmSharedFrames,
    "mm_scene_cut" -> mmSceneCut)

  private def fSql(i: Int): String =
    s"round(CAST('0x' || substr(md5(text || '#f$i'), 1, 8) AS BIGINT) / 4294967296.0, 6) AS f$i"

  // the frame-sampling chain through `f(media_id, bi, fhex)` — shared by
  // the mm_frames oracle and mm_shared_frames' fingerprint join
  private val framesCte: String =
    s"""h AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx FROM documents),
       |n AS (SELECT media_id, hx,
       |             (len(hx) // 2 + ${FrameSize - 1}) // $FrameSize AS nb
       |      FROM h),
       |ix AS (SELECT media_id, hx, CAST(unnest(range(nb)) AS INT) AS bi FROM n),
       |f AS (SELECT media_id, bi,
       |             substr(hx, bi * ${FrameSize * 2} + 1, ${FrameSize * 2}) AS fhex
       |      FROM ix
       |      WHERE bi % $FrameStride = 0 AND bi < ${FrameStride * MaxFrames})""".stripMargin

  // the dHash pipeline through verified Hamming pairs (`prs`) — shared by
  // the mm_phash oracle and mm_dedup_cc's recursive closure
  private val phashPairsCte: String =
    s"""h AS (
       |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
       |         octet_length(encode(text)) AS n
       |  FROM documents WHERE octet_length(encode(text)) > 0),
       |f AS (
       |  SELECT media_id,
       |         [coalesce(list_avg(
       |            [CAST('0x' || substr(hx, j * 2 + 1, 2) AS BIGINT)
       |             for j in range(i * ((n + ${PhashCells - 1}) // $PhashCells),
       |                            least((i + 1) * ((n + ${PhashCells - 1}) // $PhashCells), n))]), 0.0)
       |          for i in range(0, $PhashCells)] AS fv
       |  FROM h),
       |p AS (
       |  SELECT media_id,
       |    CAST(list_sum(list_transform(range(0, $PhashDim), i ->
       |      CASE WHEN fv[CAST(i AS INT) + 1] > fv[CAST(i AS INT) + 2]
       |           THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END)) AS BIGINT) AS ph
       |  FROM f),
       |bl AS (SELECT media_id, ph, unnest(range(0, $PhashBlocks)) AS block FROM p),
       |blv AS (SELECT media_id, block,
       |        (ph >> CAST(block * $PhashBlockBits AS INT)) & ${(1 << PhashBlockBits) - 1} AS bval
       |        FROM bl),
       |blsz AS (SELECT block, bval, count(*) AS sz FROM blv GROUP BY block, bval),
       |blvc AS (SELECT v.media_id, v.block, v.bval FROM blv v
       |         JOIN blsz USING (block, bval) WHERE sz <= $HotBucketCap),
       |cand AS (SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
       |         FROM blvc a JOIN blvc b
       |         ON a.block = b.block AND a.bval = b.bval AND a.media_id < b.media_id),
       |prs AS (
       |  SELECT c.id_a, c.id_b,
       |         CAST(bit_count(xor(pa.ph, pb.ph)) AS INT) AS hamming
       |  FROM cand c
       |  JOIN p pa ON pa.media_id = c.id_a
       |  JOIN p pb ON pb.media_id = c.id_b
       |  WHERE bit_count(xor(pa.ph, pb.ph)) <= ${PhashBlocks - 1})""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm_features" ->
      s"""SELECT doc_id AS media_id, 'text' AS kind,
         |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         |       octet_length(encode(text)) > 0 AS decode_ok,
         |       ${(0 until Dim).map(fSql).mkString(",\n       ")}
         |FROM documents ORDER BY media_id""".stripMargin,
    // frames reconstructed on the hex plane: block i of the payload bytes
    // = chars [i*64+1, 64] of hex(bytes); every FrameStride-th block,
    // first MaxFrames of them
    "mm_frames" ->
      s"""WITH $framesCte
         |SELECT media_id, bi AS frame_index,
         |       CAST(len(fhex) // 2 AS INT) AS n_bytes,
         |       lower(fhex) AS frame_hex
         |FROM f ORDER BY media_id, frame_index""".stripMargin,
    // the frames CTE feeding a per-asset-distinct fingerprint self-join —
    // the same md5-on-the-hex-plane fingerprint as the Spark side
    "mm_shared_frames" ->
      s"""WITH $framesCte,
         |fp AS (SELECT DISTINCT media_id, md5(lower(fhex)) AS fh FROM f)
         |SELECT a.media_id AS id_a, b.media_id AS id_b,
         |       CAST(count(*) AS BIGINT) AS n_shared
         |FROM fp a JOIN fp b ON a.fh = b.fh AND a.media_id < b.media_id
         |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin,
    // block means are exact-integer sums divided once (correctly rounded
    // identically on both engines), so the per-bit gradient comparisons
    // match Spark bit-for-bit
    "mm_phash" ->
      s"""WITH $phashPairsCte
         |SELECT id_a, id_b, hamming FROM prs
         |ORDER BY id_a, id_b""".stripMargin,
    // the frames CTE feeding per-byte arrays, a lag over frame order, and
    // the exact integer-sum / length mean-abs-diff; single-frame assets
    // keep zero cuts via the left join
    "mm_scene_cut" ->
      s"""WITH $framesCte,
         |fb AS (SELECT media_id, bi, lower(fhex) AS fx,
         |              CAST(len(fhex) // 2 AS INT) AS nb FROM f),
         |bv AS (SELECT media_id, bi,
         |              [CAST('0x' || substr(fx, j * 2 + 1, 2) AS BIGINT)
         |               for j in range(nb)] AS bv
         |       FROM fb),
         |lg AS (SELECT media_id, bi, bv,
         |              lag(bv) OVER (PARTITION BY media_id ORDER BY bi) AS pv
         |       FROM bv),
         |dd AS (SELECT media_id,
         |              CASE WHEN pv IS NOT NULL THEN
         |                list_sum(list_transform(range(least(len(bv), len(pv))),
         |                  j -> abs(bv[CAST(j AS INT) + 1] - pv[CAST(j AS INT) + 1]))) * 1.0
         |                  / least(len(bv), len(pv)) END AS d
         |       FROM lg)
         |SELECT media_id, CAST(count(*) AS INT) AS n_frames,
         |       CAST(sum(CASE WHEN d > $SceneCutThreshold THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_cuts,
         |       CAST(sum(CASE WHEN d > $SceneCutThreshold THEN 1 ELSE 0 END) + 1 AS BIGINT)
         |         AS n_scenes,
         |       coalesce(round(avg(d), 6), 0.0) AS mean_diff,
         |       coalesce(round(max(d), 6), 0.0) AS max_diff
         |FROM dd GROUP BY media_id
         |ORDER BY media_id""".stripMargin,
    // the mm_phash pair CTEs feeding a recursive transitive closure
    // seeded from ALL media ids (assets in no pair are singletons) —
    // dedup_cc's oracle shape on the media plane
    "mm_dedup_cc" ->
      s"""WITH RECURSIVE $phashPairsCte,
         |e AS (SELECT id_a AS src, id_b AS dst FROM prs
         |      UNION ALL SELECT id_b, id_a FROM prs),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src)
         |SELECT a AS media_id, CAST(min(b) AS BIGINT) AS component,
         |       a = min(b) AS keep
         |FROM reach GROUP BY a ORDER BY media_id""".stripMargin)
}
