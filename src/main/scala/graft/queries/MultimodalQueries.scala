package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> mmFeatures,
    "mm_frames" -> mmFrames)

  private def fSql(i: Int): String =
    s"round(CAST('0x' || substr(md5(text || '#f$i'), 1, 8) AS BIGINT) / 4294967296.0, 6) AS f$i"

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
      s"""WITH h AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx FROM documents),
         |n AS (SELECT media_id, hx,
         |             (len(hx) // 2 + ${FrameSize - 1}) // $FrameSize AS nb
         |      FROM h),
         |ix AS (SELECT media_id, hx, CAST(unnest(range(nb)) AS INT) AS bi FROM n),
         |f AS (SELECT media_id, bi,
         |             substr(hx, bi * ${FrameSize * 2} + 1, ${FrameSize * 2}) AS fhex
         |      FROM ix
         |      WHERE bi % $FrameStride = 0 AND bi < ${FrameStride * MaxFrames})
         |SELECT media_id, bi AS frame_index,
         |       CAST(len(fhex) // 2 AS INT) AS n_bytes,
         |       lower(fhex) AS frame_hex
         |FROM f ORDER BY media_id, frame_index""".stripMargin)
}
