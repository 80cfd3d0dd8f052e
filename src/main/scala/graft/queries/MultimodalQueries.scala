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

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> mmFeatures)

  private def fSql(i: Int): String =
    s"round(CAST('0x' || substr(md5(text || '#f$i'), 1, 8) AS BIGINT) / 4294967296.0, 6) AS f$i"

  val oracles: Map[String, String] = Map(
    "mm_features" ->
      s"""SELECT doc_id AS media_id, 'text' AS kind,
         |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         |       octet_length(encode(text)) > 0 AS decode_ok,
         |       ${(0 until Dim).map(fSql).mkString(",\n       ")}
         |FROM documents ORDER BY media_id""".stripMargin)
}
