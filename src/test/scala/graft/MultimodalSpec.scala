package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaRecord, StubDecoder}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def media(rows: (Long, String, String)*): org.apache.spark.sql.Dataset[MediaRecord] =
    rows.map { case (id, kind, payload) =>
      MediaRecord(id, kind, payload.getBytes("UTF-8"), 0, 0, 0)
    }.toDS()

  test("extractFeatures: fixed-dim deterministic features, once-per-partition init") {
    val ds = media((1L, "image", "pixels-go-here"), (2L, "audio", "pcm-bytes"))
    val out = Multimodal.extractFeatures(ds, new StubDecoder(8)).collect().sortBy(_.media_id)
    assert(out.forall(_.decode_ok))
    assert(out.forall(_.features.length == 8))
    assert(out.forall(_.features.forall(f => f >= 0.0 && f < 1.0)))
    // deterministic across runs
    val out2 = Multimodal.extractFeatures(ds, new StubDecoder(8)).collect().sortBy(_.media_id)
    assert(out.map(_.features.toSeq).toSeq == out2.map(_.features.toSeq).toSeq)
  }

  test("decode failure path: empty payload kept with decode_ok=false") {
    val ds = media((1L, "image", "ok"), (2L, "image", ""))
    val out = Multimodal.extractFeatures(ds, new StubDecoder(4)).collect().sortBy(_.media_id)
    assert(out(0).decode_ok && out(1).decode_ok == false)
    assert(out(1).features.isEmpty)
  }

  test("sampleFrames: strided fixed-size blocks, bounded count") {
    val payload = (0 until 100).map(i => ('a' + i % 26).toChar).mkString // 100 bytes
    val ds = media((7L, "video", payload))
    val frames = Multimodal.sampleFrames(ds, frameSize = 10, stride = 2, maxFrames = 3)
      .orderBy("frame_index").collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length == 10))
  }

  test("mm_features query runs on the documents table") {
    val df = graft.queries.MultimodalQueries.mmFeatures(spark, sf())
    val rows = df.collect()
    assert(rows.length > 0)
    assert(rows.forall(_.getBoolean(3))) // all documents non-empty
  }
}
