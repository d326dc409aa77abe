package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "an image payload of some length", "s0"),
    (1L, "an audio payload here", "s1"),
    (2L, "a video payload with enough bytes for frames", "s2"),
    (3L, "x", "s3"))
    .toDF("doc_id", "text", "source")

  test("media corpus assigns types cyclically and keeps bytes opaque") {
    val m = Multimodal.mediaFromDocuments(docs)
    val types = m.select($"media_id", $"media_type").as[(Long, String)].collect().toMap
    assert(types == Map(0L -> "image", 1L -> "audio", 2L -> "video", 3L -> "image"))
    assert(m.schema("bytes").dataType.typeName == "binary")
  }

  test("image decode stub yields bounded metadata; resize preserves aspect cap") {
    val imgs = Multimodal.mediaFromDocuments(docs)
      .filter($"media_type" === "image")
      .withColumn("image_meta", Multimodal.decodeImageMeta($"bytes"))
    val metas = imgs.select($"image_meta.width", $"image_meta.height", $"image_meta.channels")
      .as[(Int, Int, Int)].collect()
    metas.foreach { case (w, h, c) =>
      assert(w >= 16 && w < 256 && h >= 16 && h < 256 && c >= 1 && c <= 3)
    }
    val resized = Multimodal.resizeImages(imgs, maxSide = 32)
      .select($"resized_width", $"resized_height").as[(Int, Int)].collect()
    resized.foreach { case (w, h) => assert(w <= 32 && h <= 32 && w >= 1 && h >= 1) }
  }

  test("frame sampling emits n frames per video covering the byte stream") {
    val vids = Multimodal.mediaFromDocuments(docs).filter($"media_type" === "video")
    val frames = Multimodal.sampleFrames(vids, 4)
    assert(frames.count() == vids.count() * 4)
    val lens = frames.select($"frame_idx", $"frame_len").as[(Int, Int)].collect()
    assert(lens.map(_._1).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(lens.forall(_._2 >= 1))
  }

  test("audio decode stub computes duration and mean level deterministically") {
    val auds = Multimodal.mediaFromDocuments(docs).filter($"media_type" === "audio")
      .withColumn("m", Multimodal.decodeAudioMeta($"bytes"))
    val (dur, rate, level) = auds
      .select($"m.duration_sec", $"m.sample_rate", $"m.mean_level")
      .as[(Double, Int, Double)].head()
    val text = "an audio payload here"
    assert(math.abs(dur - text.length / 16000.0) < 1e-12)
    assert(rate == 16000)
    val want = text.map(_.toLong).sum.toDouble / text.length
    assert(math.abs(level - want) < 1e-12)
  }
}
