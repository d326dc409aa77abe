package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media as opaque `binary` columns plus typed metadata, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs,
  * so `decode*` derive deterministic fake metadata from the byte stream
  * (length + first/last byte arithmetic — chosen to be reproducible in
  * ANSI SQL so the stages stay oracle-checkable). Everything AROUND the
  * stub — schemas, binary slicing, explode-based frame fan-out,
  * partition-parallel shape, null handling — is the real production
  * plumbing; swapping in a real codec changes only the marked lambdas.
  *
  * Scale: all stages are narrow (no shuffle); frame sampling multiplies
  * rows via explode which preserves input partitioning. Decoders on real
  * data would be mapInPandas/mapPartitions batch calls — same dataflow.
  */
object Multimodal {

  /** Deterministic media corpus derived from the documents table:
    * media_id, media_type in {image,audio,video}, bytes, source. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("bytes"),
      col("source"))

  private def cpFirst(bytes: Column): Column = ascii(substring(bytes.cast("string"), 1, 1))
  private def cpLast(bytes: Column): Column = ascii(substring(bytes.cast("string"), -1, 1))

  /** STUB image decode: metadata struct derived arithmetically from the
    * bytes (a real pipeline decodes the container header here). */
  def decodeImageMeta(bytes: Column): Column = {
    val n = length(bytes)
    struct(
      (lit(16) + pmod(n * 31 + cpFirst(bytes), lit(240))).as("width"),
      (lit(16) + pmod(n * 17 + cpLast(bytes), lit(240))).as("height"),
      (lit(1) + pmod(n, lit(3))).as("channels"))
  }

  /** STUB audio decode: fake 16 kHz mono PCM view of the byte stream. */
  def decodeAudioMeta(bytes: Column): Column = {
    val n = length(bytes)
    struct(
      (n.cast("double") / 16000.0).as("duration_sec"),
      lit(16000).as("sample_rate"),
      // mean byte value as a stand-in loudness feature: a sequential
      // fold over code points (real: RMS over PCM samples)
      (aggregate(transform(filter(split(bytes.cast("string"), ""), c => c =!= ""),
        c => ascii(c).cast("long")), lit(0L), (acc, x) => acc + x).cast("double") / n)
        .as("mean_level"))
  }

  /** Resize plan: computes target dims preserving aspect ratio cap and a
    * stub "resized" payload (truncated bytes — real: pixel resample). */
  def resizeImages(df: DataFrame, maxSide: Int): DataFrame = {
    val meta = col("image_meta")
    val w = meta.getField("width"); val h = meta.getField("height")
    val scale = least(lit(1.0), lit(maxSide).cast("double") / greatest(w, h))
    df.withColumn("resized_width", floor(w * scale).cast("int"))
      .withColumn("resized_height", floor(h * scale).cast("int"))
      .withColumn("resized_bytes", // STUB: real code re-encodes pixels
        substring(col("bytes"), 1, 64))
  }

  /** Frame sampling for video rows: emits `n` evenly-spaced fake frames
    * as byte slices with frame index — the explode shape (row-multiplying,
    * shuffle-free) a real frame extractor produces. */
  def sampleFrames(df: DataFrame, n: Int): DataFrame = {
    df.withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_bytes", // STUB: real code decodes the frame at the offset
        expr(s"substring(bytes, frame_idx * greatest(length(bytes) div $n, 1) + 1, " +
          s"greatest(length(bytes) div $n, 1))"))
      .withColumn("frame_len", length(col("frame_bytes")))
      .drop("bytes")
  }
}
