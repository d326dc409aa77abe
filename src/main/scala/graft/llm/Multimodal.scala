package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media as opaque `binary` columns plus typed metadata, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * Two decode tiers:
  *  - REAL decoders for the formats the JDK ships codecs for —
  *    PNG/JPEG/BMP/GIF via `javax.imageio` ([[decodeImagesReal]],
  *    [[resizeImagesReal]]), multi-frame GIF extraction
  *    ([[sampleFramesReal]]) and WAV via `javax.sound.sampled`
  *    ([[decodeAudioReal]]) — as `mapPartitions` kernels (the
  *    production dataflow: one codec context per partition, narrow,
  *    malformed rows degrade to `ok = false` instead of failing the
  *    job).
  *  - STUBS for everything else (video codecs, mp3/flac — absent from
  *    this container): `decode*Meta` derive deterministic fake metadata
  *    from the byte stream, reproducible in ANSI SQL so the stages stay
  *    oracle-checkable against DuckDB.
  *
  * Scale: all stages are narrow (no shuffle); frame sampling multiplies
  * rows via explode which preserves input partitioning.
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
      // fold over code points (real: RMS over PCM samples). Guarded for
      // empty payloads — ANSI mode throws DIVIDE_BY_ZERO even on doubles
      when(n === 0, lit(0.0)).otherwise(
        aggregate(transform(filter(split(bytes.cast("string"), ""), c => c =!= ""),
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

  // ---- REAL decoders (JDK codecs; mapPartitions kernels) -------------

  /** REAL image decode via `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF):
    * (id, bytes) -> (id, width, height, channels, ok). Undecodable or
    * malformed payloads yield `ok = false` rather than failing the job —
    * at corpus scale some fraction of media is always broken. */
  def decodeImagesReal(df: DataFrame, idCol: String = "media_id",
                       bytesCol: String = "bytes"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) (id, 0, 0, 0, false)
            else (id, img.getWidth, img.getHeight,
              img.getColorModel.getNumComponents, true)
          } catch { case _: Exception => (id, 0, 0, 0, false) }
        }
      }
      .toDF(idCol, "width", "height", "channels", "ok")
  }

  /** REAL resize: decode, aspect-preserving scale to `maxSide`
    * (never upscale), re-encode PNG. Output carries the resized payload
    * plus its dimensions; broken inputs pass through with `ok = false`
    * and empty bytes. */
  def resizeImagesReal(df: DataFrame, maxSide: Int,
                       idCol: String = "media_id",
                       bytesCol: String = "bytes"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) (id, Array.empty[Byte], 0, 0, false)
            else {
              val scale = math.min(1.0,
                maxSide.toDouble / math.max(img.getWidth, img.getHeight))
              val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
                math.max(1, (img.getHeight * scale).toInt))
              val out = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              (id, bos.toByteArray, w, h, true)
            }
          } catch { case _: Exception => (id, Array.empty[Byte], 0, 0, false) }
        }
      }
      .toDF(idCol, "resized_bytes", "resized_width", "resized_height", "ok")
  }

  /** REAL perceptual hash (average-hash) via the JDK codecs: decode,
    * bilinear-scale to 8x8 grayscale, threshold each cell against the
    * mean -> one 64-bit signature whose hamming distance tracks visual
    * similarity (resize-/re-encode-stable, unlike a byte hash). Pairs
    * then come from [[Dedup.hammingPairs]] — image near-dup dedup with
    * the exact same bucketed-join scale shape as SimHash text dedup.
    * Broken payloads yield `ok = false`, sig 0. */
  def imagePhashReal(df: DataFrame, idCol: String = "media_id",
                     bytesCol: String = "bytes"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) (id, 0L, false)
            else {
              val small = new java.awt.image.BufferedImage(8, 8,
                java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val g = small.createGraphics()
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, 8, 8, null)
              g.dispose()
              val px = new Array[Int](64)
              small.getRaster.getPixels(0, 0, 8, 8, px)
              val mean = px.sum / 64.0
              var sig = 0L
              var i = 0
              while (i < 64) { if (px(i) > mean) sig |= (1L << i); i += 1 }
              (id, sig, true)
            }
          } catch { case _: Exception => (id, 0L, false) }
        }
      }
      .toDF(idCol, "phash", "ok")
  }

  /** REAL frame sampling via the JDK GIF codec: animated GIFs are the
    * one multi-frame container `javax.imageio` ships a decoder for, so
    * the video frame-extract stage gets a real decode path (the same
    * `mapPartitions` kernel shape an ffmpeg-backed extractor would use;
    * containers ImageIO can't read degrade to one `ok = false` row).
    *
    * Emits up to `n` evenly spaced frames per input — frame index
    * `floor(j * total / n)` for j in 0..n-1, deduplicated when
    * `total < n` — each re-encoded PNG with its dimensions and the
    * container's total frame count. Note GIF frames after the first may
    * be partial patches under inter-frame disposal; sampling decodes
    * the raw stored frame, which is exactly what a training-data
    * thumbnail stage wants (cheap, no compositing state). */
  def sampleFramesReal(df: DataFrame, n: Int,
                       idCol: String = "media_id",
                       bytesCol: String = "bytes"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) {
              iis.close()
              Seq((id, -1, 0, 0, 0, Array.empty[Byte], false))
            } else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                val total = reader.getNumImages(true)
                (0 until n).map(j => (j.toLong * total / n).toInt).distinct
                  .map { f =>
                    val img = reader.read(f)
                    val bos = new java.io.ByteArrayOutputStream()
                    javax.imageio.ImageIO.write(img, "png", bos)
                    (id, f, total, img.getWidth, img.getHeight,
                      bos.toByteArray, true)
                  }
              } finally { reader.dispose(); iis.close() }
            }
          } catch { case _: Exception =>
            Seq((id, -1, 0, 0, 0, Array.empty[Byte], false))
          }
        }
      }
      .toDF(idCol, "frame_idx", "total_frames", "width", "height",
        "frame_bytes", "ok")
  }

  /** REAL video near-dup: sample `nFrames` frames per clip (the JDK GIF
    * codec), perceptual-hash each frame ([[imagePhashReal]]'s kernel),
    * and pair clips sharing >= `minShared` distinct frame hashes —
    * frame-SET containment instead of one whole-clip signature, so
    * trimmed / re-timed / container-re-encoded copies still collide on
    * the frames they share (pHash absorbs palette/encoding jitter; a raw
    * byte hash would not). Candidate generation is an equi-join on the
    * frame hash — bucketed, never quadratic across clips — the same
    * scale discipline as every dedup path here.
    * Output: id_a, id_b, shared_frames. */
  def videoNearDupReal(df: DataFrame, nFrames: Int = 4, minShared: Int = 2,
                       idCol: String = "media_id",
                       bytesCol: String = "bytes"): DataFrame = {
    val frames = sampleFramesReal(df, nFrames, idCol, bytesCol)
      .filter(col("ok"))
      .select(col(idCol), col("frame_bytes").as("bytes"))
    val sigs = imagePhashReal(frames, idCol, "bytes")
      .filter(col("ok"))
      .select(col(idCol).as("id"), col("phash")).distinct()
    sigs.as("a").join(sigs.as("b"),
        col("a.phash") === col("b.phash") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("long").as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
  }

  /** REAL audio fingerprint via `javax.sound.sampled`: decode to 16-bit
    * PCM, split into 32 equal windows, and emit a 64-bit signature —
    * bit i = window i's RMS energy above the median energy (the loudness
    * envelope), bit 32+i = window i's zero-crossing rate above the
    * median ZCR (a pitch proxy). Both halves compare against their own
    * median, so the signature is invariant to uniform volume scaling
    * and robust to light noise; hamming distance then tracks perceptual
    * similarity and pairs come from [[Dedup.hammingPairs]] — the audio
    * sibling of [[imagePhashReal]]. Broken payloads yield ok = false. */
  def audioFingerprintReal(df: DataFrame, idCol: String = "media_id",
                           bytesCol: String = "bytes"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val data = ais.readAllBytes(); ais.close()
            val ch = fmt.getChannels
            val n = data.length / 2 / ch
            if (n < 64 || fmt.getSampleSizeInBits != 16) (id, 0L, false)
            else {
              // mono mixdown, little- or big-endian per the header
              val pcm = new Array[Double](n)
              val le = !fmt.isBigEndian
              var i = 0
              while (i < n) {
                var acc = 0.0
                var c = 0
                while (c < ch) {
                  val o = (i * ch + c) * 2
                  val s = if (le) ((data(o + 1) << 8) | (data(o) & 0xff)).toShort
                          else ((data(o) << 8) | (data(o + 1) & 0xff)).toShort
                  acc += s; c += 1
                }
                pcm(i) = acc / ch; i += 1
              }
              val wins = 32
              val rms = new Array[Double](wins)
              val zcr = new Array[Double](wins)
              var w = 0
              while (w < wins) {
                val lo = w * n / wins; val hi = (w + 1) * n / wins
                var e = 0.0; var z = 0; var j = lo
                while (j < hi) {
                  e += pcm(j) * pcm(j)
                  if (j > lo && (pcm(j) >= 0) != (pcm(j - 1) >= 0)) z += 1
                  j += 1
                }
                rms(w) = math.sqrt(e / math.max(hi - lo, 1))
                zcr(w) = z.toDouble / math.max(hi - lo, 1)
                w += 1
              }
              def median(a: Array[Double]): Double = {
                val s = a.sorted; (s(15) + s(16)) / 2
              }
              val (mr, mz) = (median(rms), median(zcr))
              var sig = 0L
              w = 0
              while (w < wins) {
                if (rms(w) > mr) sig |= (1L << w)
                if (zcr(w) > mz) sig |= (1L << (32 + w))
                w += 1
              }
              (id, sig, true)
            }
          } catch { case _: Exception => (id, 0L, false) }
        }
      }
      .toDF(idCol, "afp", "ok")
  }

  /** REAL audio decode via `javax.sound.sampled` (WAV/AIFF/AU):
    * (id, bytes) -> (id, duration_sec, sample_rate, channels, rms, ok).
    * RMS is computed over the 16-bit PCM samples — the loudness feature
    * the stub fakes with a byte mean. */
  def decodeAudioReal(df: DataFrame, idCol: String = "media_id",
                      bytesCol: String = "bytes"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val frames = ais.getFrameLength
            val duration = frames.toDouble / fmt.getFrameRate
            val pcm = ais.readAllBytes()
            var sumSq = 0.0; var i = 0; var n = 0
            val bigEndian = fmt.isBigEndian
            while (i + 1 < pcm.length) {
              val s = if (bigEndian) ((pcm(i) << 8) | (pcm(i + 1) & 0xff)).toShort
                      else ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort
              sumSq += s.toDouble * s.toDouble; n += 1; i += 2
            }
            val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n) / 32768.0
            (id, duration, fmt.getSampleRate.toInt, fmt.getChannels, rms, true)
          } catch { case _: Exception => (id, 0.0, 0, 0, 0.0, false) }
        }
      }
      .toDF(idCol, "duration_sec", "sample_rate", "channels", "rms", "ok")
  }

  // ---- REAL video container parsing (ISO-BMFF / MP4, no codec) --------

  /** Parsed ISO-BMFF container metadata: (major brand, duration seconds,
    * track count, presentation width, presentation height, codec
    * fourccs). Pure box walking per ISO/IEC 14496-12 — `ftyp` for the
    * brand, `moov/mvhd` (v0 or v1) for timescale+duration, each
    * `moov/trak/tkhd` for the 16.16 fixed-point presentation size
    * (audio tracks carry 0x0; the max across tracks is the video
    * size), and each `trak/mdia/minf/stbl/stsd` for the sample-entry
    * codec fourccs (avc1/hvc1/mp4a/...) — the field a real curation
    * filter keys on ("keep h264 only"), distinct in track order. None
    * for anything that is not a plausible BMFF stream (short buffer,
    * box sizes that escape the buffer, no moov). This is CONTAINER
    * metadata — real and exact without any sample decode, which is
    * what manifest building, length filtering, aspect bucketing, and
    * codec filtering need at corpus scale; sample decode stays behind
    * the codec-tier boundary documented above. */
  private[llm] def parseMp4(bytes: Array[Byte])
      : Option[(String, Double, Int, Int, Int, Seq[String])] = {
    val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    def u32(at: Int): Long = bb.getInt(at) & 0xffffffffL
    def u16(at: Int): Int = bb.getShort(at) & 0xffff

    /** (type, payloadStart, payloadEnd, nextBox) or None when malformed. */
    def box(at: Int, limit: Int): Option[(String, Int, Int, Int)] = {
      if (at + 8 > limit) return None
      var size = u32(at)
      var payload = at + 8
      if (size == 1) { // 64-bit largesize
        if (at + 16 > limit) return None
        val ls = bb.getLong(at + 8)
        if (ls < 16 || at + ls > limit) return None
        size = ls; payload = at + 16
      } else if (size == 0) size = (limit - at).toLong // box runs to end
      if (size < 8 || at + size > limit) return None
      val tag = new String(bytes, at + 4, 4, "ISO-8859-1")
      Some((tag, payload, at + size.toInt, at + size.toInt))
    }

    def children(from: Int, to: Int): Iterator[(String, Int, Int)] =
      Iterator.unfold(from) { at =>
        if (at >= to) None
        else box(at, to).map { case (tag, ps, pe, next) => ((tag, ps, pe), next) }
      }

    if (bytes.length < 16) return None
    var brand = ""
    var durationSec = 0.0
    var nTracks = 0
    var w = 0; var h = 0
    var sawMoov = false
    val codecs = scala.collection.mutable.LinkedHashSet.empty[String]

    /** Codec fourccs from an `stsd` payload: version+flags (4),
      * entry_count (4), then sample entries each led by (size, format).
      * Malformed entry sizes stop the walk, never escape the box. */
    def stsdCodecs(ps: Int, pe: Int): Unit = {
      if (pe - ps < 8) return
      var at = ps + 8
      var n = u32(ps + 4)
      while (n > 0 && at + 8 <= pe) {
        val sz = u32(at)
        if (sz < 8 || at + sz > pe) return
        codecs += new String(bytes, at + 4, 4, "ISO-8859-1").trim
        at += sz.toInt
        n -= 1
      }
    }
    def walkToStsd(tps: Int, tpe: Int): Unit =
      children(tps, tpe).foreach {
        case ("mdia", ps, pe) => walkToStsd(ps, pe)
        case ("minf", ps, pe) => walkToStsd(ps, pe)
        case ("stbl", ps, pe) => walkToStsd(ps, pe)
        case ("stsd", ps, pe) => stsdCodecs(ps, pe)
        case _ => ()
      }

    children(0, bytes.length).foreach {
      case ("ftyp", ps, pe) if pe - ps >= 4 =>
        brand = new String(bytes, ps, 4, "ISO-8859-1").trim
      case ("moov", mps, mpe) =>
        sawMoov = true
        children(mps, mpe).foreach {
          case ("mvhd", ps, pe) if pe - ps >= 4 =>
            val v = bytes(ps) & 0xff
            if (v == 1 && pe - ps >= 32) {
              val timescale = u32(ps + 20)
              val duration = bb.getLong(ps + 24)
              if (timescale > 0) durationSec = duration.toDouble / timescale
            } else if (v == 0 && pe - ps >= 20) {
              val timescale = u32(ps + 12)
              val duration = u32(ps + 16)
              if (timescale > 0) durationSec = duration.toDouble / timescale
            }
          case ("trak", tps, tpe) =>
            nTracks += 1
            children(tps, tpe).foreach {
              case ("tkhd", ps, pe) =>
                val v = bytes(ps) & 0xff
                // width/height are the LAST 8 payload bytes in both
                // versions (v0 layout is 84 bytes, v1 is 96)
                val need = if (v == 1) 96 else 84
                if (pe - ps >= need) {
                  val tw = (u32(pe - 8) >> 16).toInt // 16.16 fixed
                  val th = (u32(pe - 4) >> 16).toInt
                  if (tw > 0 && th > 0) { w = math.max(w, tw); h = math.max(h, th) }
                }
              case ("mdia", ps, pe) => walkToStsd(ps, pe)
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    if (sawMoov) Some((brand, durationSec, nTracks, w, h, codecs.toSeq))
    else None
  }

  /** REAL MP4/MOV container metadata as a stage: (id, bytes) ->
    * (id, brand, duration_sec, n_tracks, width, height, codecs, ok)
    * via the [[parseMp4]] box walker in the usual mapPartitions kernel
    * shape — narrow, malformed rows degrade to ok = false. `codecs`
    * carries the stsd sample-entry fourccs (avc1/hvc1/mp4a/...), so a
    * "keep h264 only" curation filter is `array_contains(codecs,
    * 'avc1')` over manifest metadata, no decode. Closes the container-
    * format half of the video story (SURVEY's documented divergence:
    * the JDK ships no video CODEC, so sample decode remains the
    * animated-GIF real path / stub tier, but manifest-grade container
    * metadata is parsed for real). */
  def videoContainerMeta(df: DataFrame, idCol: String = "media_id",
                         bytesCol: String = "bytes"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parseMp4(bytes) match {
            case Some((brand, dur, n, w, h, cs)) =>
              (id, brand, dur, n, w, h, cs, true)
            case None => (id, "", 0.0, 0, 0, 0, Seq.empty[String], false)
          }
        }
      }
      .toDF(idCol, "brand", "duration_sec", "n_tracks", "width", "height",
        "codecs", "ok")
  }
}
