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

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 7 + y * 13) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def wavBytes(rateHz: Int, seconds: Double, freqHz: Double): Array[Byte] = {
    val n = (rateHz * seconds).toInt
    val fmt = new javax.sound.sampled.AudioFormat(rateHz.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = (math.sin(2 * math.Pi * freqHz * i / rateHz) * 16000).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("REAL image decode reads PNG and JPEG dims; broken payloads degrade") {
    val media = Seq(
      (1L, pngBytes(100, 40)),
      (2L, jpegBytes(30, 60)),
      (3L, "not an image at all".getBytes)).toDF("media_id", "bytes")
    val out = Multimodal.decodeImagesReal(media)
      .select($"media_id", $"width", $"height", $"channels", $"ok")
      .as[(Long, Int, Int, Int, Boolean)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 100, 40, 3, true)))
    assert(out(1) == ((2L, 30, 60, 3, true)))
    assert(out(2)._5 == false)
  }

  test("REAL resize scales aspect-preserving, re-encodes decodable PNG") {
    val media = Seq((1L, pngBytes(200, 100)), (2L, pngBytes(20, 10)))
      .toDF("media_id", "bytes")
    val out = Multimodal.resizeImagesReal(media, maxSide = 64)
    val rows = out.select($"media_id", $"resized_bytes", $"resized_width",
        $"resized_height", $"ok")
      .as[(Long, Array[Byte], Int, Int, Boolean)].collect().sortBy(_._1)
    assert(rows(0)._3 == 64 && rows(0)._4 == 32 && rows(0)._5)
    assert(rows(1)._3 == 20 && rows(1)._4 == 10) // never upscaled
    // the resized payload is itself a decodable image with those dims
    val round = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rows(0)._2))
    assert(round.getWidth == 64 && round.getHeight == 32)
  }

  test("REAL perceptual hash: re-encoded/noisy copies are close, distinct images far") {
    // structured gradient image; a JPEG re-encode and a few-pixel edit
    // must stay within a small hamming radius of the original, while an
    // inverted image lands far away
    def structured(w: Int, h: Int, invert: Boolean, tweak: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach { y =>
        val v0 = (x * 255 / w + y * 255 / h) / 2
        val v = if (invert) 255 - v0 else math.min(255, v0 + (if (x < 3 && y < 3) tweak else 0))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def asJpeg(png: Array[Byte]): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val rgb = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      rgb.createGraphics().drawImage(img, 0, 0, null)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(rgb, "jpg", bos)
      bos.toByteArray
    }
    val base = structured(64, 48, invert = false, tweak = 0)
    val rows = Seq(
      (1L, base),
      (2L, asJpeg(base)),                               // lossy re-encode
      (3L, structured(64, 48, invert = false, tweak = 40)), // small local edit
      (4L, structured(64, 48, invert = true, tweak = 0)),   // inverted -> far
      (5L, "not an image".getBytes("UTF-8")))           // broken -> ok=false
      .toDF("media_id", "bytes")
    val got = Multimodal.imagePhashReal(rows)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(5L)._2 == false)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val h12 = ham(got(1L)._1, got(2L)._1)
    val h13 = ham(got(1L)._1, got(3L)._1)
    val h14 = ham(got(1L)._1, got(4L)._1)
    assert(h12 <= 6, s"jpeg re-encode drifted $h12 bits")
    assert(h13 <= 6, s"local edit drifted $h13 bits")
    assert(h14 >= 32, s"inverted image unexpectedly close: $h14")
    // and the pairs come out of the same hammingPairs join SimHash uses
    val sigs = Seq((1L, got(1L)._1), (2L, got(2L)._1), (3L, got(3L)._1),
      (4L, got(4L)._1)).toDF("id", "sig")
    val pairs = Dedup.hammingPairs(sigs, maxDist = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  /** WAV whose frequency and amplitude step per 1/32-second window
    * according to `pattern` — gives the fingerprint's envelope and ZCR
    * halves real structure to latch onto. */
  private def fmWav(pattern: Seq[Int], gain: Double = 1.0): Array[Byte] = {
    val rate = 16000
    val perWin = rate / 32
    val n = perWin * 32
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val w = i / perWin
      val p = pattern(w % pattern.length)
      val freq = 200.0 + 150.0 * (p % 8)
      val amp = (2000 + 1500 * (p % 4)) * gain
      val s = (math.sin(2 * math.Pi * freq * i / rate) * amp).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("REAL audio fingerprint: volume-invariant, pattern-sensitive") {
    val patA = Seq(0, 3, 1, 6, 2, 7, 4, 5)
    val patB = Seq(7, 1, 5, 0, 6, 2, 3, 4)
    val media = Seq(
      (1L, fmWav(patA)),
      (2L, fmWav(patA, gain = 0.4)),  // same content, quieter -> same sig
      (3L, fmWav(patB)),              // different structure -> far
      (4L, "junk".getBytes))          // broken -> ok=false
      .toDF("media_id", "bytes")
    val got = Multimodal.audioFingerprintReal(media)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!got(4L)._2)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(got(1L)._1, got(2L)._1) == 0,
      s"volume scaling moved ${ham(got(1L)._1, got(2L)._1)} bits")
    assert(ham(got(1L)._1, got(3L)._1) >= 16,
      s"distinct patterns too close: ${ham(got(1L)._1, got(3L)._1)}")
    // pairs through the shared hamming machinery
    val sigs = Seq((1L, got(1L)._1), (2L, got(2L)._1), (3L, got(3L)._1))
      .toDF("id", "sig")
    val pairs = Dedup.hammingPairs(sigs, maxDist = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
  }

  test("REAL audio decode parses WAV duration, rate and RMS of a sine") {
    val media = Seq(
      (1L, wavBytes(16000, 0.5, 440.0)),
      (2L, "junk".getBytes)).toDF("media_id", "bytes")
    val out = Multimodal.decodeAudioReal(media)
      .select($"media_id", $"duration_sec", $"sample_rate", $"channels",
        $"rms", $"ok")
      .as[(Long, Double, Int, Int, Double, Boolean)].collect().sortBy(_._1)
    val (_, dur, rate, ch, rms, ok) = out(0)
    assert(ok && rate == 16000 && ch == 1)
    assert(math.abs(dur - 0.5) < 1e-6)
    // a full-scale-0.5 sine has RMS ~ 0.5/sqrt(2) ~ 0.345
    assert(math.abs(rms - 16000.0 / 32768 / math.sqrt(2)) < 0.01)
    assert(!out(1)._6)
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

  /** Animated GIF with `frames` solid-color full-size frames (color =
    * frame index scaled into the red channel), written through the JDK
    * GIF sequence writer. */
  private def gifBytes(frames: Int, w: Int, h: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until frames).foreach { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(40 * f, 0, 0))
      g.fillRect(0, 0, w, h)
      g.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  /** Animated GIF whose frame f carries pattern `patterns(f)` — a
    * checker-gradient keyed on the pattern id, so distinct patterns
    * produce distinct perceptual hashes (solid frames would all
    * degenerate to pHash 0). */
  private def patternGif(patterns: Seq[Int], w: Int = 32, h: Int = 24): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    patterns.foreach { p =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      // paint an 8x8 block pattern from the bits of mix64(p): survives
      // the pHash downsample exactly, so distinct p -> distinct hashes
      val bits = graft.functions.HashFunctions.mix64(p.toLong)
      (0 until w).foreach(x => (0 until h).foreach { y =>
        val cell = (y * 8 / h) * 8 + (x * 8 / w)
        val v = if (((bits >>> cell) & 1L) == 1L) 230 else 20
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  test("REAL video near-dup pairs clips on shared frame hashes") {
    val media = Seq(
      (1L, patternGif(Seq(0, 1, 2, 3, 4, 5))),   // base clip
      (2L, patternGif(Seq(2, 3, 4, 5, 6, 7))),   // trimmed/re-timed: shares 2..5
      (3L, patternGif(Seq(10, 11, 12, 13, 14, 15))), // disjoint content
      (4L, "not a container".getBytes))          // broken: silently absent
      .toDF("media_id", "bytes")
    val pairs = Multimodal.videoNearDupReal(media, nFrames = 6, minShared = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)), pairs.toString)
    assert(pairs.head._3 >= 2 && pairs.head._3 <= 4) // patterns 2..5 overlap
  }

  test("REAL frame sampling decodes evenly spaced frames of an animated GIF") {
    val media = Seq(
      (1L, gifBytes(6, 24, 16)),
      (2L, "not a container".getBytes)).toDF("media_id", "bytes")
    val out = Multimodal.sampleFramesReal(media, n = 3)
      .select($"media_id", $"frame_idx", $"total_frames", $"width",
        $"height", $"frame_bytes", $"ok")
      .as[(Long, Int, Int, Int, Int, Array[Byte], Boolean)].collect()
    val good = out.filter(_._1 == 1L).sortBy(_._2)
    assert(good.map(_._2).toSeq == Seq(0, 2, 4)) // floor(j*6/3)
    assert(good.forall(r => r._3 == 6 && r._4 == 24 && r._5 == 16 && r._7))
    // each sampled frame re-decodes as PNG with the frame's own color
    good.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r._6))
      assert(img.getWidth == 24 && img.getHeight == 16)
      val red = (img.getRGB(5, 5) >> 16) & 0xff
      // GIF palette quantization may wobble the channel slightly
      assert(math.abs(red - 40 * r._2) <= 8,
        s"frame ${r._2}: red $red != ${40 * r._2}")
    }
    val bad = out.filter(_._1 == 2L)
    assert(bad.length == 1 && !bad(0)._7 && bad(0)._2 == -1)
  }

  test("REAL frame sampling dedups indices when the GIF has fewer frames than n") {
    val media = Seq((9L, gifBytes(2, 8, 8))).toDF("media_id", "bytes")
    val idx = Multimodal.sampleFramesReal(media, n = 5)
      .select($"frame_idx").as[Int].collect().sorted.toSeq
    // floor(j*2/5) for j=0..4 -> 0,0,0,1,1 -> distinct 0,1
    assert(idx == Seq(0, 1))
  }

  // ---- ISO-BMFF container parsing ------------------------------------

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)

  private def bmffBox(tag: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ tag.getBytes("ISO-8859-1") ++ payload

  /** mvhd v0: timescale 600, duration 3000 -> 5.0 s. */
  private def mvhdV0: Array[Byte] = bmffBox("mvhd",
    be32(0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(3000) ++
      Array.fill[Byte](80)(0))

  /** mvhd v1 (64-bit times): same 600/3000. */
  private def mvhdV1: Array[Byte] = bmffBox("mvhd",
    Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(600) ++ be64(3000) ++
      Array.fill[Byte](80)(0))

  /** tkhd v0 with 16.16 fixed-point presentation size (0x0 = audio). */
  private def tkhdV0(w: Int, h: Int): Array[Byte] = bmffBox("tkhd",
    be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(3000) ++
      Array.fill[Byte](8 + 2 + 2 + 2 + 2 + 36)(0) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))

  /** Minimal stsd with one sample entry of the given codec fourcc
    * (16-byte entry: size + format + 6 reserved + data_ref_index). */
  private def stsdBox(fourcc: String): Array[Byte] = bmffBox("stsd",
    be32(0) ++ be32(1) ++
      be32(16) ++ fourcc.getBytes("ISO-8859-1") ++ Array.fill[Byte](8)(0))

  /** The trak/mdia/minf/stbl nesting stsd really lives under. */
  private def trakWithCodec(tkhd: Array[Byte], fourcc: String): Array[Byte] =
    bmffBox("trak", tkhd ++
      bmffBox("mdia", bmffBox("minf", bmffBox("stbl", stsdBox(fourcc)))))

  private def mp4Bytes(mvhd: Array[Byte]): Array[Byte] =
    bmffBox("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0x200) ++
        "mp41".getBytes("ISO-8859-1")) ++
      bmffBox("moov", mvhd ++
        bmffBox("trak", tkhdV0(640, 360)) ++ // video track
        bmffBox("trak", tkhdV0(0, 0))) ++    // audio track (0x0 size)
      bmffBox("mdat", Array.fill[Byte](32)(7))

  private def mp4WithCodecs: Array[Byte] =
    bmffBox("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0x200) ++
        "mp41".getBytes("ISO-8859-1")) ++
      bmffBox("moov", mvhdV0 ++
        trakWithCodec(tkhdV0(640, 360), "avc1") ++
        trakWithCodec(tkhdV0(0, 0), "mp4a")) ++
      bmffBox("mdat", Array.fill[Byte](16)(7))

  test("parseMp4 walks ftyp/moov/mvhd/tkhd: brand, duration, tracks, size") {
    val got = Multimodal.parseMp4(mp4Bytes(mvhdV0))
    assert(got.contains(("isom", 5.0, 2, 640, 360, Seq.empty[String])))
  }

  test("parseMp4 handles 64-bit (version 1) movie headers") {
    assert(Multimodal.parseMp4(mp4Bytes(mvhdV1))
      .contains(("isom", 5.0, 2, 640, 360, Seq.empty[String])))
  }

  test("parseMp4 walks stbl/stsd: per-track codec fourccs in track order") {
    val got = Multimodal.parseMp4(mp4WithCodecs)
    assert(got.contains(("isom", 5.0, 2, 640, 360, Seq("avc1", "mp4a"))))
  }

  test("parseMp4 rejects non-BMFF payloads and truncated boxes") {
    assert(Multimodal.parseMp4("not a video at all".getBytes).isEmpty)
    assert(Multimodal.parseMp4(Array.empty[Byte]).isEmpty)
    // a moov whose declared size escapes the buffer is malformed, not a crash
    val truncated = mp4Bytes(mvhdV0).dropRight(60)
    assert(Multimodal.parseMp4(truncated).isEmpty ||
      Multimodal.parseMp4(truncated).isDefined) // no exception is the contract
  }

  test("videoContainerMeta stage: good rows parse, broken rows degrade to ok=false") {
    val media = Seq(
      (1L, mp4Bytes(mvhdV0)),
      (2L, "plain text masquerading as a clip".getBytes),
      (3L, mp4WithCodecs)
    ).toDF("media_id", "bytes")
    val got = Multimodal.videoContainerMeta(media)
      .select($"media_id", $"brand", $"duration_sec", $"n_tracks",
        $"width", $"height", $"codecs", $"ok")
      .as[(Long, String, Double, Int, Int, Int, Seq[String], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "isom", 5.0, 2, 640, 360, Seq.empty[String], true),
      (2L, "", 0.0, 0, 0, 0, Seq.empty[String], false),
      (3L, "isom", 5.0, 2, 640, 360, Seq("avc1", "mp4a"), true)))
    // the curation filter the codecs column exists for
    assert(Multimodal.videoContainerMeta(media)
      .filter(array_contains($"codecs", "avc1"))
      .select($"media_id").as[Long].collect().toSeq == Seq(3L))
  }
}
