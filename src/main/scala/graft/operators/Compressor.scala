package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, DeflaterOutputStream, GZIPInputStream, GZIPOutputStream, InflaterInputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Body compression — Spark analog of core.compressor
  * (compressor.go:92-171): gzip/flate/zlib/lzw/zstd/snappy at a configured
  * level, rewriting the body in place; undecodable input on the inverse
  * path is rejected (status INVALID).
  *
  * Codecs reuse the JVM/Spark-bundled native libs (java.util.zip,
  * zstd-jni, snappy-java, lz4-java — all on the Spark classpath), plus a
  * self-contained LZW (the one reference codec the JVM doesn't ship:
  * compressor.go:104-127 wraps Go's compress/lzw; here the standard
  * LSB-first variable-width rendering, 9→12-bit codes, clear-on-full).
  * UDF-based: compression is opaque byte work with no relational
  * structure for Catalyst to optimize, so a UDF costs only the call
  * overhead; the bytes dominate.
  */
object Compressor {
  val Codecs = Seq("gzip", "flate", "zlib", "zstd", "snappy", "lz4", "lzw")

  def compressBytes(codec: String, level: Int)(data: Array[Byte]): Array[Byte] = codec match {
    case "gzip" =>
      val bos = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(bos) { `def`.setLevel(level) }
      g.write(data); g.close(); bos.toByteArray
    case "flate" =>
      val bos = new ByteArrayOutputStream()
      val d = new DeflaterOutputStream(bos, new Deflater(level, true))
      d.write(data); d.close(); bos.toByteArray
    case "zlib" =>
      val bos = new ByteArrayOutputStream()
      val d = new DeflaterOutputStream(bos, new Deflater(level, false))
      d.write(data); d.close(); bos.toByteArray
    case "zstd" => com.github.luben.zstd.Zstd.compress(data, level)
    case "snappy" => org.xerial.snappy.Snappy.compress(data)
    case "lz4" =>
      val c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
      val max = c.maxCompressedLength(data.length)
      val out = new Array[Byte](max + 4)
      // length-prefix so decompress knows the original size
      out(0) = (data.length >>> 24).toByte; out(1) = (data.length >>> 16).toByte
      out(2) = (data.length >>> 8).toByte; out(3) = data.length.toByte
      val n = c.compress(data, 0, data.length, out, 4, max)
      java.util.Arrays.copyOf(out, n + 4)
    case "lzw" => Lzw.compress(data)
    case other => throw new IllegalArgumentException(s"unknown codec $other")
  }

  def decompressBytes(codec: String)(data: Array[Byte]): Array[Byte] = codec match {
    case "gzip" =>
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(data))
      val out = in.readAllBytes(); in.close(); out
    case "flate" =>
      val in = new InflaterInputStream(new java.io.ByteArrayInputStream(data),
        new java.util.zip.Inflater(true))
      val out = in.readAllBytes(); in.close(); out
    case "zlib" =>
      val in = new InflaterInputStream(new java.io.ByteArrayInputStream(data))
      val out = in.readAllBytes(); in.close(); out
    case "zstd" =>
      val size = com.github.luben.zstd.Zstd.getFrameContentSize(data)
      com.github.luben.zstd.Zstd.decompress(data, size.toInt)
    case "snappy" => org.xerial.snappy.Snappy.uncompress(data)
    case "lz4" =>
      val len = ((data(0) & 0xff) << 24) | ((data(1) & 0xff) << 16) |
        ((data(2) & 0xff) << 8) | (data(3) & 0xff)
      val d = net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
      d.decompress(data, 4, len)
    case "lzw" => Lzw.decompress(data)
    case other => throw new IllegalArgumentException(s"unknown codec $other")
  }

  /** Static-forwarder entry points for the codegen expressions (called
    * from generated Java as graft.operators.Compressor.compressStatic). */
  def compressStatic(data: Array[Byte], codec: String, level: Int): Array[Byte] =
    compressBytes(codec, level)(data)

  def decompressStatic(data: Array[Byte], codec: String): Array[Byte] =
    decompressBytes(codec)(data)

  // codegen'd Catalyst expressions (graft.functions.CompressCodec):
  // keeps the codec call inside WholeStageCodegen instead of paying a
  // ScalaUDF boundary per message
  def compressCol(codec: String, level: Int = 6): Column => Column =
    (c: Column) => graft.functions.CompressCodec(c, codec, level)

  def decompressCol(codec: String): Column => Column =
    (c: Column) => graft.functions.DecompressCodec(c, codec)

  /** Event-model form: body := compress(body). */
  def compress(df: DataFrame, codec: String, level: Int = 6, bodyCol: String = "body"): DataFrame =
    df.withColumn(bodyCol, compressCol(codec, level)(col(bodyCol)))

  def decompress(df: DataFrame, codec: String, bodyCol: String = "body"): DataFrame = {
    val decoded = decompressCol(codec)(col(bodyCol))
    df.withColumn("status",
        when(decoded.isNull && col(bodyCol).isNotNull, FlowEventModel.StatusInvalid)
          .otherwise(FlowEventModel.StatusDone))
      .withColumn(bodyCol, decoded)
  }
}
