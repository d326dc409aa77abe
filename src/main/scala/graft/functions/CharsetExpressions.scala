package graft.functions

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset-aware HTTP body decode — the WARC front door's missing
  * realism piece: real CommonCrawl is ~20–30% non-UTF-8
  * (Windows-1251/1252, GBK, Shift_JIS, ISO-8859-*), and decoding those
  * records as UTF-8 turns them into mojibake that silently poisons
  * every downstream signal (langid, Gopher/C4 bands, LM scores, dedup
  * hashes). The charset is determined per record, in the order every
  * browser and crawler implements:
  *
  *  1. `charset=` parameter of the HTTP `Content-Type` header (the
  *     header block is ASCII by RFC 9110; decoded ISO-8859-1),
  *  2. a Unicode byte-order mark on the payload,
  *  3. an HTML `<meta charset=…>` / `<meta http-equiv=Content-Type …>`
  *     declaration sniffed from the first 8 KB of payload (the HTML5
  *     prescan window),
  *  4. UTF-8 (the correct modern default).
  *
  * Decoding REPLACES malformed/unmappable sequences (U+FFFD) instead of
  * throwing — a truncated multi-byte tail from `maxBodyBytes` must not
  * kill the scan. Unknown/unsupported charset labels fall back to
  * UTF-8. Both expressions codegen to one static call, so the front
  * door stays inside WholeStageCodegen like the extraction chain that
  * follows it.
  */
case class HttpBodyText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    CharsetOps.httpBodyText(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharsetOps.httpBodyText($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HttpBodyText {
  def apply(c: Column): Column =
    GraftBridge.column(HttpBodyText(GraftBridge.expression(c)))
}

/** String → bytes in a named charset — the fixture-construction inverse
  * of [[HttpBodyText]] (an oracle row can plant a Windows-1251 page by
  * round-tripping text DuckDB never sees as bytes). `charset` is a
  * construction-time literal, resolved once. */
case class CharsetEncode(child: Expression, charset: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BinaryType

  override def nullSafeEval(input: Any): Any =
    CharsetOps.encode(input.asInstanceOf[UTF8String], charset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.CharsetOps.encode($c, "$charset")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharsetEncode {
  def apply(c: Column, charset: String): Column = {
    require(charset.matches("[A-Za-z0-9._:\\-]+"),
      s"charset label must be a plain token, got: $charset")
    GraftBridge.column(CharsetEncode(GraftBridge.expression(c), charset))
  }
}

/** Static kernels called from generated code and from nullSafeEval. */
object CharsetOps {

  /** HTML5 prescan window for the `<meta charset>` sniff. */
  private val SniffBytes = 8192

  private val HeaderCharsetRe = java.util.regex.Pattern.compile(
    "(?i)content-type\\s*:[^\r\n]*?charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9._\\-]+)")

  private val MetaCharsetRe = java.util.regex.Pattern.compile(
    "(?i)<meta[^>]{0,256}?charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9._\\-]+)")

  /** Resolve a charset label leniently: unknown/illegal labels → null
    * (caller falls through to the next detection source). */
  private def lookup(label: String): Charset =
    try {
      if (label == null) null
      else if (Charset.isSupported(label)) Charset.forName(label)
      else null
    } catch { case _: IllegalArgumentException => null }

  def encode(s: UTF8String, charset: String): Array[Byte] = {
    val cs = lookup(charset)
    require(cs != null, s"unsupported charset: $charset")
    val enc = cs.newEncoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val bb = enc.encode(java.nio.CharBuffer.wrap(s.toString))
    val out = new Array[Byte](bb.remaining())
    bb.get(out)
    out
  }

  /** Start offset of the payload after an HTTP header block (first
    * CRLFCRLF or LFLF), or -1 when no blank line terminates one. */
  private def payloadStart(b: Array[Byte]): Int = {
    var i = 0
    val n = b.length
    while (i < n) {
      if (b(i) == '\n') {
        if (i + 1 < n && b(i + 1) == '\n') return i + 2
        if (i + 2 < n && b(i + 1) == '\r' && b(i + 2) == '\n') return i + 3
        if (i + 1 == n || i + 2 == n) return n // headers-only record
      }
      i += 1
    }
    -1
  }

  private def isHttp(b: Array[Byte]): Boolean =
    b.length >= 5 && b(0) == 'H' && b(1) == 'T' && b(2) == 'T' &&
      b(3) == 'P' && b(4) == '/'

  private def group1(p: java.util.regex.Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) m.group(1) else null
  }

  /** The full front-door decode: split off the HTTP header block (when
    * present), detect the charset (header → BOM → meta prescan →
    * UTF-8), decode the payload with replacement, strip a leading BOM
    * char. Non-HTTP bodies (WET conversion records, raw resources)
    * decode whole. */
  def httpBodyText(body: Array[Byte]): UTF8String = {
    var off = 0
    var cs: Charset = null
    if (isHttp(body)) {
      val ps = payloadStart(body)
      if (ps >= 0) {
        val headers = new String(body, 0, ps, StandardCharsets.ISO_8859_1)
        cs = lookup(group1(HeaderCharsetRe, headers))
        off = ps
      }
      // no blank line at all: treat the whole record as payload (a
      // truncated header block should degrade, not vanish)
    }
    val n = body.length - off
    if (cs == null && n >= 2) {
      // BOM beats the meta sniff (a BOM-carrying page IS that encoding)
      val b0 = body(off) & 0xff; val b1 = body(off + 1) & 0xff
      if (b0 == 0xfe && b1 == 0xff) cs = StandardCharsets.UTF_16BE
      else if (b0 == 0xff && b1 == 0xfe) cs = StandardCharsets.UTF_16LE
      else if (n >= 3 && b0 == 0xef && b1 == 0xbb && (body(off + 2) & 0xff) == 0xbf)
        cs = StandardCharsets.UTF_8
    }
    if (cs == null) {
      val win = math.min(n, SniffBytes)
      val prefix = new String(body, off, win, StandardCharsets.ISO_8859_1)
      cs = lookup(group1(MetaCharsetRe, prefix))
    }
    if (cs == null) cs = StandardCharsets.UTF_8
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val out = dec.decode(java.nio.ByteBuffer.wrap(body, off, n)).toString
    UTF8String.fromString(
      if (out.nonEmpty && out.charAt(0) == '\uFEFF') out.substring(1) else out)
  }
}
