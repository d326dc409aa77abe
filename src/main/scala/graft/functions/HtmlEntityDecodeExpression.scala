package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass HTML character-reference decode: the full numeric forms
  * `&#dd;` / `&#xhh;` (any Unicode scalar, surrogate-pair encoded
  * above the BMP) plus the common named set — the general decoder the
  * [[graft.llm.Extract]] regexp chain deliberately leaves out (its
  * chained `replace`s stay inside the java.regex∩RE2 subset a DuckDB
  * oracle can replicate; numeric references need real codepoint
  * arithmetic). One codegen'd pass per row, left-to-right, so
  * double-escaped text decodes exactly one level (`&amp;#65;` →
  * `&#65;`, never `A`) and malformed references (no terminating ';',
  * out-of-range codepoints, surrogates) pass through verbatim — the
  * lenient behavior every browser and extractor implements.
  */
case class HtmlEntityDecode(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    HtmlEntityDecode.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlEntityDecode.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlEntityDecode {

  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Longest named entity we recognize ("quot"/"nbsp" = 4) plus the
    * longest numeric body ("x10FFFF" = 7). */
  private val MaxBody = 8

  /** Called from generated code and from nullSafeEval. */
  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(str.length)
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        // Bounded lookahead: a reference body is ≤ MaxBody chars, so a
        // ';' can only matter at positions i+2 .. i+1+MaxBody. An
        // unbounded indexOf would make a ';'-free '&'-run O(n²).
        var semi = -1
        var j = i + 2
        val jMax = math.min(n - 1, i + 1 + MaxBody)
        while (semi < 0 && j <= jMax) {
          if (str.charAt(j) == ';') semi = j
          j += 1
        }
        val decoded =
          if (semi < 0) null
          else {
            val body = str.substring(i + 1, semi)
            if (body.charAt(0) == '#') {
              val cp =
                try {
                  if (body.length > 1 &&
                      (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
                    Integer.parseInt(body.substring(2), 16)
                  else Integer.parseInt(body.substring(1), 10)
                } catch { case _: NumberFormatException => -1 }
              if (cp >= 0 && cp <= 0x10FFFF &&
                  !(cp >= 0xD800 && cp <= 0xDFFF))
                new String(Character.toChars(cp))
              else null
            } else Named.getOrElse(body, null)
          }
        if (decoded == null) { out.append('&'); i += 1 }
        else { out.append(decoded); i = semi + 1 }
      }
    }
    UTF8String.fromString(out.toString)
  }

  def apply(c: Column): Column =
    GraftBridge.column(HtmlEntityDecode(GraftBridge.expression(c)))
}
