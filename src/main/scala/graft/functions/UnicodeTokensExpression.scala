package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-aware tokenization as ONE regex-free scan: the exact
  * semantics of `regexp_extract_all(text, UTokenPattern)` — each
  * CJK/Thai codepoint ([[TextFunctions.CjkCharClass]]) is its own
  * token, maximal runs of any other non-whitespace characters are one
  * token, whitespace is `\s` ASCII — compiled to a hand-written
  * character scanner instead of an NFA alternation. The round-14
  * bench measured the regexp form costing 1.3–2.3× on every
  * token-heavy query (tokenization IS the hot loop of the classifier,
  * zipf, chunking, LM and BPE paths at 100 TB); this expression
  * restores the pre-Unicode cost while keeping the CJK semantics,
  * and a spec pins byte-identical output against the regexp form on
  * adversarial inputs. One codegen'd static call per row — stays
  * inside whole-stage codegen like the other graft expressions.
  */
case class UnicodeTokens(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    UnicodeTokens.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeTokens.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeTokens {

  /** Java `\s`: the ASCII whitespace class regexes use by default —
    * NOT Character.isWhitespace, which adds Unicode spaces the regexp
    * form deliberately does not treat as separators. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
      c == '\f' || c == '\r'

  /** [[TextFunctions.CjkCharClass]] as range checks — all BMP, so
    * char-level comparison is codepoint-exact (astral chars are
    * surrogate pairs outside every range and fall into runs, exactly
    * like the regexp's negated class). */
  @inline private def isCjk(c: Char): Boolean =
    (c >= 0x4e00 && c <= 0x9fff) || (c >= 0x3040 && c <= 0x30ff) ||
      (c >= 0x3400 && c <= 0x4dbf) || (c >= 0xf900 && c <= 0xfaff) ||
      (c >= 0x0e00 && c <= 0x0e7f)

  /** The scanner on plain Strings — shared by the expression and the
    * BPE/Unigram mapPartitions kernels (the kernels previously
    * re-compiled [[TextFunctions.UTokenPattern]] per partition; using
    * the same scanner makes chain==kernel token parity true by
    * construction AND drops the per-row NFA cost there too). */
  def tokenizeStrings(str: String): Array[String] = {
    val n = str.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (isWs(c)) i += 1
      else if (isCjk(c)) {
        out += String.valueOf(c)
        i += 1
      } else {
        val start = i
        var j = i
        var stop = false
        while (j < n && !stop) {
          val cj = str.charAt(j)
          if (isWs(cj) || isCjk(cj)) stop = true else j += 1
        }
        out += str.substring(start, j)
        i = j
      }
    }
    out.toArray
  }

  /** Called from generated code and from nullSafeEval. */
  def tokenize(s: UTF8String): ArrayData = {
    val toks = tokenizeStrings(s.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = UTF8String.fromString(toks(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column =
    GraftBridge.column(UnicodeTokens(GraftBridge.expression(c)))
}
