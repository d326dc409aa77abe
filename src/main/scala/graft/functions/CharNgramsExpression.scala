package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character 2-5-grams of each word token, with `<`/`>` boundary
  * markers — the fastText feature family (public: Joulin et al. 2017,
  * arXiv:1607.01759 / the langid variant 1612.03651): word-level
  * bag-of-words features misroute SHORT or space-less text because a
  * single unseen word carries no signal, while its character n-grams
  * overlap the training vocabulary's morphology (`<sch`, `ção>`,
  * `ttää`). One regex-free scan per row: tokens come from the SAME
  * [[UnicodeTokens]] scanner the rest of the text stack compiles to,
  * then each token emits its boundary-marked n-grams over CODEPOINTS
  * (so surrogate pairs can't split, and the DuckDB twin's
  * codepoint-based `substr` agrees). Emission order is deterministic:
  * token order, then n ascending, then position ascending — though
  * consumers (the hashed-BoW trainer) only read the multiset.
  * Whole-stage-codegen friendly like the other graft expressions.
  */
case class CharNgrams(child: Expression, minN: Int, maxN: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(minN >= 1 && maxN >= minN, s"bad n-gram range [$minN,$maxN]")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharNgrams.ngrams(input.asInstanceOf[UTF8String], minN, maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharNgrams.ngrams($c, $minN, $maxN)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgrams {

  /** The scanner on plain Strings — shared with any kernel consumer
    * the way [[UnicodeTokens.tokenizeStrings]] is. */
  def ngramStrings(str: String, minN: Int, maxN: Int): Array[String] = {
    val toks = UnicodeTokens.tokenizeStrings(str)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var t = 0
    while (t < toks.length) {
      val w = "<" + toks(t) + ">"
      // codepoint bounds (emoji are surrogate PAIRS in UTF-16):
      // bounds(i) = UTF-16 offset of the i-th codepoint
      val u = w.length
      val bounds = new Array[Int](u + 1)
      var n = 0
      var off = 0
      while (off < u) {
        bounds(n) = off
        off += Character.charCount(w.codePointAt(off))
        n += 1
      }
      bounds(n) = u
      var l = minN
      while (l <= maxN) {
        var i = 0
        while (i + l <= n) {
          out += w.substring(bounds(i), bounds(i + l))
          i += 1
        }
        l += 1
      }
      t += 1
    }
    out.toArray
  }

  /** Called from generated code and from nullSafeEval. */
  def ngrams(s: UTF8String, minN: Int, maxN: Int): ArrayData = {
    val gs = ngramStrings(s.toString, minN, maxN)
    val out = new Array[Any](gs.length)
    var i = 0
    while (i < gs.length) {
      out(i) = UTF8String.fromString(gs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, minN: Int, maxN: Int): Column =
    GraftBridge.column(CharNgrams(GraftBridge.expression(c), minN, maxN))
}
