package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Feature-hashed bag-of-words linear score: for each token, hash it into
  * one of `weights.length` buckets (first two bytes of its MD5, mod the
  * bucket count — the standard "hashing trick") and sum the bucket
  * weights. One codegen'd pass per row; the weight vector is typically a
  * constant-folded literal array (a trained linear model's coefficients),
  * so classifier inference over a 100-TB corpus is a map-only scan with
  * no shuffle and no model-serving round trips.
  *
  * This is the inference step of the fastText-style quality filters used
  * by public corpus pipelines (CCNet-style quality scoring): training
  * happens offline; the engine's job is scoring every document at scan
  * speed. MD5 (not a JVM-private hash) keeps bucket assignment exact and
  * reproducible in ANSI SQL — the llm_classifier_score oracle recomputes
  * it from md5 hex digits.
  *
  * Empty token arrays score 0; a null tokens or weights array yields null.
  */
case class HashedBowScore(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(LongType))
  override def dataType: DataType = LongType

  override def nullSafeEval(toks: Any, weights: Any): Any =
    java.lang.Long.valueOf(HashedBowScore.score(
      toks.asInstanceOf[ArrayData], weights.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) => s"graft.functions.HashedBowScore.score($t, $w)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HashedBowScore {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Bucket of one token: big-endian int of md5(token)[0..1], mod
    * `buckets`. Equals folding the first 4 hex digits of md5 hex —
    * the SQL-reproducible contract. */
  def bucket(tokenUtf8: Array[Byte], buckets: Int): Int = {
    val md = digests.get()
    md.reset()
    val h = md.digest(tokenUtf8)
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % buckets
  }

  /** Called from generated code and from nullSafeEval. */
  def score(toks: ArrayData, weights: ArrayData): Long = {
    val buckets = weights.numElements()
    require(buckets > 0, "HashedBowScore needs a non-empty weight vector")
    var s = 0L
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      val tok = toks.getUTF8String(i)
      if (tok != null) s += weights.getLong(bucket(tok.getBytes, buckets))
      i += 1
    }
    s
  }

  def apply(toks: Column, weights: Column): Column =
    GraftBridge.column(HashedBowScore(
      GraftBridge.expression(toks), GraftBridge.expression(weights)))
}
