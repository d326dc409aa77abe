package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Duplicate-n-gram fraction of a token array in exact ppm —
  * `(grams - distinct_grams) * 1000000 div grams` — as ONE codegen'd
  * pass (a static call from generated code, same pattern as
  * [[CompressCodec]]/[[RollingHash]]).
  *
  * Replaces the higher-order-function formulation
  * (`transform(sequence(...), i -> concat_ws(' ', slice(toks,...)))` +
  * `array_distinct`), which runs interpreted and materializes every
  * n-gram array twice per reference. Semantics are bit-identical to that
  * formulation (and to the DuckDB oracle of llm_repetition): a document
  * shorter than n tokens contributes a single whole-sequence gram; an
  * empty token array yields 0.
  */
case class DupNgramPpm(child: Expression, n: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  require(n >= 1, "n-gram size must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(DupNgramPpm.ppm(input.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DupNgramPpm.ppm($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DupNgramPpm {
  /** Called from generated code. */
  def ppm(arr: ArrayData, n: Int): Long = {
    val t = arr.numElements()
    if (t == 0) return 0L
    val total = if (t > n) t - n + 1 else 1
    val seen = new java.util.HashSet[UTF8String](total * 2)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < total) {
      val end = math.min(i + n, t)
      val gram =
        if (n == 1) arr.getUTF8String(i)
        else {
          val parts = new Array[UTF8String](end - i)
          var j = i
          while (j < end) { parts(j - i) = arr.getUTF8String(j); j += 1 }
          UTF8String.concatWs(sep, parts: _*)
        }
      seen.add(gram)
      i += 1
    }
    (total - seen.size).toLong * 1000000L / total
  }

  def apply(c: Column, n: Int): Column =
    GraftBridge.column(DupNgramPpm(GraftBridge.expression(c), n))
}
