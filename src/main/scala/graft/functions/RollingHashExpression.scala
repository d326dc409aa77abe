package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string: fold over UTF-16 code units,
  * h = (h*31 + c) mod 1e9+7 — one codegen'd pass per row.
  *
  * Replaces the pure-Column formulation (split to a char array, filter,
  * transform to code points, aggregate fold), which allocates a per-char
  * array and runs the lambda interpreted. Values are identical
  * (documented contract: fold over code units; reproducible in SQL via a
  * reduce over the char list, see llm_text_stats' oracle).
  */
case class RollingHash(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31L + s.charAt(i).toLong) % 1000000007L; i += 1 }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  /** Called from generated code. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) { h = (h * 31L + str.charAt(i).toLong) % 1000000007L; i += 1 }
    h
  }

  def apply(c: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c)))
}
