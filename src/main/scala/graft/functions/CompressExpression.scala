package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Codegen'd body compression (the round-1 opening from SURVEY §7.3's
  * "defer until profiling demands" list): the UDF form costs a
  * ScalaUDF interpreted-call boundary per row — encoder conversion,
  * closure dispatch, and a WholeStageCodegen break. These expressions
  * keep the codec call inside the generated code as a direct static
  * call on the raw byte[], so a compress stage fuses with the
  * surrounding projection. The byte work still dominates for large
  * bodies; the win is per-row overhead and unbroken codegen spans for
  * the many-small-message shape the reference was built around.
  */
case class CompressCodec(child: Expression, codec: String, level: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any =
    graft.operators.Compressor.compressStatic(
      input.asInstanceOf[Array[Byte]], codec, level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.operators.Compressor.compressStatic($c, "$codec", $level)""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Inverse of [[CompressCodec]]; undecodable input yields null (the
  * caller maps that to the INVALID dead-letter status, reference
  * semantics). The generated code catches codec exceptions in place. */
case class DecompressCodec(child: Expression, codec: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    try graft.operators.Compressor.decompressStatic(
      input.asInstanceOf[Array[Byte]], codec)
    catch { case _: Exception => null }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      try {
        ${ev.value} = graft.operators.Compressor.decompressStatic($c, "$codec");
      } catch (Exception e) {
        ${ev.isNull} = true;
      }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CompressCodec {
  def apply(c: Column, codec: String, level: Int): Column =
    GraftBridge.column(
      CompressCodec(GraftBridge.expression(c.cast("binary")), codec, level))
}

object DecompressCodec {
  def apply(c: Column, codec: String): Column =
    GraftBridge.column(
      DecompressCodec(GraftBridge.expression(c.cast("binary")), codec))
}
