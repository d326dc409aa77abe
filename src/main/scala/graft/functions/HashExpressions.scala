package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Whole-stage-codegen forms of the engine's hashing kernels — the same
  * static-call pattern as [[DupNgramPpm]]: each expression compiles to a
  * primitive call on [[HashKernels]] from generated code, so the ncopy
  * replica-placement and simhash paths run unboxed instead of through
  * per-row Scala UDFs (one boxed `java.lang.Long` + closure dispatch per
  * row — the one place those paths contradicted the codegen-where-hot
  * standard; semantics are bit-identical to the UDFs they replace, so
  * the DuckDB oracles of op_replicator_ncopy / q28_kmv_distinct /
  * llm_dedup_simhash pin the rewrite).
  */
case class Mix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashFunctions.mix64(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.mix64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Lamping–Veach jump consistent hash of a long key into [0, numBuckets)
  * (reference pkg/util/hash/jump_hash.go:6-17). */
case class JumpHash(child: Expression, numBuckets: Int) extends UnaryExpression {
  require(numBuckets > 0, "numBuckets must be positive")
  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(
      HashFunctions.jumpHash(input.asInstanceOf[Long], numBuckets))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.jumpHash($c, $numBuckets)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `n` distinct replica buckets for a long key (successive salted jump
  * hashes, first-seen order) — the replicator `ncopy` placement kernel. */
case class ReplicaBuckets(child: Expression, n: Int, numBuckets: Int)
    extends UnaryExpression {
  require(n > 0 && numBuckets > 0, "n and numBuckets must be positive")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.replicaBuckets(input.asInstanceOf[Long], n, numBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.replicaBuckets($c, $n, $numBuckets)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array (token multiplicity = weight). */
case class SimHash64(child: Expression, seed: Long) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      HashKernels.simhash(input.asInstanceOf[ArrayData], seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash($c, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static kernels called from generated code (and from the interpreted
  * `nullSafeEval` paths above) — a top-level object so the Java static
  * forwarders are unambiguous. */
object HashKernels {
  def mix64(x: Long): Long = HashFunctions.mix64(x)

  def jumpHash(key: Long, numBuckets: Int): Int =
    HashFunctions.jumpHash(key, numBuckets)

  /** First-seen-order distinct buckets — identical to the LinkedHashSet
    * fold in [[HashFunctions.replicaBuckets]], allocated flat. */
  def replicaBuckets(key: Long, n: Int, numBuckets: Int): ArrayData = {
    val want = math.min(n, numBuckets)
    val out = new Array[Int](want)
    var size = 0
    var salt = 0L
    while (size < want) {
      val b = HashFunctions.jumpHash(
        HashFunctions.mix64(key ^ HashFunctions.mix64(salt)), numBuckets)
      var i = 0
      var dup = false
      while (i < size) { if (out(i) == b) dup = true; i += 1 }
      if (!dup) { out(size) = b; size += 1 }
      salt += 1
    }
    new GenericArrayData(out)
  }

  /** Single-pass 64-bit SimHash; per-token hash is the code-point fold of
    * [[HashFunctions.hashString]] (oracle-pinned). */
  def simhash(tokens: ArrayData, seed: Long): Long = {
    val votes = new Array[Int](64)
    val nTok = tokens.numElements()
    var t = 0
    while (t < nTok) {
      val h = HashFunctions.hashString(tokens.getUTF8String(t).toString, seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}
