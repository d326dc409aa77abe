package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType, StringType}

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
case class Mix64(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
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
case class JumpHash(child: Expression, numBuckets: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  require(numBuckets > 0, "numBuckets must be positive")
  override def inputTypes: Seq[DataType] = Seq(LongType)
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
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n > 0 && numBuckets > 0, "n and numBuckets must be positive")
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.replicaBuckets(input.asInstanceOf[Long], n, numBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.replicaBuckets($c, $n, $numBuckets)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct hashed word n-gram shingles straight from a token array —
  * the first stage of the MinHash/LSH dedup path (no shingle strings are
  * ever materialized; shorter-than-n docs hash their full sequence). */
case class ShingleHashes(child: Expression, n: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, "shingle size must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.shingleHashes(input.asInstanceOf[ArrayData], n, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.shingleHashes($c, $n, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature (k permutation minima in one pass) over pre-hashed
  * shingles (array<long>). */
case class MinHashSigLongs(child: Expression, k: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1, "signature length must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashSigLongs(input.asInstanceOf[ArrayData], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.minhashSigLongs($c, $k, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** LSH band keys: hash of each contiguous band of `rowsPerBand`
  * signature entries. */
case class BandKeys(child: Expression, numBands: Int, rowsPerBand: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(numBands >= 1 && rowsPerBand >= 1, "band shape must be positive")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.bandKeys(input.asInstanceOf[ArrayData], numBands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.bandKeys($c, $numBands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane signature of an `array<float>` embedding: `bits`
  * sign bits packed into a long (hyperplane components deterministic
  * +-1 from splitmix64(seed, bit, dim)). */
case class HyperplaneSig(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      HashKernels.hyperplaneSig(input.asInstanceOf[ArrayData], bits, seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.hyperplaneSig($c, $bits, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array (token multiplicity = weight). */
case class SimHash64(child: Expression, seed: Long) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
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
/** Per-POSITION hashed token windows (no dedup, no fallback): element i
  * is the hash of tokens[i..i+n-1], array length = size-n+1 (empty for
  * shorter docs). The positional sibling of [[ShingleHashes]] — feeds
  * span-level operators (llm_dup_spans) where position identity matters,
  * so downstream shuffles move 8-byte keys instead of window strings. */
case class WindowHashes(child: Expression, n: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, "window size must be >= 1")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.windowHashes(input.asInstanceOf[ArrayData], n, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.windowHashes($c, $n, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

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

  /** Per-position window hashes — same per-window fold as
    * [[shingleHashes]] (hashString per token, mix64-chained combine) but
    * positional: no dedup, no short-doc fallback. */
  def windowHashes(tokens: ArrayData, n: Int, seed: Long): ArrayData = {
    val nTok = tokens.numElements()
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      th(i) = HashFunctions.hashString(tokens.getUTF8String(i).toString, seed)
      i += 1
    }
    val out = new Array[Long](nTok - n + 1)
    i = 0
    while (i + n <= nTok) {
      var h = HashFunctions.mix64(seed + 0x5eedL)
      var j = i
      while (j < i + n) { h = HashFunctions.mix64(h ^ th(j)); j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct rolling-window shingle hashes, first-seen order — identical
    * fold to the former UDF (oracle-pinned): per-token
    * [[HashFunctions.hashString]], n-window mix64 combine, whole-sequence
    * fallback for shorter-than-n docs. */
  def shingleHashes(tokens: ArrayData, n: Int, seed: Long): ArrayData = {
    val nTok = tokens.numElements()
    val th = new Array[Long](nTok)
    var i = 0
    while (i < nTok) {
      th(i) = HashFunctions.hashString(tokens.getUTF8String(i).toString, seed)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (nTok < n) {
      var h = HashFunctions.mix64(seed + 0x5eedL)
      i = 0
      while (i < nTok) { h = HashFunctions.mix64(h ^ th(i)); i += 1 }
      seen.add(h)
    } else {
      i = 0
      while (i + n <= nTok) {
        var h = HashFunctions.mix64(seed + 0x5eedL)
        var j = i
        while (j < i + n) { h = HashFunctions.mix64(h ^ th(j)); j += 1 }
        seen.add(h)
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** k permutation minima in one pass over pre-hashed shingles. */
  def minhashSigLongs(shingles: ArrayData, k: Int, seed: Long): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    // the per-index mixers are shingle-independent: hoist them per row
    val mixi = new Array[Long](k)
    var i = 0
    while (i < k) { mixi(i) = HashFunctions.mix64(i.toLong); i += 1 }
    val seedMix = HashFunctions.mix64(seed)
    val ns = shingles.numElements()
    var s = 0
    while (s < ns) {
      val base = HashFunctions.mix64(shingles.getLong(s) ^ seedMix)
      i = 0
      while (i < k) {
        val h = HashFunctions.mix64(base ^ mixi(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }

  /** Band keys from a minhash signature. */
  def bandKeys(sig: ArrayData, numBands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](numBands)
    val len = sig.numElements()
    var b = 0
    while (b < numBands) {
      var h = HashFunctions.mix64(b.toLong + 0x5151L)
      var i = b * rowsPerBand
      val end = math.min(i + rowsPerBand, len)
      while (i < end) { h = HashFunctions.mix64(h ^ sig.getLong(i)); i += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Packed sign bits of deterministic-hyperplane projections; the
    * accumulation order and float-to-double widening match the former
    * UDF exactly (oracle-pinned via llm_ann_lsh). */
  def hyperplaneSig(vec: ArrayData, bits: Int, seed: Long): Long = {
    val d = vec.numElements()
    var sig = 0L
    var b = 0
    while (b < bits) {
      var proj = 0.0
      var j = 0
      while (j < d) {
        val sign =
          if ((HashFunctions.mix64(seed ^ HashFunctions.mix64(b.toLong * 131071L + j)) & 1L) == 0L) 1.0
          else -1.0
        proj += vec.getFloat(j) * sign
        j += 1
      }
      if (proj >= 0.0) sig |= (1L << b)
      b += 1
    }
    sig
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
