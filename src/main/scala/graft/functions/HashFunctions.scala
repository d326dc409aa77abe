package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._

/** Hashing utilities: jump consistent hash (replica placement), MinHash,
  * SimHash, and random-hyperplane LSH.
  *
  * Jump hash implements the Lamping–Veach algorithm ("A Fast, Minimal
  * Memory, Consistent Hash Algorithm", arXiv:1406.2294) which the reference
  * exposes at pkg/util/hash/jump_hash.go:6-17 for its (unimplemented)
  * `ncopy` replicator mode.
  *
  * Every hot-path hash — mix64, jumpHash, replica placement, shingle
  * hashing, minhash signatures, band keys, simhash, hyperplane
  * signatures — is a codegen Catalyst expression (HashExpressions.scala)
  * computing the whole signature in ONE pass over the input array from
  * generated code, no per-row UDF boxing. (The pure-Column alternative
  * needs k independent `aggregate` folds, which re-traverses the array k
  * times and blows past the JIT/codegen method-size limits for k=64 —
  * measured slower.) Signatures use an internal splitmix64 mixer, so
  * they are deterministic across executors/runs with zero broadcast
  * state.
  */
object HashFunctions {

  /** splitmix64 finalizer — fast, well-mixed 64-bit hash step. */
  @inline def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Deterministic 64-bit hash of a string with a salt. Folds UNICODE
    * CODE POINTS, not UTF-16 code units — external engines index strings
    * by code point (DuckDB substr/unicode), so the SQL oracles reproduce
    * this fold exactly even for supplementary-plane characters, which a
    * per-char fold would hash as two surrogates. */
  def hashString(s: String, salt: Long): Long = {
    var h = mix64(salt)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = mix64(h ^ cp.toLong)
      i += Character.charCount(cp)
    }
    h
  }

  /** Pure-JVM jump consistent hash: maps key to a bucket in [0, n). */
  def jumpHash(key: Long, numBuckets: Int): Int = {
    require(numBuckets > 0)
    var k = key
    var b = -1L
    var j = 0L
    while (j < numBuckets) {
      b = j
      k = k * 2862933555777941757L + 1
      // (b+1) * (2^31 / (highest 31 bits of k + 1))
      j = ((b + 1) * (0x80000000L.toDouble / ((k >>> 33) + 1).toDouble)).toLong
    }
    b.toInt
  }

  /** `n` distinct replica buckets for a key over `numBuckets` slots:
    * successive salted jump hashes, de-duplicated — deterministic placement
    * for the replicator's `ncopy` mode. */
  def replicaBuckets(key: Long, n: Int, numBuckets: Int): Seq[Int] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[Int]
    var salt = 0L
    val want = math.min(n, numBuckets)
    while (out.size < want) {
      out += jumpHash(mix64(key ^ mix64(salt)), numBuckets)
      salt += 1
    }
    out.toSeq
  }

  /** Column form of mix64 (key: long column): a codegen [[Mix64]]
    * expression — Column arithmetic would trip ANSI overflow checking on
    * the wrapping multiplies, and the former Scala UDF boxed a Long per
    * row on the ncopy/kmv hot paths. */
  def mix64Col(key: Column): Column =
    GraftBridge.column(Mix64(GraftBridge.expression(key)))

  /** Column form of jumpHash (key: long column), codegen'd. */
  def jumpHashCol(key: Column, numBuckets: Int): Column =
    GraftBridge.column(JumpHash(GraftBridge.expression(key), numBuckets))

  /** Column form of replicaBuckets, codegen'd (the ncopy placement). */
  def replicaBucketsCol(key: Column, n: Int, numBuckets: Int): Column =
    GraftBridge.column(ReplicaBuckets(GraftBridge.expression(key), n, numBuckets))

  /** Distinct hashed word n-gram shingles straight from a token array:
    * each token is hashed once, then an n-window rolling combine yields
    * the shingle identity — no shingle strings are ever materialized.
    * (The Column-expression shingle path allocates slice+concat per
    * shingle in interpreted HOFs; measured as the LSH dedup bottleneck.)
    * Shorter-than-n docs hash their full token sequence (parity with
    * TextFunctions.wordShingles). Codegen [[ShingleHashes]] expression. */
  def shingleHashes(n: Int, seed: Long = 7L): Column => Column =
    (c: Column) => GraftBridge.column(ShingleHashes(GraftBridge.expression(c), n, seed))

  /** Per-position hashed token windows (no dedup) — codegen
    * [[WindowHashes]]; see its scaladoc for the positional contract. */
  def windowHashes(n: Int, seed: Long = 7L): Column => Column =
    (c: Column) => GraftBridge.column(WindowHashes(GraftBridge.expression(c), n, seed))

  /** MinHash signature over PRE-HASHED shingles (array<long>): k
    * permutation minima in one pass, codegen [[MinHashSigLongs]]. */
  def minhashSigLongs(k: Int, seed: Long = 7L): Column => Column =
    (c: Column) => GraftBridge.column(MinHashSigLongs(GraftBridge.expression(c), k, seed))

  /** LSH band keys from a minhash signature: hash of each contiguous band
    * of `rowsPerBand` signature entries → array<long> of numBands keys,
    * codegen [[BandKeys]]. */
  def bandKeys(numBands: Int, rowsPerBand: Int): Column => Column =
    (c: Column) => GraftBridge.column(BandKeys(GraftBridge.expression(c), numBands, rowsPerBand))

  /** 64-bit SimHash over a token array (token multiplicity = weight),
    * single pass — the codegen [[SimHash64]] expression (name kept from
    * its UDF predecessor so call sites read unchanged). */
  def simhashUdf(seed: Long = 11L): Column => Column =
    (c: Column) => GraftBridge.column(SimHash64(GraftBridge.expression(c), seed))

  /** Random-hyperplane signature of an embedding: `bits` sign bits packed
    * into a long; hyperplane components are deterministic +-1 from
    * splitmix64(seed, bit, dim). Single pass per row, codegen
    * [[HyperplaneSig]]. */
  def hyperplaneSig(bits: Int, seed: Long = 42L): Column => Column =
    (c: Column) => GraftBridge.column(HyperplaneSig(GraftBridge.expression(c), bits, seed))

  /** Hamming distance between two long signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
