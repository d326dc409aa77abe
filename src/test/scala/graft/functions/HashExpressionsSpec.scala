package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData

import graft.SparkSpec

/** Eval/codegen parity for the codegen hash expressions that replaced the
  * per-row Scala UDFs on the ncopy/kmv/simhash paths — the same contract
  * NearestCellsFloat's parity spec pins: the generated-code path (exercised
  * through a DataFrame select) and the interpreted `nullSafeEval` path must
  * agree with each other and with the plain-JVM reference functions. */
class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val keys: Seq[Long] =
    (1L to 300L).map(HashFunctions.mix64) ++
      Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue)

  test("Mix64 / JumpHash / ReplicaBuckets codegen match the JVM functions") {
    val rows = keys.toDF("k")
      .select($"k",
        HashFunctions.mix64Col($"k").as("m"),
        HashFunctions.jumpHashCol($"k", 16).as("j"),
        HashFunctions.replicaBucketsCol($"k", 3, 8).as("r"))
      .as[(Long, Long, Int, Seq[Int])].collect()
    assert(rows.length == keys.length)
    rows.foreach { case (k, m, j, r) =>
      assert(m == HashFunctions.mix64(k), s"mix64($k)")
      assert(j == HashFunctions.jumpHash(k, 16), s"jumpHash($k)")
      assert(r == HashFunctions.replicaBuckets(k, 3, 8), s"replicaBuckets($k)")
    }
  }

  test("Mix64 / JumpHash / ReplicaBuckets interpreted eval agrees with codegen") {
    keys.foreach { k =>
      assert(Mix64(Literal(k)).nullSafeEval(k) == HashFunctions.mix64(k))
      assert(JumpHash(Literal(k), 16).nullSafeEval(k) ==
        HashFunctions.jumpHash(k, 16))
      val arr = ReplicaBuckets(Literal(k), 3, 8).nullSafeEval(k)
        .asInstanceOf[ArrayData].toIntArray().toSeq
      assert(arr == HashFunctions.replicaBuckets(k, 3, 8))
    }
  }

  test("SimHash64 codegen and eval match, and near-identical docs stay close") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "completely different content about spark engines")
    val toks = docs.map(_.split(" ").toSeq)
    val got = toks.toDF("toks")
      .select(HashFunctions.simhashUdf()($"toks").as("sig"))
      .as[Long].collect()
    // eval parity via the static kernel the interpreted path calls
    val expected = toks.map(t =>
      HashKernels.simhash(ArrayData.toArrayData(
        t.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray), 11L))
    assert(got.toSeq == expected)
    // SimHash locality: one-token edit flips few bits; unrelated docs many
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(got(0), got(1)) <= 16, s"near-dup hamming ${ham(got(0), got(1))}")
    assert(ham(got(0), got(2)) > 16, s"distinct hamming ${ham(got(0), got(2))}")
  }

  test("ShingleHashes / MinHashSigLongs / BandKeys match a plain-JVM reference fold") {
    val docs = Seq(
      Seq("a", "b", "c", "d", "e", "b", "c", "d"), // overlapping window, dup shingle
      Seq("x", "y"),                               // shorter than n -> one shingle
      Seq.empty[String])                           // empty -> one seed-only shingle
    val n = 3; val k = 8
    // reference fold, straight from the documented semantics
    def refShingles(toks: Seq[String]): Seq[Long] = {
      val th = toks.map(HashFunctions.hashString(_, 7L))
      val out = scala.collection.mutable.LinkedHashSet.empty[Long]
      if (th.length < n) {
        var h = HashFunctions.mix64(7L + 0x5eedL)
        th.foreach(t => h = HashFunctions.mix64(h ^ t))
        out += h
      } else for (i <- 0 to th.length - n) {
        var h = HashFunctions.mix64(7L + 0x5eedL)
        (i until i + n).foreach(j => h = HashFunctions.mix64(h ^ th(j)))
        out += h
      }
      out.toSeq
    }
    def refSig(sh: Seq[Long]): Seq[Long] =
      (0 until k).map(i => (sh.map(s => HashFunctions.mix64(
        HashFunctions.mix64(s ^ HashFunctions.mix64(7L)) ^ HashFunctions.mix64(i.toLong)))
        :+ Long.MaxValue).min)
    def refBands(sig: Seq[Long]): Seq[Long] =
      (0 until 4).map { b =>
        var h = HashFunctions.mix64(b.toLong + 0x5151L)
        (b * 2 until math.min(b * 2 + 2, sig.length)).foreach(i =>
          h = HashFunctions.mix64(h ^ sig(i)))
        h
      }
    val got = docs.toDF("toks").select(
      HashFunctions.shingleHashes(n)($"toks").as("sh"),
      HashFunctions.minhashSigLongs(k)(HashFunctions.shingleHashes(n)($"toks")).as("sig"),
      HashFunctions.bandKeys(4, 2)(
        HashFunctions.minhashSigLongs(k)(HashFunctions.shingleHashes(n)($"toks"))).as("bk"))
      .as[(Seq[Long], Seq[Long], Seq[Long])].collect()
    docs.zip(got).foreach { case (toks, (sh, sig, bk)) =>
      val esh = refShingles(toks)
      assert(sh == esh, s"shingles of $toks")
      assert(sig == refSig(esh), s"signature of $toks")
      assert(bk == refBands(refSig(esh)), s"band keys of $toks")
    }
  }

  test("WindowHashes is positional: same fold as ShingleHashes, no dedup") {
    val docs = Seq(
      Seq("a", "b", "c", "d", "e", "b", "c", "d"), // repeated window content
      Seq("a", "b", "c", "a", "b", "c"),           // identical windows at 0 and 3
      Seq("x", "y"),                               // shorter than n -> EMPTY (no fallback)
      Seq.empty[String])
    val n = 3
    def refWindows(toks: Seq[String]): Seq[Long] = {
      val th = toks.map(HashFunctions.hashString(_, 7L))
      if (th.length < n) Seq.empty
      else (0 to th.length - n).map { i =>
        var h = HashFunctions.mix64(7L + 0x5eedL)
        (i until i + n).foreach(j => h = HashFunctions.mix64(h ^ th(j)))
        h
      }
    }
    val got = docs.toDF("toks")
      .select(HashFunctions.windowHashes(n)($"toks").as("w"))
      .as[Seq[Long]].collect()
    docs.zip(got).foreach { case (toks, w) =>
      assert(w == refWindows(toks), s"windows of $toks")
      assert(w.length == math.max(toks.length - n + 1, 0).min(
        if (toks.length < n) 0 else toks.length - n + 1), s"length for $toks")
    }
    // positional contract: identical window content hashes identically
    val w2 = refWindows(Seq("a", "b", "c", "a", "b", "c"))
    assert(w2(0) == w2(3) && w2.distinct.length < w2.length)
  }

  test("HyperplaneSig codegen matches the documented projection fold") {
    val vecs = Seq(Seq(1.0f, -2.0f, 0.5f), Seq(0.0f, 0.0f, 0.0f))
    def ref(v: Seq[Float], bits: Int, seed: Long): Long = {
      var sig = 0L
      for (b <- 0 until bits) {
        var proj = 0.0
        for (j <- v.indices) {
          val sign = if ((HashFunctions.mix64(seed ^ HashFunctions.mix64(
            b.toLong * 131071L + j)) & 1L) == 0L) 1.0 else -1.0
          proj += v(j) * sign
        }
        if (proj >= 0.0) sig |= (1L << b)
      }
      sig
    }
    val got = vecs.toDF("v")
      .select(HashFunctions.hyperplaneSig(12)($"v")).as[Long].collect()
    assert(got.toSeq == vecs.map(ref(_, 12, 42L)))
  }

  test("input types are declared: the analyzer casts compatible columns") {
    // these are public Column APIs — an int column into Mix64 or an
    // array<double> into HyperplaneSig must be cast by the analyzer
    // (ImplicitCastInputTypes), not silently mis-read at runtime
    val ints = Seq(1, 2, -7).toDF("i")
      .select(HashFunctions.mix64Col($"i").as("m")).as[Long].collect()
    assert(ints.toSeq == Seq(1, 2, -7).map(i => HashFunctions.mix64(i.toLong)))

    val doubles = Seq(Seq(1.0, -2.0, 0.5)).toDF("v")
      .select(HashFunctions.hyperplaneSig(12)($"v")).as[Long].collect()
    val floats = Seq(Seq(1.0f, -2.0f, 0.5f)).toDF("v")
      .select(HashFunctions.hyperplaneSig(12)($"v")).as[Long].collect()
    assert(doubles.toSeq == floats.toSeq)
  }

  test("input types are declared: incompatible columns fail at analysis") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Seq("not", "a", "long")).toDF("a")
        .select(HashFunctions.mix64Col($"a")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("mix64") ||
      err.getMessage.toLowerCase.contains("data type mismatch"), err.getMessage)
  }

  test("the hash expressions stay inside whole-stage codegen (no UDF nodes)") {
    // spark.range: a codegen leaf the optimizer cannot constant-fold away
    val df = spark.range(1000).select(
      HashFunctions.mix64Col($"id"),
      HashFunctions.jumpHashCol($"id", 16),
      HashFunctions.replicaBucketsCol($"id", 3, 8))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
    // `*(n)` is the executedPlan toString marker for a WholeStageCodegen
    // stage; the Project carrying the hash expressions must be inside one
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("mix64")),
      plan)
  }
}
