package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Eval/codegen parity for HashedBowScore plus the md5-bucket contract
  * the llm_classifier_score oracle recomputes digit-by-digit: bucket =
  * big-endian int of the first two md5 bytes, mod the weight count. */
class HashedBowScoreSpec extends SparkSpec {
  import spark.implicits._

  private val buckets = 4096
  private val weights: Array[Long] =
    Array.tabulate(buckets)(b => (b % 1001L) - 500L)

  private def refBucket(tok: String): Int = {
    // independent recomputation via the hex-digit fold the oracle uses
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
    hex.foldLeft(0)((h, c) => h * 16 + Integer.parseInt(c.toString, 16)) % buckets
  }

  private def refScore(toks: Seq[String]): Long =
    toks.map(t => weights(refBucket(t))).sum

  test("codegen path matches the md5 hex-digit reference fold") {
    val docs = Seq(
      Seq("the", "quick", "brown", "fox"),
      Seq("the", "the", "the"), // repeats count every occurrence
      Seq(""),                  // empty token hashes like any other
      Seq.empty[String])        // empty doc scores 0
    val wcol = expr(
      s"transform(sequence(0, ${buckets - 1}), b -> CAST(b % 1001 - 500 AS BIGINT))")
    val got = docs.toDF("toks")
      .select(HashedBowScore($"toks", wcol).as("s")).as[Long].collect()
    assert(got.toSeq == docs.map(refScore))
  }

  test("interpreted eval agrees with codegen and handles nulls") {
    val toks = ArrayData.toArrayData(
      Array("alpha", "beta", "gamma").map(UTF8String.fromString))
    val w = ArrayData.toArrayData(weights)
    val e = HashedBowScore(Literal(toks, org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType)), Literal(w,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    assert(e.nullSafeEval(toks, w) == refScore(Seq("alpha", "beta", "gamma")))
    // null token inside the array is skipped, not NPE'd
    val withNull = ArrayData.toArrayData(
      Array(UTF8String.fromString("alpha"), null, UTF8String.fromString("beta")))
    assert(e.nullSafeEval(withNull, w) == refScore(Seq("alpha", "beta")))
  }

  test("bucket distribution uses the full table (hashing-trick sanity)") {
    val toks = (0 until 2000).map(i => s"tok$i")
    val hit = toks.map(refBucket).distinct.size
    assert(hit > 1000, s"expected wide bucket coverage, got $hit/$buckets")
  }
}
