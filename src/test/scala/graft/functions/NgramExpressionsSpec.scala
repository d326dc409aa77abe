package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NgramExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofPpm(n: Int): org.apache.spark.sql.Column = {
    val grams = s"transform(sequence(0, greatest(size(toks)-$n, 0))," +
      s" i -> concat_ws(' ', slice(toks, i+1, $n)))"
    expr(s"cast(size($grams) - size(array_distinct($grams)) as bigint)" +
      s" * 1000000 div size($grams)")
  }

  test("DupNgramPpm matches the higher-order-function formulation") {
    val docs = Seq(
      "x y x y z",
      "a b c d e f g",
      "spam ham spam ham spam ham",
      "one",
      "a a a a a a a a",
      "tiny doc").toDF("text")
      .select(TextFunctions.tokens(col("text")).as("toks"))
    Seq(1, 2, 3).foreach { n =>
      val got = docs.select(DupNgramPpm(col("toks"), n)).as[Long].collect().toSeq
      val want = docs.select(hofPpm(n)).as[Long].collect().toSeq
      assert(got == want, s"n=$n: $got vs $want")
    }
  }

  test("DupNgramPpm edge cases: empty array, doc shorter than n") {
    val one = Seq(Tuple1(Seq.empty[String]), Tuple1(Seq("a")), Tuple1(Seq("a", "b")))
      .toDF("toks")
    val got = one.select(DupNgramPpm(col("toks"), 3)).as[Long].collect().toSeq
    // empty -> 0; single whole-sequence gram -> 0 dup
    assert(got == Seq(0L, 0L, 0L))
    val rep = Seq(Tuple1(Seq("a", "a", "a", "a"))).toDF("toks")
    // 4 tokens, 1 distinct -> 750000 ppm at n=1
    assert(rep.select(DupNgramPpm(col("toks"), 1)).as[Long].head() == 750000L)
  }

  test("DupNgramPpm matches a plain Scala reference on fuzzed arrays") {
    def ref(toks: Seq[String], n: Int): Long = {
      if (toks.isEmpty) return 0L
      val total = if (toks.length > n) toks.length - n + 1 else 1
      val grams = (0 until total).map(i => toks.slice(i, i + n).mkString(" "))
      (total - grams.distinct.size).toLong * 1000000L / total
    }
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "cc", "dd", "e1", "f2", "gg3")
    val cases = Seq.fill(200)(
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    val df = cases.map(Tuple1(_)).toDF("toks")
    Seq(1, 2, 3, 5).foreach { n =>
      val got = df.select(DupNgramPpm(col("toks"), n)).as[Long].collect().toSeq
      val want = cases.map(ref(_, n))
      assert(got == want, s"n=$n mismatch")
    }
  }

  test("registered SQL function works and stays codegen (no ScalaUDF)") {
    GraftFunctions.registerAll(spark)
    val df = Seq("x y x y z").toDF("text")
      .selectExpr("graft_dup_ngram_ppm(split(trim(text), '\\\\s+'), 2) AS ppm")
    assert(df.as[Long].head() == 250000L)
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
  }
}
