package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("tokenCount handles empty, single and multi-token strings") {
    val cases = Seq("" -> 0, "one" -> 1, "a b c" -> 3, "  padded   out  " -> 2)
    cases.foreach { case (s, want) =>
      val got = one(s).select(TextFunctions.tokenCount($"text")).as[Int].head()
      assert(got == want, s"'$s' -> $got, want $want")
    }
  }

  test("lexTokenCount splits words, numbers and punctuation") {
    val got = one("ab12 cd, x!").select(TextFunctions.lexTokenCount($"text")).as[Int].head()
    // ab, 12, cd, ',', x, '!'
    assert(got == 6)
  }

  test("wordShingles produces distinct n-grams; short docs yield one shingle") {
    val got = one("a b c d").select(TextFunctions.wordShingles($"text", 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = one("a b").select(TextFunctions.wordShingles($"text", 3)).as[Seq[String]].head()
    assert(short == Seq("a b"))
    val repeated = one("x y x y x y x y").select(TextFunctions.wordShingles($"text", 2))
      .as[Seq[String]].head()
    assert(repeated.toSet == Set("x y", "y x"))
  }

  test("wordNgrams keeps repeats in order; repetition ppm math is exact") {
    val got = one("x y x y z").select(TextFunctions.wordNgrams($"text", 2))
      .as[Seq[String]].head()
    assert(got == Seq("x y", "y x", "x y", "y z"))
    // dup fraction of those 2-grams: 4 grams, 3 distinct -> 250000 ppm
    val ppm = one("x y x y z")
      .select(TextFunctions.wordNgrams($"text", 2).as("g2"))
      .select(expr("cast(size(g2) - size(array_distinct(g2)) as bigint)" +
        " * 1000000 div size(g2)"))
      .as[Long].head()
    assert(ppm == 250000L)
  }

  test("fingerprint is deterministic, order-sensitive, and matches a reference fold") {
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => Math.floorMod(h * 31 + c.toLong, 1000000007L))
    Seq("", "a", "ab", "ba", "the quick brown fox").foreach { s =>
      val got = one(s).select(TextFunctions.fingerprint($"text")).as[Long].head()
      assert(got == ref(s), s"'$s'")
    }
    assert(ref("ab") != ref("ba"))
  }

  test("langId picks the language with most stopword hits, zh by CJK ratio") {
    val cases = Seq(
      "the cat and the dog is in the house" -> "en",
      "der hund und die katze ist nicht hier" -> "de",
      "le chat est dans la maison pour le moment" -> "fr",
      "el gato es una mascota en la casa" -> "es",
      "qqq zzz www" -> "unknown")
    cases.foreach { case (s, want) =>
      val got = one(s).select(TextFunctions.langId($"text")).as[String].head()
      assert(got == want, s"'$s' -> $got")
    }
  }

  test("qualityScore is in [0,1] and ranks clean text above junk") {
    val clean = "The quick brown fox jumps over the lazy dog and runs to the forest with great speed today."
    val junk = "!!!! ???? ,,,, ;;;; x !!!! ???? ,,,, x ;;;;"
    val scores = Seq(clean, junk).map(s =>
      one(s).select(TextFunctions.qualityScore($"text")).as[Double].head())
    scores.foreach(s => assert(s >= 0.0 && s <= 1.0))
    assert(scores.head > scores(1))
  }

  test("UnicodeTokens scanner is byte-identical to the UTokenPattern " +
      "regexp on adversarial inputs (codegen, interpreted, and kernel)") {
    val cases = Seq(
      "", " ", "\t\n\f\r", "plain english words here",
      "  padded   out  ", "tab\tand\nnewline splits",
      "今天天气很好", "mixed 中文 and english 词",
      "中x中", "ภาษาไทยไม่มีช่องว่าง", "ひらがなカタカナ混在",
      "edge中", "中edge", "astral 😀😀 pair", "punct!!! runs???",
      "　ideographic space is NOT a separator　",
      "a" * 500 + "中" + "b" * 500)
    val df = cases.map(Tuple1(_)).toDF("t")
    val viaExpr = df.select(UnicodeTokens($"t")).as[Seq[String]].collect()
    val viaRegex = df.select(regexp_extract_all($"t",
      lit(TextFunctions.UTokenPattern), lit(0))).as[Seq[String]].collect()
    viaExpr.zip(viaRegex).zip(cases).foreach { case ((a, b), c) =>
      assert(a == b, s"'${c.take(40)}': scanner $a != regexp $b")
    }
    // interpreted eval (filter predicate path) agrees with codegen
    cases.foreach { c =>
      val direct = UnicodeTokens
        .tokenizeStrings(c).toSeq
      val viaKernelPath = UnicodeTokens.tokenize(
        org.apache.spark.unsafe.types.UTF8String.fromString(c))
      assert(viaKernelPath.numElements() == direct.size)
    }
  }

  test("charNgrams emits boundary-marked 2-5-grams per token over " +
      "CODEPOINTS; column and kernel agree; degenerate inputs hold") {
    // one ASCII token: all grams of '<cat>' lengths 2..5
    val g1 = CharNgrams.ngramStrings("cat", 2, 5).toSeq
    assert(g1 == Seq("<c", "ca", "at", "t>",
      "<ca", "cat", "at>", "<cat", "cat>", "<cat>"), g1)
    // CJK chars are separate tokens -> '<天>' grams only (len 3 < 4)
    val g2 = CharNgrams.ngramStrings("天气", 2, 5).toSeq
    assert(g2 == Seq("<天", "天>", "<天>", "<气", "气>", "<气>"), g2)
    // surrogate pairs count as ONE codepoint: '<😀>' has 3 codepoints
    val g3 = CharNgrams.ngramStrings("😀", 2, 5).toSeq
    assert(g3 == Seq("<😀", "😀>", "<😀>"), g3)
    assert(g3.forall(g => !g.exists(Character.isHighSurrogate) ||
      g.codePoints().toArray.forall(Character.isValidCodePoint)))
    // empty / whitespace-only: no tokens, no grams
    assert(CharNgrams.ngramStrings("", 2, 5).isEmpty)
    assert(CharNgrams.ngramStrings("  \t", 2, 5).isEmpty)
    // the Column rendering matches the kernel on a mixed corpus
    val cases = Seq("hello world", "天气 ok", "😀 mix", "")
    val viaCol = cases.map(Tuple1(_)).toDF("t")
      .select(TextFunctions.charNgrams($"t")).as[Seq[String]].collect()
    viaCol.zip(cases).foreach { case (a, c) =>
      assert(a == CharNgrams.ngramStrings(c, 2, 5).toSeq, c)
    }
  }
}
