package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram-LM tokenizer (llm.Unigram): hard-EM training over the word
  * histogram, Viterbi encode — expression rendering vs compiled kernel
  * parity (the BpeSpec discipline), deterministic tie-breaks, the
  * model-artifact round trip, and degenerate corpora. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the mat the cat the hat"),
    (3L, "concatenation of the catalog"),
    (4L, "xyz qqq zzz"),
    (5L, "a ab abc abcd abcde")).toDF("doc_id", "text")

  test("viterbi minimizes pieces then maximizes score: frequent short " +
      "words encode as single pieces, rare long words split") {
    val vocab = Unigram.train(corpus, "text")
    val enc = Unigram.encode(corpus, "doc_id", "text", vocab)
      .select($"doc_id", $"n_words", $"n_pieces", $"pieces")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // 'the' recurs 6x: it must be a learned piece — doc 1 has 6 words
    // and 'the' contributes exactly one piece each time
    val d1 = enc(1L)
    assert(d1._2 == 6)
    assert(d1._4.split(" ").count(_ == "the") == 2, d1._4)
    // a 1-char word is always exactly one piece; n_pieces >= n_words
    val d5 = enc(5L)
    assert(d5._4.split(" ").head == "a")
    assert(enc.values.forall(r => r._3 >= r._2))
    // every word re-assembles from its pieces (segmentation is lossless)
    val joined = Unigram.encode(corpus, "doc_id", "text", vocab)
      .select($"doc_id", regexp_replace($"pieces", " ", "").as("glued"))
      .as[(Long, String)].collect().toMap
    val original = corpus.select($"doc_id",
      regexp_replace($"text", " ", "").as("glued"))
      .as[(Long, String)].collect().toMap
    assert(joined == original)
  }

  test("expression rendering and compiled kernel are row-identical on " +
      "adversarial inputs (CJK, punctuation runs, repeats, longs)") {
    val nasty = Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaaaa abababab"),
      (2L, "天气很好 natural 天气"),
      (3L, "!!!??? a.b.c---x"),
      (4L, "supercalifragilisticexpialidocious"),
      (5L, "x xx xxx xxxx xxxxx"),
      (6L, "привет мир привет")).toDF("doc_id", "text")
    val vocab = Unigram.train(nasty, "text")
    val a = Unigram.encode(nasty, "doc_id", "text", vocab)
      .as[(Long, Long, Long, String)].collect().toSet
    val b = Unigram.encodeFast(nasty, "doc_id", "text", vocab)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(a == b, s"chain/kernel divergence:\n${a.diff(b)}\n${b.diff(a)}")
    // CJK words are single codepoints post-tokenizer: one piece each
    val zh = a.find(_._1 == 2L).get
    assert(zh._2 == 7 && zh._4.split(" ").count(_ == "天") == 2)
  }

  test("training and encoding are deterministic across partitionings " +
      "and row orders") {
    val v1 = Unigram.train(corpus, "text")
    val v2 = Unigram.train(
      corpus.repartition(7).sortWithinPartitions(desc("text")), "text")
    assert(v1 == v2)
    val e1 = Unigram.encode(corpus, "doc_id", "text", v1)
      .as[(Long, Long, Long, String)].collect().toSet
    val e2 = Unigram.encode(corpus.repartition(5), "doc_id", "text", v2)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(e1 == e2)
  }

  test("tie-breaks are pinned: equal piece counts prefer the higher " +
      "summed score, exact ties prefer the longer piece at the cut") {
    // vocab: chars a,b (count 1 each), 'ab' count 9, 'bb' count 1.
    // 'abb' = ab+b (score 10) vs a+bb (score 2): both 2 pieces -> ab+b
    val vocab = Seq("a" -> 1L, "ab" -> 9L, "b" -> 1L, "bb" -> 1L)
    val out = Seq((1L, "abb")).toDF("doc_id", "text")
    val viaExpr = Unigram.encode(out, "doc_id", "text", vocab)
      .select($"pieces").as[String].head()
    assert(viaExpr == "ab b")
    // exact tie: vocab where 'ab'+'b' and 'a'+'bb' tie on score 5 ->
    // the LONGER piece at the decision point wins: dp(3) prefers the
    // l=2 candidate 'bb'? No: candidates at the final position are
    // compared longest-last with >= replacement, so l=2 ('bb', via
    // dp(1)='a') replaces l=1 ('b', via dp(2)='ab') on equality.
    val tied = Seq("a" -> 4L, "ab" -> 4L, "b" -> 1L, "bb" -> 1L)
    val viaExpr2 = Unigram.encode(out, "doc_id", "text", tied)
      .select($"pieces").as[String].head()
    val viaKernel2 = Unigram.encodeFast(out, "doc_id", "text", tied)
      .select($"pieces").as[String].head()
    assert(viaExpr2 == viaKernel2)
    assert(viaExpr2 == "a bb", viaExpr2)
  }

  test("vocabulary persists and reloads bit-identically; encode via " +
      "the reloaded artifact matches") {
    val vocab = Unigram.train(corpus, "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-unigram-").toString + "/vocab"
    Unigram.saveVocab(spark, vocab, dir)
    val re = Unigram.loadVocab(spark, dir)
    assert(re == vocab)
    val a = Unigram.encode(corpus, "doc_id", "text", vocab)
      .as[(Long, Long, Long, String)].collect().toSet
    val b = Unigram.encodeFast(corpus, "doc_id", "text", re)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(a == b)
  }

  test("unseen characters never strand the dp: encoding a corpus " +
      "DISJOINT from the training corpus emits unknown chars as their " +
      "own pieces, expression and kernel row-identical") {
    // train on plain ASCII; encode text whose characters (emoji, CJK,
    // Cyrillic, novel punctuation) never appeared in training — the
    // train-once/encode-many path where the 'single chars always in
    // vocab' guarantee does NOT hold
    val vocab = Unigram.train(corpus, "text")
    assert(!vocab.exists(_._1 == "好"))
    val fresh = Seq(
      (1L, "天气很好"),                  // space-less CJK, all unseen
      (2L, "héllo wörld ¿qué?"),    // accented latin + ¿
      (3L, "mix the cat 好 mix"),        // seen words + one unseen char
      (4L, "😀😀"),  // emoji (surrogate pairs)
      (5L, "пример текст")).toDF("doc_id", "text")
    val a = Unigram.encode(fresh, "doc_id", "text", vocab)
      .as[(Long, Long, Long, String)].collect().toSet
    val b = Unigram.encodeFast(fresh, "doc_id", "text", vocab)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(a == b, s"chain/kernel divergence:\n${a.diff(b)}\n${b.diff(a)}")
    // nothing null or empty; segmentation stays lossless
    assert(a.forall(r => r._4 != null && r._4.nonEmpty))
    val glued = a.map(r => r._1 -> r._4.replace(" ", "")).toMap
    val orig = fresh.select($"doc_id",
      regexp_replace($"text", " ", "").as("g"))
      .as[(Long, String)].collect().toMap
    assert(glued == orig)
    // an all-unseen word segments as one piece per character
    val zh = a.find(_._1 == 1L).get
    assert(zh._4.split(" ").length == zh._3.toInt)
    // seen words still encode with the learned pieces
    val mixed = a.find(_._1 == 3L).get
    assert(mixed._4.split(" ").contains("the"))
  }

  test("degenerate corpora: empty corpus trains an empty vocabulary " +
      "and encodes to zero rows; empty-text docs vanish like Bpe") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val v = Unigram.train(empty, "text")
    assert(v.isEmpty)
    assert(Unigram.encode(empty, "doc_id", "text", v).count() == 0)
    val blanks = Seq((1L, ""), (2L, "   "), (3L, "ok then")).toDF(
      "doc_id", "text")
    val vb = Unigram.train(blanks, "text")
    val out = Unigram.encode(blanks, "doc_id", "text", vb)
      .select($"doc_id").as[Long].collect().toSet
    assert(out == Set(3L))
  }

  test("seedVocab's union legs share ONE aggregation exchange (the " +
      "one-collect form relies on reuse, not a persist)") {
    // r15 dropped the persist + second collect on the claim that the
    // union's legs reuse the substring-histogram aggregation exchange;
    // the r15 advisor flagged that claim as unverified (AQE replanning
    // could diverge the legs and silently run the corpus-scale pass
    // twice). Pin it: collect through the SAME Dataset (clones leave
    // isFinalPlan=false) and demand a ReusedExchange/ReusedQueryStage
    // in the FINAL plan.
    val hist = Unigram.histogram(corpus, "text")
    val frame = Unigram.seedVocabFrame(hist)
    frame.collect()
    val plan = frame.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("ReusedExchange") ||
      plan.contains("ReusedQueryStage") ||
      plan.contains("TableCacheQueryStage"),
      s"no exchange reuse in the final plan:\n$plan")
  }
}
