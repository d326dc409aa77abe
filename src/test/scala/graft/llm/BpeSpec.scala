package graft.llm

import graft.SparkSpec

/** BPE training + encoding against the classic hand-computable example
  * (Sennrich et al.'s low/lower/newest/widest corpus): merge choices,
  * tie-breaks, greedy overlap semantics, and encode composition are all
  * independent pencil-and-paper answers. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // low x5, lower x2, newest x6, widest x3
  private def corpus = Seq(
    (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
    (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
  ).toDF("doc_id", "text")

  test("trainMerges reproduces the hand-derived merge sequence with tie-breaks") {
    // pair counts round 1: es 9, st 9 (tie -> 'e s' < 's t'), then est 9,
    // then lo 7 ties ow 7 -> 'l o', then 'lo w' 7
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("encode applies merges in rank order: lowest -> low est") {
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 4)
    val got = Bpe.encode(Seq((9L, "lowest")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((9L, 1L, 2L, "low est")))
  }

  test("greedy left-to-right non-overlap: aaa under merge (a,a) -> aa a") {
    val got = Bpe.encode(Seq((1L, "aaa aaaa")).toDF("doc_id", "text"),
        "doc_id", "text", Seq(("a", "a")))
      .as[(Long, Long, Long, String)].collect().toSeq
    // aaa -> aa a ; aaaa -> aa aa ; chained merge (aa,aa) would need rank 2
    assert(got == Seq((1L, 2L, 4L, "aa a aa aa")))
  }

  test("later merges consume earlier merges' output") {
    val got = Bpe.encode(Seq((1L, "aaaa")).toDF("doc_id", "text"),
        "doc_id", "text", Seq(("a", "a"), ("aa", "aa")))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 1L, 1L, "aaaa")))
  }

  test("word order is preserved and words never merge across boundaries") {
    val merges = Seq(("w", "x"))
    val got = Bpe.encode(Seq((1L, "wx x w wx")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 4L, 4L, "wx x w wx")))
  }

  test("encodeFast kernel is row-identical to the replace-chain encode") {
    // adversarial corpus: repeated-char runs (overlap semantics), words
    // that are prefixes of others, and random material — trained merges
    // applied by both encoders must agree exactly
    val rng = new scala.util.Random(41)
    val alphabet = "abcde"
    def word(): String =
      Seq.fill(2 + rng.nextInt(8))(alphabet(rng.nextInt(alphabet.length))).mkString
    val docs = ((0L until 30L).map(i =>
      (i, Seq.fill(12)(word()).mkString(" "))) ++ Seq(
      (100L, "aaaa aaa aa a aaaaaaa"),
      (101L, "ab aba abab ababab ba bab"),
      (102L, "edcba abcde deed")
    )).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 12)
    assert(merges.size == 12)
    val slow = Bpe.encode(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long, String)].collect().toSet
    val fast = Bpe.encodeFast(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(fast == slow)
    assert(slow.size == 33)
  }

  test("training stops early when the vocabulary is fully merged") {
    val merges = Bpe.trainMerges(Seq((1L, "ab ab")).toDF("doc_id", "text"),
      "text", numMerges = 10)
    assert(merges == Seq(("a", "b"))) // one pair exists; then nothing
  }

  // ---- driver-local incremental trainer vs the distributed loop ------

  private def histOf(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions._
    df.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
  }

  test("driver trainer == distributed trainer on the Sennrich corpus (tie-breaks)") {
    val dist = Bpe.trainMergesDistributed(histOf(corpus), numMerges = 4)
    val local = Bpe.trainMerges(corpus, "text", numMerges = 4) // driver path
    assert(local == dist)
    assert(local == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("driver trainer == distributed trainer on an adversarial corpus, deep") {
    // repeated-char runs (overlap counting + non-overlapping rewrite),
    // shared prefixes, skewed frequencies — 40 merges deep so the
    // incremental pair-count maintenance is exercised well past the
    // first rewrites
    val rng = new scala.util.Random(97)
    val alphabet = "abcd"
    def word(): String =
      Seq.fill(2 + rng.nextInt(9))(alphabet(rng.nextInt(alphabet.length))).mkString
    val docs = ((0L until 40L).map(i =>
      (i, Seq.fill(10)(word()).mkString(" "))) ++ Seq(
      (100L, "aaaaaa aaaa aa a"),
      (101L, "abab ababab ba bab abba"),
      (102L, "dcba abcd ddcc ccdd")
    )).toDF("doc_id", "text")
    val dist = Bpe.trainMergesDistributed(histOf(docs), numMerges = 40)
    val local = Bpe.trainMerges(docs, "text", numMerges = 40)
    assert(local == dist)
    assert(local.size == 40)
  }

  test("past-budget dispatch falls back to the distributed trainer") {
    // driverBudget = 1 cannot hold the histogram -> the distributed
    // loop must produce the same merges the driver path does
    val viaFallback = Bpe.trainMerges(corpus, "text", numMerges = 4,
      driverBudget = 1)
    assert(viaFallback == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("driver trainer early-stops when the vocabulary is fully merged") {
    val merges = Bpe.trainMergesLocal(Seq(("ab", 2L)), numMerges = 10)
    assert(merges == Seq(("a", "b")))
  }

  test("encodeFast preserves non-numeric ids (no silent cast)") {
    val docs = Seq(("doc-a", "lowest low"), ("doc-b", "newest"))
      .toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"))
    val fast = Bpe.encodeFast(docs, "doc_id", "text", merges)
      .as[(String, Long, Long, String)].collect().toSet
    val slow = Bpe.encode(docs, "doc_id", "text", merges)
      .as[(String, Long, Long, String)].collect().toSet
    assert(fast == slow)
    assert(fast.map(_._1) == Set("doc-a", "doc-b"))
  }

  // ---- GPT-2-style pre-tokenization ------------------------------------

  /** Pre-tokens of one string through the Spark column path. */
  private def preToksOf(s: String): Seq[String] = {
    import org.apache.spark.sql.functions._
    Seq(Tuple1(s)).toDF("text")
      .select(explode(graft.llm.Bpe.preTokens(col("text"))).as("t"))
      .as[String].collect().toSeq
  }

  test("pre-tokenizer: contractions, leading spaces, digit and punct runs") {
    // contraction splits off; the space before 'world' attaches as Ġ
    assert(preToksOf("don't stop") == Seq("don", "'t", "Ġstop"))
    assert(preToksOf("hello world") == Seq("hello", "Ġworld"))
    // digit runs split from letters; punctuation runs split from both
    assert(preToksOf("abc123 x!?") == Seq("abc", "123", "Ġx", "!?"))
    // whitespace runs beyond the claimed leading space drop (documented
    // divergence from the exact GPT-2 pattern: no lookahead in RE2)
    assert(preToksOf("a  b") == Seq("a", "Ġb"))
    // leading punctuation without a word: one punct run
    assert(preToksOf("'hello") == Seq("'", "hello"))
  }

  test("pre-tokenized train+encode: merges learn over Ġ-marked tokens") {
    val docs = Seq((1L, "the cat the cat"), (2L, "the dog"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMergesPre(docs, "text", numMerges = 30)
    // the leading space is part of the alphabet: some learned piece
    // must carry Ġ (' the' repeats, bare 'the' appears once per doc)
    assert(merges.exists { case (l, r) => (l + r).contains("Ġ") })
    val enc = Bpe.encodePre(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._4)).toMap
    // doc 1 pre-tokens: the, Ġcat, Ġthe, Ġcat -> 4 "words"; with 30
    // merges on this tiny corpus every token collapses to one piece
    assert(enc(1L)._1 == 4L)
    assert(enc(1L)._2 == "the Ġcat Ġthe Ġcat")
    assert(enc(2L)._2 == "the Ġdog")
  }

  test("encodeFastPre kernel is row-identical to the pre replace chain") {
    val docs = Seq(
      (1L, "don't stop believing"),
      (2L, "it's 1999, let's go!"),
      (3L, "  spaced   out  "),
      (4L, "")
    ).toDF("doc_id", "text")
    val merges = Bpe.trainMergesPre(docs, "text", numMerges = 12)
    val slow = Bpe.encodePre(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long, String)].collect().toSet
    val fast = Bpe.encodeFastPre(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(fast == slow && slow.nonEmpty)
  }
}
