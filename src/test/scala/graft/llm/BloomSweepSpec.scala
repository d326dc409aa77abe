package graft.llm

import graft.SparkSpec

/** [[Dedup.contaminationBloomSweep]]: the Bloom prefilter must be
  * invisible in the results (no false negatives + exact verify), across
  * filter sizes from generous to adversarially tiny. */
class BloomSweepSpec extends SparkSpec {
  import spark.implicits._

  // 12-token docs; shingle n = 4. d1 shares its full window set with the
  // eval doc e0 (9 shared 4-grams), d2 shares exactly 2, d3 none.
  private val e0 = (1 to 12).map(i => s"e$i").mkString(" ")
  private val d2 = ((1 to 5).map(i => s"e$i") ++ (1 to 7).map(i => s"u$i")).mkString(" ")
  private lazy val docs = Seq(
    (0L, "eval", e0),
    (1L, "train", e0),
    (2L, "train", d2),
    (3L, "train", (1 to 12).map(i => s"x$i").mkString(" ")))
    .toDF("doc_id", "source", "text")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Boolean)] =
    df.select($"doc_id", $"shared_ngrams", $"contaminated")
      .as[(Long, Long, Boolean)].collect().toSet

  // d1: 12-4+1 = 9 shared windows; d2: windows at offsets 0,1 are all-e
  // prefixes of e0's first 5 tokens -> 'e1 e2 e3 e4' and 'e2 e3 e4 e5'
  private val expected = Set((1L, 9L, true), (2L, 2L, false))

  test("bloom-pruned sweep matches the exact sweep result") {
    val got = rows(Dedup.contaminationBloomSweep(docs, "doc_id", "text",
      "source", "eval", n = 4, minShared = 3L))
    assert(got == expected)
  }

  test("an adversarially tiny filter (dense false positives) stays exact") {
    // 64 bits for dozens of shingles: most probes collide, the verify
    // join must throw every false positive back out
    val got = rows(Dedup.contaminationBloomSweep(docs, "doc_id", "text",
      "source", "eval", n = 4, minShared = 3L,
      estimatedEvalItems = 4L, numBits = 64L))
    assert(got == expected)
  }

  test("empty eval source yields an empty sweep, not an error") {
    val got = rows(Dedup.contaminationBloomSweep(docs, "doc_id", "text",
      "source", "no_such_source", n = 4, minShared = 3L))
    assert(got.isEmpty)
  }

  test("threshold edge: minShared equal to the shared count contaminates") {
    val got = rows(Dedup.contaminationBloomSweep(docs, "doc_id", "text",
      "source", "eval", n = 4, minShared = 2L))
    assert(got == Set((1L, 9L, true), (2L, 2L, true)))
  }
}
