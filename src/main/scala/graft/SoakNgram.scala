package graft

import org.apache.spark.sql.functions._

/** Scale soak for the prefix-filtered exact jaccard join
  * ([[graft.llm.Dedup.ngramJaccardPairs]]) under its documented worst
  * case: a STOP-SHINGLE corpus where every document shares a header
  * phrase, so the header's shingles occur in 100% of docs. Before
  * prefix filtering that made one inverted-index bucket quadratic in
  * the corpus (the hazard VERDICT r4/r5 carried); with prefix
  * filtering the stop-shingles sort last by document frequency, fall
  * outside every prefix, and never feed the join. This soak measures
  * that claim at corpus sizes where the quadratic bucket would be
  * ~n^2/2 candidate pairs (200k docs -> 2e10 pairs, an unrunnable
  * join), and cross-checks the pair yield against the corpus
  * construction.
  *
  * {{{ runMain graft.SoakNgram [nDocs] [groupSize] }}}
  *
  * Corpus shape (Column-generated): `nDocs/groupSize` families; within
  * a family docs differ in one of 30 body tokens (3-gram jaccard ~0.81
  * with `groupSize`=5 variants), and EVERY doc starts with the same
  * 8-token header — 10 universal 3-gram stop-shingles per doc. Expected
  * pairs at threshold 0.7: families x C(groupSize, 2).
  */
object SoakNgram {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val group = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-ngram-").toString

    // 8-token header shared by EVERY doc + 29 family tokens + 1 variant
    // token: header 3-grams have df = n (the stop-shingle hazard), the
    // family body keeps within-family jaccard ~0.81 >= 0.7 and
    // cross-family jaccard ~0.
    spark.range(n).selectExpr("id AS doc_id",
      s"""concat_ws(' ',
         |  'the quick brown fox jumps over the lazy',
         |  concat_ws(' ', transform(sequence(1, 29),
         |    i -> concat('w', pmod(hash((id DIV $group) * 131 + i), 50000)))),
         |  concat('v', CAST(id % $group AS STRING))
         |) AS text""".stripMargin)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")

    val t0 = System.nanoTime()
    val pairs = graft.llm.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.7)
    val nPairs = pairs.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val expected = (n / group) * (group.toLong * (group - 1) / 2)

    println(s"""{"soak":"ngram","n_docs":$n,"group":$group,""" +
      s""""pairs":$nPairs,"expected_pairs":$expected,""" +
      s""""exact":${nPairs == expected},"sec":${f"$sec%.1f"}}""")
    spark.stop()
  }
}
