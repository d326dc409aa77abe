package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Dedup

/** Streaming admission against the persisted LSH index: micro-batches
  * dedup against everything EVER admitted (index on disk), plus
  * intra-batch min-id-first admission. Assertions are family-based and
  * order-agnostic across batches (the file source's batch order is an
  * implementation detail). */
class StreamingIndexDedupSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(29)
  private val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho")

  private def doc(len: Int): String =
    Seq.fill(len)(vocab(rng.nextInt(vocab.length))).mkString(" ")

  private def variant(text: String): String = {
    val t = text.split(" "); t(t.length / 2) = "CHANGED"; t.mkString(" ")
  }

  test("admission drops index dups, cross-batch dups, and intra-batch later ids") {
    val idx = java.nio.file.Files.createTempDirectory("graft-sid-idx-").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft-sid-src-").toString

    val corpus = (0L until 10L).map(i => (i, doc(60)))
    Dedup.lshBuildIndex(corpus.toDF("doc_id", "text"), "text", "doc_id", idx)

    val freshA = doc(60) // admitted once across batches
    val freshB = doc(60) // exact-copy family across batches
    val freshC = doc(60) // intra-batch near-dup family
    val batches = Seq(
      Seq((100L, variant(corpus.head._2)), // dup of the pre-built index
          (101L, freshA)),
      Seq((200L, variant(freshA)),         // cross-batch dup of 101's family
          (201L, freshB)),
      Seq((300L, freshB),                  // exact cross-batch copy of 201
          (301L, freshC),
          (302L, variant(freshC))))        // intra-batch near-dup of 301
    batches.foreach { b =>
      b.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(srcDir)
    }

    val schema = spark.read.parquet(srcDir).schema
    val src = Streams.fileSource(spark, srcDir, schema, maxFilesPerTrigger = Some(1))
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    StreamingIndexDedup.run(src, "text", "doc_id", idx, threshold = 0.5,
      (adm, _) => admitted ++= adm.select("doc_id").as[Long].collect())

    val got = admitted.toSet
    // near-dup of the pre-built index: never admitted
    assert(!got.contains(100L))
    // one representative per cross-batch family, whichever batch ran first
    assert(Seq(101L, 200L).count(got) == 1)
    assert(Seq(201L, 300L).count(got) == 1)
    // intra-batch: the min id wins deterministically
    assert(got.contains(301L) && !got.contains(302L))
    assert(got.size == 3)

    // the index now holds corpus + admitted: re-matching an admitted
    // doc's variant hits the appended entries
    val probeSrc = if (got.contains(101L)) freshA else variant(freshA)
    val probe = Dedup.lshIndexMatches(
      Seq((9000L, variant(probeSrc))).toDF("doc_id", "text"),
      "text", "doc_id", idx, threshold = 0.5)
    assert(probe.count() >= 1)

    // NATURAL redelivery idempotence: replay the ENTIRE drained stream
    // (fresh checkpoint, same files) — every replayed doc matches
    // itself in the index at jaccard 1.0, so nothing is admitted and
    // the index is unchanged
    val sizeBefore = spark.read.parquet(
      graft.llm.GenDir.live(spark, s"$idx/shingles")).count()
    val src2 = Streams.fileSource(spark, srcDir, schema,
      maxFilesPerTrigger = Some(1))
    val replayed = scala.collection.mutable.ArrayBuffer.empty[Long]
    StreamingIndexDedup.run(src2, "text", "doc_id", idx, threshold = 0.5,
      (adm, _) => replayed ++= adm.select("doc_id").as[Long].collect())
    assert(replayed.isEmpty, s"replay admitted: $replayed")
    assert(spark.read.parquet(
      graft.llm.GenDir.live(spark, s"$idx/shingles")).count() == sizeBefore)
  }
}
