package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Degenerate-corpus robustness: the corpus queries must return empty
  * (or well-defined) results on an EMPTY documents table and must not
  * crash on documents with EMPTY text — ANSI mode turns a div-by-zero
  * in a ppm computation into a job failure, so these edges need pinning.
  */
class EmptyCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val queries = Seq("llm_repetition", "llm_zipf_spectrum",
    "llm_mix_weights", "llm_novelty", "llm_decontaminate",
    "llm_dedup_exact", "llm_chunking", "llm_text_stats")

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = Files.createTempDirectory("graft-empty-").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("corpus queries run on an EMPTY documents table") {
    val dir = writeDocs(Seq.empty)
    queries.foreach { name =>
      val n = SparkEntry.queries(name)(spark, dir).count()
      assert(n == 0, s"$name returned $n rows on an empty corpus")
    }
  }

  test("corpus queries tolerate documents with empty text") {
    val dir = writeDocs(Seq(
      (1L, "", "en", "src0", 0L),
      (2L, "   ", "en", "src1", 3L),
      (3L, "some real words here to keep company", "en", "src1", 36L)))
    queries.foreach { name =>
      // must not throw (div-by-zero under ANSI, NPEs on empty arrays)
      try SparkEntry.queries(name)(spark, dir).collect()
      catch { case e: Throwable => fail(s"$name threw: ${e.getMessage.take(200)}") }
    }
  }
}
