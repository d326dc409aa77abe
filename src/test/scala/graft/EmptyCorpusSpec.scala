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

  // every query whose only inputs are the documents/embeddings tables
  private val queries = Seq("llm_repetition", "llm_zipf_spectrum",
    "llm_mix_weights", "llm_novelty", "llm_decontaminate",
    "llm_dedup_exact", "llm_dedup_normalized", "llm_chunking",
    "llm_text_stats", "llm_quality_score", "llm_langid", "llm_top_terms",
    "llm_redact", "llm_text_clean", "llm_shard_pack",
    "llm_sample_deterministic", "llm_pack_sequences",
    "llm_dedup_ngram_jaccard", "llm_dedup_minhash", "llm_dedup_simhash",
    "llm_dedup_levenshtein", "llm_dedup_clusters", "llm_dedup_clusters_mr",
    "llm_curation_pipeline", "llm_dedup_embedding", "llm_ann_topk",
    "llm_embedding_centroids", "llm_classifier_score", "llm_dup_spans",
    "llm_semdedup", "llm_dup_spans_cut", "llm_decontaminate_cut",
    "llm_span_index", "llm_extract_text", "llm_lm_per_lang",
    "llm_classifier_train", "llm_url_normalize", "llm_dedup_paragraph",
    "llm_gopher_rules", "llm_c4_rules", "llm_gopher_rules_cjk",
    "llm_extract_charset", "llm_langid_clf", "llm_unigram_encode",
    "llm_unigram_encode_fast", "llm_curation_scorecard",
    "mm_image_meta", "mm_resize", "mm_frame_sample", "mm_audio_stats",
    "mm_image_phash_pairs")

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = Files.createTempDirectory("graft-empty-").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("corpus queries run on an EMPTY documents table") {
    val dir = writeDocs(Seq.empty)
    // global aggregates legitimately return one all-zero summary row;
    // the classifier trainer always emits its buckets-sized zero model
    val fixedRows = Map("llm_curation_pipeline" -> 1L,
      "llm_classifier_train" -> 512L, "llm_curation_scorecard" -> 1L)
    queries.foreach { name =>
      val n = SparkEntry.queries(name)(spark, dir).count()
      val want = fixedRows.getOrElse(name, 0L)
      assert(n == want, s"$name returned $n rows on an empty corpus")
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
