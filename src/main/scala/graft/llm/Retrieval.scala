package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval: BM25-shaped scoring over an inverted-index
  * join — the lexical complement to the dense ANN paths in [[Similarity]]
  * (a training-data pipeline uses both: dense for near-dup/semantic
  * clustering, sparse for benchmark decontamination and targeted corpus
  * search).
  *
  * Scoring is INTEGER-EXACT on purpose: the classic BM25 idf
  * `ln((N - df + 0.5) / (df + 0.5))` is replaced by its Robertson raw
  * odds in parts-per-million — `idf_ppm = (2N - 2df + 1) * 1e6 div
  * (2df + 1)` — and the tf saturation `tf / (tf + k1)` by
  * `tf * 1e6 div (tf + 2)` (k1 = 2, b = 0). Same monotonicity in df and
  * tf as BM25, but every intermediate is a 64-bit integer, so the score
  * is bit-identical across engines and row orders and the whole operator
  * stays DuckDB-oracle-checkable (float scoring would hash-mismatch on
  * summation order). Length normalization (b > 0) is deliberately
  * omitted from the exact form; a production deployment that wants it
  * flips the score expression to doubles — the plan shape is unchanged.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the query term set is tiny next to the corpus, so it is
  *    BROADCAST; corpus tokens are semi-joined against it BEFORE any
  *    aggregation — the only rows that ever shuffle are postings of
  *    terms some query actually uses;
  *  - df for those terms is exact (df counts every document containing
  *    the term, and restricting to query terms first loses nothing);
  *  - final ranking runs through [[graft.plans.TopKPerKey]], whose
  *    partial phase caps per-query candidates map-side before the
  *    exchange.
  * A standing query workload would persist the (term, df) statistics
  * and the postings as an index artifact instead of recomputing —
  * the same build-once/query-many split as [[Similarity.ivfBuildIndex]].
  *
  * Reference analog: the reference has no retrieval operator; this is
  * part of the LLM-data extension surface (SURVEY.md "LLM-data
  * extension").
  */
object Retrieval {

  /** Tokenize `textCol` exactly like the rest of the text stack: split
    * on single spaces, drop empties. */
  private def tokens(df: DataFrame, id: String, textCol: String) =
    df.select(col(id), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")

  /** Top-`k` documents per query under integer-exact BM25-shaped
    * scoring.
    *
    * @param docs    corpus with `doc_id` and `text`
    * @param queries query set with `query_id` and `qtext` (tokenized
    *                with the same rules as the corpus)
    * @return (query_id, doc_id, score_ppm, rnk) with rnk 1..k per query,
    *         ties broken by ascending doc_id
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // distinct query terms: the broadcast driver of every downstream prune
    val qTerms = tokens(queries, "query_id", "qtext").distinct()
    val qTermSet = qTerms.select(col("term")).distinct()

    // corpus postings RESTRICTED to query terms before the tf aggregate:
    // the broadcast semi-join drops non-matching tokens at the scan, so
    // the (doc_id, term) shuffle carries only useful postings
    val postings = tokens(docs, "doc_id", "text")
      .join(broadcast(qTermSet), "term")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // exact document frequency per (query-relevant) term + corpus size,
    // both kept lazy: N arrives via a broadcast 1-row cross join, not a
    // driver-side count
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n"))

    val scored = qTerms
      .join(postings, "term")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(nDocs))
      // idf in ppm, tf saturation in permille: the asymmetric scales keep
      // the product within int64 out to N ≈ 1.3e9 documents (idf_ppm ≤
      // 2N*1e6/3 at df=1; × 1e3 < 2^63)
      .withColumn("contrib_ppm", expr(
        "(((2 * n - 2 * df + 1) * 1000000) div (2 * df + 1))" +
          " * ((tf * 1000) div (tf + 2)) div 1000"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib_ppm")).as("score_ppm"))

    graft.plans.TopKPerKey(scored,
      keys = Seq(col("query_id")),
      order = Seq(col("score_ppm").desc, col("doc_id").asc),
      k = k, rankName = "rnk")
  }
}
