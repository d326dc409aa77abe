package graft.llm

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization (Sennrich et al. 2016; the GPT-2
  * tokenizer's training shape): learn merge rules from the corpus, then
  * encode documents with them — the REAL form of the "BPE-ish" token
  * counting a training-data pipeline needs (vocabulary sizing, token
  * budgets, piece statistics).
  *
  * The scale structure mirrors production BPE trainers (HuggingFace
  * `tokenizers` trains on word counts, not raw text):
  *  - ONE corpus pass builds the word-frequency HISTOGRAM — after that
  *    the corpus is never touched again; training cost is bounded by
  *    the distinct-word vocabulary, not corpus size;
  *  - each merge iteration is one small distributed aggregation over
  *    the histogram (adjacent-pair counts weighted by word frequency;
  *    winner = max count, ties broken by pair text ascending — fully
  *    deterministic), followed by a literal string rewrite of the
  *    piece sequences. The histogram is localCheckpoint'ed per
  *    iteration so lineage stays flat across hundreds of merges;
  *  - encoding is a chain of literal `replace` expressions (one per
  *    merge) over per-word padded piece strings — pure Catalyst string
  *    expressions, no UDF, broadcast-free (the merge table rides the
  *    plan as literals). Applying merges in rank order with
  *    left-to-right non-overlapping replacement is the classic
  *    reference BPE encoder, and `replace`'s semantics match it
  *    exactly in both Spark and DuckDB — which is what makes the whole
  *    train+encode loop oracle-checkable (llm_bpe_encode unrolls the
  *    training iterations as MATERIALIZED CTEs, the k-means-oracle
  *    discipline).
  *
  * Pieces never cross word boundaries (words are padded ' c h a r s '
  * and merged within their own string), the standard word-level BPE
  * contract.
  */
object Bpe {

  private def wordsOf(textCol: String) =
    explode(split(col(textCol), " ")).as("w")

  /** Piece-boundary separator (u0001, written `|` below). Each piece
    * is wrapped in its OWN separators -- `|c||h||a||r||s|` for a 5-char
    * word -- and a merge of (l, r) rewrites `|l||r|` -> `|lr|`. Because
    * adjacent matches share no boundary character, left-to-right
    * non-overlapping replacement merges a run like `a a a a` into
    * `aa aa` -- the true greedy BPE pass. (A single shared separator --
    * ` l r ` -> ` lr ` -- silently consumes the boundary and breaks
    * runs to `aa a a`; caught by BpeSpec's overlap pin.) The wrapper
    * also blocks prefix confusion: `|l||r|` cannot match a following
    * piece that merely STARTS with r. */
  private[llm] val Sep = "\u0001"

  /** `|c||h||a||r||s|` — the padded piece string of a word, the
    * canonical representation merges rewrite. */
  private val padded =
    concat(lit(Sep), concat_ws(Sep + Sep, split(col("w"), "")), lit(Sep))

  /** Train `numMerges` merge rules over `docs`. Returns merges in rank
    * order as (left, right) piece pairs. Deterministic: winner per
    * round = (weighted count desc, pair text asc). Stops early when no
    * pair remains (vocabulary fully merged). */
  def trainMerges(docs: DataFrame, textCol: String,
                  numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 1)
    var hist = docs.select(wordsOf(textCol))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("freq"), padded.as("s"))
      .localCheckpoint(true)
    val merges = mutable.Buffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      val top = hist
        .select(col("freq"), split(trim(col("s"), Sep), Sep + Sep).as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(a) - 1)," +
            " i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))")).as("pr"))
        .groupBy(col("pr")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pr").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val Array(l, r) = top(0).getString(0).split(" ", 2)
        merges += ((l, r))
        hist = hist
          .withColumn("s", replace(col("s"),
            lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep)))
          .localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** The merge chain as a column expression over a padded piece
    * string: rank-ordered literal replaces (the reference slow-encoder
    * semantics — left-to-right, non-overlapping, later merges see
    * earlier merges' output). */
  private def applyMerges(c: org.apache.spark.sql.Column,
                          merges: Seq[(String, String)]) =
    merges.foldLeft(c) { case (acc, (l, r)) =>
      replace(acc, lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep))
    }

  /** Encode documents with trained merges: per doc, every word's piece
    * sequence in order. Output: (idCol, n_words, n_pieces, pieces) with
    * `pieces` the space-joined concatenation over words. One explode +
    * one grouped fold — the merge chain itself is projection-only. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    words
      // back to human form: inner piece boundaries (doubled separator)
      // become spaces, the outer wrappers trim away
      .withColumn("p",
        trim(replace(applyMerges(padded, merges), lit(Sep + Sep), lit(" ")), Sep))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(size(split(col("p"), " "))).as("n_pieces"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("p")))),
          x => x.getField("p")), " ").as("pieces"))
  }

  /** Train-then-encode in one call — the llm_bpe_encode query shape. */
  def trainEncode(docs: DataFrame, idCol: String, textCol: String,
                  numMerges: Int): DataFrame =
    encode(docs, idCol, textCol, trainMerges(docs, textCol, numMerges))

  /** Pieces of one text value as a space-joined string — the ROW-WISE
    * form for pipeline actors (each message annotated independently, no
    * grouping). The per-word merge chain runs inside HOF lambdas, which
    * Catalyst interprets rather than codegens — fine at per-message
    * actor granularity; bulk jobs use [[encode]]'s explode+group plan. */
  def piecesColumn(text: org.apache.spark.sql.Column,
                   merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val perWord = (w: org.apache.spark.sql.Column) =>
      trim(replace(applyMerges(
        concat(lit(Sep), concat_ws(Sep + Sep, split(w, "")), lit(Sep)), merges),
        lit(Sep + Sep), lit(" ")), Sep)
    array_join(transform(filter(split(text, " "), w => w =!= ""), perWord), " ")
  }

  /** [[encode]] with a rank-lookup KERNEL instead of the replace
    * chain — the bulk path for production-size merge tables: the chain
    * costs O(merges × word length) per word (fine at tens of merges,
    * linear-in-vocabulary at thousands), while the kernel repeatedly
    * merges the lowest-rank adjacent pair present, O(word length ×
    * passes) with a broadcast hash lookup per pair — the reference
    * GPT-2 `bpe()` loop. Row-identical to [[encode]] BY CONSTRUCTION:
    * a learned pair's constituents always predate it in the vocabulary,
    * so exhaustive rank-order application (what the replace chain does)
    * and repeated min-rank application converge to the same pieces —
    * BpeSpec pins the parity on adversarial inputs. */
  def encodeFast(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rankBc = spark.sparkContext.broadcast((
      merges.zipWithIndex.map { case ((l, r), i) => (l, r) -> i }.toMap,
      merges.toArray))
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val (rank, mergeArr) = rankBc.value
        def encodeWord(w: String): mutable.ArrayBuffer[String] = {
          val pieces = mutable.ArrayBuffer.tabulate(w.length)(i => w.substring(i, i + 1))
          var continue = pieces.length >= 2
          while (continue) {
            // lowest-rank adjacent pair present
            var best = Int.MaxValue
            var i = 0
            while (i < pieces.length - 1) {
              rank.get((pieces(i), pieces(i + 1))).foreach(r => if (r < best) best = r)
              i += 1
            }
            if (best == Int.MaxValue) continue = false
            else {
              // merge ALL its occurrences, left-to-right non-overlapping
              val (l, r) = mergeArr(best)
              var j = 0
              while (j < pieces.length - 1) {
                if (pieces(j) == l && pieces(j + 1) == r) {
                  pieces(j) = l + r
                  pieces.remove(j + 1)
                }
                j += 1
              }
              continue = pieces.length >= 2
            }
          }
          pieces
        }
        it.map { case (id, text) =>
          val words = text.split(" ").filter(_.nonEmpty)
          var nPieces = 0L
          val sb = new StringBuilder
          words.foreach { w =>
            val ps = encodeWord(w)
            nPieces += ps.length
            if (sb.nonEmpty) sb.append(' ')
            sb.append(ps.mkString(" "))
          }
          (id, words.length.toLong, nPieces, sb.toString)
        }
      }
      .toDF(idCol, "n_words", "n_pieces", "pieces")
      .filter(col("n_words") > 0) // encode's explode drops all-empty docs too
  }

  /** Persist a trained merge table (rank order preserved) — the model
    * artifact a standing pipeline loads instead of retraining. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "l", "r")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a merge table persisted by [[saveMerges]] — bounded collect
    * (merge tables are vocabulary-sized). */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[(String, String)] =
    spark.read.parquet(path)
      .select(col("rank"), col("l"), col("r"))
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
}
