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
    explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w")

  // ---- GPT-2-style pre-tokenization ------------------------------------

  /** Simplified GPT-2 pre-tokenization pattern (the reference GPT-2
    * pattern minus its trailing-whitespace lookahead, which RE2 — and
    * therefore the DuckDB oracle — cannot express): contractions split
    * off first, then letter runs, digit runs, and punctuation runs,
    * each optionally claiming ONE leading space. Documented divergences
    * from the exact GPT-2 pattern: whitespace runs beyond the claimed
    * leading space are dropped (never part of any token), and the
    * alphabet is code points, not bytes. Alternation is ordered and
    * both engines match leftmost-first, so Spark and DuckDB tokenize
    * identically — what makes the pre-tokenized trainer
    * oracle-checkable. */
  val PreTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  /** U+0120 'Ġ' — GPT-2's printable stand-in for a token's leading
    * space. Mapping it BEFORE training keeps every piece space-free, so
    * the space-joined `pieces` output stays unambiguous. */
  val SpaceMark = "Ġ"

  /** Pre-tokens of a text column: regex matches with the leading space
    * rendered as [[SpaceMark]] (the only space a match can contain, by
    * the pattern's character classes). */
  private[llm] def preTokens(text: org.apache.spark.sql.Column) =
    transform(regexp_extract_all(text, lit(PreTokenPattern), lit(0)),
      t => replace(t, lit(" "), lit(SpaceMark)))

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

  /** Default row budget for collecting the word-frequency histogram to
    * the driver (see [[trainMerges]]): 4M distinct words × ~40 bytes is
    * a few hundred MB of driver heap — vocabulary-sized, never
    * corpus-sized (a 100 TB web corpus still has a bounded distinct-word
    * set after the usual pre-tokenizer splitting). */
  val DriverHistBudget = 4000000

  /** Train `numMerges` merge rules over `docs`. Returns merges in rank
    * order as (left, right) piece pairs. Deterministic: winner per
    * round = (weighted count desc, pair text asc under UTF-8 binary
    * order — both paths below agree on that comparator). Stops early
    * when no pair remains (vocabulary fully merged).
    *
    * Cost structure: ONE corpus pass builds the word histogram; after
    * that the corpus is never touched. When the histogram fits
    * `driverBudget` rows (virtually always — it is vocabulary-sized),
    * training runs the classic INCREMENTAL pair-count trainer on the
    * driver ([[trainMergesLocal]]): pair counts in a lazy-invalidation
    * heap, each merge updating only the words that contain the winning
    * pair — the Sennrich/GPT-2 structure, thousands of merges in
    * seconds with ZERO Spark jobs in the loop. Past the budget it falls
    * back to [[trainMergesDistributed]], whose per-merge cost is one
    * small aggregation over the histogram (~2 Spark jobs per merge —
    * correct at any scale but scheduling-bound at production vocabulary
    * sizes, which is exactly why the driver path exists). */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  driverBudget: Int = DriverHistBudget): Seq[(String, String)] = {
    require(numMerges >= 1)
    val hist = docs.select(wordsOf(textCol))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    // bounded probe: collect at most budget+1 rows — if the histogram
    // fits, this IS the histogram (no second job); if not, fall back
    val sample = hist.limit(driverBudget + 1).collect()
    if (sample.length <= driverBudget)
      trainMergesLocal(
        sample.map(r => (r.getString(0), r.getLong(1))).toSeq, numMerges)
    else
      trainMergesDistributed(hist, numMerges)
  }

  /** UTF-8 binary comparison — Spark/DuckDB string ORDER BY semantics
    * (Java's String.compareTo is UTF-16 code-unit order, which disagrees
    * with byte order for non-BMP code points; merges must not depend on
    * which engine ran the trainer). */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Code-point pieces of a word — matches Spark's `split(w, "")`
    * (Java regex zero-width matches never land inside a surrogate
    * pair), so the driver trainer and the Catalyst encode chain see the
    * same initial piece sequences. */
  private def codePointPieces(w: String): mutable.ArrayBuffer[String] = {
    val out = new mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out
  }

  /** The classic incremental BPE trainer over a collected word
    * histogram (Sennrich et al. 2016 §3; the structure GPT-2's trainer
    * shares): maintain adjacent-pair counts across all words, pick the
    * max-count pair per round from a lazy-invalidation max-heap, and
    * rewrite ONLY the words containing it — updating just the pair
    * counts adjacent to the rewrite. Per-merge cost is proportional to
    * the occurrences of the winning pair, not the vocabulary, so a 32k
    * vocabulary trains in seconds once the single histogram pass is
    * paid. Pair counting matches [[trainMergesDistributed]] exactly:
    * every adjacent position counts (overlapping runs included),
    * weighted by word frequency; rewrites are left-to-right
    * non-overlapping; ties break by "l r" text ascending in UTF-8
    * order. */
  private[llm] def trainMergesLocal(histogram: Seq[(String, Long)],
                                    numMerges: Int): Seq[(String, String)] = {
    val words = histogram.map { case (w, _) => codePointPieces(w) }.toArray
    val freqs = histogram.map(_._2).toArray
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    // words a pair has EVER occurred in — members may go stale after
    // rewrites (cheaper to re-check at use than to maintain removals)
    val pairWords = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[Int]]

    // (count desc, pair text asc): heap is a max-heap, so equal counts
    // must rank the UTF-8-smaller pair text HIGHER
    implicit val ord: Ordering[(Long, String, String)] =
      (a: (Long, String, String), b: (Long, String, String)) =>
        if (a._1 != b._1) java.lang.Long.compare(a._1, b._1)
        else utf8Compare(b._2 + " " + b._3, a._2 + " " + a._3)
    val heap = mutable.PriorityQueue.empty[(Long, String, String)]

    // EVERY count change pushes its new value — stale entries invalidate
    // lazily at pop time (current-count check). Pushing on decrements
    // too is load-bearing: a decremented-but-still-max pair must have a
    // live heap entry or it would be skipped as stale.
    def addPair(p: (String, String), wi: Int, f: Long): Unit = {
      val c = pairCounts.getOrElse(p, 0L) + f
      pairCounts(p) = c
      val ws = pairWords.getOrElseUpdate(p, mutable.ArrayBuffer.empty)
      if (ws.isEmpty || ws.last != wi) ws += wi
      heap.enqueue((c, p._1, p._2))
    }
    def dropPair(p: (String, String), f: Long): Unit = {
      val c = pairCounts(p) - f
      if (c <= 0L) pairCounts.remove(p)
      else { pairCounts(p) = c; heap.enqueue((c, p._1, p._2)) }
    }

    var wi = 0
    while (wi < words.length) {
      val ps = words(wi)
      var i = 0
      while (i < ps.length - 1) {
        addPair((ps(i), ps(i + 1)), wi, freqs(wi))
        i += 1
      }
      wi += 1
    }

    val merges = mutable.Buffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      // pop to the first LIVE entry (count still current)
      var winner: (String, String) = null
      while ((winner eq null) && heap.nonEmpty) {
        val (c, l, r) = heap.dequeue()
        if (pairCounts.getOrElse((l, r), 0L) == c) winner = (l, r)
      }
      if (winner eq null) done = true
      else {
        val (l, r) = winner
        merges += winner
        val merged = l + r
        pairWords.remove(winner).foreach(_.foreach { w =>
          val ps = words(w)
          val f = freqs(w)
          // does the pair still occur here? (membership may be stale)
          var hit = false
          var i = 0
          while (!hit && i < ps.length - 1) {
            hit = ps(i) == l && ps(i + 1) == r; i += 1
          }
          if (hit) {
            i = 0
            while (i < ps.length - 1) { dropPair((ps(i), ps(i + 1)), f); i += 1 }
            // left-to-right non-overlapping rewrite — the same greedy
            // pass the replace-chain encoder performs
            i = 0
            while (i < ps.length - 1) {
              if (ps(i) == l && ps(i + 1) == r) { ps(i) = merged; ps.remove(i + 1) }
              i += 1
            }
            i = 0
            while (i < ps.length - 1) {
              addPair((ps(i), ps(i + 1)), w, f); i += 1
            }
          }
        })
      }
    }
    merges.toSeq
  }

  /** The distributed merge loop — one small aggregation over the word
    * histogram per merge. Kept as the past-[[DriverHistBudget]]
    * fallback: correct at unbounded vocabulary, but each merge costs ~2
    * Spark jobs of scheduling, so [[trainMerges]] prefers the driver
    * trainer whenever the histogram fits. `hist` carries (w, freq). */
  private[llm] def trainMergesDistributed(hist0: DataFrame,
                                          numMerges: Int): Seq[(String, String)] = {
    var hist = hist0
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
             merges: Seq[(String, String)]): DataFrame =
    encodeTail(docs
      .select(col(idCol), posexplode(
        graft.functions.TextFunctions.tokens(col(textCol)))
        .as(Seq("pos", "w"))), idCol, merges)

  /** Shared encode tail over an exploded (idCol, pos, w) word frame. */
  private def encodeTail(words: DataFrame, idCol: String,
                         merges: Seq[(String, String)]): DataFrame =
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

  /** Train-then-encode in one call — the llm_bpe_encode query shape. */
  def trainEncode(docs: DataFrame, idCol: String, textCol: String,
                  numMerges: Int): DataFrame =
    encode(docs, idCol, textCol, trainMerges(docs, textCol, numMerges))

  // ---- pre-tokenized (GPT-2-style) train + encode ----------------------

  /** [[trainMerges]] over [[PreTokenPattern]] pre-tokens instead of
    * space-split words: contractions, letter/digit/punct runs, and
    * leading spaces (as [[SpaceMark]]) become the merge alphabet — what
    * a real vocabulary run trains on. Same histogram-once cost
    * structure, same driver/distributed split, same comparator. */
  def trainMergesPre(docs: DataFrame, textCol: String, numMerges: Int,
                     driverBudget: Int = DriverHistBudget): Seq[(String, String)] = {
    require(numMerges >= 1)
    val hist = docs.select(explode(preTokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val sample = hist.limit(driverBudget + 1).collect()
    if (sample.length <= driverBudget)
      trainMergesLocal(
        sample.map(r => (r.getString(0), r.getLong(1))).toSeq, numMerges)
    else
      trainMergesDistributed(hist, numMerges)
  }

  /** [[encode]] over the same pre-tokens the pre trainer saw. `pieces`
    * stays a space-joined string (pre-tokens are space-free once the
    * leading space renders as [[SpaceMark]]); `n_words` counts
    * pre-tokens. */
  def encodePre(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame =
    encodeTail(docs
      .select(col(idCol), posexplode(preTokens(col(textCol))).as(Seq("pos", "w")))
      .filter(col("w") =!= ""), idCol, merges)

  /** Pre-tokenized train-then-encode — the llm_bpe_encode_pre shape. */
  def trainEncodePre(docs: DataFrame, idCol: String, textCol: String,
                     numMerges: Int): DataFrame =
    encodePre(docs, idCol, textCol, trainMergesPre(docs, textCol, numMerges))

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
    array_join(transform(
      graft.functions.TextFunctions.tokens(text), perWord), " ")
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
                 merges: Seq[(String, String)]): DataFrame =
    encodeFastWith(docs, idCol, textCol, merges, usePreTokens = false)

  /** [[encodeFast]] over [[PreTokenPattern]] pre-tokens — the bulk
    * kernel twin of [[encodePre]], row-identical to it by the same
    * rank-order/min-rank convergence argument (BpeSpec pins the
    * parity). The kernel compiles the SAME Java regex Spark's
    * `regexp_extract_all` runs, so the token streams agree. */
  def encodeFastPre(docs: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)]): DataFrame =
    encodeFastWith(docs, idCol, textCol, merges, usePreTokens = true)

  private def encodeFastWith(docs: DataFrame, idCol: String, textCol: String,
                             merges: Seq[(String, String)],
                             usePreTokens: Boolean): DataFrame = {
    val rankBc = docs.sparkSession.sparkContext.broadcast((
      merges.zipWithIndex.map { case ((l, r), i) => (l, r) -> i }.toMap,
      merges.toArray))
    // the id column passes through UNTOUCHED (Row-level kernel): casting
    // it would null out non-numeric ids and break the documented
    // row-identity with [[encode]], which never reshapes the id
    val in = docs.select(col(idCol), col(textCol))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      in.schema.fields(0),
      org.apache.spark.sql.types.StructField("n_words",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_pieces",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("pieces",
        org.apache.spark.sql.types.StringType, nullable = true)))
    in.mapPartitions { it =>
        val (rank, mergeArr) = rankBc.value
        // Plain family: the SAME scanner TextFunctions.tokens compiles
        // to (UnicodeTokens), so chain==kernel token streams agree by
        // construction — and the kernel skips the per-row NFA.
        val preTok =
          if (usePreTokens) java.util.regex.Pattern.compile(PreTokenPattern)
          else null
        def tokensOf(text: String): Array[String] =
          if (preTok == null) {
            graft.functions.UnicodeTokens.tokenizeStrings(text)
          } else {
            val m = preTok.matcher(text)
            val out = mutable.ArrayBuffer.empty[String]
            while (m.find()) out += m.group().replace(" ", SpaceMark)
            out.toArray
          }
        def encodeWord(w: String): mutable.ArrayBuffer[String] = {
          val pieces = codePointPieces(w)
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
        it.map { row =>
          val text = if (row.isNullAt(1)) "" else row.getString(1)
          val words = tokensOf(text)
          var nPieces = 0L
          val sb = new StringBuilder
          words.foreach { w =>
            val ps = encodeWord(w)
            nPieces += ps.length
            if (sb.nonEmpty) sb.append(' ')
            sb.append(ps.mkString(" "))
          }
          org.apache.spark.sql.Row(row.get(0), words.length.toLong, nPieces,
            sb.toString)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
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
