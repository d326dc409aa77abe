package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram-LM (SentencePiece-style, Kudo 2018 arXiv:1804.10959)
  * subword tokenizer — the OTHER tokenizer family real pipelines
  * train besides BPE: a piece VOCABULARY with per-piece scores is
  * fitted by EM over the word histogram, and words encode by Viterbi
  * segmentation under those scores.
  *
  * Exact-integer rendering (the [[Bpe]]/[[Lm]] discipline — log-space
  * float EM would never be engine-exact): this is HARD EM over piece
  * counts. Scores are raw corpus counts; the Viterbi objective is
  * lexicographic — (1) fewest pieces, (2) highest summed piece count,
  * (3) longer piece at the decision point — every comparison an
  * integer, so the whole lifecycle (seed → EM iterations → encode) is
  * reproducible token-for-token by a DuckDB twin unrolling the same
  * steps (`llm_unigram_encode`), exactly like the BPE oracle. Kudo's
  * soft-EM (forward–backward expected counts) and probability-scored
  * Viterbi are the float-world form of the same structure; the
  * deterministic fixed-point form here keeps the hash-exact gate.
  *
  * Distribution shape (100-TB posture): training never collects the
  * histogram — each EM iteration segments the (word, freq) frame with
  * the Viterbi COLUMN (vocabulary broadcast as a literal map: the
  * model is the small side, bounded by `seedK` + alphabet), recounts
  * pieces with one groupBy, and collects only the VOCABULARY (KBs).
  * Encoding is map-only: [[encode]] is the expression rendering (the
  * oracle path), [[encodeFast]] the mapPartitions kernel compiled
  * from the same rules for bulk throughput — parity is spec-pinned
  * like BpeSpec's chain==kernel.
  */
object Unigram {

  /** Longest candidate piece (chars). 3 keeps the oracle's unrolled
    * candidate CASE small while still learning real multi-char units. */
  val MaxPieceLen = 3

  /** Seed vocabulary size for multi-char pieces (single chars are
    * always in the vocabulary and never pruned — coverage guarantee). */
  val SeedK = 120

  /** EM iterations — each is one unrolled CTE block in the oracle. */
  val EmIters = 2

  /** Word histogram of a corpus — the unit EM operates on (identical
    * tokenization to the rest of the text stack). */
  def histogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Seed vocabulary: every substring of length 1..maxLen of every
    * histogram word, counted by (occurrences x word freq); ALL single
    * chars survive, multi-char pieces keep the top `seedK` by
    * (count desc, piece asc) — a deterministic total order. Returns
    * (piece, count) sorted by piece. The collect is vocabulary-sized
    * (seedK + alphabet), never corpus-sized. */
  /** The one-collect seed frame: all single chars ∪ the top-seedK
    * multis. The union's two legs share the aggregation subtree —
    * exchange-reused, so the histogram substring pass runs once and
    * nothing needs persisting (pre-r15 this was a persist + two
    * collect jobs). UnigramSpec asserts the ReusedExchange is actually
    * in the executed plan — if a Spark upgrade ever diverges the legs
    * under AQE replanning, that spec (not a silent 2x histogram pass)
    * is what fails. */
  private[llm] def seedVocabFrame(hist: DataFrame, maxLen: Int = MaxPieceLen,
                                  seedK: Int = SeedK): DataFrame = {
    val subs = hist
      .select(col("freq"), col("w"), explode(sequence(lit(1),
        greatest(length(col("w")), lit(1)))).as("i"))
      .select(col("freq"), col("w"), col("i"),
        explode(sequence(lit(1), lit(maxLen))).as("l"))
      .filter(col("i") + col("l") - 1 <= length(col("w")))
      .select(col("freq"), col("w").substr(col("i"), col("l")).as("p"))
      .groupBy(col("p")).agg(sum(col("freq")).as("c"))
    subs.filter(length(col("p")) === 1)
      .unionByName(subs.filter(length(col("p")) >= 2)
        .orderBy(col("c").desc, col("p").asc).limit(seedK))
  }

  def seedVocab(hist: DataFrame, maxLen: Int = MaxPieceLen,
                seedK: Int = SeedK): Seq[(String, Long)] = {
    val spark = hist.sparkSession
    import spark.implicits._
    seedVocabFrame(hist, maxLen, seedK)
      .as[(String, Long)].collect()
      .sortBy(_._1).toSeq
  }

  /** Viterbi segmentation of a word column as a pure Column: an
    * `aggregate` HOF whose accumulator is the dp TABLE — an array of
    * (n_pieces, score, segmentation-so-far) structs, one per position,
    * grown one position per step. Candidates at each position are the
    * up-to-`MaxPieceLen` suffix pieces; a longer candidate replaces
    * the incumbent on (fewer pieces) or (equal pieces AND score >=) —
    * the ties-to-longer rule the DuckDB twin reproduces with the same
    * nested CASE. Single chars segment even when absent from the
    * vocabulary (UNK-as-char fallback, score 0), so dp never strands —
    * even on text disjoint from the training corpus (new punctuation,
    * emoji, unseen scripts). Interpreted HOF (per-word cost
    * O(len·maxLen)) —
    * the oracle/EM path; bulk encode uses [[encodeFast]]'s kernel. */
  def viterbiCol(w: Column, vocab: Seq[(String, Long)]): Column = {
    // empty-corpus guard: a zero-entry map literal can't be built; ""
    // never equals a piece (pieces have length >= 1)
    val entries =
      if (vocab.isEmpty) Seq(lit(""), lit(0L))
      else vocab.flatMap { case (p, c) => Seq(lit(p), lit(c)) }
    val vmap = map(entries: _*)
    val init = array(struct(lit(0L).as("n"), lit(0L).as("sc"),
      lit("").as("seg")))
    val step = (acc: Column, x: Column) => {
      val j = size(acc) // position being filled: dp(0..j-1) present
      def cand(l: Int): Column = {
        val piece = w.substr((j - l + 1).cast("int"), lit(l))
        val dpI = element_at(acc, j - l + 1) // dp(j-l), 1-based index
        // UNSEEN-CHAR FALLBACK: a single char absent from the vocab is
        // emitted as its own piece with score 0 (an UNK-as-char rule),
        // so dp never strands on out-of-vocabulary characters — the
        // "single chars always in vocab" guarantee only holds when
        // encoding the training corpus itself. Multi-char candidates
        // additionally require a REACHED dp(j-l) (vacuous now that
        // cand(1) is total, kept as defense-in-depth mirrored in
        // [[viterbiWord]] so the two paths stay identical).
        val score =
          if (l == 1) coalesce(element_at(vmap, piece), lit(0L))
          else element_at(vmap, piece)
        when(j >= l && score.isNotNull && dpI.isNotNull,
          struct((dpI.getField("n") + 1L).as("n"),
            (dpI.getField("sc") + score).as("sc"),
            concat(dpI.getField("seg"),
              when(dpI.getField("seg") === "", lit("")).otherwise(lit(" ")),
              piece).as("seg")))
          .otherwise(lit(null))
      }
      val best = (2 to MaxPieceLen).foldLeft(cand(1)) { (b, l) =>
        val c = cand(l)
        when(c.isNotNull &&
            (c.getField("n") < b.getField("n") ||
              (c.getField("n") === b.getField("n") &&
                c.getField("sc") >= b.getField("sc"))), c)
          .otherwise(b)
      }
      concat(acc, array(best))
    }
    val dp = aggregate(
      transform(sequence(lit(1), greatest(length(w), lit(1))),
        _ => lit(0)), // dummy elements: position = size(acc)
      init, step)
    // words can't be empty (tokens drop empties), but greatest() above
    // keeps the sequence total; element_at(length+1) is the final state
    when(length(w) >= 1,
      element_at(dp, (length(w) + 1).cast("int")).getField("seg"))
      .otherwise(lit(""))
  }

  /** One hard-EM step: segment the histogram under `vocab`, recount
    * piece usage (weighted by word freq), keep every single char (its
    * new usage count, 0 if unused) and every multi-char piece that was
    * actually used. Distributed: one projection + one groupBy; only
    * the vocabulary is collected. */
  def emStep(hist: DataFrame, vocab: Seq[(String, Long)])
      : Seq[(String, Long)] = {
    val spark = hist.sparkSession
    import spark.implicits._
    val used = hist
      .select(col("freq"),
        explode(split(viterbiCol(col("w"), vocab), " ")).as("p"))
      .filter(col("p") =!= "")
      .groupBy(col("p")).agg(sum(col("freq")).as("c"))
      .as[(String, Long)].collect().toMap
    val chars = vocab.collect { case (p, _) if p.length == 1 =>
      p -> used.getOrElse(p, 0L) }
    val multi = vocab.collect { case (p, _) if p.length >= 2 &&
      used.contains(p) => p -> used(p) }
    (chars ++ multi).sortBy(_._1)
  }

  /** The full training lifecycle: seed → `iters` hard-EM steps.
    * Returns (piece, count) sorted by piece — the model artifact. */
  def train(docs: DataFrame, textCol: String, iters: Int = EmIters,
            maxLen: Int = MaxPieceLen, seedK: Int = SeedK)
      : Seq[(String, Long)] = {
    val hist = histogram(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var vocab = seedVocab(hist, maxLen, seedK)
      for (_ <- 0 until iters) vocab = emStep(hist, vocab)
      vocab
    } finally hist.unpersist()
  }

  /** Encode documents with a trained vocabulary — the expression
    * rendering, output shape identical to [[Bpe.encode]]: (idCol,
    * n_words, n_pieces, pieces). Viterbi runs once per DISTINCT word
    * (the word vocabulary is Zipf-bounded — orders of magnitude
    * smaller than the occurrence stream) and joins back to positions;
    * documents with zero tokens yield no row, like Bpe.encode. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: Seq[(String, Long)]): DataFrame = {
    val words = docs.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "w")))
    val seg = words.select(col("w")).distinct()
      .withColumn("p", viterbiCol(col("w"), vocab))
    words.join(seg, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(size(split(col("p"), " "))).as("n_pieces"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("p")))),
          x => x.getField("p")), " ").as("pieces"))
  }

  /** Scala Viterbi — the SAME candidate order, comparison, and
    * tie-break as [[viterbiCol]], compiled; used by the kernel and
    * spec-pinned row-identical to the expression path. */
  private[graft] def viterbiWord(w: String,
                                 vocab: java.util.HashMap[String, Long])
      : (Int, String) = {
    // dp over CODEPOINTS, not UTF-16 units: Spark `length`/`substr`
    // (hence [[viterbiCol]] and the seedVocab pieces) count codepoints,
    // so a UTF-16 dp would split surrogate pairs (emoji) into lone
    // surrogates and diverge from the expression path. bounds(i) is
    // the UTF-16 offset of the i-th codepoint.
    val u = w.length
    val bounds = new Array[Int](u + 1)
    var n = 0
    var off = 0
    while (off < u) {
      bounds(n) = off
      off += Character.charCount(w.codePointAt(off))
      n += 1
    }
    bounds(n) = u
    val dpN = new Array[Long](n + 1)
    val dpSc = new Array[Long](n + 1)
    val dpSeg = new Array[String](n + 1)
    dpSeg(0) = ""
    var j = 1
    while (j <= n) {
      var bestN = -1L; var bestSc = 0L; var bestSeg: String = null
      var l = 1
      while (l <= MaxPieceLen) {
        if (l <= j && dpSeg(j - l) != null) {
          val piece = w.substring(bounds(j - l), bounds(j))
          // containsKey first: get() returns null for absent keys and
          // a Long-typed val would NPE on unboxing. Single chars absent
          // from the vocab fall back to score 0 (UNK-as-char — see
          // [[viterbiCol]]) so dp never strands on unseen characters;
          // the dpSeg null guard above is then vacuous, kept as
          // defense-in-depth mirroring the expression path.
          val has = vocab.containsKey(piece)
          if (has || l == 1) {
            val sc: Long = if (has) vocab.get(piece) else 0L
            val cn = dpN(j - l) + 1
            val cs = dpSc(j - l) + sc
            if (bestN < 0 || cn < bestN || (cn == bestN && cs >= bestSc)) {
              bestN = cn; bestSc = cs
              bestSeg = if (dpSeg(j - l).isEmpty) piece
                        else dpSeg(j - l) + " " + piece
            }
          }
        }
        l += 1
      }
      dpN(j) = bestN; dpSc(j) = bestSc; dpSeg(j) = bestSeg
      j += 1
    }
    (dpN(n).toInt, dpSeg(n))
  }

  /** [[encode]] with a compiled per-partition kernel instead of the
    * interpreted HOF — the bulk path. Row-identical BY CONSTRUCTION
    * (same dp recurrence and tie-breaks); UnigramSpec pins the parity. */
  def encodeFast(docs: DataFrame, idCol: String, textCol: String,
                 vocab: Seq[(String, Long)]): DataFrame = {
    val spark = docs.sparkSession
    val vocabBc = spark.sparkContext.broadcast {
      val m = new java.util.HashMap[String, Long](vocab.size * 2)
      vocab.foreach { case (p, c) => m.put(p, c) }
      m
    }
    val in = docs.select(col(idCol), col(textCol))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      in.schema.fields(0),
      org.apache.spark.sql.types.StructField("n_words",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_pieces",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("pieces",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    in.mapPartitions { it =>
      val vmap = vocabBc.value
      it.flatMap { row =>
        val text = row.getString(1)
        if (text == null) None
        else {
          // the same scanner TextFunctions.tokens compiles to — token
          // parity with the expression rendering by construction
          val toks = graft.functions.UnicodeTokens.tokenizeStrings(text)
          var nWords = 0L
          var nPieces = 0L
          val sb = new java.lang.StringBuilder()
          toks.foreach { tk =>
            val (np, seg) = viterbiWord(tk, vmap)
            nWords += 1; nPieces += np
            if (sb.length > 0) sb.append(' ')
            sb.append(seg)
          }
          if (nWords == 0) None
          else Some(org.apache.spark.sql.Row(
            row.get(0), nWords, nPieces, sb.toString))
        }
      }
    }(enc)
  }

  /** Persist a trained vocabulary (one (piece, c) parquet, KBs) /
    * reload it — the train-once/encode-many artifact form. */
  def saveVocab(spark: org.apache.spark.sql.SparkSession,
                vocab: Seq[(String, Long)], path: String): Unit = {
    import spark.implicits._
    vocab.toDF("piece", "c").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadVocab(spark: org.apache.spark.sql.SparkSession,
                path: String): Seq[(String, Long)] = {
    import spark.implicits._
    spark.read.parquet(path).select(col("piece"), col("c"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
  }
}
