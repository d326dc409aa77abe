package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, language-ID heuristics, quality scoring,
  * token counting, and document fingerprinting.
  *
  * All pure `Column` expressions (codegen'd) — no UDFs in the hot path, so
  * these scale linearly with executor count and stay inside
  * WholeStageCodegen spans.
  */
object TextFunctions {

  /** Character class of scripts written WITHOUT word spaces — Han
    * (incl. Extension A and the compatibility block), Hiragana,
    * Katakana, Thai. Text in these scripts tokenizes per codepoint
    * (the standard fallback every tokenizer applies when no trained
    * segmenter is available — whitespace splitting would return ONE
    * "word" per document and turn every word-count signal into noise).
    * BMP-only ranges, shared verbatim by java.regex and RE2 so the
    * DuckDB oracles can use the same constant. */
  val CjkCharClass: String =
    "\\x{3040}-\\x{30ff}\\x{3400}-\\x{4dbf}\\x{4e00}-\\x{9fff}" +
      "\\x{f900}-\\x{faff}\\x{0e00}-\\x{0e7f}"

  /** Unicode-aware token pattern: each CJK/Thai codepoint is its own
    * token; maximal runs of any other non-space characters are one
    * token. On space-delimited text this is EXACTLY whitespace
    * tokenization (a maximal non-space run = a whitespace-split word),
    * so English-corpus oracles are unchanged by construction. */
  val UTokenPattern: String = s"[$CjkCharClass]|[^\\s$CjkCharClass]+"

  /** Tokens of text: Unicode-aware (see [[UTokenPattern]]); empty or
    * all-whitespace text yields an EMPTY array (the whitespace-split
    * form returned [""]).
    *
    * Evaluated by the [[UnicodeTokens]] codegen expression — a single
    * regex-free character scan with the EXACT `regexp_extract_all(
    * UTokenPattern)` semantics (spec-pinned byte-identical on
    * adversarial inputs). The round-14 bench caught the regexp
    * alternation form costing 1.3–2.3× on every token-heavy query —
    * tokenization IS the hot loop of the classifier/zipf/LM/BPE paths
    * at 100 TB — and the scanner restores the pre-Unicode cost while
    * keeping the CJK semantics. The DuckDB oracles keep using
    * [[UTokenPattern]]: same tokens, independently derived. */
  def tokens(text: Column): Column = UnicodeTokens(text)

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** fastText-style char 2-5-grams of every token with `<`/`>`
    * boundary markers (see [[CharNgrams]]) — the feature family that
    * rescues language ID on SHORT or space-less text where the
    * word-level bag-of-words has no seen tokens to vote with. */
  def charNgrams(text: Column, minN: Int = 2, maxN: Int = 5): Column =
    CharNgrams(text, minN, maxN)

  /** BPE-ish lexical token count: words / numbers / single punctuation.
    * Pattern kept RE2-compatible so external engines can reproduce it. */
  val LexTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def lexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(LexTokenPattern), lit(0)))

  /** All word n-grams in order (with repeats) as array<string>; docs
    * shorter than n words yield the whole token sequence joined. */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
  }

  /** Distinct word n-gram shingles as array<string>; docs shorter than n
    * words yield the whole token sequence joined (single shingle). */
  def wordShingles(text: Column, n: Int): Column =
    array_distinct(wordNgrams(text, n))

  /** Polynomial rolling hash fingerprint: fold over code units of the
    * string, h = (h*31 + c) mod 1e9+7. Deterministic, order-sensitive,
    * reproducible in ANSI SQL via a reduce over the char array. One
    * codegen'd pass per row (RollingHash expression). */
  def fingerprint(text: Column): Column = RollingHash(text)

  /** Count of occurrences of any of the literal words with word-ish
    * boundaries — ONE alternation regexp per word list (a per-word sum
    * builds a 10x bigger expression tree that trips plan-size limits;
    * alternation is a single scan. Both Java regex and RE2 use
    * leftmost-first alternation, so the count is engine-portable). */
  private[graft] def wordHitsPattern(words: Seq[String]): String =
    "(^|[^a-z])(" + words.mkString("|") + ")($|[^a-z])"

  private def wordHits(text: Column, words: Seq[String]): Column =
    regexp_count(concat(lit(" "), lower(text), lit(" ")),
      lit(wordHitsPattern(words)))

  // Tiny embedded stopword lists per language for the heuristic language ID.
  val StopwordsEn = Seq("the", "and", "of", "to", "a", "in", "is", "that", "for", "with")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "nicht")
  val StopwordsFr = Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que")
  val StopwordsEs = Seq("el", "la", "los", "y", "es", "un", "una", "en", "por", "para", "que")

  /** Heuristic language ID: CJK codepoint ratio first, then stopword votes.
    * Returns one of en/de/fr/es/zh/unknown. */
  def langId(text: Column): Column = {
    val nChars = length(text)
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val en = wordHits(text, StopwordsEn)
    val de = wordHits(text, StopwordsDe)
    val fr = wordHits(text, StopwordsFr)
    val es = wordHits(text, StopwordsEs)
    val top = greatest(en, de, fr, es)
    when(nChars > 0 && cjk * 4 >= nChars, lit("zh"))
      .when(top === 0, lit("unknown"))
      .when(en === top, lit("en"))   // deterministic tie-break order
      .when(de === top, lit("de"))
      .when(fr === top, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Heuristic quality score in [0,1]: blend of length band, alpha ratio,
    * punctuation ratio, mean word length band, and stopword presence.
    * Deterministic closed-form arithmetic (reproducible in SQL). */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTok = tokenCount(text).cast("double")
    val alpha = size(regexp_extract_all(text, lit("[A-Za-z]"), lit(0))).cast("double")
    val punct = size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0))).cast("double")
    val stop = wordHits(text, StopwordsEn).cast("double")
    val lengthScore = least(nChars / 200.0, lit(1.0))
    val alphaRatio = when(nChars === 0, 0.0).otherwise(alpha / nChars)
    val punctRatio = when(nChars === 0, 0.0).otherwise(punct / nChars)
    val punctScore = lit(1.0) - least(punctRatio * 10.0, lit(1.0))
    val meanWordLen = when(nTok === 0, 0.0).otherwise(nChars / nTok)
    val wordLenScore = when(meanWordLen >= 3.0 && meanWordLen <= 10.0, 1.0).otherwise(0.5)
    val stopScore = least(when(nTok === 0, 0.0).otherwise(stop / nTok) * 4.0, lit(1.0))
    round(
      lengthScore * 0.25 + alphaRatio * 0.25 + punctScore * 0.2 +
        wordLenScore * 0.15 + stopScore * 0.15,
      6)
  }

  // ---- Gopher quality rules (Rae et al. 2021, Appendix A) -------------

  /** Gopher's required-stopword set (ibid.): a document must contain at
    * least two of these to pass. */
  val GopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Pattern matching exactly the [[UTokenPattern]] tokens that contain
    * at least one ASCII letter: any token with a letter matches once,
    * starting at its first char and extending (greedy) to its end, so
    * `regexp_count` = alpha-token count — one codegen regexp scan
    * instead of an interpreted per-token HOF lambda. Leftmost-first
    * (java) and leftmost-longest (RE2) agree here because every match
    * covers a whole maximal run. */
  val AlphaTokenPattern: String =
    s"[^\\s$CjkCharClass]*[A-Za-z][^\\s$CjkCharClass]*"

  /** The Gopher rule signals, EXACT integer ppm (hash-gateable like
    * every quality signal here): word count, mean word length, symbol
    * ('#' and '...') to word ratio, alphabetic-word ratio, and
    * required-stopword hits. All codegen column arithmetic — the
    * token array once per row, the alpha-token count a single
    * regexp_count scan. Unicode-aware: CJK/Thai codepoints count as
    * words (see [[UTokenPattern]]), so the word-count band and mean
    * word length stay meaningful on unsegmented scripts. */
  def gopherSignals(text: Column): Seq[(String, Column)] = {
    val tk = tokens(text)
    val n = size(tk).cast("long")
    val sumLen = length(concat_ws("", tk)).cast("long")
    val nAlpha = regexp_count(text, lit(AlphaTokenPattern)).cast("long")
    val nHash = (length(text) -
      length(regexp_replace(text, "#", ""))).cast("long")
    val nEll = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3).cast("long")
    val stops = wordHits(text, GopherStops).cast("long")
    // exact integer floor division without `expr` name plumbing:
    // (a - a mod n) is exactly divisible, its double quotient is an
    // exact integer < 2^53, so the cast is exact — equals SQL `div`
    def ppm(num: Column): Column = {
      val a = num * 1000000L
      when(n === 0, 0L).otherwise(((a - pmod(a, n)) / n).cast("long"))
    }
    Seq(
      "n_words" -> n,
      "mean_word_len_ppm" -> ppm(sumLen),
      "symbol_ppm" -> ppm(nHash + nEll),
      "alpha_ppm" -> ppm(nAlpha),
      "stop_hits" -> stops)
  }

  /** C4's line-keep rule (Raffel et al. 2020 §2.2) over a document's
    * `\n` lines: terminal punctuation, >= 5 words, no 'javascript'
    * mention. The word count is the Unicode-aware [[tokens]] count so
    * a zh line of >= 5 characters passes the band instead of reading
    * as "one word" — shared by the llm.c4_filter actor and the
    * llm_c4_rules oracle so both gates stay identical. */
  def c4KeptLines(text: Column): Column =
    filter(split(text, "\n"), l =>
      size(tokens(l)) >= 5 && l.rlike("[.!?\"]$") &&
        !lower(l).contains("javascript"))
}
