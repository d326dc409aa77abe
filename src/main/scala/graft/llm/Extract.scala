package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction: the front door of a pretraining data
  * pipeline (CommonCrawl-style raw web → clean `documents` rows),
  * upstream of every curation operator in this package.
  *
  * Spark-first design: the whole pass is a chain of built-in
  * `regexp_replace`/`replace` column expressions — fully
  * whole-stage-codegen'd, no UDFs, no per-row interpreter — so
  * extraction fuses into the same generated loop as the downstream
  * quality/langid/dedup expressions and scans 100 TB of crawl with
  * zero extra materialization. The patterns are deliberately
  * restricted to syntax shared by java.util.regex and RE2 so a DuckDB
  * oracle can replicate the transform token-for-token
  * (`llm_extract_text`).
  *
  * Scope (documented, not accidental): tag stripping handles
  * comments, script/style elision, block-element line breaks, and the
  * named entities covering the overwhelming share of real-world HTML
  * (`&amp; &lt; &gt; &quot; &#39; &apos; &nbsp;`). Full numeric
  * character-reference decode (`&#x2014;` …) needs a custom Catalyst
  * expression and is out of scope for the expression chain — the
  * chained `replace` order below still decodes double-escaped text
  * correctly (`&amp;lt;` → `&lt;`, never `<`) because `&amp;` is
  * decoded LAST, matching single-pass semantics.
  *
  * Boilerplate removal is the line-density heuristic every practical
  * extractor starts from (short navigation/footer lines carry little
  * content): [[mainContent]] keeps lines of at least `minLineChars`
  * characters. It composes from `split`/`filter`/`array_join` higher
  * order functions — interpreted, not codegen'd, so keep it AFTER the
  * regexp chain has shrunk the data (it operates on extracted text,
  * not raw HTML).
  */
object Extract {

  /** Strip HTML comments (including commented-out markup). */
  val CommentPattern = "(?s)<!--.*?-->"

  /** Elide script/style elements WITH their content — the two
    * elements whose text payload is never document text. */
  val ScriptPattern = "(?is)<script\\b[^>]*>.*?</script[^>]*>"
  val StylePattern = "(?is)<style\\b[^>]*>.*?</style[^>]*>"

  /** Tags that terminate a visual block: replaced by a line break so
    * extracted text preserves paragraph structure (the signal the
    * [[mainContent]] line heuristic and downstream chunkers key on). */
  val BlockBreakPattern =
    "(?i)<(?:br|hr)\\s*/?\\s*>|</(?:p|div|h[1-6]|li|tr|ul|ol|table|" +
      "blockquote|pre|section|article|aside|header|footer|figure|" +
      "figcaption|form|fieldset|address|dl|dt|dd|title)\\s*>"

  /** Any remaining tag (replaced by a space — inline tags must not
    * weld adjacent words together). */
  val TagPattern = "(?s)<[^>]*>"

  /** Named entities decoded by the chain, IN ORDER — `&amp;` last so
    * double-escaped text decodes one level only (single-pass
    * semantics). */
  val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")

  /** Horizontal whitespace runs → one space (newlines survive). */
  val HspacePattern = "[ \\t\\f\\r]+"

  /** Whitespace runs containing a newline → one newline: collapses
    * blank lines AND trims spaces hugging each break. */
  val LineBreakPattern = "\\s*\\n\\s*"

  /** Leading/trailing whitespace of the whole document. */
  val EdgePattern = "^\\s+|\\s+$"

  /** Extracted text of an HTML column: comments/script/style removed,
    * block tags → line breaks, all other tags → spaces, named
    * entities decoded, whitespace normalized. Pure codegen expression
    * chain. */
  def extractText(html: Column): Column = {
    val noComments = regexp_replace(html, CommentPattern, "")
    val noScript = regexp_replace(noComments, ScriptPattern, "")
    val noStyle = regexp_replace(noScript, StylePattern, "")
    val broken = regexp_replace(noStyle, BlockBreakPattern, "\n")
    val noTags = regexp_replace(broken, TagPattern, " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (ent, repl)) =>
      // entity strings are regex-literal (no metacharacters) and the
      // replacements carry no '$'/'\' — safe as regexp_replace args
      regexp_replace(c, ent, repl)
    }
    val hspace = regexp_replace(decoded, HspacePattern, " ")
    val lines = regexp_replace(hspace, LineBreakPattern, "\n")
    regexp_replace(lines, EdgePattern, "")
  }

  /** [[extractText]] with FULL character-reference decode: the entity
    * step runs through the [[graft.functions.HtmlEntityDecode]]
    * codegen expression (numeric `&#dd;`/`&#xhh;` references at any
    * Unicode scalar, plus the named set, single-pass) instead of the
    * named-only replace chain. Same single-decode semantics; not
    * DuckDB-replicable (numeric decode needs codepoint arithmetic), so
    * this form is spec-verified while [[extractText]] carries the
    * oracle. */
  def extractTextFull(html: Column): Column = {
    val noComments = regexp_replace(html, CommentPattern, "")
    val noScript = regexp_replace(noComments, ScriptPattern, "")
    val noStyle = regexp_replace(noScript, StylePattern, "")
    val broken = regexp_replace(noStyle, BlockBreakPattern, "\n")
    val noTags = regexp_replace(broken, TagPattern, " ")
    val decoded = graft.functions.HtmlEntityDecode(noTags)
    val hspace = regexp_replace(decoded, HspacePattern, " ")
    val lines = regexp_replace(hspace, LineBreakPattern, "\n")
    regexp_replace(lines, EdgePattern, "")
  }

  /** Line-density boilerplate filter over EXTRACTED text: keep lines
    * of at least `minLineChars` characters (navigation, footers and
    * button labels are short; running prose is not). Returns the
    * surviving lines re-joined with newlines — "" when nothing
    * survives. */
  def mainContent(text: Column, minLineChars: Int): Column =
    array_join(
      filter(split(text, "\n"), l => length(l) >= minLineChars), "\n")

  // ---- URL canonicalization (regexp-subset twin of the full
  // functions.NormalizeUrl expression) --------------------------------

  /** Fragment: everything from '#'. */
  val UrlFragmentPattern = "(?s)#.*$"

  /** A tracking parameter in LEADING position (keeps the '?' for the
    * survivors): applied [[UrlLeadUnroll]] times — each global pass
    * removes non-overlapping matches left-to-right, so N consecutive
    * leading trackers need N passes (bounded unroll, identical in both
    * engines). */
  val UrlTrackLeadPattern =
    "\\?(?:utm_[A-Za-z]+|gclid|fbclid|msclkid|ref)=[^&#]*&"
  val UrlLeadUnroll = 3

  /** Any other tracking parameter with its separator. */
  val UrlTrackPattern =
    "[?&](?:utm_[A-Za-z]+|gclid|fbclid|msclkid|ref)=[^&#]*"

  /** A dangling '?' or '&' left by the removals. */
  val UrlTrailPattern = "[?&]$"

  /** Regexp-only URL canonicalization: fragment and tracking-parameter
    * removal — the oracle-checkable subset (RE2 has no backreferences
    * or lookahead, so host/scheme casing, default ports and parameter
    * sorting live in the [[graft.functions.NormalizeUrl]] codegen
    * expression instead; compose both with `NormalizeUrl(col)` for the
    * full form — its output is already fragment- and tracker-free). */
  def normalizeUrlLite(url: Column): Column = {
    val noFrag = regexp_replace(url, UrlFragmentPattern, "")
    val noLead = (1 to UrlLeadUnroll).foldLeft(noFrag)((c, _) =>
      regexp_replace(c, UrlTrackLeadPattern, "?"))
    val noTrack = regexp_replace(noLead, UrlTrackPattern, "")
    regexp_replace(noTrack, UrlTrailPattern, "")
  }

  /** DuckDB twin of [[normalizeUrlLite]] — generated from the SAME
    * pattern constants. */
  def normalizeUrlLiteSql(urlExpr: String): String = {
    def rr(x: String, pat: String, repl: String) =
      s"regexp_replace($x, '$pat', $repl, 'g')"
    val noFrag = rr(urlExpr, UrlFragmentPattern, "''")
    val noLead = (1 to UrlLeadUnroll).foldLeft(noFrag)((x, _) =>
      rr(x, UrlTrackLeadPattern, "'?'"))
    val noTrack = rr(noLead, UrlTrackPattern, "''")
    rr(noTrack, UrlTrailPattern, "''")
  }

  // ---- link-density boilerplate classification (jusText-style,
  // Pomikálek 2011 simplified): navigation/footer/related-links blocks
  // are short AND link-dense; running prose is long and link-sparse.
  // The whole pass is block-granular, so instead of per-element
  // interpreted HOF lambdas the operator EXPLODES blocks to rows —
  // every regexp below then runs as a codegen row expression — and
  // reassembles with one doc-keyed shuffle (the dedupParagraphs
  // shape, bounded by document length). ------------------------------

  /** Sentinel characters marking structure inside the stripped text:
    * C0 controls that cannot legally appear in HTML text (any
    * pre-existing occurrences are scrubbed first so crawl garbage
    * cannot forge block or anchor boundaries). */
  val SentinelScrubPattern = "[\\x01-\\x03]"

  /** `<a …>` open / `</a>` close → anchor markers (x02/x03), BEFORE
    * the generic tag strip so link-text extents survive it. */
  val AnchorOpenPattern = "(?is)<a\\b[^>]*>"
  val AnchorClosePattern = "(?i)</a\\s*>"

  /** A complete anchor span (non-greedy: nested/malformed anchors
    * degrade to zero-length spans, never swallow the document). */
  val LinkSpanPattern = "(?s)\\x02.*?\\x03"

  /** Leftover anchor markers (unpaired spans across block breaks). */
  val MarkerPattern = "[\\x02\\x03]"

  /** The marked text of an HTML column: comments/script/style gone,
    * anchors bracketed by x02/x03, block boundaries as x01, other tags
    * stripped, entities decoded, whitespace normalized — one codegen
    * regexp chain, the [[extractText]] pipeline with structure
    * sentinels riding through it. */
  def markedText(html: Column): Column = {
    val noComments = regexp_replace(html, CommentPattern, "")
    val noScript = regexp_replace(noComments, ScriptPattern, "")
    val noStyle = regexp_replace(noScript, StylePattern, "")
    val scrubbed = regexp_replace(noStyle, SentinelScrubPattern, "")
    val aOpen = regexp_replace(scrubbed, AnchorOpenPattern, "\u0002")
    val aClose = regexp_replace(aOpen, AnchorClosePattern, "\u0003")
    val broken = regexp_replace(aClose, BlockBreakPattern, "\u0001")
    val noTags = regexp_replace(broken, TagPattern, " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (ent, repl)) =>
      regexp_replace(c, ent, repl)
    }
    val hspace = regexp_replace(decoded, HspacePattern, " ")
    regexp_replace(hspace, LineBreakPattern, "\n")
  }

  /** Block-granular main-content extraction: classify each block by
    * length and link density, keep the good ones, reassemble in
    * document order. A block is GOOD iff its visible text is at least
    * `minChars` characters AND `link_len * 1000 <= maxLinkDensityPm *
    * text_len` — integer arithmetic throughout, so the DuckDB twin is
    * hash-exact. Returns one row per input row (the dedup_paragraph
    * left-join contract: empty/all-boilerplate docs keep an explicit
    * row with `main_text = ""`): `(idCol, n_blocks, n_good,
    * main_text)`.
    *
    * Scale shape: marked-text chain and per-block features are codegen
    * row expressions (blocks are EXPLODED, not HOF-mapped); the only
    * shuffle is the doc-keyed reassembly, partition size bounded by
    * document length — the same budget as every other per-doc rewrite
    * in this package. */
  def mainContentBlocks(df: org.apache.spark.sql.DataFrame,
                        htmlCol: String, idCol: String,
                        minChars: Int = 25,
                        maxLinkDensityPm: Int = 300)
      : org.apache.spark.sql.DataFrame = {
    val marked = df.select(col(idCol),
      split(markedText(col(htmlCol)), "\\x01").as("_blocks"))
    val exploded = marked.select(col(idCol),
      posexplode(col("_blocks")).as(Seq("pos", "block")))
    val stripped = regexp_replace(col("block"), MarkerPattern, "")
    val nonlink = regexp_replace(
      regexp_replace(col("block"), LinkSpanPattern, ""),
      MarkerPattern, "")
    val clean = regexp_replace(stripped, EdgePattern, "")
    val feats = exploded.select(col(idCol), col("pos"),
      clean.as("clean"),
      length(stripped).as("raw_len"),
      (length(stripped) - length(nonlink)).as("link_len"))
      .filter(length(col("clean")) > 0)
    val classified = feats.withColumn("good",
      length(col("clean")) >= minChars &&
        col("link_len") * 1000 <= lit(maxLinkDensityPm) * col("raw_len"))
    val agg = classified.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_blocks"),
      sum(when(col("good"), 1L).otherwise(0L)).as("n_good"),
      array_join(transform(array_sort(collect_list(
        when(col("good"), struct(col("pos"), col("clean"))))),
        s => s.getField("clean")), "\n").as("main_text"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .withColumn("n_blocks", coalesce(col("n_blocks"), lit(0L)))
      .withColumn("n_good", coalesce(col("n_good"), lit(0L)))
      .withColumn("main_text", coalesce(col("main_text"), lit("")))
  }

  /** DuckDB twin of [[markedText]] — generated from the SAME pattern
    * constants; sentinels render as chr(1)/chr(2)/chr(3) in rewrite
    * position and as RE2 `\x01` escapes inside patterns. */
  def markedTextSql(htmlExpr: String): String = {
    def rr(x: String, pat: String, repl: String) =
      s"regexp_replace($x, '$pat', $repl, 'g')"
    val noComments = rr(htmlExpr, CommentPattern, "''")
    val noScript = rr(noComments, ScriptPattern, "''")
    val noStyle = rr(noScript, StylePattern, "''")
    val scrubbed = rr(noStyle, SentinelScrubPattern, "''")
    val aOpen = rr(scrubbed, AnchorOpenPattern, "chr(2)")
    val aClose = rr(aOpen, AnchorClosePattern, "chr(3)")
    val broken = rr(aClose, BlockBreakPattern, "chr(1)")
    val noTags = rr(broken, TagPattern, "' '")
    val decoded = Entities.foldLeft(noTags) { case (x, (ent, repl)) =>
      val r = if (repl == "'") "''" else repl
      s"replace($x, '$ent', '$r')"
    }
    val hspace = rr(decoded, HspacePattern, "' '")
    rr(hspace, LineBreakPattern, "chr(10)")
  }

  // ---- meta-robots directives (the page's own indexing consent: a
  // `noindex` page told every indexer to drop it, and a curation
  // pipeline building a public corpus honors that exactly like a
  // crawler honors robots.txt) --------------------------------------

  /** `<meta name=robots content="...">`, either attribute order,
    * quoted or bare values. Group 1 = the directive list. (?i) covers
    * the class; both patterns stay in the java.regex∩RE2 subset. */
  val MetaRobotsNameFirst: String =
    "(?is)<meta\\b[^>]*\\bname\\s*=\\s*[\"']?robots\\b[^>]*" +
      "\\bcontent\\s*=\\s*[\"']?([a-z, ]*)"
  val MetaRobotsContentFirst: String =
    "(?is)<meta\\b[^>]*\\bcontent\\s*=\\s*[\"']?([a-z, ]*)[\"']?" +
      "[^>]*\\bname\\s*=\\s*[\"']?robots\\b"

  /** The page's robots directives, lowercased, both attribute orders
    * folded ("" when the page has no robots meta). */
  def metaRobotsDirectives(html: Column): Column = lower(concat_ws(",",
    regexp_extract(html, MetaRobotsNameFirst, 1),
    regexp_extract(html, MetaRobotsContentFirst, 1)))

  /** Whole-word directive test over [[metaRobotsDirectives]]. */
  def metaNoindex(html: Column): Column =
    metaRobotsDirectives(html).rlike("\\bnoindex\\b")
  def metaNofollow(html: Column): Column =
    metaRobotsDirectives(html).rlike("\\bnofollow\\b")

  /** DuckDB twins, generated from the SAME pattern constants. */
  def metaRobotsDirectivesSql(htmlExpr: String): String = {
    def esc(p: String) = p.replace("'", "''")
    s"lower(concat_ws(',', " +
      s"regexp_extract($htmlExpr, '${esc(MetaRobotsNameFirst)}', 1), " +
      s"regexp_extract($htmlExpr, '${esc(MetaRobotsContentFirst)}', 1)))"
  }
  def metaNoindexSql(htmlExpr: String): String =
    s"regexp_matches(${metaRobotsDirectivesSql(htmlExpr)}, '\\bnoindex\\b')"
  def metaNofollowSql(htmlExpr: String): String =
    s"regexp_matches(${metaRobotsDirectivesSql(htmlExpr)}, '\\bnofollow\\b')"

  // ---- URL host / domain filtering (the blocklist stage a curation
  // run applies before fetching or extracting anything: RefinedWeb
  // §3.1 and FineWeb both gate on UT1-style domain blocklists plus
  // URL keyword rules) ---------------------------------------------

  /** Host of an absolute URL: the authority minus userinfo and port.
    * Group 1 of the match; empty string for scheme-less input. */
  val UrlHostPattern =
    "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/:?#]+)"

  /** A 2-letter ccTLD preceded by one of the common second-level
    * registry labels: the registrable domain spans THREE labels
    * (co.uk, com.au, ac.jp, …). A deliberate approximation of the
    * public-suffix list — the handful of second-level registries that
    * dominate real crawl traffic, kept regexp-small so the DuckDB twin
    * stays token-identical; a production deployment swaps in the full
    * PSL as a broadcast lookup without touching callers. */
  val MultiSuffixPattern =
    "\\.(?:co|com|net|org|ac|gov|edu|mil|sch)\\.[a-z]{2}$"

  /** Lowercased host of a URL column ("" when not an absolute URL). */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, UrlHostPattern, 1))

  /** DuckDB twin of [[urlHost]] (RE2 takes every pattern above; DuckDB
    * regexp_extract returns '' on no match, same as Spark). */
  def urlHostSql(urlExpr: String): String =
    s"lower(regexp_extract($urlExpr, '$UrlHostPattern', 1))"

  /** Registrable domain of a host: last two labels, or last three
    * under a [[MultiSuffixPattern]] suffix. Hosts with fewer labels
    * pass through whole ([[org.apache.spark.sql.functions.substring_index]]
    * semantics). Blocklist matching keys on this column so one entry
    * covers every subdomain. */
  def registrableDomain(host: Column): Column =
    when(host.rlike(MultiSuffixPattern), substring_index(host, ".", -3))
      .otherwise(substring_index(host, ".", -2))

  /** DuckDB twin of [[registrableDomain]] — negative list slices are
    * DuckDB's substring_index-from-the-right. */
  def registrableDomainSql(hostExpr: String): String =
    s"CASE WHEN regexp_matches($hostExpr, '$MultiSuffixPattern') " +
      s"THEN array_to_string(string_split($hostExpr, '.')[-3:], '.') " +
      s"ELSE array_to_string(string_split($hostExpr, '.')[-2:], '.') END"

  /** Regex-escape a literal word for embedding in an alternation (the
    * word lists are caller-supplied config, not trusted patterns). */
  private def reQuote(w: String): String =
    w.flatMap(c =>
      if (c.isLetterOrDigit) c.toString else "\\" + c)

  /** Case-insensitive whole-word alternation pattern for a word list —
    * shared by [[badwordCount]] and its SQL twin. ASCII word
    * boundaries: Java and RE2 agree on `\b` for ASCII lists — which is
    * exactly why the alphabet is RESTRICTED to printable ASCII here:
    * `\x`-escapes of non-ASCII letters are where the two engines'
    * escape sets can disagree, and `\b` itself is ASCII-word-only in
    * RE2. Word lists are caller config; reject the out-of-contract
    * alphabet loudly instead of diverging silently. */
  def wordListPattern(words: Seq[String]): String = {
    words.foreach { w =>
      require(w.nonEmpty && w.forall(c => c >= 0x20 && c < 0x7f),
        s"word list entries must be non-empty printable ASCII, got: '$w'")
    }
    "(?i)\\b(?:" + words.map(reQuote).mkString("|") + ")\\b"
  }

  /** [[wordListPattern]] as a single-quoted SQL literal — the regex
    * layer escapes metacharacters, but the SQL quoting layer needs its
    * own discipline (a word containing `'` would otherwise break or
    * inject into the generated statement). */
  def wordListPatternSqlLit(words: Seq[String]): String =
    "'" + wordListPattern(words).replace("'", "''") + "'"

  /** Occurrences of any listed word in `text` (whole-word,
    * case-insensitive). The C4 "bad words" gate is `badwordCount > 0`;
    * keeping the count (not a flag) lets callers threshold by ppm for
    * softer policies. One codegen regexp scan. */
  def badwordCount(text: Column, words: Seq[String]): Column =
    if (words.isEmpty) lit(0L)
    else regexp_count(text, lit(wordListPattern(words))).cast("long")

  /** DuckDB twin of [[badwordCount]] (len ∘ regexp_extract_all — the
    * engine's regexp_count form). */
  def badwordCountSql(textExpr: String, words: Seq[String]): String =
    if (words.isEmpty) "CAST(0 AS BIGINT)"
    else s"CAST(len(regexp_extract_all($textExpr, " +
      s"${wordListPatternSqlLit(words)})) AS BIGINT)"

  /** DuckDB oracle twin of [[extractText]] over SQL expression
    * `htmlExpr` — built from the SAME pattern constants so the two
    * engines cannot drift. RE2 accepts every pattern above; newline
    * replacement goes through chr(10) (RE2 rewrite strings reject
    * backslash escapes). */
  def extractTextSql(htmlExpr: String): String = {
    def rr(x: String, pat: String, repl: String) =
      s"regexp_replace($x, '$pat', $repl, 'g')"
    val noComments = rr(htmlExpr, CommentPattern, "''")
    val noScript = rr(noComments, ScriptPattern, "''")
    val noStyle = rr(noScript, StylePattern, "''")
    val broken = rr(noStyle, BlockBreakPattern, "chr(10)")
    val noTags = rr(broken, TagPattern, "' '")
    val decoded = Entities.foldLeft(noTags) { case (x, (ent, repl)) =>
      val r = if (repl == "'") "''" else repl
      s"replace($x, '$ent', '$r')"
    }
    val hspace = rr(decoded, HspacePattern, "' '")
    val lines = rr(hspace, LineBreakPattern, "chr(10)")
    rr(lines, EdgePattern, "''")
  }

  /** DuckDB oracle twin of [[mainContent]]. */
  def mainContentSql(textExpr: String, minLineChars: Int): String =
    s"coalesce(list_aggregate(list_filter(string_split($textExpr, chr(10)), " +
      s"l -> length(l) >= $minLineChars), 'string_agg', chr(10)), '')"
}
