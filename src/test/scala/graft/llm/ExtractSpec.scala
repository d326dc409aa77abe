package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.HtmlEntityDecode

/** HTML extraction beyond the oracle-pinned chain: the full
  * character-reference decoder (numeric forms need codepoint
  * arithmetic no SQL twin can express) and its composition into
  * extractTextFull. */
class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private def dec(s: String): String =
    Seq(s).toDF("x").select(HtmlEntityDecode($"x").as("d"))
      .as[String].head()

  test("numeric references decode at any scalar; named set matches the " +
      "chain; one decode pass only") {
    assert(dec("&#65;&#98;&#x43;&#x64;") == "AbCd")
    assert(dec("snow &#x2603; man") == "snow ☃ man")
    assert(dec("astral &#x1F600;!") == "astral 😀!")
    assert(dec("&lt;b&gt; &quot;q&quot; &apos;a&apos; &amp; x&nbsp;y") ==
      "<b> \"q\" 'a' & x y")
    // single pass: double-escaped text decodes exactly one level
    assert(dec("&amp;#65; &amp;lt;") == "&#65; &lt;")
  }

  test("malformed references pass through verbatim (browser leniency)") {
    assert(dec("AT&T; a & b") == "AT&T; a & b") // unknown name, bare &
    assert(dec("&#xD800; &#1114112; &#; &#xzz;") ==
      "&#xD800; &#1114112; &#; &#xzz;") // surrogate, overflow, empty, junk
    assert(dec("&unterminated") == "&unterminated")
    assert(dec("&waytoolongname;") == "&waytoolongname;") // > MaxBody
    assert(dec("") == "" && dec("no entities") == "no entities")
  }

  test("extractTextFull equals extractText on named-only input and " +
      "additionally decodes numeric references") {
    val html = "<p>alpha &amp; beta &lt;x&gt;</p><div>line two</div>"
    val both = Seq(html).toDF("h")
      .select(Extract.extractText($"h").as("a"),
        Extract.extractTextFull($"h").as("b"))
      .as[(String, String)].head()
    assert(both._1 == both._2)
    val numeric = "<p>caf&#233; &#x2014; d&#234;j&#224;</p>"
    val full = Seq(numeric).toDF("h")
      .select(Extract.extractTextFull($"h")).as[String].head()
    assert(full == "café — dêjà")
  }

  test("llm.extract actor with full_entities decodes numeric references") {
    val in = java.nio.file.Files
      .createTempDirectory("graft-extract-full-").toString + "/in"
    Seq((1L, "<p>caf&#233; &amp; bar</p>")).toDF("id", "page")
      .write.parquet(in)
    val yaml =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  ex:  {module: llm.extract, params: {column: page, full_entities: true}}
        |  ex_full_out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [ex]}
        |  ex:  {connect: [ex_full_out]}
        |""".stripMargin
    new graft.pipeline.PipelineCompiler(spark,
      graft.pipeline.PipelineConfig.parse(yaml)).runBatch()
    assert(spark.table("ex_full_out").select($"text").as[String].head() ==
      "café & bar")
  }

  test("urlHost strips scheme/userinfo/port and lowercases; " +
      "registrableDomain takes 2 labels, 3 under multi-part suffixes") {
    val cases = Seq(
      "http://www.Site.Example.COM/p?q=1#f" ->
        ("www.site.example.com", "example.com"),
      "https://user:pw@blog.co.uk:8443/x" -> ("blog.co.uk", "blog.co.uk"),
      "ftp://a.b.ac.jp/f" -> ("a.b.ac.jp", "b.ac.jp"),
      "http://localhost/x" -> ("localhost", "localhost"),
      "relative/path" -> ("", ""),
      "" -> ("", ""))
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), Extract.urlHost(col("url")).as("h"))
      .select(col("url"), col("h"),
        Extract.registrableDomain(col("h")).as("d"))
      .as[(String, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    cases.foreach { case (u, exp) =>
      assert(got(u) == exp, s"$u: got ${got(u)}, want $exp")
    }
  }

  test("badwordCount is whole-word and case-insensitive; empty list " +
      "counts zero") {
    val df = Seq(
      "win the JACKPOT, now",   // case + punctuation boundary
      "jackpots are compound",  // NOT a whole-word hit
      "roulette and jackpot",   // two hits
      "").toDF("t")
    val n = df.select(Extract.badwordCount(col("t"),
      Seq("jackpot", "roulette")).as("n")).as[Long].collect().toSeq
    assert(n == Seq(1L, 0L, 2L, 0L), s"got $n")
    val z = df.select(Extract.badwordCount(col("t"), Nil).as("n"))
      .as[Long].collect().toSeq
    assert(z == Seq(0L, 0L, 0L, 0L))
  }

  test("word lists are validated (printable ASCII only) and their SQL " +
      "literal form doubles single quotes — no injection, no " +
      "Java/RE2 escape drift") {
    // the alphabet contract rejects loudly instead of diverging
    intercept[IllegalArgumentException](Extract.wordListPattern(Seq("")))
    intercept[IllegalArgumentException](Extract.wordListPattern(Seq("naïve")))
    intercept[IllegalArgumentException](Extract.wordListPattern(Seq("a\tb")))
    // a single quote is legal ASCII config (e.g. "don't"): the regex
    // layer escapes it as a metachar-free literal, the SQL layer
    // doubles it so the generated statement stays one literal
    val lit = Extract.wordListPatternSqlLit(Seq("don't"))
    assert(lit.startsWith("'") && lit.endsWith("'"))
    assert(lit.contains("don\\''t"), lit)
    val sql = Extract.badwordCountSql("text", Seq("don't"))
    // balanced quoting: an even number of quote chars in the statement
    assert(sql.count(_ == '\'') % 2 == 0, sql)
    // and the Spark side actually matches the quoted word whole-word
    val df = Seq("i don't care", "donte dont don'tish").toDF("t")
    val n = df.select(Extract.badwordCount(col("t"), Seq("don't")).as("n"))
      .as[Long].collect().toSeq
    assert(n == Seq(1L, 0L), s"got $n")
  }

  test("mainContentBlocks keeps prose, drops link-dense nav/footer, " +
      "and never loses a document row") {
    val prose = "This is a long enough paragraph of running prose " +
      "that should comfortably clear the minimum character bound."
    val df = Seq(
      (1L, "<html><body><div><a href=/>Home</a> <a href=/a>About</a>" +
        "</div><p>" + prose + "</p>" +
        "<div><a href=/p>Privacy</a></div></body></html>"),
      (2L, "<html><body><div><a>Only</a> <a>Links</a> <a>Here</a>" +
        "</div></body></html>"), // all boilerplate -> empty main_text
      (3L, ""),                  // empty doc -> explicit empty row
      // anchor spanning a block break: the open marker lands in one
      // block, the close in the next — both degrade to linkLen 0
      (4L, "<p>Before the split <a href=/x>link text begins here" +
        "</p><p>and ends over here</a> with plenty of trailing prose " +
        "to clear the length bound.</p>"),
      // sentinel forgery: raw \u0001/\u0002 bytes in crawl garbage
      // must be scrubbed, not honored as structure
      (5L, "<p>Forged \u0001 and \u0002 sentinels inside otherwise " +
        "acceptable running prose long enough to keep.</p>"))
      .toDF("doc_id", "html")
    val out = Extract.mainContentBlocks(df, "html", "doc_id")
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, String)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 == prose, s"got ${byId(1L)._4}")
    assert(byId(1L)._2 == 3L && byId(1L)._3 == 1L) // nav, prose, footer
    assert(byId(2L)._4 == "" && byId(2L)._3 == 0L)
    assert(byId(3L) == ((3L, 0L, 0L, "")))
    assert(byId(4L)._3 == 2L, s"got ${byId(4L)}") // both halves survive
    assert(byId(5L)._4.contains("Forged") &&
      !byId(5L)._4.contains("\u0001") && !byId(5L)._4.contains("\u0002"))
  }

  test("llm.main_content actor rewrites html to block-classified text") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mce-pipe-").toString + "/in"
    val prose = "A paragraph of sustained prose that is long enough " +
      "to survive the block classifier without any trouble at all."
    Seq((1L, "<div><a href=/>Nav</a> <a href=/b>Bar</a></div><p>" +
        prose + "</p>"),
      (2L, "<div><a>Only</a><a>Links</a></div>"))
      .toDF("doc_id", "html").write.parquet(dir)
    val yaml =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$dir"}}
        |  mce: {module: llm.main_content, params: {column: html}}
        |  mce_pipe_out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [mce]}
        |  mce: {connect: [mce_pipe_out]}
        |""".stripMargin
    new graft.pipeline.PipelineCompiler(spark,
      graft.pipeline.PipelineConfig.parse(yaml)).runBatch()
    val rows = spark.table("mce_pipe_out")
      .select($"doc_id", $"text", $"n_good").as[(Long, String, Long)]
      .collect().map { case (id, t, g) => id -> ((t, g)) }.toMap
    assert(rows(1L) == ((prose, 1L)))
    assert(rows(2L) == (("", 0L)))
  }

  test("llm.extract drop_noindex honors the page's robots consent " +
      "before extraction; attribute order and case do not matter") {
    val in = java.nio.file.Files
      .createTempDirectory("graft-noindex-pipe-").toString + "/in"
    Seq(
      (1L, "<head><meta charset=utf-8></head><p>kept page</p>"),
      (2L, "<head><meta name=\"robots\" content=\"noindex\"></head>" +
        "<p>dropped</p>"),
      (3L, "<head><meta content=NOINDEX,nofollow name=robots></head>" +
        "<p>dropped too</p>"),
      (4L, "<head><META NAME=ROBOTS CONTENT=\"index, follow\"></head>" +
        "<p>follow is not nofollow</p>"))
      .toDF("doc_id", "html").write.parquet(in)
    val yaml =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  ex:  {module: llm.extract, params: {column: html,
        |        drop_noindex: "true"}}
        |  noindex_pipe_out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [ex]}
        |  ex:  {connect: [noindex_pipe_out]}
        |""".stripMargin
    new graft.pipeline.PipelineCompiler(spark,
      graft.pipeline.PipelineConfig.parse(yaml)).runBatch()
    assert(spark.table("noindex_pipe_out")
      .select($"doc_id").as[Long].collect().toSet == Set(1L, 4L))
  }

  test("interpreted eval agrees with codegen") {
    val df = Seq("&#65;&amp;&#x1F600;&bogus; tail").toDF("x")
    val viaCodegen = df.select(HtmlEntityDecode($"x")).as[String].head()
    // filter forces a non-codegen (interpreted predicate) path too;
    // and direct JVM decode is the reference
    val direct = HtmlEntityDecode.decode(
      org.apache.spark.unsafe.types.UTF8String
        .fromString("&#65;&amp;&#x1F600;&bogus; tail")).toString
    assert(viaCodegen == direct && direct == "A&😀&bogus; tail")
  }
}
