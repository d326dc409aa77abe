package graft.functions

import graft.SparkSpec

/** Full URL canonicalization (NormalizeUrl): the parsing-required
  * rules the regexp-subset twin cannot express — casing, default
  * ports, parameter sorting — plus adversarial pass-through. */
class NormalizeUrlSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("u").select(NormalizeUrl($"u").as("n")).as[String].head()

  test("scheme/host casing, default ports, fragments, trackers, " +
      "trailing slashes") {
    assert(norm("HTTP://Example.COM:80/a/?utm_source=x#frag") ==
      "http://example.com/a")
    assert(norm("https://Example.com:443/") == "https://example.com")
    assert(norm("https://example.com:8443/x/") ==
      "https://example.com:8443/x")
    assert(norm("http://example.com./a") == "http://example.com/a")
    assert(norm("http://example.com/a?gclid=1&q=2&fbclid=3") ==
      "http://example.com/a?q=2")
  }

  test("surviving query parameters sort canonically; empty query drops") {
    assert(norm("http://e.com/p?b=2&a=1&a=0") == "http://e.com/p?a=0&a=1&b=2")
    assert(norm("http://e.com/p?utm_campaign=x&utm_source=y") ==
      "http://e.com/p")
    assert(norm("http://e.com/p?flag&a=1") == "http://e.com/p?a=1&flag")
  }

  test("permuted tracker-laden variants of one page collapse to one key") {
    val variants = Seq(
      "HTTP://News.Example.com/story/42?utm_source=tw&id=7",
      "http://news.example.com:80/story/42/?id=7#comments",
      "http://news.example.com/story/42?id=7&fbclid=zz")
    assert(variants.map(norm).distinct ==
      Seq("http://news.example.com/story/42?id=7"))
  }

  test("unparseable or schemeless inputs pass through verbatim") {
    for (bad <- Seq("not a url", "http://exa mple.com/x", "/relative/path",
        "mailto:x@y.z", "")) // mailto has no host -> verbatim
      assert(norm(bad) == bad, s"'$bad' should pass through")
  }

  test("interpreted eval agrees with codegen and the direct JVM call") {
    val in = "HTTPS://A.B:443/c/?utm_x=1&b=2&a=3#f"
    val viaDf = norm(in)
    val direct = NormalizeUrl.normalize(
      org.apache.spark.unsafe.types.UTF8String.fromString(in)).toString
    assert(viaDf == direct && direct == "https://a.b/c?a=3&b=2")
  }
}
