package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Full URL canonicalization — the first dedup key of every crawl
  * pipeline (the same page arrives as `HTTP://Example.COM:80/a/?utm_
  * source=x#frag` and `http://example.com/a/` across fetches). One
  * codegen'd pass per row:
  *
  *  - scheme and host lowercase; a trailing host dot dropped;
  *  - default ports stripped scheme-aware (http:80, https:443);
  *  - the fragment dropped;
  *  - tracking query parameters removed (`utm_*`, `gclid`, `fbclid`,
  *    `msclkid`, `ref`), the survivors SORTED by (key, value) — a
  *    canonical order so permuted params hash identically;
  *  - an empty query dropped; a bare "/" path dropped; a trailing
  *    path slash dropped (directory-vs-page ambiguity resolves one
  *    way, the choice crawl canonicalizers make).
  *
  * Anything `java.net.URI` rejects passes through verbatim (crawl
  * inputs are adversarial; a normalizer that throws poisons the whole
  * scan). The regexp-subset twin lives in
  * [[graft.llm.Extract.normalizeUrlLite]] for the DuckDB oracle; this
  * expression is the full-fidelity form (host/scheme casing, ports
  * and param sorting need real parsing, not RE2).
  */
case class NormalizeUrl(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeUrl.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeUrl.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeUrl {

  private val Tracking = Set("gclid", "fbclid", "msclkid", "ref")

  private def tracked(key: String): Boolean = {
    val k = key.toLowerCase
    k.startsWith("utm_") || Tracking(k)
  }

  /** Called from generated code and from nullSafeEval. */
  def normalize(s: UTF8String): UTF8String = {
    val raw = s.toString
    val u =
      try new java.net.URI(raw)
      catch { case _: java.net.URISyntaxException => return s }
    if (u.getScheme == null || u.getHost == null) return s
    val scheme = u.getScheme.toLowerCase
    var host = u.getHost.toLowerCase
    if (host.endsWith(".") && host.length > 1) host = host.dropRight(1)
    val port = u.getPort match {
      case -1 => ""
      case 80 if scheme == "http" => ""
      case 443 if scheme == "https" => ""
      case p => s":$p"
    }
    var path = Option(u.getRawPath).getOrElse("")
    if (path == "/") path = ""
    else if (path.endsWith("/") && path.length > 1) path = path.dropRight(1)
    val query = Option(u.getRawQuery).map { q =>
      val kept = q.split("&").toIndexedSeq.filter(_.nonEmpty)
        .map { p =>
          val i = p.indexOf('=')
          if (i < 0) (p, null: String) else (p.take(i), p.drop(i + 1))
        }
        .filterNot { case (k, _) => tracked(k) }
        .sortBy { case (k, v) => (k, if (v == null) "" else v) }
        .map { case (k, v) => if (v == null) k else s"$k=$v" }
      if (kept.isEmpty) "" else "?" + kept.mkString("&")
    }.getOrElse("")
    UTF8String.fromString(s"$scheme://$host$port$path$query")
  }

  def apply(c: Column): Column =
    GraftBridge.column(NormalizeUrl(GraftBridge.expression(c)))
}
