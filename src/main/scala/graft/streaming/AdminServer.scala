package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** Live admin/introspection endpoint over a RUNNING pipeline — the
  * reference's embedded admin HTTP server (web/app/http.go:22-63; config
  * dump web/app/agent/config.go:19-27, DOT topology graphviz.go:31):
  *
  *  - `GET /config`            resolved config, one provenance line per
  *                             key (winner provider + shadowed layers)
  *  - `GET /pipeline/describe` the DAG as Graphviz DOT
  *  - `GET /progress`          JSON array of every active streaming
  *                             query's last StreamingQueryProgress — the
  *                             Spark rendering of the reference's
  *                             /expvar counters (rows/sec in/out, batch
  *                             durations, state rows)
  *  - `GET /sinks`             per-sink failure counters: batches/rows
  *                             dead-lettered after retry exhaustion (the
  *                             /expvar analog's failure side)
  *
  * Serves on loopback only (an operator debugging a relay, not a public
  * surface); port 0 picks an ephemeral port, `boundPort` reports it.
  * Content is computed per request, so /progress reflects the live
  * query state at each poll.
  */
final class AdminServer(spark: SparkSession,
                        explainConfig: () => String,
                        dot: () => String,
                        port: Int = 0,
                        deadLetters: () => Map[String, (Long, Long)] =
                          () => Map.empty) {

  // see NetReceivers: avoids a delayed-ACK stall on every reply; must
  // be set before the JVM's first HttpServer is created
  System.setProperty("sun.net.httpserver.nodelay", "true")

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  private def jsonStr(s: String): String =
    if (s == null) "null"
    else "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def progressJson(): String =
    spark.streams.active.map { q =>
      val p = q.lastProgress
      s"""{"id":${jsonStr(q.id.toString)},"name":${jsonStr(q.name)},""" +
        s""""isActive":${q.isActive},"progress":${if (p == null) "null" else p.json}}"""
    }.mkString("[", ",", "]")

  /** HTTP semantics treat HEAD as GET without a body (probes and
    * load-balancer health checks use it): send the same status +
    * headers with the computed length, omit the body. */
  private def respond(ex: HttpExchange, status: Int, contentType: String,
                      bytes: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    if (ex.getRequestMethod == "HEAD") {
      ex.getResponseHeaders.set("Content-Length", bytes.length.toString)
      ex.sendResponseHeaders(status, -1L)
    } else {
      ex.sendResponseHeaders(status, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
    }
  }

  private def route(path: String, contentType: String, body: () => String): Unit =
    server.createContext(path, (ex: HttpExchange) =>
      try {
        val (status, bytes) =
          if (ex.getRequestMethod != "GET" && ex.getRequestMethod != "HEAD")
            (405, "method not allowed\n".getBytes(StandardCharsets.UTF_8))
          else if (ex.getRequestURI.getPath != path) // no sub-path fallthrough
            (404, "not found\n".getBytes(StandardCharsets.UTF_8))
          else (200, body().getBytes(StandardCharsets.UTF_8))
        respond(ex, status,
          if (status == 200) contentType else "text/plain; charset=utf-8", bytes)
      } finally ex.close())

  /** Per-sink dead-letter tallies, computed per request so the payload
    * tracks the live compiler state at each poll. */
  private def sinksJson(): String =
    deadLetters().toSeq.sortBy(_._1).map { case (sink, (batches, rows)) =>
      s"""{"sink":${jsonStr(sink)},"deadLetteredBatches":$batches,""" +
        s""""deadLetteredRows":$rows}"""
    }.mkString("[", ",", "]")

  private def htmlEsc(s: String): String =
    s.flatMap { case '<' => "&lt;" case '>' => "&gt;" case '&' => "&amp;"
                case c => c.toString }

  /** Human-rendered pipeline topology: the DOT's edges as an HTML list
    * (readable without a graphviz install) plus the DOT source for
    * tooling — the browser-facing half of /pipeline/describe. */
  private def pipelineHtml(): String = {
    val d = dot()
    val edge = """"([^"]+)"\s*->\s*"([^"]+)"""".r
    val edges = edge.findAllMatchIn(d)
      .map(m => s"<li>${htmlEsc(m.group(1))} &rarr; ${htmlEsc(m.group(2))}</li>")
      .mkString("\n")
    // stripMargin runs on the STATIC template halves only: interpolating
    // the DOT/edge content first would let any content line starting
    // with '|' be eaten by the margin strip
    val head = """<!DOCTYPE html>
       |<html><head><title>graft pipeline</title></head><body>
       |<h1>pipeline topology</h1>
       |<ul>
       |""".stripMargin
    val mid = """
       |</ul>
       |<h2>DOT source</h2>
       |<pre>""".stripMargin
    head + edges + mid + htmlEsc(d) + "</pre>\n</body></html>\n"
  }

  route("/config", "text/plain; charset=utf-8", explainConfig)
  route("/pipeline/describe", "text/vnd.graphviz; charset=utf-8", dot)
  route("/pipeline/html", "text/html; charset=utf-8", () => pipelineHtml())
  route("/progress", "application/json", () => progressJson())
  route("/sinks", "application/json", () => sinksJson())

  /** Discoverability index at `/` — the reference admin server's HTML
    * landing page enumerating its surfaces (web/app/agent/index.go,
    * served via static.go); anything else under the root context stays
    * a 404. */
  private val indexHtml =
    """<!DOCTYPE html>
      |<html><head><title>graft admin</title></head><body>
      |<h1>graft admin</h1>
      |<ul>
      |<li><a href="/config">/config</a> &mdash; resolved config, one provenance line per key</li>
      |<li><a href="/pipeline/describe">/pipeline/describe</a> &mdash; pipeline DAG as Graphviz DOT</li>
      |<li><a href="/pipeline/html">/pipeline/html</a> &mdash; pipeline DAG rendered as HTML</li>
      |<li><a href="/progress">/progress</a> &mdash; live streaming-query progress (JSON)</li>
      |<li><a href="/sinks">/sinks</a> &mdash; per-sink dead-letter counters (JSON)</li>
      |</ul></body></html>
      |""".stripMargin

  server.createContext("/", (ex: HttpExchange) =>
    try {
      val (status, contentType, body) =
        if (ex.getRequestURI.getPath != "/")
          (404, "text/plain; charset=utf-8", "not found\n")
        else if (ex.getRequestMethod != "GET" && ex.getRequestMethod != "HEAD")
          (405, "text/plain; charset=utf-8", "method not allowed\n")
        else (200, "text/html; charset=utf-8", indexHtml)
      respond(ex, status, contentType, body.getBytes(StandardCharsets.UTF_8))
    } finally ex.close())

  def start(): AdminServer = { server.start(); this }
  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}
