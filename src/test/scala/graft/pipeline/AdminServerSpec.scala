package graft.pipeline

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import graft.SparkSpec
import graft.streaming.{AdminServer, Streams}

/** e2e for the live admin surface (reference web/app/http.go:22-63):
  * /config, /pipeline/describe and /progress serve over HTTP WHILE a
  * streaming pipeline is running — the introspection an operator needs
  * against a live relay, not just at launch. */
class AdminServerSpec extends SparkSpec {
  import spark.implicits._

  private def get(port: Int, path: String): (Int, String) =
    getWithType(port, path) match { case (c, b, _) => (c, b) }

  private def getWithType(port: Int, path: String): (Int, String, String) = {
    val conn = new java.net.URL(s"http://127.0.0.1:$port$path").openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), "UTF-8")
    (code, body, String.valueOf(conn.getContentType))
  }

  test("admin endpoints serve config, DOT and live progress during a streaming run") {
    val in = Files.createTempDirectory("graft-admin-in-").toString
    // two parquet files -> two micro-batches at maxFilesPerTrigger=1
    Seq((1L, "a"), (2L, "b")).toDF("id", "k")
      .repartition(1).write.mode("append").parquet(in)
    Seq((3L, "c"), (4L, "d")).toDF("id", "k")
      .repartition(1).write.mode("append").parquet(in)
    val yaml =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  out: {module: core.sink, params: {format: noop}}
        |pipeline:
        |  src: {connect: [out]}
        |""".stripMargin
    val repo = ConfigRepository.forPipeline(yaml, args = Seq("-o", "system.maxprocs=8"))
    val cfg = repo.toPipelineConfig
    val admin = new AdminServer(spark,
      () => repo.explainAll, () => PipelineConfig.toDot(cfg)).start()
    try {
      // /config: resolved provenance, cli layer winning over the default
      val (c1, cfgBody) = get(admin.boundPort, "/config")
      assert(c1 == 200, cfgBody)
      assert(cfgBody.contains("system.maxprocs = 8  (cli:30)"), cfgBody)
      assert(cfgBody.contains("default:0=1"), cfgBody)
      // /pipeline/describe: the DAG as DOT
      val (c2, dotBody) = get(admin.boundPort, "/pipeline/describe")
      assert(c2 == 200, dotBody)
      assert(dotBody.contains("digraph pipeline"), dotBody)
      assert(dotBody.contains("\"src\" -> \"out\""), dotBody)

      // /progress LIVE: hold micro-batch 1 open until the poll loop has
      // seen batch 0's committed StreamingQueryProgress on an active query
      val release = new CountDownLatch(1)
      val schema = spark.read.parquet(in).schema
      val runner = new Thread(() => {
        val df = Streams.fileSource(spark, in, schema, maxFilesPerTrigger = Some(1))
        Streams.runForeachBatch(df, (batch, id) => {
          batch.count()
          if (id >= 1) release.await()
          ()
        })
      })
      runner.start()
      val deadline = System.currentTimeMillis() + 30000
      var live = ""
      while (!live.contains("\"numInputRows\"") && System.currentTimeMillis() < deadline) {
        live = get(admin.boundPort, "/progress")._2
        Thread.sleep(50)
      }
      release.countDown()
      runner.join(30000)
      assert(live.contains("\"isActive\":true"), live.take(2000))
      assert(live.contains("\"numInputRows\""), live.take(2000))

      // after the run drains: still 200, empty active-query array
      assert(get(admin.boundPort, "/progress")._1 == 200)
      // unknown path and non-GET are refused, not crashed
      assert(get(admin.boundPort, "/nope")._1 == 404)

      // `/` serves the HTML index enumerating every endpoint as a link
      // (reference web/app/agent/index.go discoverability surface),
      // with the content-type a browser needs to render it
      val (ci, idx, idxType) = getWithType(admin.boundPort, "/")
      assert(ci == 200, idx)
      assert(idxType.startsWith("text/html"), s"index content-type: $idxType")
      assert(idx.contains("<html>") || idx.contains("<!DOCTYPE html>"), idx)
      Seq("/config", "/pipeline/describe", "/pipeline/html", "/progress")
        .foreach(ep =>
          assert(idx.contains(s"""href="$ep""""), s"index must link $ep: $idx"))

      // /pipeline/html: the DAG rendered for a browser — edges as an
      // HTML list plus the DOT source, served as text/html
      val (cph, ph, phType) = getWithType(admin.boundPort, "/pipeline/html")
      assert(cph == 200, ph)
      assert(phType.startsWith("text/html"), s"pipeline/html content-type: $phType")
      assert(ph.contains("src &rarr; out"), ph)
      assert(ph.contains("digraph pipeline"), ph) // DOT source embedded

      // HEAD is GET without a body (health probes): 200, headers, no bytes
      val head = new java.net.URL(s"http://127.0.0.1:${admin.boundPort}/")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      head.setRequestMethod("HEAD")
      assert(head.getResponseCode == 200)
      assert(head.getContentLengthLong > 0L, "HEAD must carry Content-Length")
      assert(head.getInputStream.readAllBytes().isEmpty, "HEAD body must be empty")
    } finally admin.stop()
  }

  test("/pipeline/html preserves interpolated lines starting with '|'") {
    // stripMargin must run on the static template only: a DOT line whose
    // content begins with '|' (legal in node names/labels) would
    // otherwise be truncated at render time
    val dot = "digraph pipeline {\n  \"a|x\" -> \"|b\"\n  |weird label line\n}"
    val admin = new graft.streaming.AdminServer(spark, () => "", () => dot)
      .start()
    try {
      val (c, body) = get(admin.boundPort, "/pipeline/html")
      assert(c == 200, body)
      assert(body.contains("|weird label line"), body)
      assert(body.contains("a|x &rarr; |b"), body)
    } finally admin.stop()
  }

  test("progress advances across micro-batches while a tcp bind receiver ingests") {
    // the daemon composition an operator actually runs: a YAML pipeline
    // with a live socket receiver in --follow mode, introspected over
    // the admin surface WHILE rows stream in
    val yaml =
      """actors:
        |  rcv: {module: core.receiver, params: {bind: "tcp://:0", channel: admin-bind-e2e}}
        |  out: {module: core.sink, params: {format: noop}}
        |pipeline:
        |  rcv: {connect: [out]}
        |""".stripMargin
    graft.sources.PushReceiver.clear("admin-bind-e2e")
    val cfg = PipelineConfig.parse(yaml)
    val compiler = new PipelineCompiler(spark, cfg)
    val port = compiler.startReceivers()("rcv")
    val admin = new AdminServer(spark,
      () => yaml, () => PipelineConfig.toDot(cfg)).start()
    val queries = compiler.startStreaming(Map.empty,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    try {
      def sendLines(lines: Seq[String]): Unit = {
        val s = new java.net.Socket("127.0.0.1", port)
        try {
          val out = s.getOutputStream
          val in = new java.io.BufferedReader(new java.io.InputStreamReader(
            s.getInputStream, "UTF-8"))
          lines.foreach { l =>
            out.write(s"$l\r\n".getBytes("UTF-8")); out.flush()
            assert(in.readLine() == "OK")
          }
        } finally s.close()
      }
      // the progress JSON snapshot for our query: batchId at latest poll
      def batchIdWithRows(): Option[Long] = {
        val (code, body) = get(admin.boundPort, "/progress")
        assert(code == 200, body)
        val m = """"batchId"\s*:\s*(\d+)""".r.findFirstMatchIn(body)
        val rows = """"numInputRows"\s*:\s*([1-9]\d*)""".r.findFirstMatchIn(body)
        if (rows.isDefined) m.map(_.group(1).toLong) else None
      }
      def awaitIngestedBatch(after: Long): Long = {
        val deadline = System.currentTimeMillis() + 30000
        var got = Option.empty[Long]
        while (got.forall(_ <= after) && System.currentTimeMillis() < deadline) {
          got = batchIdWithRows()
          if (got.forall(_ <= after)) Thread.sleep(50)
        }
        assert(got.exists(_ > after),
          s"no ingesting batch past id $after observed on /progress")
        got.get
      }
      sendLines(Seq("wave1-a", "wave1-b"))
      val b1 = awaitIngestedBatch(after = -1L)
      // a second wave must surface as a LATER micro-batch with rows —
      // the live surface tracks the stream, it doesn't latch one batch
      sendLines(Seq("wave2-a", "wave2-b", "wave2-c"))
      val b2 = awaitIngestedBatch(after = b1)
      assert(b2 > b1)
      // the dashboard fields a relay operator needs are in the payload:
      // per-query throughput (rows/sec in+processed) and batch duration
      // — the reference's /expvar counters rendered through
      // StreamingQueryProgress.json
      val (_, body) = get(admin.boundPort, "/progress")
      Seq("\"name\":\"out\"",
          "\"inputRowsPerSecond\"", "\"processedRowsPerSecond\"",
          "\"durationMs\"", "\"triggerExecution\"", "\"numInputRows\"")
        .foreach(f => assert(body.contains(f), s"missing $f in: ${body.take(2000)}"))
      // throughput is a parseable non-negative number, not a placeholder
      val rps = """"processedRowsPerSecond"\s*:\s*([0-9.E+-]+)""".r
        .findFirstMatchIn(body).map(_.group(1).toDouble)
      assert(rps.exists(_ >= 0.0), s"processedRowsPerSecond unparseable: $rps")
    } finally {
      queries.values.foreach(_.stop())
      queries.values.foreach(_.awaitTermination(30000))
      compiler.close()
      admin.stop()
    }
  }

  test("/sinks composite status: fan-out with one healthy and one dead sink") {
    // the reference replicator's composite status (replicator.go:120-145):
    // a fan-out where ONE downstream is failing must report per-sink
    // health — the dead peer accrues dead-letter counters while the
    // healthy peer keeps delivering, and the admin payload distinguishes
    // them instead of collapsing to a single pipeline-wide verdict
    val healthy = new java.net.ServerSocket(
      0, 50, java.net.InetAddress.getLoopbackAddress)
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val acceptor = new Thread(() => {
      try while (!healthy.isClosed) {
        val s = healthy.accept()
        val worker = new Thread(() => {
          val r = new java.io.BufferedReader(new java.io.InputStreamReader(
            s.getInputStream, "UTF-8"))
          var line = r.readLine()
          while (line != null) { got.add(line); line = r.readLine() }
          s.close()
        })
        worker.setDaemon(true); worker.start()
      } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true); acceptor.start()
    val deadPort = {
      val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p
    }
    val yaml =
      s"""actors:
        |  rcv: {module: core.receiver, params: {bind: "tcp://:0", channel: admin-composite-e2e, silent: true}}
        |  ok:  {module: core.sink, params: {bind: "tcp://127.0.0.1:${healthy.getLocalPort}"}}
        |  bad: {module: core.sink, params: {bind: "tcp://127.0.0.1:$deadPort", max_attempts: 2, min_backoff_ms: 1}}
        |pipeline:
        |  rcv: {connect: [ok, bad]}
        |""".stripMargin
    graft.sources.PushReceiver.clear("admin-composite-e2e")
    val cfg = PipelineConfig.parse(yaml)
    val compiler = new PipelineCompiler(spark, cfg)
    val port = compiler.startReceivers()("rcv")
    val admin = new AdminServer(spark, () => yaml,
      () => PipelineConfig.toDot(cfg),
      deadLetters = () => compiler.deadLetterCounts).start()
    val queries = compiler.startStreaming(Map.empty,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    try {
      val s = new java.net.Socket("127.0.0.1", port)
      try s.getOutputStream.write("split-1\r\nsplit-2\r\n".getBytes("UTF-8"))
      finally s.close()
      val deadline = System.currentTimeMillis() + 30000
      var body = ""
      while (!(body.contains("\"deadLetteredRows\":2") && got.size >= 2) &&
          System.currentTimeMillis() < deadline) {
        body = get(admin.boundPort, "/sinks")._2
        Thread.sleep(50)
      }
      // the healthy leg delivered every row over its live socket...
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet == Set("split-1", "split-2"), got.toString)
      // ...while the dead leg — and ONLY the dead leg — shows failure
      // counters on the admin surface
      assert(body.contains("\"sink\":\"bad\""), body)
      assert(body.contains("\"deadLetteredRows\":2"), body)
      assert(!body.contains("\"sink\":\"ok\""),
        s"healthy sink must not accrue dead-letter counters: $body")
    } finally {
      queries.values.foreach(_.stop())
      queries.values.foreach(_.awaitTermination(30000))
      compiler.close()
      admin.stop()
      healthy.close()
    }
  }

  test("/sinks surfaces per-sink dead-letter counters after retry exhaustion") {
    // an unreachable peer exhausts a tight retry budget; the failure
    // counters must be visible over the admin surface (the reference's
    // /expvar failure side), not only via the compiler API
    val deadPort = {
      val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p
    }
    val yaml =
      s"""actors:
        |  rcv: {module: core.receiver, params: {bind: "tcp://:0", channel: admin-dlq-e2e, silent: true}}
        |  out: {module: core.sink, params: {bind: "tcp://127.0.0.1:$deadPort", max_attempts: 2, min_backoff_ms: 1}}
        |pipeline:
        |  rcv: {connect: [out]}
        |""".stripMargin
    graft.sources.PushReceiver.clear("admin-dlq-e2e")
    val cfg = PipelineConfig.parse(yaml)
    val compiler = new PipelineCompiler(spark, cfg)
    val port = compiler.startReceivers()("rcv")
    val admin = new AdminServer(spark, () => yaml,
      () => PipelineConfig.toDot(cfg),
      deadLetters = () => compiler.deadLetterCounts).start()
    val queries = compiler.startStreaming(Map.empty,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    try {
      // before any failure the payload is an empty array, still 200
      val (c0, empty) = get(admin.boundPort, "/sinks")
      assert(c0 == 200 && empty == "[]", empty)
      val s = new java.net.Socket("127.0.0.1", port)
      try s.getOutputStream.write("doomed-1\r\ndoomed-2\r\n".getBytes("UTF-8"))
      finally s.close()
      val deadline = System.currentTimeMillis() + 30000
      var body = ""
      while (!body.contains("\"deadLetteredRows\":2") &&
          System.currentTimeMillis() < deadline) {
        body = get(admin.boundPort, "/sinks")._2
        Thread.sleep(50)
      }
      assert(body.contains("\"sink\":\"out\""), body)
      assert(body.contains("\"deadLetteredRows\":2"), body)
      assert("""\"deadLetteredBatches\":[1-9]""".r.findFirstIn(body).isDefined, body)
      // the index advertises the endpoint
      assert(get(admin.boundPort, "/")._2.contains("href=\"/sinks\""))
    } finally {
      queries.values.foreach(_.stop())
      queries.values.foreach(_.awaitTermination(30000))
      compiler.close()
      admin.stop()
    }
  }
}
