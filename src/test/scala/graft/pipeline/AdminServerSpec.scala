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

  private def get(port: Int, path: String): (Int, String) = {
    val conn = new java.net.URL(s"http://127.0.0.1:$port$path").openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), "UTF-8")
    (code, body)
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
      // (reference web/app/agent/index.go discoverability surface)
      val (ci, idx) = get(admin.boundPort, "/")
      assert(ci == 200, idx)
      assert(idx.contains("<html>") || idx.contains("<!DOCTYPE html>"), idx)
      Seq("/config", "/pipeline/describe", "/progress").foreach(ep =>
        assert(idx.contains(s"""href="$ep""""), s"index must link $ep: $idx"))
    } finally admin.stop()
  }
}
