package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(dir: String): Unit =
    Seq(
      (1L, "click", "payload-1"), (2L, "view", "payload-2"), (3L, "click", "payload-3"),
      (4L, "bogus", "payload-4"), (5L, "purchase", "payload-5"))
      .toDF("id", "kind", "body")
      .write.mode("overwrite").parquet(dir)

  test("parse validates structure, rejects cycles and unknown actors") {
    val cyclic =
      """actors:
        |  a: {module: core.mux}
        |  b: {module: core.mux}
        |pipeline:
        |  a: {connect: [b]}
        |  b: {connect: [a]}
        |""".stripMargin
    val e = intercept[IllegalArgumentException](PipelineConfig.parse(cyclic))
    assert(e.getMessage.contains("cycle") || e.getMessage.contains("receiver"))

    val unknown =
      """actors:
        |  a: {module: core.mux}
        |pipeline:
        |  a: {connect: [ghost]}
        |""".stripMargin
    assert(intercept[IllegalArgumentException](PipelineConfig.parse(unknown))
      .getMessage.contains("ghost"))
  }

  test("unknown module and missing sink path fail loudly at build/run time") {
    val in = Files.createTempDirectory("graft-pipe-err-").toString
    writeEvents(in)
    val unknownModule =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  bad: {module: core.frobnicator}
        |  out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [bad]}
        |  bad: {connect: [out]}
        |""".stripMargin
    val e1 = intercept[RuntimeException](
      new PipelineCompiler(spark, PipelineConfig.parse(unknownModule)).runBatch())
    assert(e1.getMessage.contains("frobnicator"))

    val noPath =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  out: {module: core.sink, params: {format: parquet}}
        |pipeline:
        |  src: {connect: [out]}
        |""".stripMargin
    val e2 = intercept[RuntimeException](
      new PipelineCompiler(spark, PipelineConfig.parse(noPath)).runBatch())
    assert(e2.getMessage.contains("path"))

    // a typo'd param fails at COMPILE time with the module's schema in
    // the message (the pkg/cast convert-or-give-up contract), instead of
    // silently falling back to the default
    val typoParam =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  near: {module: llm.dedup_near, params: {column: text, treshold: "0.5"}}
        |  out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [near]}
        |  near: {connect: [out]}
        |""".stripMargin
    val e3 = intercept[IllegalArgumentException](
      new PipelineCompiler(spark, PipelineConfig.parse(typoParam)))
    assert(e3.getMessage.contains("treshold") && e3.getMessage.contains("threshold"))

    // the stream-only schema_from receiver param must stay accepted
    // (Flowd --stream uses it for schema inference)
    val streamParam =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in", schema_from: "$in"}}
        |  out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [out]}
        |""".stripMargin
    new PipelineCompiler(spark, PipelineConfig.parse(streamParam)) // must not throw
  }

  test("empty and malformed configs are rejected at parse time") {
    assert(intercept[IllegalArgumentException](PipelineConfig.parse(""))
      .getMessage.nonEmpty)
    assert(intercept[IllegalArgumentException](PipelineConfig.parse("actors: {}"))
      .getMessage.contains("no actors"))
    // actor without a module
    assert(intercept[IllegalArgumentException](
      PipelineConfig.parse("actors:\n  a: {params: {}}\n"))
      .getMessage.contains("module"))
  }

  test("toposort puts receivers before sinks; DOT render includes all nodes") {
    val yaml =
      """actors:
        |  src:  {module: core.receiver, params: {path: /tmp/x}}
        |  enc:  {module: core.encoder_base64}
        |  out:  {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [enc]}
        |  enc: {connect: [out]}
        |""".stripMargin
    val cfg = PipelineConfig.parse(yaml)
    assert(PipelineConfig.toposort(cfg) == Seq("src", "enc", "out"))
    assert(cfg.receivers == Seq("src") && cfg.sinks == Seq("out"))
    val dot = PipelineConfig.toDot(cfg)
    Seq("src", "enc", "out", "->").foreach(s => assert(dot.contains(s)))
  }

  test("end-to-end batch: receiver -> router -> per-route sinks with dead letter") {
    val in = Files.createTempDirectory("graft-pipe-in-").toString
    writeEvents(in)
    // route names equal downstream actor names (router.go Connect wiring)
    val yaml2 =
      s"""actors:
        |  src:      {module: core.receiver, params: {path: "$in"}}
        |  route:    {module: core.router, params: {key: kind, dead_letter: dlq}}
        |  click:    {module: core.sink, params: {format: memory}}
        |  view:     {module: core.sink, params: {format: memory}}
        |  dlq:      {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src:   {connect: [route]}
        |  route: {connect: [click, view, dlq]}
        |""".stripMargin
    val cfg = PipelineConfig.parse(yaml2)
    val counts = new PipelineCompiler(spark, cfg).runBatch()
    assert(counts == Map("click" -> 2L, "view" -> 1L, "dlq" -> 2L))
    // memory sinks registered as views; dead letter carries UNROUTABLE
    assert(spark.table("dlq").select($"kind").as[String].collect().toSet ==
      Set("bogus", "purchase"))
  }

  test("end-to-end batch: transform chain compresses and encodes bodies losslessly") {
    val in = Files.createTempDirectory("graft-pipe-in2-").toString
    val out = Files.createTempDirectory("graft-pipe-out-").toString + "/result"
    writeEvents(in)
    val yaml =
      s"""actors:
        |  src:  {module: core.receiver, params: {path: "$in"}}
        |  gz:   {module: core.compressor, params: {codec: zstd, column: body}}
        |  gunz: {module: core.decompressor, params: {codec: zstd, column: body}}
        |  b64:  {module: core.encoder_base64, params: {column: body}}
        |  deb:  {module: core.decoder_base64, params: {column: body}}
        |  out:  {module: core.sink, params: {format: parquet, path: "$out"}}
        |pipeline:
        |  src:  {connect: [gz]}
        |  gz:   {connect: [gunz]}
        |  gunz: {connect: [b64]}
        |  b64:  {connect: [deb]}
        |  deb:  {connect: [out]}
        |""".stripMargin
    val cfg = PipelineConfig.parse(yaml)
    val counts = new PipelineCompiler(spark, cfg).runBatch()
    assert(counts("out") == 5L)
    val bodies = spark.read.parquet(out)
      .select($"body".cast("string")).as[String].collect().toSet
    assert(bodies == (1 to 5).map(i => s"payload-$i").toSet)
  }

  test("end-to-end streaming: same pipeline over a file stream drains all rows") {
    val in = Files.createTempDirectory("graft-pipe-sin-").toString
    writeEvents(in)
    val yaml =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  enc: {module: core.encoder_base64, params: {column: body}}
        |  out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [enc]}
        |  enc: {connect: [out]}
        |""".stripMargin
    val cfg = PipelineConfig.parse(yaml)
    val schema = spark.read.parquet(in).schema
    val counts = new PipelineCompiler(spark, cfg)
      .runStreamingOnce(Map("src" -> schema))
    assert(counts("out") == 5L)
  }

  test("partitioned parquet sink demuxes rows into per-key directories") {
    val in = Files.createTempDirectory("graft-pipe-part-in-").toString
    val out = Files.createTempDirectory("graft-pipe-part-out-").toString + "/demux"
    writeEvents(in)
    val yaml =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  out: {module: core.sink, params: {format: parquet, path: "$out", partition_by: [kind]}}
        |pipeline:
        |  src: {connect: [out]}
        |""".stripMargin
    val counts = new PipelineCompiler(spark, PipelineConfig.parse(yaml)).runBatch()
    assert(counts("out") == 5L)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("kind=click", "kind=view", "kind=bogus", "kind=purchase"))
  }

  test("runStreamingOnce writes sink outputs per micro-batch, not just counts") {
    val in = Files.createTempDirectory("graft-pipe-sonce-in-").toString
    val out = Files.createTempDirectory("graft-pipe-sonce-out-").toString + "/sink"
    writeEvents(in)
    val yaml =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  out: {module: core.sink, params: {format: parquet, path: "$out"}}
        |pipeline:
        |  src: {connect: [out]}
        |""".stripMargin
    val schema = spark.read.parquet(in).schema
    val counts = new PipelineCompiler(spark, PipelineConfig.parse(yaml))
      .runStreamingOnce(Map("src" -> schema))
    assert(counts("out") == 5L)
    // the --stream run materialized the sink, matching the daemon mode
    assert(spark.read.parquet(out).count() == 5L)
  }

  test("push-receiver pipeline streams pushed messages through transforms to a sink") {
    val ch = "pipe-push"
    graft.sources.PushReceiver.clear(ch)
    Seq("alpha", "beta").foreach(s =>
      graft.sources.PushReceiver.push(ch, s.getBytes("UTF-8")))
    val yaml =
      s"""actors:
        |  src: {module: core.push_receiver, params: {channel: "$ch"}}
        |  enc: {module: core.encoder_base64, params: {column: body}}
        |  out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [enc]}
        |  enc: {connect: [out]}
        |""".stripMargin
    val cfg = PipelineConfig.parse(yaml)
    val counts = new PipelineCompiler(spark, cfg).runStreamingOnce(Map.empty)
    assert(counts("out") == 2L)
  }

  test("topk actor ranks per key through the custom operator in YAML pipelines") {
    val in = Files.createTempDirectory("graft-pipe-topk-").toString
    Seq((1L, "a", 10), (2L, "a", 30), (3L, "a", 20), (4L, "b", 5))
      .toDF("id", "grp", "score").write.mode("overwrite").parquet(in)
    val yaml =
      s"""actors:
        |  src:  {module: core.receiver, params: {path: "$in"}}
        |  top:  {module: core.topk, params: {keys: [grp], order: ["score desc", id], k: 2}}
        |  out:  {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [top]}
        |  top: {connect: [out]}
        |""".stripMargin
    val counts = new PipelineCompiler(spark, PipelineConfig.parse(yaml)).runBatch()
    assert(counts("out") == 3L) // a: top-2 of 3; b: 1
    val got = spark.table("out").select($"id", $"rank").as[(Long, Int)].collect().toSet
    assert(got == Set((2L, 1), (3L, 2), (4L, 1)))
  }

  test("replicator ncopy pipeline places n jump-hash copies on the sink peers") {
    val in = Files.createTempDirectory("graft-pipe-ncopy-").toString
    writeEvents(in)
    val yaml =
      s"""actors:
        |  src:  {module: core.receiver, params: {path: "$in"}}
        |  rep:  {module: core.replicator, params: {mode: ncopy, key: id, n: 2}}
        |  s1:   {module: core.sink, params: {format: memory}}
        |  s2:   {module: core.sink, params: {format: memory}}
        |  s3:   {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [rep]}
        |  rep: {connect: [s1, s2, s3]}
        |""".stripMargin
    val counts = new PipelineCompiler(spark, PipelineConfig.parse(yaml)).runBatch()
    // n=2 distinct replicas per row over 3 buckets: exactly 2x the input
    assert(counts.values.sum == 10L, s"ncopy must place exactly n copies: $counts")
    // placement must be the library operator's (the oracle-checked
    // op_replicator_ncopy shape): bucket i feeds the i-th sorted sink
    val expected = graft.operators.Routing
      .replicateNcopy(spark.read.parquet(in), $"id", n = 2, numBuckets = 3)
      .groupBy($"copy_id").count()
      .as[(Int, Long)].collect().toMap
    assert(counts == Map(
      "s1" -> expected.getOrElse(0, 0L),
      "s2" -> expected.getOrElse(1, 0L),
      "s3" -> expected.getOrElse(2, 0L)), s"counts=$counts expected=$expected")
    // every replica pair is distinct per row: no sink sees the same id twice
    Seq("s1", "s2", "s3").foreach { s =>
      val ids = spark.table(s).select($"id").as[Long].collect()
      assert(ids.distinct.length == ids.length, s"$s got a duplicate replica")
    }
  }

  test("replicator fanout pipeline splits rows across sinks without loss") {
    val in = Files.createTempDirectory("graft-pipe-fan-").toString
    writeEvents(in)
    val yaml =
      s"""actors:
        |  src:  {module: core.receiver, params: {path: "$in"}}
        |  rep:  {module: core.replicator, params: {mode: fanout}}
        |  s1:   {module: core.sink, params: {format: memory}}
        |  s2:   {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [rep]}
        |  rep: {connect: [s1, s2]}
        |""".stripMargin
    val counts = new PipelineCompiler(spark, PipelineConfig.parse(yaml)).runBatch()
    assert(counts.values.sum == 5L, s"fanout must not duplicate or drop: $counts")
  }

  test("re-running a memory-sink pipeline releases the replaced view's cache") {
    val in = Files.createTempDirectory("graft-pipe-cache-").toString
    writeEvents(in)
    val yaml =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [out]}
        |""".stripMargin
    val compiler = new PipelineCompiler(spark, PipelineConfig.parse(yaml))
    val before = spark.sparkContext.getPersistentRDDs.size
    compiler.runBatch()
    compiler.runBatch()
    compiler.runBatch()
    // config-reload loop on a long-lived session: each run replaces the
    // view, so at most ONE cache (the live view's) may remain pinned
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1,
      s"memory sink leaked ${after - before} caches across 3 runs")
    assert(spark.table("out").count() == 5L)
  }

  test("a bind sink carrying a stray format param still loads (format is never read)") {
    // the compiler's dispatch ignores `format` when `bind` is present —
    // the load-time format/path rules must mirror that order, not fail a
    // config for a param that would never be read
    val yaml =
      """actors:
        |  rcv: {module: core.receiver, params: {bind: "tcp://:0", channel: psc-bindfmt}}
        |  out: {module: core.sink, params: {bind: "udp://127.0.0.1:9", format: parquet}}
        |pipeline:
        |  rcv: {connect: [out]}
        |""".stripMargin
    new PipelineCompiler(spark, PipelineConfig.parse(yaml)) // must not throw
    // format-dispatched sinks keep the strict rule
    val noBind =
      """actors:
        |  rcv: {module: core.receiver, params: {bind: "tcp://:0", channel: psc-nofmt}}
        |  out: {module: core.sink, params: {format: parquet}}
        |pipeline:
        |  rcv: {connect: [out]}
        |""".stripMargin
    val e = intercept[IllegalArgumentException](PipelineConfig.parse(noBind))
    assert(e.getMessage.contains("path"))
  }
}
