package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Daemon lifecycle (`Flowd --stream --follow`): the pipeline's sink
  * queries keep running and drain files that arrive AFTER start — the
  * reference flowd's long-running contract, vs runStreamingOnce which
  * exits when the backlog is consumed. */
class FollowModeSpec extends SparkSpec {
  import spark.implicits._

  private def pollCount(path: String, want: Long, timeoutMs: Long = 30000): Long = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var n = -1L
    while (n != want && System.currentTimeMillis() < deadline) {
      n = scala.util.Try(spark.read.parquet(path).count()).getOrElse(-1L)
      if (n != want) Thread.sleep(100)
    }
    n
  }

  test("startStreaming drains files arriving after start, until stopped") {
    val in = Files.createTempDirectory("graft-follow-in-").toString
    val out = Files.createTempDirectory("graft-follow-out-").toString + "/sink"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "body")
      .coalesce(1).write.mode("append").parquet(in)
    val yaml =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  enc: {module: core.encoder_base64, params: {column: body}}
        |  out: {module: core.sink, params: {format: parquet, path: "$out"}}
        |pipeline:
        |  src: {connect: [enc]}
        |  enc: {connect: [out]}
        |""".stripMargin
    val cfg = PipelineConfig.parse(yaml)
    val schema = spark.read.parquet(in).schema
    val queries = new PipelineCompiler(spark, cfg).startStreaming(
      Map("src" -> schema), Trigger.ProcessingTime("100 milliseconds"))
    try {
      assert(queries.keySet == Set("out"))
      // the pre-start backlog drains...
      assert(pollCount(out, 3) == 3)
      // ...and a file dropped AFTER start is picked up by the live query
      Seq((4L, "d"), (5L, "e")).toDF("id", "body")
        .coalesce(1).write.mode("append").parquet(in)
      assert(pollCount(out, 5) == 5)
      assert(queries("out").isActive)
    } finally {
      queries.values.foreach(_.stop())
      queries.values.foreach(_.awaitTermination(30000))
    }
  }

  test("a pinned checkpoint resumes a restarted daemon from committed offsets") {
    val in = Files.createTempDirectory("graft-follow-ckpt-in-").toString
    val out = Files.createTempDirectory("graft-follow-ckpt-out-").toString + "/sink"
    val ckpt = Files.createTempDirectory("graft-follow-ckpt-").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "body")
      .coalesce(1).write.mode("append").parquet(in)
    val yaml =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  out: {module: core.sink, params: {format: parquet, path: "$out", checkpoint: "$ckpt"}}
        |pipeline:
        |  src: {connect: [out]}
        |""".stripMargin
    val cfg = PipelineConfig.parse(yaml)
    val schema = spark.read.parquet(in).schema
    def start() = new PipelineCompiler(spark, cfg).startStreaming(
      Map("src" -> schema), Trigger.ProcessingTime("100 milliseconds"))
    val run1 = start()
    try {
      assert(pollCount(out, 3) == 3)
      // foreachBatch+append is at-least-once: stopping between the write
      // and the offset commit legitimately replays the batch. The spec
      // pins the COMMITTED-offsets contract, so wait for batch 0's
      // commit marker before stopping (on a loaded box the commit can
      // trail the visible write by seconds).
      val commit0 = new java.io.File(s"$ckpt/commits/0")
      val deadline = System.currentTimeMillis() + 30000
      while (!commit0.exists() && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(commit0.exists(), "batch 0 commit marker never appeared")
    } finally { run1.values.foreach(_.stop()); run1.values.foreach(_.awaitTermination(30000)) }
    // restart: the committed backlog must NOT re-append (would be 6 with
    // an ephemeral checkpoint); only the file dropped between runs drains
    Seq((4L, "d")).toDF("id", "body").coalesce(1).write.mode("append").parquet(in)
    val run2 = start()
    try assert(pollCount(out, 4) == 4)
    finally { run2.values.foreach(_.stop()); run2.values.foreach(_.awaitTermination(30000)) }
  }
}
