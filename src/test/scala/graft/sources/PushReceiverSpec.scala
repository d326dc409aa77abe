package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Transforms
import graft.streaming.{StatusMetrics, Streams}

class PushReceiverSpec extends SparkSpec {
  import spark.implicits._

  test("push receiver streams pushed messages with body, meta, ingest_ts") {
    val ch = "t-basic"
    PushReceiver.clear(ch)
    (1 to 5).foreach(i =>
      PushReceiver.push(ch, s"msg-$i".getBytes("UTF-8"),
        Map("seq" -> i.toString), tsMicros = 1700000000000000L + i))
    val stream = spark.readStream
      .format(classOf[PushReceiverProvider].getName)
      .option("channel", ch).load()
    val got = Streams.runToMemory(spark, stream, "push_basic")
      .select($"body".cast("string"), $"meta".getItem("seq"))
      .as[(String, String)].collect().toSet
    assert(got == (1 to 5).map(i => (s"msg-$i", i.toString)).toSet)
  }

  test("receiver -> operator chain -> sink runs over the push transport") {
    val ch = "t-chain"
    PushReceiver.clear(ch)
    // meta-parser wire format, like the reference's HTTP receiver feeding
    // the x.meta_parser actor (README.md:206-212)
    Seq("route=a&id=1 payload-one", "route=b&id=2 payload-two").foreach(s =>
      PushReceiver.push(ch, s.getBytes("UTF-8")))
    val stream = spark.readStream
      .format(classOf[PushReceiverProvider].getName)
      .option("channel", ch).load()
    val parsed = Transforms.parseMeta(stream)
      .select($"meta".getItem("route").as("route"),
        $"meta".getItem("id").as("id"), $"body".cast("string").as("payload"))
    val got = Streams.runToMemory(spark, parsed, "push_chain")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(("a", "1", "payload-one"), ("b", "2", "payload-two")))
  }

  test("maxMsgsPerTrigger bounds each micro-batch (admission control)") {
    val ch = "t-admission"
    PushReceiver.clear(ch)
    (1 to 10).foreach(i => PushReceiver.push(ch, Array(i.toByte)))
    val stream = spark.readStream
      .format(classOf[PushReceiverProvider].getName)
      .option("channel", ch).option("maxMsgsPerTrigger", "3").load()
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    Streams.runForeachBatch(stream, (df, _) => batchSizes += df.count())
    assert(batchSizes.sum == 10, s"all messages must drain: $batchSizes")
    assert(batchSizes.forall(_ <= 3), s"batches must respect the cap: $batchSizes")
  }

  test("checkpointed restart resumes from committed offsets: no loss, no dups") {
    val ch = "t-recovery"
    PushReceiver.clear(ch)
    val ckpt = Streams.newCheckpointDir()
    val outDir = java.nio.file.Files.createTempDirectory("graft-recov-out-").toString

    def runOnce(): Unit = {
      val stream = spark.readStream
        .format(classOf[PushReceiverProvider].getName)
        .option("channel", ch).load()
        .select($"body".cast("string").as("body"))
      val q = stream.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    (1 to 3).foreach(i => PushReceiver.push(ch, s"m$i".getBytes("UTF-8")))
    runOnce()
    (4 to 5).foreach(i => PushReceiver.push(ch, s"m$i".getBytes("UTF-8")))
    runOnce() // restart from the same checkpoint: must read ONLY m4, m5

    val got = spark.read.parquet(outDir).as[String].collect().toSeq
    assert(got.sorted == Seq("m1", "m2", "m3", "m4", "m5"),
      s"exactly-once violated: $got")
  }

  test("observed metrics reach the status collector per batch") {
    val ch = "t-metrics"
    PushReceiver.clear(ch)
    // 2 valid base64 bodies, 1 invalid -> INVALID status at the decoder
    Seq(
      java.util.Base64.getEncoder.encodeToString("ok-1".getBytes),
      java.util.Base64.getEncoder.encodeToString("ok-2".getBytes),
      "!!!bad$$$").foreach(s => PushReceiver.push(ch, s.getBytes("UTF-8")))
    val collector = StatusMetrics.register(spark)
    try {
      val stream = spark.readStream
        .format(classOf[PushReceiverProvider].getName)
        .option("channel", ch).load()
      val decoded = StatusMetrics.observed(
        graft.operators.Transforms.decodeBase64(stream), "decoder")
      val q = decoded.writeStream.format("memory").queryName("push_metrics")
        .option("checkpointLocation", Streams.newCheckpointDir())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // the listener bus is async: poll briefly for delivery
      def find() = collector.snapshot.collectFirst {
        case ((_, obs), vals) if obs == "decoder" => vals
      }
      val deadline = System.currentTimeMillis() + 10000
      var m = find()
      while (m.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); m = find()
      }
      assert(m.isDefined, s"no decoder observation in ${collector.snapshot.keySet}")
      assert(m.get("rows") == 3L)
      assert(m.get("n_INVALID") == 1L)
      assert(m.get("n_DONE") == 2L)
    } finally spark.streams.removeListener(collector)
  }

  test("composite status folds like the reference replicator") {
    import graft.operators.FlowEventModel._
    assert(StatusMetrics.compositeStatus(Seq(StatusDone, StatusDone)) == StatusDone)
    assert(StatusMetrics.compositeStatus(Seq(StatusDone, StatusFailed)) == StatusPartialSend)
    assert(StatusMetrics.compositeStatus(Seq(StatusFailed, StatusFailed)) == StatusFailed)
  }
}
