package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingCCSpec extends SparkSpec {
  import spark.implicits._

  private def mapping(stateDir: String): Map[Long, Long] =
    StreamingCC.currentMapping(spark, stateDir)
      .as[(Long, Long)].collect().toMap

  test("incremental CC merges components across batches, matches batch CC") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = Files.createTempDirectory("scc_state").toString
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingCC.sink(mem.toDF().toDF("u", "v"), "u", "v", stateDir)
      .option("checkpointLocation", Streams.newCheckpointDir())
      .start()
    // batch 1: two separate components {1,2} and {3,4}
    mem.addData((1L, 2L), (3L, 4L))
    q.processAllAvailable()
    assert(mapping(stateDir) == Map(2L -> 1L, 4L -> 3L))
    // batch 2: a bridging edge merges them into {1,2,3,4}
    mem.addData((2L, 3L))
    q.processAllAvailable()
    assert(mapping(stateDir) == Map(2L -> 1L, 3L -> 1L, 4L -> 1L))
    // batch 3: an unrelated new component + a redundant edge (no-op)
    mem.addData((10L, 11L), (1L, 4L))
    q.processAllAvailable()
    q.stop()
    val incremental = mapping(stateDir)
    assert(incremental == Map(2L -> 1L, 3L -> 1L, 4L -> 1L, 11L -> 10L))
    // parity: batch CC over the full edge history gives the same mapping
    val all = Seq((1L, 2L), (3L, 4L), (2L, 3L), (10L, 11L), (1L, 4L))
      .toDF("u", "v")
    val batch = graft.llm.ConnectedComponents.run(all, "u", "v")
      .as[(Long, Long)].collect().toMap
    assert(incremental == batch)
  }

  test("mergeBatch is idempotent per batch id (restart replay)") {
    val stateDir = Files.createTempDirectory("scc_replay").toString
    val b0 = Seq((1L, 2L)).toDF("u", "v")
    StreamingCC.mergeBatch(b0, "u", "v", stateDir, batchId = 0L)
    val after0 = mapping(stateDir)
    // replaying batch 0 — even with different (corrupt) content — is a no-op
    StreamingCC.mergeBatch(Seq((7L, 8L)).toDF("u", "v"), "u", "v", stateDir, 0L)
    assert(mapping(stateDir) == after0)
    // the next batch id applies normally
    StreamingCC.mergeBatch(Seq((7L, 8L)).toDF("u", "v"), "u", "v", stateDir, 1L)
    assert(mapping(stateDir) == Map(2L -> 1L, 8L -> 7L))
  }

  test("delta merge matches full merge and batch CC on a fuzzed stream") {
    val rnd = new scala.util.Random(42)
    val full = Files.createTempDirectory("scc_full").toString
    val delta = Files.createTempDirectory("scc_delta").toString
    val history = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    (0L until 6L).foreach { bid =>
      val edges = Seq.fill(8)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      history ++= edges
      val df = edges.toDF("u", "v")
      StreamingCC.mergeBatch(df, "u", "v", full, bid)
      StreamingCC.mergeBatchDelta(df, "u", "v", delta, bid)
      assert(mapping(delta) == mapping(full), s"diverged at batch $bid")
    }
    val batch = graft.llm.ConnectedComponents
      .run(history.toSeq.toDF("u", "v"), "u", "v")
      .as[(Long, Long)].collect().toMap
    assert(mapping(delta) == batch)
  }

  test("delta merge covers the new-node-becomes-root and no-op cases") {
    val dir = Files.createTempDirectory("scc_delta2").toString
    // batch 0 (full path): component {5,9} rooted at 5
    StreamingCC.mergeBatchDelta(Seq((9L, 5L)).toDF("u", "v"), "u", "v", dir, 0L)
    assert(mapping(dir) == Map(9L -> 5L))
    // batch 1: NEW node 2 joins — smaller than the old root, so the
    // old root 5 is demoted and every prior member re-roots to 2
    StreamingCC.mergeBatchDelta(Seq((2L, 9L)).toDF("u", "v"), "u", "v", dir, 1L)
    assert(mapping(dir) == Map(5L -> 2L, 9L -> 2L))
    // batch 2: only redundant edges — no new version is written
    val before = new java.io.File(dir).listFiles().map(_.getName).toSet
    StreamingCC.mergeBatchDelta(Seq((5L, 2L), (9L, 9L)).toDF("u", "v"), "u", "v", dir, 2L)
    assert(new java.io.File(dir).listFiles().map(_.getName).toSet == before)
    assert(mapping(dir) == Map(5L -> 2L, 9L -> 2L))
  }

  test("old state versions are pruned") {
    val stateDir = Files.createTempDirectory("scc_prune").toString
    (0L to 5L).foreach { i =>
      StreamingCC.mergeBatch(Seq((i * 2, i * 2 + 1)).toDF("u", "v"),
        "u", "v", stateDir, batchId = i, keepVersions = 2)
    }
    val kept = new java.io.File(stateDir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(kept == Seq("v=4", "v=5"))
    // and the forest still carries the FULL history despite pruning
    assert(mapping(stateDir) ==
      (0L to 5L).map(i => (i * 2 + 1) -> i * 2).toMap)
  }
}
