package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val evalDoc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val clean1 =
    "the committee published its findings on tuesday noting the results " +
    "were consistent with earlier work and further review would follow"
  private val clean2 =
    "unrelated second family of words entirely disjoint vocabulary here " +
    "lambda sigma tau upsilon phi chi psi omega aleph bet gimel dalet"

  test("streaming gate drops contaminated docs across batches") {
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = Seq(Tuple1(evalDoc)).toDF("text")
    val mem = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingDecontaminate.sink(
        mem.toDF().toDF("doc_id", "text"), evalDocs,
        "text", "doc_id", n = 5, minShared = 2) { (cleaned, _) =>
        out ++= cleaned.select("doc_id").as[Long](
          org.apache.spark.sql.Encoders.scalaLong).collect()
      }
      .option("checkpointLocation", Streams.newCheckpointDir())
      .start()
    // batch 1: one clean doc + one embedding the eval passage
    mem.addData((1L, clean1), (2L, "prefix words then " + evalDoc))
    q.processAllAvailable()
    // batch 2: clean doc + a doc sharing only ONE 5-gram (< minShared)
    mem.addData((3L, clean2),
      (4L, "alpha beta gamma delta epsilon completely different tail " +
           "of many other words that share nothing else with the eval"))
    q.processAllAvailable()
    q.stop()
    assert(out.toSet == Set(1L, 3L, 4L))
  }
}
