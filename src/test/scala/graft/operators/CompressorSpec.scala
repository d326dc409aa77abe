package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompressorSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private def events(bodies: Array[Byte]*) = {
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    bodies.map(b => FlowEvent(b, Map.empty[String, String], ts)).toDF()
  }

  private val corpora: Seq[Array[Byte]] = Seq(
    Array.emptyByteArray,
    "hello world".getBytes("UTF-8"),
    Array.fill(10000)(rng.nextInt(256).toByte),
    ("repetitive " * 500).getBytes("UTF-8"))

  Compressor.Codecs.foreach { codec =>
    test(s"$codec round-trips empty, text, random and repetitive bodies") {
      val df = events(corpora: _*)
      val out = Compressor.decompress(Compressor.compress(df, codec), codec)
      val got = out.select($"body").as[Array[Byte]].collect()
      assert(got.map(_.toSeq).toSet == corpora.map(_.toSeq).toSet)
      assert(out.filter($"status" === FlowEventModel.StatusInvalid).count() == 0)
    }
  }

  test("compression shrinks repetitive payloads (sanity)") {
    val body = ("abcabcabc " * 1000).getBytes("UTF-8")
    Seq("gzip", "zstd", "lz4").foreach { codec =>
      val out = Compressor.compress(events(body), codec)
        .select(length($"body")).as[Int].head()
      assert(out < body.length / 2, s"$codec did not compress: $out vs ${body.length}")
    }
  }

  test("decompress of garbage yields status INVALID with null body (dead-letter)") {
    val garbage = events("this is not a gzip stream".getBytes("UTF-8"))
    val out = Compressor.decompress(garbage, "gzip")
    val row = out.select($"status", $"body").head()
    assert(row.getString(0) == FlowEventModel.StatusInvalid)
    assert(row.get(1) == null)
  }

  test("compression runs as a codegen expression, not a ScalaUDF boundary") {
    // a file-backed scan: a local relation would be constant-folded by
    // ConvertToLocalRelation (which also only works for non-UDF
    // expressions, but leaves no codegen span to inspect)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumnRenamed("text", "body")
    val df = Compressor.compress(docs, "gzip")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan.take(2000))
    // the custom expression sits inside a whole-stage-codegen'd Project
    // (rendered as the "*(n)" stage marker)
    assert(plan.contains("*(1) Project"), plan.take(2000))
    assert(plan.contains("compresscodec"), plan.take(2000))
  }
}
