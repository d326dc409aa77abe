package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded randomized round-trip properties (the reference fuzzes operator
  * inputs with RandBytes, pkg/util/test/rand.go:13-24; we mirror that
  * with deterministic seeds). */
class FuzzRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(1234)
  private val ts = Timestamp.valueOf("2024-01-01 00:00:00")

  private def randKey(): String =
    (1 + rng.nextInt(8)).toString.flatMap(_ => ('a' + rng.nextInt(26)).toChar.toString)

  private def randValue(): String = {
    val chars = "abcXYZ019 &=%+?/#:;.,!\té中"
    (0 until rng.nextInt(12)).map(_ => chars(rng.nextInt(chars.length))).mkString
  }

  test("meta parser round-trips 200 random URL-encoded meta maps") {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val cases = (1 to 200).map { i =>
      val m = (0 until 1 + rng.nextInt(5)).map(_ => randKey() -> randValue()).toMap
      val payload = s"payload-$i ${randValue()}"
      (i.toLong, m, payload,
        m.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&") + " " + payload)
    }
    val df = cases.map { case (id, _, _, body) =>
      FlowEvent(body.getBytes("UTF-8"), Map.empty[String, String], ts) -> id
    }.map { case (e, id) => (id, e.body, e.meta, e.ingest_ts) }
      .toDF("id", "body", "meta", "ingest_ts")
    val out = Transforms.parseMeta(df)
      .select($"id", $"meta", $"body".cast("string"))
      .collect().map(r => r.getLong(0) ->
        (r.getMap[String, String](1).toMap, r.getString(2))).toMap
    cases.foreach { case (id, m, payload, _) =>
      val (gotMeta, gotPayload) = out(id)
      assert(gotMeta == m, s"case $id meta: $gotMeta vs $m")
      assert(gotPayload == payload, s"case $id payload")
    }
  }

  test("compressor+base64 chain round-trips 50 random binary bodies per codec") {
    val bodies = (1 to 50).map { i =>
      val len = rng.nextInt(4000)
      val b = new Array[Byte](len); rng.nextBytes(b); (i.toLong, b)
    }
    val df = bodies.map { case (id, b) => (id, b) }.toDF("id", "body")
    Seq("zstd", "gzip", "lz4").foreach { codec =>
      val chain = Transforms.decodeBase64(
        Transforms.encodeBase64(
          Compressor.decompress(Compressor.compress(df, codec), codec)))
      val got = chain.select($"id", $"body").as[(Long, Array[Byte])]
        .collect().map { case (id, b) => id -> b.toSeq }.toMap
      bodies.foreach { case (id, b) =>
        assert(got(id) == b.toSeq, s"$codec corrupted body $id")
      }
    }
  }
}
