package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewToolsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key distribution") {
    // 90% of rows share one hot key
    val big = spark.range(2000).toDF("id")
      .withColumn("k", when($"id" % 10 === 0, $"id" % 5).otherwise(lit(99L)))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"), (99L, "hot"))
      .toDF("dk", "label")
    val plain = big.join(dim, $"k" === $"dk").select($"id", $"label")
      .as[(Long, String)].collect().toSet
    val salted = SkewTools.saltedEquiJoin(big, dim, col("k"), col("dk"), 8)
      .select($"id", $"label").as[(Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 2000)
  }

  test("salted left join keeps unmatched big-side rows exactly once") {
    val big = Seq((1L, 10L), (2L, 20L), (3L, 999L)).toDF("id", "k")
    val dim = Seq((10L, "x"), (20L, "y")).toDF("dk", "v")
    val out = SkewTools.saltedEquiJoin(big, dim, col("k"), col("dk"), 4, "left")
      .select($"id", $"v").as[(Long, Option[String])].collect()
    // left join with replicated dim: unmatched rows must not fan out
    assert(out.count(_._1 == 3L) == 1)
    assert(out.toSet == Set((1L, Some("x")), (2L, Some("y")), (3L, None)))
  }
}
