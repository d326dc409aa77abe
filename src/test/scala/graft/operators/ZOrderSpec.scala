package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits matches a bit-twiddling reference, 2 and 3 way") {
    def ref(vals: Seq[Long]): Long = {
      val k = vals.size
      var z = 0L
      for (j <- vals.indices; i <- 0 until 16)
        z |= ((vals(j) >> i) & 1L) << (i * k + j)
      z
    }
    val cases2 = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L),
      (0L, 65535L), (12345L, 54321L), (65535L, 65535L))
    val got2 = cases2.toDF("a", "b")
      .select(ZOrder.interleaveBits(Seq($"a", $"b")).as("z"))
      .as[Long].collect()
    cases2.zip(got2).foreach { case ((a, b), z) =>
      assert(z == ref(Seq(a, b)), s"interleave($a,$b)")
    }
    val cases3 = Seq((7L, 1L, 5L), (65535L, 0L, 65535L), (100L, 200L, 300L))
    val got3 = cases3.toDF("a", "b", "c")
      .select(ZOrder.interleaveBits(Seq($"a", $"b", $"c")).as("z"))
      .as[Long].collect()
    cases3.zip(got3).foreach { case ((a, b, c), z) =>
      assert(z == ref(Seq(a, b, c)), s"interleave($a,$b,$c)")
    }
  }

  test("zValue is monotone per dimension and bounded to 32 bits for 2 cols") {
    val ranges = Seq((0.0, 1023.0), (0.0, 1023.0))
    val df = Seq((0L, 0L), (1023L, 1023L), (512L, 2L), (2L, 512L))
      .toDF("x", "y")
      .select(ZOrder.zValue(Seq($"x", $"y"), ranges).as("z"))
    val zs = df.as[Long].collect()
    assert(zs.forall(z => z >= 0L && z < (1L << 32)))
    assert(zs(0) == 0L)
    assert(zs(1) == (1L << 32) - 1) // both ranks max out -> all 32 bits set
  }

  /** Per-file [min,max] envelopes of `c` for every parquet part file. */
  private def fileEnvelopes(path: String, c: String): Seq[(Double, Double)] = {
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    files.toSeq.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      (r.getDouble(0), r.getDouble(1))
    }
  }

  private def overlapping(envs: Seq[(Double, Double)], lo: Double, hi: Double): Int =
    envs.count { case (mn, mx) => mx >= lo && mn < hi }

  test("z-ordered files prune on BOTH dimensions; single-sort only on its own") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-").toString
    val n = 64 // files per layout
    val data = spark.range(200000).select(
      pmod(hash(col("id")), lit(1024)).cast("long").as("x"),
      pmod(hash(col("id"), lit(7)), lit(1024)).cast("long").as("y"))

    ZOrder.writeZOrdered(data, s"$dir/z", Seq("x", "y"), numFiles = n)
    data.repartitionByRange(n, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/xsort")

    val zX = fileEnvelopes(s"$dir/z", "x")
    val zY = fileEnvelopes(s"$dir/z", "y")
    val sX = fileEnvelopes(s"$dir/xsort", "x")
    val sY = fileEnvelopes(s"$dir/xsort", "y")
    assert(zX.size == n && sX.size == n)

    // a 1/16-wide band on each dimension (the shape of a selective scan)
    val (lo, hi) = (256.0, 320.0)
    val zxN = overlapping(zX, lo, hi); val zyN = overlapping(zY, lo, hi)
    val sxN = overlapping(sX, lo, hi); val syN = overlapping(sY, lo, hi)

    // x-sorted: perfect on x, useless on y — every file spans all of y
    assert(sxN <= 6)
    assert(syN == n)

    // z-ordered: meaningful pruning on BOTH dimensions (file envelopes
    // are compact rectangles plus a few wide z-boundary straddlers)
    assert(zxN <= n / 2, s"x-band hit $zxN of $n z files: $zX")
    assert(zyN <= n / 2, s"y-band hit $zyN of $n z files: $zY")
    // and across the 2-band workload, z-order opens strictly fewer files
    assert(zxN + zyN < sxN + syN,
      s"z workload $zxN+$zyN !< sorted workload $sxN+$syN")
  }
}
