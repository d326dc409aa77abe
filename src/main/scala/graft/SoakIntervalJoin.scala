package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Scale soak for [[graft.operators.IntervalJoin]]: two interval sets
  * far past any broadcast threshold, joined through the banded
  * equi-join. Observables: wall, result rows vs the analytically
  * expected pair count, and shuffle records (should be ≈ the exploded
  * bucket rows of both sides — the banding's entire cost — never a
  * quadratic candidate set).
  *
  * {{{ runMain graft.SoakIntervalJoin [nLeft] [nRight] }}}
  *
  * Construction: left interval i = [i*1000, i*1000 + 2000], right
  * interval j = [j*1000 + 500, j*1000 + 1500]; right j overlaps left i
  * exactly for i in {j-1, j, j+1} clipped to range — so expected pairs
  * ≈ 3·min(n,m) and the answer is checkable without a quadratic pass.
  * Bucket width 2000 ≈ interval length keeps the explode factor ~2.
  */
object SoakIntervalJoin {
  def main(args: Array[String]): Unit = {
    val nL = if (args.length > 0) args(0).toLong else 10000000L
    val nR = if (args.length > 1) args(1).toLong else 10000000L
    val spark = GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-ij-").toString

    spark.range(nL)
      .selectExpr("id AS id_a", "id * 1000 AS a_s", "id * 1000 + 2000 AS a_e")
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/left")
    spark.range(nR)
      .selectExpr(s"id + ${2 * nL} AS id_b",
        "(id_b - " + 2 * nL + ") * 1000 + 500 AS b_s",
        "(id_b - " + 2 * nL + ") * 1000 + 1500 AS b_e")
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/right")
    val left = spark.read.parquet(s"$dir/left")
    val right = spark.read.parquet(s"$dir/right")

    val shufRecords = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shufRecords.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
    })
    def settle(): Long = { Thread.sleep(2000); shufRecords.get() }

    val r0 = settle()
    val t0 = System.nanoTime()
    val joined = graft.operators.IntervalJoin.overlaps(left, right,
      "a_s", "a_e", "b_s", "b_e", bucketWidth = 2000L)
    val nPairs = joined.count()
    val wallSec = (System.nanoTime() - t0) / 1e9
    val shuffled = settle() - r0

    // right j = [1000j+500, 1000j+1500] overlaps left i = [1000i, 1000i+2000]
    // iff 1000i <= 1000j+1500 and 1000j+500 <= 1000i+2000, i.e.
    // i ∈ {j-1, j, j+1} ∩ [0, nL)
    val exact = {
      var c = 0L
      var j = 0L
      while (j < nR) {
        val lo = math.max(0L, j - 1)
        val hi = math.min(nL - 1, j + 1)
        if (hi >= lo) c += hi - lo + 1
        j += 1
      }
      c
    }
    // each 2000-long left interval spans 2 buckets at width 2000; each
    // 1000-long right interval spans 1-2 — the banding's full shuffle
    val bandedBound = 2 * nL + 2 * nR

    // hybrid leg (r9 next-round #5): plant corpus-spanning outliers —
    // under pure banding EACH would explode into span/width ≈ nL bucket
    // rows (20 outliers ≈ 2x the whole join's shuffle); the hybrid
    // split routes them through a broadcast theta join instead, so the
    // shuffle stays at the short-mass banded bound and the explode
    // factor is bounded by longFactor + 1 BY CONSTRUCTION
    val nOut = 20L
    val span = math.max(nL, nR) * 1000L + 2000L
    val outliers = spark.range(nOut)
      .selectExpr(s"id + ${3 * (nL + nR)} AS id_a", "CAST(0 AS LONG) AS a_s",
        s"CAST($span AS LONG) AS a_e")
    val r1 = settle()
    val t1 = System.nanoTime()
    val hybridPairs = graft.operators.IntervalJoin.overlapsHybrid(
      left.unionByName(outliers), right,
      "a_s", "a_e", "b_s", "b_e") // auto width from the median length
      .count()
    val hybridWall = (System.nanoTime() - t1) / 1e9
    val hybridShuffled = settle() - r1
    val hybridExpected = exact + nOut * nR // each outlier overlaps every right

    println(s"""{"soak":"interval_join","n_left":$nL,"n_right":$nR,""" +
      s""""wall_sec":${f"$wallSec%.1f"},"pairs":$nPairs,""" +
      s""""expected_pairs":$exact,"match":${nPairs == exact},""" +
      s""""shuffle_records":$shuffled,"banded_rows_bound":$bandedBound,""" +
      s""""hybrid_outliers":$nOut,"hybrid_wall_sec":${f"$hybridWall%.1f"},""" +
      s""""hybrid_pairs":$hybridPairs,"hybrid_expected":$hybridExpected,""" +
      s""""hybrid_match":${hybridPairs == hybridExpected},""" +
      s""""hybrid_shuffle_records":$hybridShuffled}""")
    spark.stop()
  }
}
