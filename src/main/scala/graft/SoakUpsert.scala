package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Scale soak for [[graft.operators.Upsert]]: the operator's headline
  * claim is that its ONE shuffle carries ≈ |distinct keys| rows, not
  * |base| + |changes| — TopKPerKey's partial phase caps every map
  * partition at one row per key BEFORE the exchange, so a versions-heavy
  * change feed collapses map-side. This main pins that with the shuffle
  * write metrics of the merge job (records + bytes), against the naive
  * |base| + |changes| row count the exchange would otherwise carry.
  * Results recorded in BASELINE.md.
  *
  * {{{ runMain graft.SoakUpsert [nBase] [nChanges] [nChangeKeys] }}}
  *
  * Base rows have unique keys 0..nBase; the change feed spreads nChanges
  * rows over nChangeKeys distinct keys (so nChanges/nChangeKeys versions
  * per key) with a monotone version column and a 10% tombstone tail.
  * Expected shuffle records: ≤ nBase + parts × nChangeKeys (each map
  * partition surfaces at most one candidate per key it holds), with the
  * change feed's excess versions never reaching the wire.
  */
object SoakUpsert {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toLong else 50000000L
    val nChanges = if (args.length > 1) args(1).toLong else 1000000L
    val nKeys = if (args.length > 2) args(2).toLong else 10000L
    val spark = GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-upsert-").toString

    // ~120-byte rows: key, version, tombstone, 100-char payload
    spark.range(nBase)
      .selectExpr("id AS k", "0L AS version", "false AS deleted",
        "repeat(concat('p', CAST(id % 97 AS STRING)), 25) AS payload")
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/base")
    spark.range(nChanges)
      .selectExpr(s"id % $nKeys AS k", s"1L + id div $nKeys AS version",
        s"(id % 10 = 9) AS deleted",
        "repeat(concat('c', CAST(id % 89 AS STRING)), 25) AS payload")
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/changes")
    val base = spark.read.parquet(s"$dir/base")
    val changes = spark.read.parquet(s"$dir/changes")

    val shufRecords = new AtomicLong
    val shufBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) {
          shufRecords.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
          shufBytes.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
    })
    def settle(): (Long, Long) = {
      Thread.sleep(2000); (shufRecords.get(), shufBytes.get())
    }

    val (r0, b0) = settle()
    val t0 = System.nanoTime()
    val merged = graft.operators.Upsert(base, changes, Seq("k"), "version",
      deleteCol = Some("deleted"))
    merged.write.format("noop").mode("overwrite").save()
    val wallSec = (System.nanoTime() - t0) / 1e9
    val (r1, b1) = settle()

    val parts = spark.sparkContext.defaultParallelism
    println(s"""{"soak":"upsert","n_base":$nBase,"n_changes":$nChanges,""" +
      s""""n_change_keys":$nKeys,"wall_sec":${f"$wallSec%.1f"},""" +
      s""""shuffle_records":${r1 - r0},"shuffle_bytes":${b1 - b0},""" +
      s""""naive_records":${nBase + nChanges},""" +
      s""""cap_bound_records":${nBase + parts.toLong * nKeys}}""")
    spark.stop()
  }
}
