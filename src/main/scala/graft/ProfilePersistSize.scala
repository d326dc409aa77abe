package graft

import org.apache.spark.sql.functions._

/** Dev measurement: on-disk size of the DISK_ONLY persisted gram
  * aggregate (the allGramCountsK shape) — the spark.rdd.compress
  * evidence probe (A/B via SPARK_GRAFT_RDD_COMPRESS).
  * {{{ runMain graft.ProfilePersistSize [nDocs] [k] }}} */
object ProfilePersistSize {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 300000L
    val k = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-psize-").toString
    def toks(idExpr: String, count: Int): String =
      s"transform(sequence(1, $count), i -> concat('w', pmod(hash(($idExpr) * 131 + i), 50000)))"
    spark.range(n)
      .selectExpr("id AS doc_id", s"concat_ws(' ', ${toks("id", 30)}) AS text")
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/corpus")
    val corpus = spark.read.parquet(s"$dir/corpus")
    val tk = graft.functions.TextFunctions.tokens(col("text"))
    val agg = corpus
      .select(explode(graft.functions.GramVariants(tk, k)).as("og"))
      .select(col("og.ord").as("ord"), col("og.gram").as("gram"))
      .groupBy(col("ord"), col("gram")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val rows = agg.count()
    spark.sparkContext.getRDDStorageInfo.foreach(i =>
      println(s"[persistsize] rows=$rows compress=" +
        spark.conf.get("spark.rdd.compress") +
        s" disk_bytes=${i.diskSize} parts=${i.numCachedPartitions}"))
    agg.unpersist()
    spark.stop()
  }
}
