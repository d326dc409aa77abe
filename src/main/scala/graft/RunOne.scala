package graft

/** Dev utility: time a single `SparkEntry.queries` entry end-to-end with
  * the noop sink (the Bench protocol, one query at a time).
  * {{{ runMain graft.RunOne <sfDir> <queryName> [repeats] }}} */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunOne <sfDir> <queryName> [repeats]")
    val Array(sfDir, name) = args.take(2)
    val repeats = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.get()
    val fn = SparkEntry.queries(name)
    (1 to repeats).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[runone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
