package graft

/** ANN kernel profile: times ivfKnn end-to-end (train + assign + probe +
  * search) at a configurable quantizer size over the embeddings table —
  * the evidence that the codegen NearestCellsFloat assignment holds up at
  * production nlist, where the former per-row UDF formulation became the
  * bottleneck. Results recorded in BASELINE.md.
  *
  * {{{ runMain graft.AnnProfile <sfDir> [nlist] [nprobe] [repeats] }}}
  */
object AnnProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnProfile <sfDir> [nlist] [nprobe] [repeats]")
    val dir = args(0)
    val nlist = if (args.length > 1) args(1).toInt else 256
    val nprobe = if (args.length > 2) args(2).toInt else 8
    val reps = if (args.length > 3) args(3).toInt else 3
    val spark = GraftSession.get()
    val emb = Tables.load(spark, dir, "embeddings")
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.llm.Similarity.ivfKnn(emb, k = 3, nlist = nlist, nprobe = nprobe)
        .write.format("noop").mode("overwrite").save()
      println(f"[annprofile] ivf nlist=$nlist nprobe=$nprobe " +
        f"run$r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
