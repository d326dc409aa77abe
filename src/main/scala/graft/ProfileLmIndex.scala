package graft

import org.apache.spark.sql.functions._

/** Dev profiling: per-phase wall clock of the llm_lm5_index lifecycle
  * (build / append / compact / recover / score) at a given SF dir —
  * separates corpus-pass cost from job/file-commit overhead so the
  * optimization rounds aim at the real wall.
  * {{{ runMain graft.ProfileLmIndex <sfDir> [k] [repeats] }}} */
object ProfileLmIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 5
    val repeats = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.get()
    val docs = Tables.load(spark, sfDir, "documents")
    def timed[T](nm: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lmprof] $nm: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to repeats).foreach { i =>
      println(s"[lmprof] ---- pass $i (k=$k) ----")
      val idx = java.nio.file.Files.createTempDirectory("graft-lmprof-").toString
      timed("build ") {
        graft.llm.Lm.lmBuildIndexK(docs.filter(pmod(col("doc_id"), lit(4)) === 0),
          "text", "doc_id", idx, k = k)
      }
      timed("append") {
        graft.llm.Lm.lmIndexAppendK(docs.filter(pmod(col("doc_id"), lit(4)) === 2),
          "text", "doc_id", idx)
      }
      timed("compact") { graft.llm.Lm.lmIndexCompactK(spark, idx) }
      timed("recover") { graft.llm.Lm.lmIndexRecoverK(spark, idx) }
      timed("score ") {
        graft.llm.Lm.lmScoreIndexK(docs, "text", "doc_id", idx)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
