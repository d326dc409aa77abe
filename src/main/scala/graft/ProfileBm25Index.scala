package graft

import org.apache.spark.sql.functions._

/** Dev profiling: per-phase wall clock of the llm_bm25_index lifecycle
  * (build half / append half / compact / search) at a given SF dir —
  * the r15 verdict asked where the flat 7–10 s wall of that entry
  * actually goes (corpus pass vs job/file-commit overhead vs search
  * planning).
  * {{{ runMain graft.ProfileBm25Index <sfDir> [repeats] }}} */
object ProfileBm25Index {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repeats = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.get()
    val docs = Tables.load(spark, sfDir, "documents")
    def timed[T](nm: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bm25prof] $nm: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to repeats).foreach { i =>
      println(s"[bm25prof] ---- pass $i ----")
      val idx = java.nio.file.Files.createTempDirectory("graft-bm25prof-").toString
      timed("build  ") {
        graft.llm.Retrieval.bm25BuildIndex(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0), "text", "doc_id", idx)
      }
      timed("append ") {
        graft.llm.Retrieval.bm25IndexAppend(
          docs.filter(pmod(col("doc_id"), lit(2)) === 1), "text", "doc_id", idx)
      }
      timed("compact") { graft.llm.Retrieval.bm25IndexCompact(spark, idx) }
      val queries = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(graft.functions.TextFunctions.tokens(col("text")), 1, 5), " ")
            .as("qtext"))
      timed("search ") {
        graft.llm.Retrieval.bm25SearchIndex(queries, idx, k = 10)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
