package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dev profiling: SAME-SESSION interleaved A/B of the gram-assembly
  * kernels vs the interpreted-HOF formulation they replaced (r16) —
  * noop-sinked explode output, no shuffle, no write, so the delta is
  * the per-row assembly CPU and nothing else. Alternating reps cancel
  * the box's drift.
  * {{{ runMain graft.ProfileGramAb [nDocs] [k] [reps] }}} */
object ProfileGramAb {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val k = if (args.length > 1) args(1).toInt else 5
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-gramab-").toString
    def toksGen(idExpr: String, count: Int): String =
      s"transform(sequence(1, $count), i -> concat('w', pmod(hash(($idExpr) * 131 + i), 50000)))"
    spark.range(n)
      .selectExpr("id AS doc_id", s"concat_ws(' ', ${toksGen("id", 30)}) AS text")
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/corpus")
    val corpus = spark.read.parquet(s"$dir/corpus")
    val tk: Column = graft.functions.TextFunctions.tokens(col("text"))

    // the pre-r16 HOF chain, verbatim (kRows + per-order variant structs)
    def hofContexts: Column = {
      val nul = lit(null).cast("string")
      var acc: Column = transform(tk, t => struct(t.as("term")))
      for (j <- 1 until k) {
        val shifted = concat(array(Seq.fill(j)(nul): _*), tk)
        val fields = "term" +: (1 until j).map(i => s"prev$i")
        acc = zip_with(acc, shifted, (a, p) =>
          struct(fields.map(f => a.getField(f).as(f)) :+ p.as(s"prev$j"): _*))
      }
      acc
    }
    def hofVariants: DataFrame = {
      val rows = corpus
        .select(posexplode(hofContexts).as(Seq("p0", "tp")))
        .filter(col("tp.term").isNotNull)
        .select((1 until k).map(j => col(s"tp.prev$j").as(s"prev$j")) :+
          col("tp.term").as("term"): _*)
      val variants = (1 to k).map { m =>
        val gram =
          if (m == 1) col("term")
          else when(col(s"prev${m - 1}").isNotNull, concat_ws(" ",
            ((m - 1) to 1 by -1).map(j => col(s"prev$j")) :+ col("term"): _*))
        struct(lit(m).as("ord"), gram.as("gram"))
      }
      rows.select(explode(array(variants: _*)).as("og"))
        .filter(col("og.gram").isNotNull)
        .select(col("og.ord").as("ord"), col("og.gram").as("gram"))
    }
    def newVariants: DataFrame = corpus
      .select(explode(graft.functions.GramVariants(tk, k)).as("og"))
      .select(col("og.ord").as("ord"), col("og.gram").as("gram"))

    def timed(nm: String)(df: DataFrame): Unit = {
      spark.sparkContext.setJobDescription(s"gramab: $nm")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[gramab] $nm: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    timed("warmup-new")(newVariants) // JIT/codegen warmup for both paths
    timed("warmup-hof")(hofVariants)
    (1 to reps).foreach { r =>
      timed(s"new[$r]")(newVariants)
      timed(s"hof[$r]")(hofVariants)
    }
    spark.stop()
  }
}
