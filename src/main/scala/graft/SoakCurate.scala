package graft

import org.apache.spark.sql.functions._

/** Scale soak for the curation scorecard (llm.Curation): >= 2M
  * synthetic docs through the full gauntlet — gopher signals, C4 line
  * rules, hashed-BoW classifier, self-scored LM, and the min-id-per-
  * text dedup window — the evidence run the r14/r15 verdicts asked for
  * (the sf0.1 bench corpus is 580 KB; none of the scorecard's
  * corpus-pass costs are visible there). The corpus mixes exact
  * duplicates (the window's work), gopher-short docs and c4-brace docs
  * (every stage observes real kill rates). Observables: scorecard wall
  * (stage counters are ONE aggregate over the annotated frame — the
  * one-pass r15 window form), the keep-set materialization wall, and
  * the counter row itself.
  * {{{ runMain graft.SoakCurate [nDocs] [passes] }}} */
object SoakCurate {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-curate-").toString
    // ~5% exact-duplicate groups (ids 18,19 mod 20 share their group
    // head's text), ~7% gopher-short, ~6% c4-brace — the rest 60-token
    // docs over a 5k vocab with periodic stopwords (stop_hits >= 2)
    // sentence-shaped lines (>= 5 words ending in '.') so the C4
    // kept-lines rule sees real lines; periodic stopwords keep
    // stop_hits >= 2; the mean-word-len / symbol / alpha bands pass by
    // construction for the main branch
    val lineExpr =
      """concat_ws(' ', transform(sequence(1, 12),
        |  i -> CASE pmod(hash(seed * 31 + ln * 100 + i), 9)
        |    WHEN 0 THEN 'the' WHEN 1 THEN 'and' WHEN 2 THEN 'of'
        |    ELSE concat('w', pmod(hash(seed * 131 + ln * 100 + i), 5000))
        |  END))""".stripMargin
    val textExpr =
      s"""CASE
        |  WHEN pmod(seed, 13) = 0 THEN 'tiny doc.'
        |  WHEN pmod(seed, 17) = 1 THEN concat('json blob { ',
        |    concat_ws(' ', transform(sequence(1, 40),
        |      i -> concat('w', pmod(hash(seed * 131 + i), 5000)))))
        |  ELSE concat_ws('\\n', transform(sequence(1, 5),
        |    ln -> concat($lineExpr, '.')))
        |END""".stripMargin
    spark.range(n)
      .selectExpr("id AS doc_id",
        "CASE WHEN pmod(id, 20) >= 18 THEN id - pmod(id, 20) ELSE id END AS seed")
      .selectExpr("doc_id", s"($textExpr) AS text")
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/corpus")
    val corpus = spark.read.parquet(s"$dir/corpus")

    (1 to passes).foreach { p =>
      spark.sparkContext.setJobDescription(s"soak-curate: pass $p counts")
      var t0 = System.nanoTime()
      val annotated = graft.llm.Curation.scorecard(corpus, "text", "doc_id")
      val counts = graft.llm.Curation.stageCounts(annotated).collect()(0)
      val countsSec = (System.nanoTime() - t0) / 1e9
      println(s"""{"soak":"curate","pass":$p,"n_docs":$n,""" +
        s""""counts_sec":${f"$countsSec%.1f"},"counts":"${counts.toString}"}""")
      Console.out.flush()
      spark.sparkContext.setJobDescription(s"soak-curate: pass $p keep set")
      t0 = System.nanoTime()
      annotated.filter(col("keep")).select(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
      val keepSec = (System.nanoTime() - t0) / 1e9
      println(s"""{"soak":"curate","pass":$p,"keep_sec":${f"$keepSec%.1f"}}""")
      Console.out.flush()
    }
    spark.stop()
  }
}
