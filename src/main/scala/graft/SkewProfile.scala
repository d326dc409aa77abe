package graft

/** Quiet-box decision harness for the skew-mitigation recommendation:
  * runs the bench's deliberately skewed join triple (AQE skew-split vs
  * no mitigation vs salted-32) at best-of-N, several passes, so a
  * reproducible ordering — not one contended sample — decides what
  * [[graft.operators.SkewTools]] documents as the default. Findings
  * recorded in BASELINE.md.
  *
  * {{{ runMain graft.SkewProfile <sfDir> [repeats] [passes] }}}
  */
object SkewProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SkewProfile <sfDir> [repeats] [passes]")
    val sfDir = args(0)
    val repeats = if (args.length > 1) args(1).toInt else 5
    val passes = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.get()
    for (p <- 1 to passes) {
      val (aqe, none, salt) = Bench.skewTriple(spark, sfDir, repeats)
      println(f"""[skewprofile] pass$p best-of-$repeats: """ +
        f"""{"aqe_skew_join":$aqe%.3f,"no_mitigation":$none%.3f,"salted_32":$salt%.3f}""")
    }
    spark.stop()
  }
}
