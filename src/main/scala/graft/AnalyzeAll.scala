package graft

import org.apache.spark.sql.SparkSession

/** Fixture-drift canary: force ANALYSIS of every declared query against a
  * tiny scale factor, without executing anything. Catches schema drift in
  * the driver-generated fixtures (column renames, type changes like the
  * TIMESTAMP(NANOS)→TIMESTAMP events.ts regeneration) in seconds, at round
  * start, instead of as silently-vanished correctness rows hours later.
  *
  * Exit 0 = every query analyzes; exit 1 = prints one line per broken
  * query (name + first line of the analysis error).
  *
  * Usage: sbt "runMain graft.AnalyzeAll [sfDir]"  (default sf0.001)
  */
object AnalyzeAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // stream_* queries execute eagerly when built (they run a bounded
    // streaming query to a memory sink); building them IS the check, and at
    // sf0.001 it is cheap — so no special-casing, every key is exercised.
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).queryExecution.analyzed; None }
        catch {
          case e: Throwable =>
            val head = Option(e.getMessage).getOrElse(e.toString)
              .linesIterator.take(2).mkString(" | ")
            Some(name -> s"${e.getClass.getSimpleName}: $head")
        }
    }
    spark.stop()
    if (failures.isEmpty) {
      println(s"[analyze-all] OK: ${SparkEntry.queries.size} queries analyze against $sfDir")
    } else {
      failures.foreach { case (n, m) => System.err.println(s"[analyze-all] BROKEN $n — $m") }
      System.err.println(s"[analyze-all] ${failures.size}/${SparkEntry.queries.size} queries no longer analyze against $sfDir")
      sys.exit(1)
    }
  }
}
