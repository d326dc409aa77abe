package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Ingest-time benchmark decontamination: drop arriving documents that
  * share at least `minShared` distinct n-gram shingles with a STATIC
  * eval set — the streaming rendering of the `llm.decontaminate`
  * curation actor, for pipelines that must reject contaminated data at
  * the door instead of sweeping the corpus later.
  *
  * The eval shingle set is computed once from the static eval frame and
  * broadcast into every micro-batch join (benchmarks are small — the
  * standard stream-static shape). Each micro-batch then runs the plain
  * batch dataflow inside foreachBatch: explode shingles, semi-join the
  * broadcast set, count shared per doc, anti-join the survivors into
  * the caller's sink function.
  */
object StreamingDecontaminate {

  /** Distinct n-gram shingle frame (`s`) of the eval documents. */
  def evalShingles(evalDocs: DataFrame, textCol: String, n: Int): DataFrame =
    evalDocs
      .select(graft.functions.TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(explode(expr("array_distinct(transform(" +
        s"sequence(0, greatest(size(__toks)-$n, 0))," +
        s" i -> concat_ws(' ', slice(__toks, i+1, $n))))")).as("s"))
      .distinct()

  /** The per-batch dataflow: rows of `batch` NOT sharing >= `minShared`
    * distinct shingles with `evalSh` (as produced by [[evalShingles]]). */
  def cleanBatch(batch: DataFrame, evalSh: DataFrame, textCol: String,
                 idCol: String, n: Int, minShared: Long): DataFrame = {
    val sh = batch
      .select(col(idCol),
        graft.functions.TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        explode(expr("array_distinct(transform(" +
          s"sequence(0, greatest(size(__toks)-$n, 0))," +
          s" i -> concat_ws(' ', slice(__toks, i+1, $n))))")).as("s"))
    val contaminated = sh.join(broadcast(evalSh), "s")
      .groupBy(col(idCol)).agg(count_distinct(col("s")).as("__shared"))
      .filter(col("__shared") >= minShared)
      .select(col(idCol))
    batch.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Wire a streaming doc frame through the gate into `sink` (called
    * per micro-batch with the decontaminated rows and the batch id). */
  def sink(docs: DataFrame, evalDocs: DataFrame, textCol: String,
           idCol: String, n: Int = 8, minShared: Long = 20L)
          (write: (DataFrame, Long) => Unit)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    val evalSh = evalShingles(evalDocs, textCol, n)
      .localCheckpoint(true) // compute the eval set once, not per batch
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      write(cleanBatch(batch, evalSh, textCol, idCol, n, minShared), batchId)
    }
  }
}
