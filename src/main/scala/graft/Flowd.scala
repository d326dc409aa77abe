package graft

import java.nio.file.{Files, Paths}

import graft.pipeline.{PipelineCompiler, PipelineConfig}

/** Pipeline daemon entry point — the analog of the reference's `flowd`
  * binary (cmd/flowd-v1alpha1/main.go:17-96): assemble the layered config
  * (defaults < FLOW_* env < YAML < `-o key=value` cli, reference weights
  * 0/10/20/30 from main.go:22-25), validate/build the DAG, run it,
  * report.
  *
  * Usage: runMain graft.Flowd <config.yml> [--explain] [--explain-config]
  *        [--stream] [-o key=value]...
  *
  * --explain prints the Graphviz DOT of the DAG (the /pipeline/describe
  * admin surface) before running; --explain-config prints every resolved
  * key with the provider that won it and the layers it shadowed (the
  * reference's repository explain surface); --stream runs each sink as an
  * availableNow streaming query (file receivers need `schema_from`
  * params pointing at a parquet file to infer from).
  */
object Flowd {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Flowd <config.yml> [--explain] [--explain-config] [--stream] [-o key=value]...")
    val cfgPath = args(0)
    val explain = args.contains("--explain")
    val explainConfig = args.contains("--explain-config")
    val stream = args.contains("--stream")
    val repo = graft.pipeline.ConfigRepository.forPipeline(
      Files.readString(Paths.get(cfgPath)), args.toSeq)
    if (explainConfig) println(repo.explainAll)
    val cfg = repo.toPipelineConfig
    if (explain) println(PipelineConfig.toDot(cfg))
    val spark = GraftSession.get()
    val compiler = new PipelineCompiler(spark, cfg)
    val counts =
      if (stream) {
        val schemas = cfg.actors.values
          .filter(_.module == "core.receiver")
          .map { a =>
            val from = a.params.getOrElse("schema_from", a.params("path")).toString
            a.name -> spark.read.parquet(from).schema
          }.toMap
        compiler.runStreamingOnce(schemas)
      } else compiler.runBatch()
    val json = counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"pipeline":"$cfgPath","sinks":$json}""")
    spark.stop()
  }
}
