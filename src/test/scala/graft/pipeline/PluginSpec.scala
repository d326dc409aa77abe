package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Example user plugin: tags rows and applies a declarative filter from
  * params — exercises the full contract (spark handle, input frame,
  * YAML params). */
class UppercaseBodyPlugin extends ActorPlugin {
  override def transform(spark: SparkSession, input: DataFrame,
                         params: Map[String, Any]): DataFrame = {
    val column = params.getOrElse("column", "body").toString
    input.withColumn(column, upper(col(column)))
      .withColumn("plugin_tag", lit(params.getOrElse("tag", "x").toString))
  }
}

class PluginSpec extends SparkSpec {
  import spark.implicits._

  test("plugin:<fqcn> module runs a user actor inside a YAML pipeline") {
    val in = Files.createTempDirectory("graft-plugin-").toString
    Seq((1L, "hello"), (2L, "world")).toDF("id", "body")
      .write.mode("overwrite").parquet(in)
    val yaml =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  up: {module: "plugin:graft.pipeline.UppercaseBodyPlugin", params: {column: body, tag: t1}}
        |  plugin_out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [up]}
        |  up: {connect: [plugin_out]}
        |""".stripMargin
    new PipelineCompiler(spark, PipelineConfig.parse(yaml)).runBatch()
    val out = spark.table("plugin_out")
      .select($"id", $"body", $"plugin_tag").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "HELLO", "t1"), (2L, "WORLD", "t1")))
  }

  test("unknown plugin class and non-plugin class fail loudly") {
    assert(intercept[IllegalArgumentException](
      ActorPlugin.load("plugin:no.such.Clazz")).getMessage.contains("not found"))
    assert(intercept[IllegalArgumentException](
      ActorPlugin.load("plugin:java.lang.String"))
      .getMessage.contains("does not implement"))
  }
}
