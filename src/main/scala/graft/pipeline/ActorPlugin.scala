package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pipeline extension point — the Spark rendering of the reference's Go
  * plugin actors (reference: pkg/corev1alpha1/flow loads `.so` plugins
  * that register actor constructors by name; here a YAML module id of
  * `plugin:<fully.qualified.ClassName>` resolves the class from the
  * session classpath at build time).
  *
  * Implementations must have a no-arg constructor. They receive the
  * upstream DataFrame and the actor's YAML params and return the
  * transformed frame — same contract as every built-in actor, so plugins
  * compose with routing, sinks and the streaming runner unchanged. Keep
  * the transform declarative (Column expressions, joins, groupBy) and
  * Catalyst optimizes through the plugin boundary exactly as it does for
  * built-ins.
  */
trait ActorPlugin {
  def transform(spark: SparkSession, input: DataFrame,
                params: Map[String, Any]): DataFrame
}

object ActorPlugin {
  val Prefix = "plugin:"

  def load(moduleId: String): ActorPlugin = {
    val cls = moduleId.stripPrefix(Prefix)
    val c = try Class.forName(cls)
    catch {
      case _: ClassNotFoundException =>
        throw new IllegalArgumentException(s"plugin class not found: $cls")
    }
    if (!classOf[ActorPlugin].isAssignableFrom(c))
      throw new IllegalArgumentException(
        s"$cls does not implement graft.pipeline.ActorPlugin")
    c.getDeclaredConstructor().newInstance().asInstanceOf[ActorPlugin]
  }
}
