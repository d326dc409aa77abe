package graft.pipeline

import scala.jdk.CollectionConverters._

/** Multi-provider layered configuration — the Scala rendering of the
  * reference's cfg.Repository (pkg/cfg/repository.go; provider weights
  * from cmd/flowd-v1alpha1/main.go:22-25: default=0 < env=10 < yaml=20
  * < cli=30; per-key explain pkg/cfg/repository.go:321-327 backed by the
  * node breakdown at :62-82).
  *
  * Keys are dotted paths ("system.maxprocs", "actors.src.params.path").
  * `get` answers from the highest-weight provider holding the key;
  * `explain` returns every provider's answer for a key, weight-descending
  * — the "where did this value come from" surface that the reference
  * exposes and that anyone running one pipeline across environments
  * needs. A flat dotted-key map per provider replaces the reference's
  * trie: same lookup semantics, no tree bookkeeping.
  */
trait ConfigProvider {
  def name: String
  def weight: Int
  /** dotted key -> value; computed once at construction */
  def entries: Map[String, Any]
}

/** Baseline values (pkg/cfg/default_provider.go:22-26 keeps defaults in
  * ONE registry rather than scattered per-consumer fallbacks). */
final class DefaultConfigProvider(registry: Map[String, Any],
                                  val weight: Int = 0) extends ConfigProvider {
  val name = "default"
  val entries: Map[String, Any] = registry
}

object DefaultConfigProvider {
  /** flowspark's baseline registry (the reference ships config/plugin
    * paths + system.maxprocs=1, default_provider.go:22-26; maxprocs is
    * the shared knob, the paths are Go-deployment-specific). */
  val Defaults: Map[String, Any] = Map("system.maxprocs" -> 1)
}

/** `FLOW_`-prefixed environment variables (pkg/cfg/env_provider.go:16-20
  * canonise + :57-79 SetUp): prefix stripped, `_` -> `.`, but `__`
  * survives as a literal `_` (the `..` produced by the double underscore
  * is folded back), all lowercased. Values are kept as RAW strings — an
  * intentionally-empty `FLOW_K=` stays `""`, exactly like the reference's
  * env provider (its `true` branch only fires for environ entries lacking
  * `=`, which real environments never produce); the typed cast happens
  * per-key against the module schema at config load ([[ParamSchema]]). */
final class EnvConfigProvider(env: Map[String, String],
                              val weight: Int = 10) extends ConfigProvider {
  val name = "env"
  val entries: Map[String, Any] = env.collect {
    case (k, v) if k.startsWith("FLOW_") =>
      EnvConfigProvider.canonise(k.drop(5)) -> ((if (v == null) "" else v): Any)
  }
}

object EnvConfigProvider {
  def canonise(key: String): String =
    key.replace("_", ".").replace("..", "_").toLowerCase
  def fromSystem(weight: Int = 10): EnvConfigProvider =
    new EnvConfigProvider(sys.env, weight)
}

/** The parsed pipeline YAML flattened to dotted keys; sequences and
  * scalar leaves stay whole values. */
final class YamlConfigProvider(rootMap: Map[String, Any],
                               val weight: Int = 20) extends ConfigProvider {
  val name = "yaml"
  val entries: Map[String, Any] = YamlConfigProvider.flatten(rootMap, "")
}

object YamlConfigProvider {
  def parse(yamlText: String, weight: Int = 20): YamlConfigProvider = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Any]](yamlText)
    require(root != null, "empty pipeline config")
    new YamlConfigProvider(
      root.asScala.map { case (k, v) => k.toString -> (v: Any) }.toMap, weight)
  }

  private[pipeline] def flatten(m: Map[String, Any], prefix: String): Map[String, Any] =
    m.flatMap {
      case (k, v: java.util.Map[_, _]) =>
        flatten(v.asScala.map { case (ck, cv) => ck.toString -> (cv: Any) }.toMap,
          s"$prefix${ConfigRepository.escapeSegment(k)}.")
      case (k, v) => Map(s"$prefix${ConfigRepository.escapeSegment(k)}" -> v)
    }
}

/** `-o key=value` command-line overrides (pkg/cfg/cli_provider.go:67-76:
  * one `=` splits key/value, none means boolean true, more is an error).
  */
final class CliConfigProvider(args: Seq[String],
                              val weight: Int = 30) extends ConfigProvider {
  val name = "cli"
  val entries: Map[String, Any] = {
    // indexed scan, not sliding(2): a trailing `-o` with no operand is a
    // loud error (the reference's flag package errors the same way), not
    // a silently dropped override
    val opts = args.zipWithIndex.collect { case ("-o", i) =>
      require(i + 1 < args.length, "-o flag needs a key[=value] operand")
      args(i + 1)
    }
    // values stay RAW strings (cli_provider.go keeps them raw; the typed
    // cast happens per-key against the module schema at config load);
    // a bare key with no `=` is boolean true (cli_provider.go:67-76)
    opts.map { kv =>
      val chunks = kv.split("=", -1)
      require(chunks.length <= 2, s"malformed -o flag (too many `=`): $kv")
      if (chunks.length == 2) chunks(0) -> (chunks(1): Any)
      else kv -> (true: Any)
    }.toMap
  }
}

final class ConfigRepository(providers: Seq[ConfigProvider]) {
  private val byWeight = providers.sortBy(-_.weight)

  /** highest-weight provider's value for the key (repository.go:306-315). */
  def get(key: String): Option[Any] =
    byWeight.collectFirst {
      case p if p.entries.contains(key) => p.entries(key)
    }

  def keys: Seq[String] = providers.flatMap(_.entries.keys).distinct.sorted

  /** every provider's answer for a key, weight-descending; head is the
    * winning layer (node.explain, repository.go:62-82). */
  def explain(key: String): Seq[(String, Int, Any)] =
    byWeight.collect {
      case p if p.entries.contains(key) => (p.name, p.weight, p.entries(key))
    }

  /** one provenance line per key: `key = value (winner:weight; shadowed…)` */
  def explainAll: String =
    keys.map { k =>
      val layers = explain(k)
      val (wn, ww, wv) = layers.head
      val shadowed = layers.tail.map { case (n, w, v) => s"$n:$w=$v" }
      val suffix = if (shadowed.isEmpty) "" else s"  [over ${shadowed.mkString(", ")}]"
      s"$k = $wv  ($wn:$ww)$suffix"
    }.mkString("\n")

  /** The merged effective key space re-nested into the pipeline config
    * model — env/cli keys override or extend the YAML's. */
  def toPipelineConfig: PipelineConfig = {
    val merged = keys.map(k => k -> get(k).get).toMap
    PipelineConfig.fromFlat(merged)
  }
}

object ConfigRepository {
  /** The flowd provider stack with reference weights (cmd main.go:22-25).
    * Env/args injectable for tests. */
  def forPipeline(yamlText: String, args: Seq[String] = Nil,
                  env: Map[String, String] = sys.env,
                  defaults: Map[String, Any] = DefaultConfigProvider.Defaults)
      : ConfigRepository =
    new ConfigRepository(Seq(
      new DefaultConfigProvider(defaults),
      new EnvConfigProvider(env),
      YamlConfigProvider.parse(yamlText),
      new CliConfigProvider(args)))

  /** A literal `.` inside ONE YAML key segment (legal for plugin params
    * like `spark.executor.memory`) is escaped to \\u0001 during flatten so
    * dotted-path splitting cannot mangle it; [[unescapeSegment]] restores
    * it at re-nest time. Env/cli keys can't address such params — same
    * limitation as the reference's dot-canonicalized env keys. */
  private[pipeline] def escapeSegment(k: String): String =
    k.replace(".", "\u0001")
  private[pipeline] def unescapeSegment(k: String): String =
    k.replace("\u0001", ".")

}
