package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Provider precedence, env canonicalization, and explain provenance —
  * parity with the reference repository semantics (weights from
  * cmd/flowd-v1alpha1/main.go:22-25: default=0 < env=10 < yaml=20 <
  * cli=30; note the reference ranks YAML above env — an env var is the
  * fleet-wide ambient layer, the YAML file is the pipeline's own
  * declaration, and only an explicit `-o` beats it). */
class ConfigRepositorySpec extends AnyFunSuite {

  private val yaml =
    """system:
      |  maxprocs: 4
      |actors:
      |  src:  {module: core.receiver, params: {path: "/data/in.parquet"}}
      |  thr:  {module: core.throttler, params: {algo: gcra, key: k, ts: t, rps: 2.0}}
      |  out:  {module: core.sink, params: {format: noop}}
      |pipeline:
      |  src: {connect: [thr]}
      |  thr: {connect: [out]}
      |""".stripMargin

  private def repo(env: Map[String, String] = Map.empty,
                   args: Seq[String] = Nil) =
    ConfigRepository.forPipeline(yaml, args, env)

  test("weights: default < env < yaml < cli, per key") {
    // default-only key: visible, provider=default
    assert(repo().get("system.maxprocs").contains(4)) // yaml over default=1
    assert(repo().explain("system.maxprocs") ==
      Seq(("yaml", 20, 4), ("default", 0, 1)))

    // env over default (key absent from yaml)
    val r1 = repo(env = Map("FLOW_SYSTEM_NEWKEY" -> "7"))
    assert(r1.get("system.newkey").contains(7L))

    // yaml over env for the same key (reference weights: yaml=20 > env=10)
    val r2 = repo(env = Map("FLOW_SYSTEM_MAXPROCS" -> "9"))
    assert(r2.get("system.maxprocs").contains(4))
    assert(r2.explain("system.maxprocs").head == ("yaml", 20, 4))
    assert(r2.explain("system.maxprocs").map(_._1) == Seq("yaml", "env", "default"))

    // cli over everything
    val r3 = repo(env = Map("FLOW_SYSTEM_MAXPROCS" -> "9"),
      args = Seq("-o", "system.maxprocs=16"))
    assert(r3.get("system.maxprocs").contains(16L))
    assert(r3.explain("system.maxprocs").map(_._1) ==
      Seq("cli", "yaml", "env", "default"))
  }

  test("env canonicalization: FLOW_ prefix, _ -> ., __ -> literal _") {
    assert(EnvConfigProvider.canonise("SYSTEM_MAXPROCS") == "system.maxprocs")
    assert(EnvConfigProvider.canonise("FOO__BAR") == "foo_bar")
    assert(EnvConfigProvider.canonise("A_B__C_D") == "a.b_c.d")
    val p = new EnvConfigProvider(Map(
      "FLOW_ACTORS_THR_PARAMS_RPS" -> "0.5",
      "FLOW_TOGGLE" -> "", // no value -> boolean true
      "UNRELATED" -> "ignored"))
    assert(p.entries == Map(
      "actors.thr.params.rps" -> 0.5,
      "toggle" -> true))
  }

  test("cli -o parsing: k=v pairs, bare key -> true, malformed rejected") {
    val p = new CliConfigProvider(Seq("cfg.yml", "-o", "a.b=1", "-o", "flag", "--stream"))
    assert(p.entries == Map("a.b" -> 1L, "flag" -> true))
    intercept[IllegalArgumentException] {
      new CliConfigProvider(Seq("-o", "a=b=c")).entries
    }
    // trailing -o with no operand is a loud error, not a silent no-op
    intercept[IllegalArgumentException] {
      new CliConfigProvider(Seq("cfg.yml", "-o")).entries
    }
  }

  test("plugin params with literal dots survive the flatten/re-nest roundtrip") {
    val dotted =
      """actors:
        |  src: {module: core.receiver, params: {path: "/data/in.parquet"}}
        |  px:  {module: "plugin:com.example.MyActor", params: {"spark.executor.memory": "4g"}}
        |  out: {module: core.sink, params: {format: noop}}
        |pipeline:
        |  src: {connect: [px]}
        |  px:  {connect: [out]}
        |""".stripMargin
    val cfg = ConfigRepository.forPipeline(dotted).toPipelineConfig
    // the dotted param key arrives verbatim, exactly as PipelineConfig.parse
    // delivers it — not exploded into nested maps
    assert(cfg.actors("px").params == Map("spark.executor.memory" -> "4g"))
    assert(cfg.actors("px").params ==
      PipelineConfig.parse(dotted).actors("px").params)
  }

  test("a scalar key that is also a prefix of deeper keys fails loudly") {
    // typo'd env override nests UNDER the scalar system.maxprocs — the
    // merge must not silently drop either side
    val e = intercept[IllegalArgumentException] {
      repo(env = Map("FLOW_SYSTEM_MAXPROCS_X" -> "1")).toPipelineConfig
    }
    assert(e.getMessage.contains("maxprocs"))
  }

  test("explainAll lines carry winner and shadowed layers") {
    val lines = repo(env = Map("FLOW_SYSTEM_MAXPROCS" -> "9")).explainAll.linesIterator.toSeq
    val mp = lines.find(_.startsWith("system.maxprocs")).get
    assert(mp.contains("(yaml:20)") && mp.contains("env:10=9") && mp.contains("default:0=1"))
  }

  test("toPipelineConfig: cli/env overrides reach actor params and edges") {
    val cfg = repo(
      env = Map("FLOW_ACTORS_THR_PARAMS_RPS" -> "0.25"),
      args = Seq("-o", "actors.out.params.format=console")).toPipelineConfig
    // env sets a param the yaml also declares — yaml wins (weight 20 > 10)
    assert(cfg.actors("thr").params("rps") == 2.0)
    // cli beats yaml
    assert(cfg.actors("out").params("format") == "console")
    // structure/edges survive the flatten/nest round-trip + validation
    assert(cfg.downstream("src") == Seq("thr"))
    assert(cfg.downstream("thr") == Seq("out"))
    assert(cfg.actors("src").params("path") == "/data/in.parquet")

    // an env-only param lands when yaml doesn't declare it
    val cfg2 = repo(env = Map("FLOW_ACTORS_THR_PARAMS_QUOTA" -> "100")).toPipelineConfig
    assert(cfg2.actors("thr").params("quota") == 100L)
  }
}
