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

    // env over default (key absent from yaml); providers keep RAW strings
    val r1 = repo(env = Map("FLOW_SYSTEM_NEWKEY" -> "7"))
    assert(r1.get("system.newkey").contains("7"))

    // yaml over env for the same key (reference weights: yaml=20 > env=10)
    val r2 = repo(env = Map("FLOW_SYSTEM_MAXPROCS" -> "9"))
    assert(r2.get("system.maxprocs").contains(4))
    assert(r2.explain("system.maxprocs").head == ("yaml", 20, 4))
    assert(r2.explain("system.maxprocs").map(_._1) == Seq("yaml", "env", "default"))

    // cli over everything
    val r3 = repo(env = Map("FLOW_SYSTEM_MAXPROCS" -> "9"),
      args = Seq("-o", "system.maxprocs=16"))
    assert(r3.get("system.maxprocs").contains("16"))
    assert(r3.explain("system.maxprocs").map(_._1) ==
      Seq("cli", "yaml", "env", "default"))
  }

  test("env canonicalization: FLOW_ prefix, _ -> ., __ -> literal _") {
    assert(EnvConfigProvider.canonise("SYSTEM_MAXPROCS") == "system.maxprocs")
    assert(EnvConfigProvider.canonise("FOO__BAR") == "foo_bar")
    assert(EnvConfigProvider.canonise("A_B__C_D") == "a.b_c.d")
    val p = new EnvConfigProvider(Map(
      "FLOW_ACTORS_THR_PARAMS_RPS" -> "0.5",
      "FLOW_TOGGLE" -> "", // intentionally empty stays "" (reference parity)
      "UNRELATED" -> "ignored"))
    assert(p.entries == Map(
      "actors.thr.params.rps" -> "0.5",
      "toggle" -> ""))
  }

  test("cli -o parsing: k=v pairs, bare key -> true, malformed rejected") {
    val p = new CliConfigProvider(Seq("cfg.yml", "-o", "a.b=1", "-o", "flag", "--stream"))
    assert(p.entries == Map("a.b" -> "1", "flag" -> true))
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

    // an env-only param lands when yaml doesn't declare it, TYPED by the
    // module schema (raw "100" -> int param quota)
    val cfg2 = repo(env = Map("FLOW_ACTORS_THR_PARAMS_QUOTA" -> "100")).toPipelineConfig
    assert(cfg2.actors("thr").params("quota") == 100L)
  }

  // the pkg/cast converter matrix (schema.go:18-73 + mapper.go:107-140):
  // string -> declared type conversions succeed; unconvertible values
  // fail AT LOAD with the actor, key and expected type in the message.
  test("schema-typed params: convert-or-error at config load") {
    // string -> float/int/bool via cli land as their declared types
    val ok = repo(args = Seq(
      "-o", "actors.thr.params.rps=0.5",
      "-o", "actors.thr.params.quota=100")).toPipelineConfig
    assert(ok.actors("thr").params("rps") == 0.5)
    assert(ok.actors("thr").params("quota") == 100L)

    // wrongly-typed value: rejected at load, message names key + type
    val e = intercept[IllegalArgumentException] {
      repo(args = Seq("-o", "actors.thr.params.rps=fast")).toPipelineConfig
    }
    assert(e.getMessage.contains("thr.rps"), e.getMessage)
    assert(e.getMessage.contains("float"), e.getMessage)
    assert(e.getMessage.contains("fast"), e.getMessage)

    // string-typed params that LOOK numeric stay raw strings — no eager
    // "1.10"->1.1 / "2e5"->200000.0 / "010"->10 mangling
    val s = repo(args = Seq("-o", "actors.src.params.path=010")).toPipelineConfig
    assert(s.actors("src").params("path") == "010")
    // (column, not format: format values are now cross-field-validated
    // against the known sink formats, which is its own loud-failure test)
    val s2 = repo(args = Seq("-o", "actors.out.params.column=2e5")).toPipelineConfig
    assert(s2.actors("out").params("column") == "2e5")

    // bool conversion (dedup_near.distributed declared bool)
    val yamlNear =
      """actors:
        |  src:  {module: core.receiver, params: {path: "/data/in.parquet"}}
        |  nd:   {module: llm.dedup_near, params: {threshold: 0.7}}
        |  out:  {module: core.sink, params: {format: noop}}
        |pipeline:
        |  src: {connect: [nd]}
        |  nd:  {connect: [out]}
        |""".stripMargin
    val b = ConfigRepository.forPipeline(yamlNear,
      args = Seq("-o", "actors.nd.params.distributed=true")).toPipelineConfig
    assert(b.actors("nd").params("distributed") == true)
    val be = intercept[IllegalArgumentException] {
      ConfigRepository.forPipeline(yamlNear,
        args = Seq("-o", "actors.nd.params.distributed=yes")).toPipelineConfig
    }
    assert(be.getMessage.contains("bool"), be.getMessage)

    // list param from a YAML sequence AND from a comma string (cli form)
    val yamlRoute =
      """actors:
        |  src:  {module: core.receiver, params: {path: "/data/in.parquet"}}
        |  r:    {module: core.router, params: {key: k, routes: [a, b]}}
        |  a:    {module: core.sink, params: {format: noop}}
        |  b:    {module: core.sink, params: {format: noop}}
        |pipeline:
        |  src: {connect: [r]}
        |  r:   {connect: [a, b]}
        |""".stripMargin
    val l1 = ConfigRepository.forPipeline(yamlRoute).toPipelineConfig
    assert(l1.actors("r").params("routes") == Seq("a", "b"))
    val l2 = ConfigRepository.forPipeline(yamlRoute,
      args = Seq("-o", "actors.r.params.routes=b,a")).toPipelineConfig
    assert(l2.actors("r").params("routes") == Seq("b", "a"))

    // a numeric YAML value for an int param passes through typed
    assert(ok.actors("thr").params("rps").isInstanceOf[Double])
  }
}
