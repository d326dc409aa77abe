package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Compressor, FlowEventModel, Routing, Throttler, Transforms}
import graft.sources.{NetReceivers, PushReceiver}
import graft.streaming.{NetSinks, Streams}

/** Compiles a PipelineConfig into DataFrame dataflow and runs it — the
  * Spark rendering of the reference's pipeline assembly
  * (pkg/corev1alpha1/pipeline/pipeline.go:21-50: buildActors via module
  * factory dispatch, buildTopology wiring `connect` edges; factories at
  * pipeline/actor_factory.go:13-22).
  *
  * Semantic mapping:
  *  - fan-in (many upstreams) = unionByName (core.mux is implicit at any
  *    multi-upstream node, as in the reference where any actor can take
  *    multiple inbound connects);
  *  - fan-out (many downstreams) = the same upstream DF feeding every
  *    branch (LinkTo/replicate-to-all semantics, README.md:177-181);
  *    core.router restricts each downstream branch to its route
  *    (RouteTo/at-most-one semantics) with an implicit dead-letter;
  *  - sinks write parquet/console/memory; in streaming mode each sink
  *    branch becomes one foreachBatch query over the shared source.
  *
  * The per-node DataFrame is memoized so a diamond topology evaluates
  * each upstream once per action (and Catalyst reuses the scan across
  * branches of the same query).
  */
object PipelineCompiler {
  /** Module param key sets, derived from the typed [[ParamSchema]] — the
    * analog of the reference's pkg/cast config mapper (convert-or-give-up
    * validation of every config key against the module's schema,
    * pkg/cast/mapper.go + schema.go:18-73): a typo'd param (`treshold`,
    * `max_dupppm`) or a wrongly-typed value (`rps: "fast"`) fails loudly
    * at config-load time instead of silently falling back to the default
    * or erupting as a bare NumberFormatException mid-construction.
    * `plugin:<fqcn>` modules take arbitrary params and are exempt. */
  val KnownParams: Map[String, Set[String]] =
    ParamSchema.Modules.map { case (m, s) => m -> s.keySet }

  /** Validate names AND convert values per [[ParamSchema]]; returns the
    * config with typed param values. */
  def validateParams(cfg: PipelineConfig): PipelineConfig =
    ParamSchema.validate(cfg)
}

class PipelineCompiler(spark: SparkSession, cfg0: PipelineConfig) {

  private val cfg = PipelineCompiler.validateParams(cfg0)

  /** Build the DataFrame flowing OUT of `name` toward `forDownstream`
    * (router branches differ per downstream; everything else is
    * downstream-agnostic). */
  private val memo = scala.collection.mutable.Map.empty[(String, String), DataFrame]

  private def inputOf(name: String): DataFrame = {
    val ups = cfg.upstream(name)
    require(ups.nonEmpty, s"$name has no upstream")
    Routing.mux(ups.map(u => outputOf(u, name)))
  }

  def outputOf(name: String, forDownstream: String = ""): DataFrame = {
    val a = cfg.actors(name)
    // router and replicator emit a DIFFERENT branch per downstream; all
    // other actors are downstream-agnostic and share one memo entry
    val routeSensitive = a.module == "core.router" || a.module == "core.replicator"
    val key = (name, if (routeSensitive) forDownstream else "")
    memo.getOrElseUpdate(key, build(a, forDownstream))
  }

  private def p(a: ActorDef, k: String): Option[String] =
    a.params.get(k).map(_.toString)

  /** Total row count of a parquet directory from file FOOTERS — a
    * driver-side metadata read, no Spark job, no table scan. Sizes the
    * counted-broadcast gates of standing pipelines (a raw row count is
    * an upper bound on the distinct count, so gating broadcast on it is
    * conservative-correct: past the budget the join falls back to
    * shuffle, results identical either way). Replaces the per-build
    * `bl.count()` scan the r14 verdict flagged. */
  private def parquetRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val rootUri = fs.makeQualified(root).toUri.getPath.stripSuffix("/")
    // a hidden COMPONENT anywhere under the root (`_temporary/...` from
    // an in-flight writer, `.stage`/`_commits` protocol dirs) hides the
    // whole subtree, exactly like Spark's own read path — checking only
    // the file's basename would count a writer's staged part files
    def hidden(p: org.apache.hadoop.fs.Path): Boolean = {
      val rel = fs.makeQualified(p).toUri.getPath
        .stripPrefix(rootUri).stripPrefix("/")
      rel.split('/').exists(c => c.startsWith("_") || c.startsWith("."))
    }
    val it = fs.listFiles(root, true)
    var n = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
          !hidden(st.getPath)) {
        // an unreadable/torn footer (a concurrent writer's in-flight
        // file) must not fail pipeline compilation — the old lazy
        // bl.count() would have been consistent with the read path;
        // report "over any budget" so the gate falls back to the
        // shuffle join (results identical either way)
        try {
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
          try n += r.getRecordCount finally r.close()
        } catch {
          case scala.util.control.NonFatal(_) => return Long.MaxValue
        }
      }
    }
    n
  }

  // ---- bind:// network transports (the reference's primary config
  // surface: receiver_factory.go:10-37 dispatches tcp/udp/unix/http on
  // the `bind` param's URI scheme; sink_head_factory.go:17-46 the same
  // for sinks — examples/tcp2stdout-config.yml is exactly this shape).
  // A bind receiver starts the matching NetReceivers listener feeding a
  // push channel; the node then compiles like core.push_receiver.

  /** Live listeners started for bind:// receivers, actor name -> handle.
    * The streaming sub-compiler registers into its OUTER compiler, so
    * boundPort/close work on the instance the caller holds. */
  private val listeners = scala.collection.mutable.Map.empty[String, NetReceivers.Handle]

  /** Batch-mode scorecard observations, actor name -> Observation;
    * read after runBatch via [[scorecardCounts]]. */
  private val scorecardObservations =
    scala.collection.mutable.Map.empty[String, org.apache.spark.sql.Observation]

  /** Per-stage survivor counts a batch run's llm.curation_scorecard
    * actor observed (n_input, n_gopher, n_c4, n_clf, n_lm, n_kept).
    * Valid after runBatch evaluated the pipeline. */
  def scorecardCounts(actor: String): Map[String, Long] =
    scorecardObservations(actor).get.map {
      case (k, v: java.lang.Long) => k -> v.longValue()
      case (k, v) => k -> v.toString.toLong
    }

  private def channelOf(a: ActorDef): String =
    p(a, "channel").getOrElse(a.name)

  /** Idempotently start the listener a bind:// receiver declares; returns
    * the push channel it feeds. */
  private def ensureListener(a: ActorDef): String = listeners.synchronized {
    val channel = channelOf(a)
    if (!listeners.contains(a.name)) {
      p(a, "capacity").foreach(c => PushReceiver.configure(channel, c.toInt))
      // durable journal: acked messages survive driver restarts and
      // re-serve into the checkpointed stream (PushReceiver scaladoc)
      p(a, "journal_dir").foreach(d => PushReceiver.configureJournal(channel, d))
      val bind = p(a, "bind").get
      val handle = bind match {
        case s if s.startsWith("tcp://") =>
          NetReceivers.startTcp(channel, portOf(a, s.drop(6)),
            silent = p(a, "silent").exists(_.toBoolean))
        case s if s.startsWith("udp://") =>
          NetReceivers.startUdp(channel, portOf(a, s.drop(6)))
        case s if s.startsWith("unix://") =>
          NetReceivers.startUnix(channel, java.nio.file.Paths.get(s.drop(7)))
        case s if s.startsWith("http://") =>
          val rest = s.drop(7)
          val slash = rest.indexOf('/')
          val (hostPort, endpoint) =
            if (slash < 0) (rest, "/v1alpha1") else (rest.take(slash), rest.drop(slash))
          NetReceivers.startHttp(channel, portOf(a, hostPort), endpoint)
        case other =>
          sys.error(s"${a.name}: unrecognised bind protocol: '$other' " +
            "(expected tcp:// udp:// unix:// http://)")
      }
      listeners(a.name) = handle
    }
    channel
  }

  private def portOf(a: ActorDef, hostPort: String): Int = {
    val i = hostPort.lastIndexOf(':')
    require(i >= 0, s"${a.name}: bind needs [host]:port, got '$hostPort'")
    hostPort.drop(i + 1).toInt
  }

  /** Start every bind:// receiver's listener NOW (the reference starts
    * receivers at pipeline start, pipeline.go Start order) and return
    * actor name -> bound port (0 for unix sockets). Port 0 binds pick an
    * ephemeral port — read the real one here. */
  def startReceivers(): Map[String, Int] =
    cfg.actors.values.toSeq
      .filter(a => a.module == "core.receiver" && a.params.contains("bind"))
      .map { a => ensureListener(a); a.name -> listeners.synchronized(listeners(a.name).port) }
      .toMap

  /** Bound port of a started bind:// receiver (None before first build). */
  def boundPort(name: String): Option[Int] =
    listeners.synchronized(listeners.get(name).map(_.port))

  /** Stop every listener this compiler started. */
  def close(): Unit = listeners.synchronized {
    listeners.values.foreach(_.close())
    listeners.clear()
  }

  /** Batch rendering of a push channel: snapshot of everything pushed so
    * far, as the engine's event schema. */
  private def pushSnapshot(channel: String): DataFrame = {
    val msgs = PushReceiver.snapshot(channel)
      .map(m => graft.operators.FlowEvent(m.body, m.meta,
        new java.sql.Timestamp(m.tsMicros / 1000L)))
    import spark.implicits._
    msgs.toDF("body", "meta", "ingest_ts")
  }

  private def build(a: ActorDef, forDownstream: String): DataFrame = a.module match {
    // network receiver by bind:// scheme; batch mode snapshots what has
    // arrived on the channel by build time (call startReceivers() before
    // pushing, then compile — or run streaming, where arrival is live)
    case "core.receiver" if a.params.contains("bind") =>
      pushSnapshot(ensureListener(a))

    case "core.receiver" =>
      val path = p(a, "path").getOrElse(sys.error(s"${a.name}: receiver needs path"))
      val format = p(a, "format").getOrElse("parquet")
      // WARC/WET crawl containers resolve through the streaming
      // per-file kernel, not a DataSource format — the raw-crawl front
      // door (records) or the assembled documents frame
      if (format == "warc") {
        // dedup_digest drops CommonCrawl-repeated payloads from the
        // header columns alone, before extraction runs;
        // digest_index_path additionally drops every payload ANY prior
        // snapshot carried (the persisted digest index) — appending
        // the accepted snapshot's digests stays the ingest job's
        // explicit step (Warc.digestIndexAppend), not a compile-time
        // side effect
        return p(a, "digest_index_path") match {
          case Some(ip) =>
            graft.sources.Warc.documentsMeta(spark, path,
              dedupDigest = true, digestIndexPath = Some(ip))
              .drop("digest")
          case None if p(a, "dedup_digest").exists(_.toBoolean) =>
            graft.sources.Warc.documentsMeta(spark, path,
              dedupDigest = true).drop("digest")
          case None => graft.sources.Warc.documents(spark, path)
        }
      }
      if (format == "warc_records")
        return graft.sources.Warc.records(spark, path)
      // listed ts columns are normalized schema-adaptively: parquet
      // TIMESTAMP(NANOS) reads as a long (truncated to micros), standard
      // TIMESTAMP/NTZ passes through — fixture encodings vary by generation
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.format(format).load(path)
      p(a, "ts_nanos_to_micros").map(_.split(",").map(_.trim).filter(_.nonEmpty))
        .getOrElse(Array.empty[String])
        .foldLeft(raw)(graft.Tables.normalizeTs)

    // network-receiver analog: the in-process push channel. Batch mode
    // snapshots what has been pushed so far; the streaming runner
    // overrides this with the DSv2 stream.
    case "core.push_receiver" =>
      val channel = p(a, "channel").getOrElse("default")
      p(a, "journal_dir").foreach(d =>
        PushReceiver.configureJournal(channel, d))
      pushSnapshot(channel)

    case "core.mux" => inputOf(a.name) // fan-in is implicit; node is a no-op marker

    case "core.router" =>
      // route rows whose `key` column equals the downstream actor's
      // declared route; unroutable rows only flow to the dead_letter
      // downstream if declared (router.go:67-76)
      val keyCol = col(p(a, "key").getOrElse("route"))
      val routes = a.params.get("routes") match {
        case Some(sq: Seq[_]) => sq.map(_.toString) // schema-cast list
        case Some(l: java.util.List[_]) =>
          scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.map(_.toString).toSeq
        case _ => cfg.downstream(a.name).filterNot(_ == p(a, "dead_letter").getOrElse(""))
      }
      val annotated = Routing.annotateRoutes(inputOf(a.name), routes, keyCol)
      if (p(a, "dead_letter").contains(forDownstream))
        annotated.filter(col("route").isNull)
      else annotated.filter(col("route") === forDownstream)

    case "core.replicator" =>
      val k = cfg.downstream(a.name).size.max(1)
      p(a, "mode").getOrElse("each") match {
        case "each" => inputOf(a.name) // every downstream sees the full DF
        case "fanout" =>
          val idx = cfg.downstream(a.name).sorted.indexOf(forDownstream).max(0)
          Routing.replicateFanout(inputOf(a.name), k).filter(col("copy_id") === idx)
        case "rand" =>
          val idx = cfg.downstream(a.name).sorted.indexOf(forDownstream).max(0)
          Routing.replicateRand(inputOf(a.name), k).filter(col("copy_id") === idx)
        // n jump-hash replicas per row over the downstream peers
        // (reference intent README.md:215-218; replicator.go:89-91 left
        // this mode as panic — the engine completes it). `buckets`
        // defaults to the downstream count; declaring more buckets than
        // downstreams models a partial ring (copies placed on undeclared
        // buckets are dropped, as unrouted peers). `key` is a SQL
        // expression, so ingest pipelines can place by content hash
        // (key: "xxhash64(body)") the way the reference replicator
        // placed by message.
        case "ncopy" =>
          val keyC = p(a, "key")
            .getOrElse(sys.error(s"${a.name}: replicator ncopy needs key"))
          val downs = cfg.downstream(a.name).sorted
          val buckets = p(a, "buckets").map(_.toInt).getOrElse(k)
          val n = p(a, "n").map(_.toInt)
            .getOrElse(sys.error(s"${a.name}: replicator ncopy needs n"))
          val idx = downs.indexOf(forDownstream).max(0)
          Routing.replicateNcopy(inputOf(a.name), expr(keyC), n, buckets)
            .filter(col("copy_id") === idx)
        case other => sys.error(s"${a.name}: unknown replicator mode $other")
      }

    // exact GCRA form (reference throttler.go semantics): params
    // key, ts, rps — admits at the configured rate per key, message
    // passes through unreshaped. Works in batch AND streaming pipelines
    // (keyed TAT state carries across micro-batches).
    case "core.throttler" if p(a, "algo").contains("gcra") =>
      val keyC = p(a, "key").getOrElse(sys.error(s"${a.name}: throttler needs key"))
      val tsC = p(a, "ts").getOrElse("ts")
      val rps = p(a, "rps").map(_.toDouble).getOrElse(1.0)
      graft.streaming.GcraThrottler
        .throttleRows(inputOf(a.name), keyC, tsC, rps)
        .filter(col("admitted")).drop("admitted")

    case "core.throttler" =>
      val quota = p(a, "quota").map(_.toInt).getOrElse(1000)
      val win = p(a, "window").getOrElse("1 minute")
      val keyCol = col(p(a, "key").getOrElse(sys.error(s"${a.name}: throttler needs key")))
      val tsCol = col(p(a, "ts").getOrElse("ts"))
      val order = Seq(tsCol)
      Throttler.throttleByWindow(inputOf(a.name), keyCol, tsCol, win, quota, order)
        .filter(col("status") =!= FlowEventModel.StatusThrottled)

    case "core.compressor" =>
      Compressor.compress(inputOf(a.name), p(a, "codec").getOrElse("gzip"),
        p(a, "level").map(_.toInt).getOrElse(6), p(a, "column").getOrElse("body"))

    case "core.decompressor" =>
      Compressor.decompress(inputOf(a.name), p(a, "codec").getOrElse("gzip"),
        p(a, "column").getOrElse("body"))

    case "core.encoder_base64" =>
      Transforms.encodeBase64(inputOf(a.name), p(a, "column").getOrElse("body"))

    case "core.decoder_base64" =>
      Transforms.decodeBase64(inputOf(a.name), p(a, "column").getOrElse("body"))

    case "core.meta_parser" =>
      Transforms.parseMeta(inputOf(a.name), p(a, "column").getOrElse("body"),
        p(a, "meta").getOrElse("meta"))

    // analytics actor: per-key top-k through the custom operator
    // (params: keys: [col], order: ["col desc", "col"], k)
    case "core.topk" =>
      def strList(v: Any): Seq[String] = v match {
        case sq: Seq[_] => sq.map(_.toString) // schema-cast list
        case l: java.util.List[_] =>
          scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.map(_.toString).toSeq
        case one => Seq(one.toString)
      }
      val keys = a.params.get("keys").map(strList).getOrElse(Nil).map(col)
      val order = a.params.get("order").map(strList) match {
        case Some(specs) if specs.nonEmpty => specs.map { o =>
          o.trim.split("\\s+") match {
            case Array(c, d) if d.equalsIgnoreCase("desc") => col(c).desc
            case Array(c, _) => col(c).asc
            case Array(c) => col(c).asc
            case _ => sys.error(s"${a.name}: bad order spec '$o'")
          }
        }
        case _ => sys.error(s"${a.name}: topk needs order")
      }
      val k = p(a, "k").map(_.toInt).getOrElse(10)
      graft.plans.TopKPerKey(inputOf(a.name), keys, order, k,
        p(a, "rank_name").getOrElse("rank"))

    // keyed CDC merge: the flowing rows are the CHANGE feed, `base` is
    // the snapshot table on disk; output = merged snapshot (operators.
    // Upsert — last-writer-wins + tombstones in one key shuffle).
    // (params: base, keys, version, delete_flag)
    case "core.upsert" =>
      val basePath = p(a, "base").getOrElse(sys.error(s"${a.name}: upsert needs base path"))
      val keys = a.params.get("keys") match {
        case Some(sq: Seq[_]) => sq.map(_.toString)
        case Some(l: java.util.List[_]) =>
          scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.map(_.toString).toSeq
        case Some(one) => Seq(one.toString)
        case None => Seq("id")
      }
      graft.operators.Upsert(spark.read.parquet(basePath), inputOf(a.name),
        keys, p(a, "version").getOrElse("version"), p(a, "delete_flag"))

    // ---- LLM-curation actors (flowspark extension namespace) ----------
    // HTML -> text extraction (params: column, text_column,
    // min_line_chars: optional line-density boilerplate cut;
    // full_entities: true swaps the named-entity replace chain for the
    // HtmlEntityDecode codegen expression — numeric &#dd;/&#xhh;
    // references decode too). The codegen regexp chain of llm.Extract;
    // pairs with the warc receiver format for a raw-crawl-to-curation
    // pipeline.
    case "llm.extract" =>
      val c = p(a, "column").getOrElse("html")
      val out = p(a, "text_column").getOrElse("text")
      val extracted =
        if (p(a, "full_entities").exists(_.toBoolean))
          graft.llm.Extract.extractTextFull(col(c))
        else graft.llm.Extract.extractText(col(c))
      val cleaned = p(a, "min_line_chars").map(_.toInt) match {
        case Some(n) => graft.llm.Extract.mainContent(extracted, n)
        case None    => extracted
      }
      // a noindex page told every indexer to drop it — honor it
      // BEFORE paying extraction when asked to
      val base = inputOf(a.name)
      val gated =
        if (p(a, "drop_noindex").exists(_.toBoolean))
          base.filter(!graft.llm.Extract.metaNoindex(col(c)))
        else base
      gated.withColumn(out, cleaned)

    // link-density boilerplate extraction (jusText-style; params:
    // column = raw HTML in, text_column = main text out, id,
    // min_chars, max_link_density_pm). Block-granular: nav/footer
    // link clusters drop, prose survives; every input row keeps an
    // explicit output row (n_blocks/n_good annotations ride along).
    case "llm.main_content" =>
      val c = p(a, "column").getOrElse("html")
      val out = p(a, "text_column").getOrElse("text")
      val idc = p(a, "id").getOrElse("doc_id")
      val in = inputOf(a.name)
      val blocks = graft.llm.Extract.mainContentBlocks(in, c, idc,
        minChars = p(a, "min_chars").map(_.toInt).getOrElse(25),
        maxLinkDensityPm =
          p(a, "max_link_density_pm").map(_.toInt).getOrElse(300))
      in.drop(out)
        .join(blocks.withColumnRenamed("main_text", out), Seq(idc), "left")

    // C4 cleaning rules (Raffel et al. 2020 §2.2; params: column,
    // min_lines, annotate_only). Rewrites the text column to the
    // surviving lines (terminal punctuation, >= 5 words, no
    // 'javascript'); drops pages with 'lorem ipsum', '{', or fewer
    // than min_lines survivors unless annotate_only.
    case "llm.c4_filter" =>
      val c = p(a, "column").getOrElse("text")
      val minLines = p(a, "min_lines").map(_.toLong).getOrElse(3L)
      val kept = graft.functions.TextFunctions.c4KeptLines(col(c))
      val annotated = inputOf(a.name)
        .withColumn("c4_has_lorem", lower(col(c)).contains("lorem ipsum"))
        .withColumn("c4_has_brace", col(c).contains("{"))
        .withColumn("c4_n_kept_lines", size(kept).cast("long"))
        .withColumn("c4_pass", !col("c4_has_lorem") &&
          !col("c4_has_brace") && col("c4_n_kept_lines") >= minLines)
      if (p(a, "annotate_only").exists(_.toBoolean)) annotated
      else annotated.filter(col("c4_pass"))
        .withColumn(c, array_join(kept, "\n")) // survivors only

    // Curation SCORECARD: the whole quality gauntlet (gopher → c4 →
    // classifier → LM score → exact dedup) as ONE actor, annotating
    // each stage's verdict and counting survivors per stage — the
    // counters ride Dataset.observe on the SAME evaluation the sink
    // consumes (zero extra passes; batch counts via scorecardCounts,
    // streaming counts via the StatusCollector listener). Params:
    // column, id, c4_min_lines, clf_min_score, lm_min_score_ppm,
    // annotate_only (absent = gate to `keep`).
    case "llm.curation_scorecard" =>
      val c = p(a, "column").getOrElse("text")
      val idc = p(a, "id").getOrElse("doc_id")
      val knobs = graft.llm.Curation.Knobs(
        c4MinLines = p(a, "c4_min_lines").map(_.toLong).getOrElse(1L),
        clfMinScore = p(a, "clf_min_score").map(_.toLong).getOrElse(0L),
        lmMinScorePpm =
          p(a, "lm_min_score_ppm").map(_.toLong).getOrElse(32000L))
      val annotated =
        graft.llm.Curation.scorecard(inputOf(a.name), c, idc, knobs)
      val es = graft.llm.Curation.stageCountExprs()
      val observed =
        if (annotated.isStreaming)
          annotated.observe(s"${a.name}_scorecard", es.head, es.tail: _*)
        else {
          val obs = org.apache.spark.sql.Observation()
          scorecardObservations(a.name) = obs
          annotated.observe(obs, es.head, es.tail: _*)
        }
      // slim to the verdict flags: the signal columns (lm_score_ppm,
      // clf_score, the gopher ppm set) would collide with downstream
      // annotate actors re-deriving them; the CollectMetrics node sits
      // below the projection, so counters still evaluate
      val slim = observed.drop("n_words", "mean_word_len_ppm",
        "symbol_ppm", "alpha_ppm", "stop_hits", "clf_score",
        "lm_score_ppm")
      if (p(a, "annotate_only").exists(_.toBoolean)) slim
      else slim.filter(col("keep"))

    // Gopher quality rules (Rae et al. 2021 Appendix A; params: column,
    // annotate_only: true = keep all rows with the `gopher_pass`
    // column, else gate). Thresholds are the paper's; the signals ride
    // as exact-ppm columns for downstream analysis.
    case "llm.gopher_filter" =>
      val c = p(a, "column").getOrElse("text")
      val sig = graft.functions.TextFunctions.gopherSignals(col(c))
      val annotated = sig.foldLeft(inputOf(a.name)) {
        case (df, (nm, cc)) => df.withColumn(nm, cc)
      }.withColumn("gopher_pass",
        col("n_words").between(50L, 100000L) &&
          col("mean_word_len_ppm").between(3000000L, 10000000L) &&
          col("symbol_ppm") <= 100000L && col("alpha_ppm") >= 800000L &&
          col("stop_hits") >= 2L)
      if (p(a, "annotate_only").exists(_.toBoolean)) annotated
      else annotated.filter(col("gopher_pass"))

    // URL canonicalization (params: column, out_column, dedup: true
    // keeps one row per canonical URL — min doc order by the id
    // column). Full NormalizeUrl codegen expression: casing, default
    // ports, fragment/tracker removal, canonical param order.
    case "llm.url_normalize" =>
      val c = p(a, "column").getOrElse("url")
      val out = p(a, "out_column").getOrElse("norm_url")
      val annotated = inputOf(a.name)
        .withColumn(out, graft.functions.NormalizeUrl(col(c)))
      if (p(a, "dedup").exists(_.toBoolean)) {
        val idc = p(a, "id").getOrElse("doc_id")
        val keep = annotated.groupBy(col(out))
          .agg(min(col(idc)).as(idc)).select(col(idc))
        annotated.join(keep, Seq(idc), "left_semi")
      } else annotated

    // paragraph-granular exact dedup (params: column, id, separator) —
    // the MassiveText "remove duplicated paragraphs" pass; rewrites
    // the text column to the surviving paragraphs and annotates
    // n_paras/n_kept
    case "llm.dedup_paragraph" =>
      val c = p(a, "column").getOrElse("text")
      val idc = p(a, "id").getOrElse("doc_id")
      val sep = p(a, "separator").getOrElse("\n")
      val in = inputOf(a.name)
      val deduped = graft.llm.Dedup.dedupParagraphs(in, c, idc, sep)
        .select(col("doc_id").as(idc), col("n_paras"), col("n_kept"),
          col("clean_text"))
      // LEFT join: an empty/all-separator text yields zero paragraph
      // rows, so an inner join would silently drop the doc from the
      // pipeline — annotation must keep every input row.
      in.drop(c).join(deduped, Seq(idc), "left")
        .withColumn("n_paras", coalesce(col("n_paras"), lit(0L)))
        .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
        .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
        .withColumnRenamed("clean_text", c)

    // URL/domain blocklist filter — the stage a curation run applies
    // FIRST, before parsing a byte of content (params: url_column,
    // blocklist: comma list of registrable domains or exact hosts,
    // blocklist_path: parquet with a `domain` column for
    // UT1-scale lists, keywords: comma list matched whole-word
    // case-insensitive against the URL, annotate_only; host_column/
    // domain_column/reason_column rename the annotations). Blocked =
    // registrable domain or host on a list, or a keyword hit;
    // annotate_only keeps every row with the reason column, otherwise
    // blocked rows drop and the reason column with them.
    case "llm.url_filter" =>
      val uc = p(a, "url_column").getOrElse("url")
      val hostCol = p(a, "host_column").getOrElse("host")
      val domCol = p(a, "domain_column").getOrElse("domain")
      val reasonCol = p(a, "reason_column").getOrElse("url_reason")
      val entries = p(a, "blocklist").toSeq.flatMap(_.split(","))
        .map(_.trim.toLowerCase).filter(_.nonEmpty)
      val kws = p(a, "keywords").toSeq.flatMap(_.split(","))
        .map(_.trim).filter(_.nonEmpty)
      val in0 = inputOf(a.name)
        .withColumn(hostCol, graft.llm.Extract.urlHost(col(uc)))
        .withColumn(domCol,
          graft.llm.Extract.registrableDomain(col(hostCol)))
      val (in1, pathHit) = p(a, "blocklist_path") match {
        case Some(bp) =>
          val bl = spark.read.parquet(bp)
            .select(lower(col("domain")).as("_bl_domain")).distinct()
            .withColumn("_bl_hit", lit(true))
          // domain blocklists are dimension-sized (UT1 ~4M rows, tens
          // of MB): counted broadcast gate with a shuffle-join
          // fallback past the budget — the house join discipline. The
          // count comes from parquet FOOTERS (driver metadata read, no
          // job): a standing pipeline re-compiles per restart and paid
          // a full blocklist scan each time; the raw row count upper-
          // bounds the distinct count, so the gate stays conservative
          val blG =
            if (parquetRowCount(spark, bp) <= 4000000L) broadcast(bl) else bl
          (in0.join(blG, col(domCol) === col("_bl_domain"), "left")
            .drop("_bl_domain"),
            coalesce(col("_bl_hit"), lit(false)))
        case None => (in0, lit(false))
      }
      val listHit =
        if (entries.isEmpty) lit(false)
        else col(domCol).isin(entries: _*) || col(hostCol).isin(entries: _*)
      val kwHit =
        if (kws.isEmpty) lit(false)
        else lower(col(uc)).rlike(graft.llm.Extract.wordListPattern(kws))
      val annotated = in1
        .withColumn(reasonCol, when(listHit || pathHit, "blocklist")
          .when(kwHit, "keyword").otherwise(lit(null).cast("string")))
        .drop("_bl_hit")
      if (p(a, "annotate_only").exists(_.toBoolean)) annotated
      else annotated.filter(col(reasonCol).isNull).drop(reasonCol)

    // word-list page gate (the C4 "bad words" filter; params: column,
    // words: comma list, count_column, max_count — a page survives at
    // most max_count whole-word case-insensitive hits, default 0 =
    // any hit drops it; annotate_only keeps all rows with the count)
    case "llm.badwords_filter" =>
      val c = p(a, "column").getOrElse("text")
      val words = p(a, "words").toSeq.flatMap(_.split(","))
        .map(_.trim).filter(_.nonEmpty)
      val cc = p(a, "count_column").getOrElse("n_badwords")
      val maxC = p(a, "max_count").map(_.toLong).getOrElse(0L)
      val ann = inputOf(a.name).withColumn(cc,
        graft.llm.Extract.badwordCount(col(c), words))
      if (p(a, "annotate_only").exists(_.toBoolean)) ann
      else ann.filter(col(cc) <= maxC)

    // quality gate: score text, keep rows >= min_quality
    // (params: column, min_quality, score_column)
    case "llm.quality_filter" =>
      val c = p(a, "column").getOrElse("text")
      val minQ = p(a, "min_quality").map(_.toDouble).getOrElse(0.5)
      val scoreCol = p(a, "score_column").getOrElse("quality")
      inputOf(a.name)
        .withColumn(scoreCol, graft.functions.TextFunctions.qualityScore(col(c)))
        .filter(col(scoreCol) >= minQ)

    // feature-hashed linear classifier gate (params: column, buckets,
    // score_column, min_score: optional — absent = annotate only;
    // label_column: optional — present = TRAIN the weights on this
    // batch's 0/1 labels via llm.Classifier's deterministic
    // fixed-point gradient descent, train_iters/lr_ppm tune it).
    // Without labels, deterministic md5-bucket weights stand in for a
    // trained model; either way scoring is the codegen HashedBowScore
    // pass, map-only per batch (trained weights constant-fold into the
    // scan).
    case "llm.classifier" =>
      val c = p(a, "column").getOrElse("text")
      val buckets = p(a, "buckets").map(_.toInt).getOrElse(4096)
      val scoreCol = p(a, "score_column").getOrElse("clf_score")
      val in = inputOf(a.name)
      val weights = (p(a, "label_column"), p(a, "model_path")) match {
        case (Some(labelCol), savePath) =>
          val w = graft.llm.Classifier.train(
            in, c, labelCol, p(a, "id").getOrElse("doc_id"), buckets,
            iters = p(a, "train_iters").map(_.toInt).getOrElse(3),
            lrPpm = p(a, "lr_ppm").map(_.toLong).getOrElse(1000000L))
          // with both params, training also PERSISTS the model —
          // later label-less runs score from it (train-once/score-many)
          savePath.foreach(graft.llm.Classifier.saveWeights(spark, w, _))
          graft.llm.Classifier.weightsColumn(w)
        case (None, Some(path)) =>
          graft.llm.Classifier.weightsColumn(
            graft.llm.Classifier.loadWeights(spark, path))
        case (None, None) => org.apache.spark.sql.functions.expr(
          s"transform(sequence(0, ${buckets - 1}), b -> CAST(b % 1001 - 500 AS BIGINT))")
      }
      val annotated = in.withColumn(scoreCol,
        graft.functions.HashedBowScore(
          graft.functions.TextFunctions.tokens(col(c)), weights))
      p(a, "min_score") match {
        case Some(min) => annotated.filter(col(scoreCol) >= min.toLong)
        case None      => annotated
      }

    // deterministic weighted sampling (params: id, weight_column, k,
    // group: optional comma-separated strata columns — absent = one
    // global group; seed: optional salt). Keeps k rows per group with
    // inclusion odds ∝ weight, RNG-free (llm.Sampling scaladoc).
    case "llm.weighted_sample" =>
      val idc = p(a, "id").getOrElse("doc_id")
      val wc = p(a, "weight_column").getOrElse("weight")
      val k = p(a, "k").map(_.toInt).getOrElse(100)
      val groups = p(a, "group").map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty)
      val seed = p(a, "seed").getOrElse("")
      val in = inputOf(a.name)
      val grouped = if (groups.nonEmpty) in
        else in.withColumn("_g", lit(0))
      graft.llm.Sampling.weightedSample(grouped,
          if (groups.nonEmpty) groups else Seq("_g"), idc, wc, k, seed)
        .drop("_g")

    // BPE tokenization annotate (params: column, pieces_column,
    // count_column, and EITHER merges_path — a persisted Bpe.saveMerges
    // table, the standing-pipeline shape — OR num_merges to self-train
    // on the flowing batch, batch runs only). Each message gains its
    // piece sequence and piece count; bulk jobs use Bpe.encode instead.
    case "llm.bpe_encode" =>
      val c = p(a, "column").getOrElse("text")
      val piecesCol = p(a, "pieces_column").getOrElse("pieces")
      val nCol = p(a, "count_column").getOrElse("n_pieces")
      val in = inputOf(a.name)
      val merges = p(a, "merges_path") match {
        case Some(path) => graft.llm.Bpe.loadMerges(spark, path)
        case None => graft.llm.Bpe.trainMerges(in, c,
          p(a, "num_merges").map(_.toInt).getOrElse(16))
      }
      in.withColumn(piecesCol, graft.llm.Bpe.piecesColumn(col(c), merges))
        .withColumn(nCol, size(split(col(piecesCol), " ")))

    // Unigram-LM tokenization annotate — the SentencePiece-style twin
    // of llm.bpe_encode (params: column, pieces_column, count_column,
    // and EITHER vocab_path — a persisted Unigram.saveVocab table —
    // OR em_iters to self-train on the flowing batch). Each message
    // gains its Viterbi piece sequence and piece count.
    case "llm.unigram_encode" =>
      val c = p(a, "column").getOrElse("text")
      val piecesCol = p(a, "pieces_column").getOrElse("pieces")
      val nCol = p(a, "count_column").getOrElse("n_pieces")
      val idc = p(a, "id").getOrElse("doc_id")
      val in = inputOf(a.name)
      val vocab = p(a, "vocab_path") match {
        case Some(path) => graft.llm.Unigram.loadVocab(spark, path)
        case None => graft.llm.Unigram.train(in, c,
          iters = p(a, "em_iters").map(_.toInt).getOrElse(
            graft.llm.Unigram.EmIters))
      }
      val enc = graft.llm.Unigram.encodeFast(in, idc, c, vocab)
        .select(col(idc), col("pieces").as(piecesCol),
          col("n_pieces").as(nCol))
      // left join + empty-piece defaults: zero-token messages survive
      // annotation (the dedup_paragraph lesson)
      in.join(enc, Seq(idc), "left")
        .withColumn(piecesCol, coalesce(col(piecesCol), lit("")))
        .withColumn(nCol, coalesce(col(nCol), lit(0L)))

    // n-gram LM quality annotate/gate (params: column, id, score_column,
    // min_score_ppm: optional — absent = annotate only, and EITHER
    // model_path — a persisted Lm.lmBuildIndex model, the standing-
    // pipeline shape — OR nothing to self-score the flowing batch, the
    // self-perplexity form that flags gibberish/boilerplate without a
    // reference corpus). Each message gains its mean per-token
    // predictability in ppm (Lm scaladoc); empty-text rows score 0.
    case "llm.lm_score" =>
      val c = p(a, "column").getOrElse("text")
      val idc = p(a, "id").getOrElse("doc_id")
      val scoreCol = p(a, "score_column").getOrElse("lm_score_ppm")
      val in = inputOf(a.name)
      // per_lang: CCNet's actual configuration — a model PER language
      // (lang-keyed counts batch-self-trained, or one persisted shard
      // per language under model_path via lmBuildIndexPerLang), so
      // minority languages never score against the majority's
      // statistics
      val scores = ((p(a, "per_lang"), p(a, "model_path")) match {
        case (Some(langCol), Some(path)) =>
          graft.llm.Lm.lmScoreIndexPerLang(in, c, idc, langCol, path)
        case (Some(langCol), None) =>
          graft.llm.Lm.lmScorePerLang(in, in, c, idc, langCol)
        case (None, Some(path)) =>
          graft.llm.Lm.lmScoreIndex(in, c, idc, path)
        case (None, None) => graft.llm.Lm.lmScore(in, in, c, idc)
      }).select(col("doc_id").as(idc), col("lm_score_ppm").as(scoreCol))
      val annotated = in.join(scores, Seq(idc), "left")
        .withColumn(scoreCol, coalesce(col(scoreCol), lit(0L)))
      // CCNet head/middle/tail annotation from FIXED reference cutoffs
      // (a deployment derives them once via Lm.lmBucketCutoffs on a
      // reference slice — per-batch cutoffs would drift with traffic):
      // tier_cutoffs_ppm: "c1,c2,..." descending; score >= c1 -> tier 1
      // ("head"), >= c2 -> 2 ("middle"), ... else last ("tail" at 2
      // cutoffs). keep_tiers gates on a comma-separated allowlist.
      val tiered = p(a, "tier_cutoffs_ppm") match {
        case Some(cuts) =>
          val cs = cuts.split(",").map(_.trim.toLong)
          require(cs.zip(cs.tail).forall { case (a1, b1) => a1 > b1 },
            s"${a.name}: tier_cutoffs_ppm must be STRICTLY descending " +
              "(a duplicated cutoff would make its tier unreachable)")
          val tierCol = p(a, "tier_column").getOrElse("lm_tier")
          val names = if (cs.length == 2) Seq("head", "middle", "tail")
            else (1 to cs.length + 1).map(i => s"tier$i")
          val tier = cs.zipWithIndex.foldRight(lit(names.last): Column) {
            case ((c, i), acc) => when(col(scoreCol) >= c, names(i)).otherwise(acc)
          }
          val t = annotated.withColumn(tierCol, tier)
          p(a, "keep_tiers") match {
            case Some(keep) => t.filter(col(tierCol)
              .isInCollection(keep.split(",").map(_.trim).toSeq))
            case None => t
          }
        case None => annotated
      }
      p(a, "min_score_ppm") match {
        case Some(min) => tiered.filter(col(scoreCol) >= min.toLong)
        case None      => tiered
      }

    // language annotate/gate (params: column, lang_column, keep: optional
    // comma-separated allowlist — absent = annotate only).
    // With labeled_path (a parquet of (text, <label_column>) examples,
    // the CCNet posture: label a SAMPLE, score the corpus), prediction
    // upgrades from the stopword vote to a one-vs-rest hashed-BoW
    // classifier trained in-pipeline (Classifier.trainMulti — buckets/
    // train_iters/lr_ppm tune it); the heuristic stays the zero-model
    // fallback. Inference is map-only either way (trained weight
    // vectors constant-fold into the scan).
    case "llm.langid" =>
      val c = p(a, "column").getOrElse("text")
      val langCol = p(a, "lang_column").getOrElse("lang")
      val modelsOpt: Option[Seq[(String, Array[Long])]] =
        (p(a, "labeled_path"), p(a, "model_path")) match {
          case (Some(path), savePath) =>
            val labeled = spark.read.parquet(path)
            val models = graft.llm.Classifier.trainMulti(
              labeled, p(a, "labeled_text_column").getOrElse("text"),
              p(a, "label_column").getOrElse("lang"),
              p(a, "labeled_id_column").getOrElse("doc_id"),
              buckets = p(a, "buckets").map(_.toInt).getOrElse(4096),
              iters = p(a, "train_iters").map(_.toInt).getOrElse(3),
              lrPpm = p(a, "lr_ppm").map(_.toLong).getOrElse(1000000L))
            // with both params, training also PERSISTS the model family —
            // later label-less runs predict from it (train-once/score-many)
            savePath.foreach(graft.llm.Classifier.saveMulti(spark, models, _))
            Some(models)
          case (None, Some(path)) =>
            Some(graft.llm.Classifier.loadMulti(spark, path))
          case (None, None) => None
        }
      val pred = modelsOpt match {
        case Some(models) => graft.llm.Classifier.predict(
          graft.functions.TextFunctions.tokens(col(c)), models)
        case None => graft.functions.TextFunctions.langId(col(c))
      }
      val annotated0 = inputOf(a.name).withColumn(langCol, pred)
      // margin_column / min_margin: the confidence gate — classifier
      // paths only (the stopword heuristic has no score to margin)
      val annotated = (p(a, "margin_column"), p(a, "min_margin")) match {
        case (None, None) => annotated0
        case (mc, mm) =>
          val models = modelsOpt.getOrElse(sys.error(s"${a.name}: " +
            "margin needs a trained model (labeled_path or model_path)"))
          val margin = graft.llm.Classifier.predictMargin(
            graft.functions.TextFunctions.tokens(col(c)), models)
          val marginCol = mc.getOrElse("lang_margin")
          val withM = annotated0.withColumn(marginCol, margin)
          val gated = mm.map(v => withM.filter(col(marginCol) >= v.toLong))
            .getOrElse(withM)
          if (mc.isEmpty) gated.drop(marginCol) else gated
      }
      p(a, "keep") match {
        case Some(keep) =>
          annotated.filter(col(langCol).isin(keep.split(",").map(_.trim): _*))
        case None => annotated
      }

    // exact content dedup: keep the min-id row per distinct text
    // (params: column, id)
    case "llm.dedup_exact" =>
      val c = p(a, "column").getOrElse("text")
      val idc = p(a, "id").getOrElse("doc_id")
      val in = inputOf(a.name)
      val keep = graft.llm.Dedup.exact(in, c, idc).select(col(idc))
      in.join(keep, idc) // semi-shaped: keep-list is tiny vs corpus post-shuffle

    // exact-substring span dedup (Lee et al. 2022): rewrite each doc's
    // text with cross-document duplicated token runs cut, keeping one
    // corpus-wide copy per duplicated window (Dedup.cutDupSpans); docs
    // left empty by the cuts drop. Non-text columns ride along by id.
    // (params: column, id, window)
    case "llm.cut_dup_spans" =>
      val c = p(a, "column").getOrElse("text")
      val idc = p(a, "id").getOrElse("doc_id")
      val w = p(a, "window").map(_.toInt).getOrElse(8)
      val in = inputOf(a.name)
      val cut = graft.llm.Dedup.cutDupSpans(in, idc, c, w)
        .select(col("doc_id").as(idc), col("clean_text"))
      in.drop(c).join(cut, idc).withColumnRenamed("clean_text", c)

    // surgical decontamination (params: column, id, source_column,
    // eval_value, window): rows whose source matches eval_value form the
    // benchmark; every other row is REWRITTEN with benchmark-covered
    // token runs cut (Dedup.decontaminateCut — eval hashes broadcast).
    // Eval rows do not flow downstream; fully-cut docs drop.
    case "llm.decontaminate_cut" =>
      val c = p(a, "column").getOrElse("text")
      val idc = p(a, "id").getOrElse("doc_id")
      val srcCol = p(a, "source_column").getOrElse("source")
      val evalV = p(a, "eval_value").getOrElse(
        sys.error(s"${a.name}: decontaminate_cut needs eval_value"))
      val w = p(a, "window").map(_.toInt).getOrElse(8)
      val in = inputOf(a.name)
      val train = in.filter(col(srcCol) =!= evalV)
      val cut = graft.llm.Dedup.decontaminateCut(
          train, in.filter(col(srcCol) === evalV), idc, c, w)
        .select(col("doc_id").as(idc), col("clean_text"))
      train.drop(c).join(cut, idc).withColumnRenamed("clean_text", c)

    // repetition gate (Gopher filters): annotate dup-token/2-gram/3-gram
    // ppm and drop rows above max_dup_ppm (checked against the WORST of
    // the three). One codegen pass per row per n (DupNgramPpm), fully
    // narrow — no shuffle added to the pipeline
    // (params: column, max_dup_ppm)
    case "llm.repetition_filter" =>
      val c = p(a, "column").getOrElse("text")
      val maxPpm = p(a, "max_dup_ppm").map(_.toLong).getOrElse(300000L)
      val toks = graft.functions.TextFunctions.tokens(col(c))
      inputOf(a.name)
        .withColumn("dup_ppm", greatest(
          graft.functions.DupNgramPpm(toks, 1),
          graft.functions.DupNgramPpm(toks, 2),
          graft.functions.DupNgramPpm(toks, 3)))
        .filter(col("dup_ppm") <= maxPpm)

    // MinHash/LSH near-dedup: resolve clusters, keep the best document
    // per cluster (longest text, then min id) — the canonical curation
    // stage (params: column, id, shingle_n, threshold, distributed)
    case "llm.dedup_near" =>
      val c = p(a, "column").getOrElse("text")
      val idc = p(a, "id").getOrElse("doc_id")
      val shingleN = p(a, "shingle_n").map(_.toInt).getOrElse(3)
      val th = p(a, "threshold").map(_.toDouble).getOrElse(0.8)
      val dist = p(a, "distributed").exists(_.toBoolean)
      val in = inputOf(a.name)
      // emit=pairs surfaces the pair-level API (id_a, id_b, jaccard)
      // instead of the dedup'd corpus; collapse_exact restricts pair
      // yield to exact-dup representatives (the resolveClusters-internal
      // collapse, exposed for callers consuming pairs directly). Params
      // belonging to the OTHER emit mode are rejected, not silently
      // ignored — the same fail-loudly contract as the module schemas.
      p(a, "emit").getOrElse("dedup") match {
        case "pairs" =>
          require(p(a, "distributed").isEmpty,
            s"${a.name}: 'distributed' applies to emit=dedup cluster " +
              "resolution only; emit=pairs never resolves clusters")
          graft.llm.Dedup.minhashLshPairs(in, c, idc, shingleN, th,
            collapseExact = p(a, "collapse_exact").exists(_.toBoolean))
        case "dedup" =>
          require(p(a, "collapse_exact").isEmpty,
            s"${a.name}: 'collapse_exact' applies to emit=pairs only; " +
              "emit=dedup always collapses exact dups internally")
          val keep = graft.llm.Dedup
            .resolveClusters(in, c, idc, shingleN, th, distributed = dist)
            .filter(col("keep")).select(col(idc))
          in.join(keep, idc)
        case other =>
          sys.error(s"${a.name}: emit must be 'dedup' or 'pairs', got $other")
      }

    // benchmark decontamination gate: drop rows sharing >= min_shared
    // distinct n-gram shingles with the eval subset (rows whose
    // source_column equals eval_value). Eval shingles broadcast —
    // benchmarks are small; the corpus side streams through the join
    // (params: column, id, source_column, eval_value, ngram_n, min_shared)
    case "llm.decontaminate" =>
      val c = p(a, "column").getOrElse("text")
      val idc = p(a, "id").getOrElse("doc_id")
      val srcCol = p(a, "source_column").getOrElse("source")
      val evalV = p(a, "eval_value")
        .getOrElse(sys.error(s"${a.name}: decontaminate needs eval_value"))
      val n = p(a, "ngram_n").map(_.toInt).getOrElse(8)
      val minShared = p(a, "min_shared").map(_.toLong).getOrElse(20L)
      val in = inputOf(a.name)
      // bloom: "true" condenses the eval shingle set to a Bloom filter
      // instead of an exact broadcast — same answers (no false
      // negatives, exact verify), for eval sides past broadcast size
      val contaminated =
        if (p(a, "bloom").exists(_.toBoolean))
          graft.llm.Dedup.contaminationBloomSweep(in, idc, c, srcCol,
              evalV, n, minShared)
            .filter(col("contaminated")).select(col("doc_id").as(idc))
        else {
          val sh = in
            .select(col(idc), col(srcCol),
              graft.functions.TextFunctions.tokens(col(c)).as("__toks"))
            .repartition(spark.sparkContext.defaultParallelism)
            .select(col(idc), col(srcCol),
              explode(expr("array_distinct(transform(" +
                s"sequence(0, greatest(size(__toks)-$n, 0))," +
                s" i -> concat_ws(' ', slice(__toks, i+1, $n))))")).as("__s"))
          val evalSh = sh.filter(col(srcCol) === evalV).select(col("__s")).distinct()
          sh.filter(col(srcCol) =!= evalV)
            .join(broadcast(evalSh), "__s")
            .groupBy(col(idc)).agg(count_distinct(col("__s")).as("__shared"))
            .filter(col("__shared") >= minShared).select(col(idc))
        }
      in.filter(col(srcCol) =!= evalV)
        .join(contaminated, Seq(idc), "left_anti")

    case "core.sink" => inputOf(a.name) // materialization handled by run()

    // extension point: module "plugin:<fqcn>" resolves a user class from
    // the classpath (the Spark analog of the reference's Go .so plugins)
    case p if p.startsWith(ActorPlugin.Prefix) =>
      ActorPlugin.load(p).transform(spark, inputOf(a.name), a.params.toMap)

    case other => sys.error(s"${a.name}: unknown module $other")
  }

  /** Batch run: writes every sink; returns sink name -> row count.
    * Each sink evaluates its pipeline ONCE (a non-deterministic
    * upstream — rand replicator — must not write one sample and report
    * the count of another): full-pass writes observe their row count
    * in-flight via [[countedAction]] (no persist, no second pass);
    * console sinks — whose `show` is LIMITed by design — persist across
    * the count+show pair (human-scale output, the one place a cache is
    * still the honest answer); memory sinks pin their temp view to the
    * very rows that were counted. */
  def runBatch(): Map[String, Long] =
    cfg.sinks.map { s =>
      val a = cfg.actors(s)
      require(a.module == "core.sink", s"terminal actor $s must be core.sink")
      val df = outputOf(s)
      val showRows = p(a, "rows").map(_.toInt).getOrElse(20)
      // bind:// sinks (sink_head_factory.go:17-46): tcp/udp/unix
      // writers, file://STDOUT = console, file://<path> = raw
      // column-bytes file
      val n = p(a, "bind") match {
        case Some("file://STDOUT") => countedConsole(df, showRows)
        case Some(bind) =>
          countedAction(df)(d => writeBound(d, bind,
            p(a, "column").getOrElse("body"), append = false))
        case None => writeFormat(a, s, df)
      }
      s -> n
    }.toMap

  /** Runs exactly one full-pass `action` over `df`, returning the row
    * count of the SAME evaluation the action consumed — observed
    * in-flight through `Dataset.observe`, so nothing is persisted and
    * the pipeline runs once. Only valid for actions that evaluate every
    * row (writes, socket sends — not LIMITed `show`). */
  private def countedAction(df: DataFrame)(action: DataFrame => Unit): Long = {
    val obs = org.apache.spark.sql.Observation()
    action(df.observe(obs, count(lit(1)).as("rows")))
    obs.get("rows").asInstanceOf[Long]
  }

  /** Console sinks: `show` is LIMITed, so the full count needs its own
    * action; persist across the pair so both read one evaluation. */
  private def countedConsole(df: DataFrame, showRows: Int): Long = {
    df.persist()
    try {
      val n = df.count()
      df.show(showRows, truncate = false)
      n
    } finally df.unpersist()
  }

  /** One batch through a bind:// sink head. */
  private def writeBound(df: DataFrame, bind: String, column: String,
                         append: Boolean): Unit = bind match {
    // file://STDOUT never reaches here: both call sites route it to
    // countedConsole (its show is LIMITed, so it cannot share the
    // full-pass observe counting this dispatch is wrapped in)
    case s if s.startsWith("file://") =>
      df.select(col(column).cast("string")).write
        .mode(if (append) "append" else "overwrite").text(s.drop(7))
    case s =>
      NetSinks.writeBatch(df, NetSinks.writerFor(s, column))
  }

  /** The format-keyed (non-bind) batch sink dispatch; returns the row
    * count of the single evaluation each write performed. */
  private def writeFormat(a: ActorDef, s: String, df: DataFrame): Long =
      p(a, "format").getOrElse("memory") match {
        case "parquet" | "json" | "csv" =>
          countedAction(df) { d =>
            val path = p(a, "path").getOrElse(sys.error(s"$s: sink needs path"))
            val w = d.write.mode(p(a, "mode").getOrElse("overwrite"))
              .format(p(a, "format").get)
            // demux-to-directories: the batch rendering of content routing
            // (SURVEY §2.3 maps router's partitioned delivery to
            // df.write.partitionBy)
            val partitioned = a.params.get("partition_by") match {
              case Some(sq: Seq[_]) => w.partitionBy(sq.map(_.toString): _*)
              case Some(l: java.util.List[_]) =>
                w.partitionBy(
                  scala.jdk.CollectionConverters.ListHasAsScala(l).asScala
                    .map(_.toString).toSeq: _*)
              case Some(c) => w.partitionBy(c.toString)
              case None => w
            }
            partitioned.save(path)
          }
        case "console" =>
          countedConsole(df, p(a, "rows").map(_.toInt).getOrElse(20))
        case "memory" =>
          // the view must expose the SAME rows the count reports: a
          // lazily-registered view would re-evaluate the pipeline, and a
          // nondeterministic upstream would disagree with the count. Pin
          // the view by persisting the branch and counting THROUGH the
          // cache; the view owns the cache for its lifetime (executor
          // storage, disk-spillable — never a driver-side collect). A
          // repeated runBatch replaces the view, so the PREVIOUS run's
          // cache is released here — otherwise a long-lived session
          // re-running batch pipelines leaks executor storage per run.
          Option(memoryViewCaches.get(s)).foreach(prev =>
            scala.util.Try(prev.unpersist()))
          df.persist()
          val n = df.count()
          df.createOrReplaceTempView(s)
          memoryViewCaches.put(s, df)
          n
        case "noop" =>
          countedAction(df)(_.write.format("noop").mode("overwrite").save())
        // crawl-interchange sink: (doc_id, url, text) out as WET
        // conversion records (Warc.writeWet — one gzip-member per
        // record), the inverse of the warc receiver format
        case "wet" =>
          countedAction(df) { d =>
            graft.sources.Warc.writeWet(d,
              p(a, "path").getOrElse(sys.error(s"$s: sink needs path")))
          }
        case other => sys.error(s"$s: unknown sink format $other")
      }

  /** A compiler whose receivers compile to STREAMING sources (file-drop
    * stream / DSv2 push stream) instead of batch scans. */
  private def streamingCompiler(
      receiverSchemas: Map[String, org.apache.spark.sql.types.StructType])
      : PipelineCompiler =
    new PipelineCompiler(spark, cfg) {
      override def outputOf(name: String, forDownstream: String): DataFrame = {
        val a = cfg.actors(name)
        a.module match {
          // bind:// receiver: start the listener (registered on the OUTER
          // compiler, so its boundPort/close see it) and stream its push
          // channel through the DSv2 source
          case "core.receiver" if a.params.contains("bind") =>
            val channel = PipelineCompiler.this.ensureListener(a)
            spark.readStream
              .format(classOf[graft.sources.PushReceiverProvider].getName)
              .option("channel", channel)
              .load()
          case "core.receiver" =>
            val fmt = a.params.getOrElse("format", "parquet").toString
            // the warc formats are a batch per-file kernel, not a
            // DataSource — streaming crawl ingest goes through the
            // manifest-tailing loop, which a file stream cannot express
            require(fmt != "warc" && fmt != "warc_records",
              s"$name: warc receivers have no file-stream form — drive " +
                "streaming crawl ingest via StreamingWarcIngest " +
                "(manifest-tailing drop zone) instead")
            Streams.fileSource(spark, a.params("path").toString,
              receiverSchemas(name), fmt)
          case "core.push_receiver" =>
            val reader = spark.readStream
              .format(classOf[graft.sources.PushReceiverProvider].getName)
              .option("channel", a.params.getOrElse("channel", "default").toString)
            a.params.get("maxMsgsPerTrigger")
              .foreach(m => reader.option("maxMsgsPerTrigger", m.toString))
            reader.load()
          case _ => super.outputOf(name, forDownstream)
        }
      }
    }

  /** One micro-batch through sink actor `a`'s configured output: bind://
    * head (per-epoch reconnect, sink.go:80-110 discipline), file formats
    * append, console shows; memory/noop count-only (their batch semantics
    * don't accumulate across an unbounded stream). With `needCount` the
    * batch's row count is observed from the SAME single evaluation the
    * write consumes (in-flight via [[countedAction]], console excepted);
    * the daemon path passes `needCount = false` and discards the count,
    * so its writes stay a single plain action per trigger — no extra
    * materialization, no cache. */
  private def writeSinkBatch(a: ActorDef, batch: DataFrame,
                             needCount: Boolean = true): Long = {
    val showRows = p(a, "rows").map(_.toInt).getOrElse(20)
    def counted(action: DataFrame => Unit): Long =
      if (needCount) countedAction(batch)(action) else { action(batch); -1L }
    p(a, "bind") match {
      case Some("file://STDOUT") =>
        if (needCount) countedConsole(batch, showRows)
        else { batch.show(showRows, truncate = false); -1L }
      case Some(bind) =>
        counted(d => writeBound(d, bind, p(a, "column").getOrElse("body"),
          append = true))
      case None => p(a, "format").getOrElse("memory") match {
        case "parquet" | "json" | "csv" =>
          // committer v1 on the user-facing append sink: a crashed
          // write leaves the sink row-identical instead of v2's
          // partial task commits (see [[graft.llm.GenDir.V1AppendCommitter]])
          counted(_.write.options(graft.llm.GenDir.V1AppendCommitter)
            .mode("append").format(p(a, "format").get)
            .save(p(a, "path").getOrElse(sys.error(s"${a.name}: sink needs path"))))
        case "console" =>
          if (needCount) countedConsole(batch, showRows)
          else { batch.show(showRows, truncate = false); -1L }
        case _ => // memory/noop: the evaluation IS the sink's effect
          if (needCount) batch.count()
          else { batch.write.format("noop").mode("overwrite").save(); -1L }
      }
    }
  }

  /** Streaming run: the receiver becomes a file/push stream; each sink
    * branch runs as one foreachBatch query with Trigger.AvailableNow
    * (start/stop discipline per SURVEY §2.6.5 is inherent: queries are
    * started per sink and awaited before returns). Sinks WRITE their
    * configured outputs per micro-batch (same dispatch as the daemon
    * mode), so `Flowd --stream` on a bind/console/file sink emits, not
    * just counts. */
  def runStreamingOnce(receiverSchemas: Map[String, org.apache.spark.sql.types.StructType])
      : Map[String, Long] = {
    val streamCompiler = streamingCompiler(receiverSchemas)
    cfg.sinks.map { s =>
      val a = cfg.actors(s)
      require(a.module == "core.sink", s"terminal actor $s must be core.sink")
      val df = streamCompiler.outputOf(s)
      var n = 0L
      Streams.runForeachBatch(df, (batch, _) => {
        n += writeSinkBatch(a, batch)
      })
      s -> n
    }.toMap
  }

  /** Daemon mode (the reference's long-running flowd): start every sink
    * branch as a CONTINUOUS foreachBatch query and return the live
    * queries — the pipeline keeps draining newly-arriving files/messages
    * until each query is stopped (or `spark.streams.awaitAnyTermination`
    * unblocks). File/object sinks append per micro-batch; console shows;
    * memory/noop count (their batch semantics don't accumulate across an
    * unbounded stream). Pair with [[graft.streaming.AdminServer]] for
    * live /progress while it runs.
    *
    * A sink's `checkpoint` param pins its query's checkpointLocation, so
    * a restarted `--follow` daemon resumes from committed offsets instead
    * of re-ingesting the whole backlog into an append sink; without it a
    * fresh ephemeral dir is used (every restart replays from scratch).
    * Caveat either way: foreachBatch + append is at-least-once — a batch
    * retried after a mid-write crash appends its rows twice. */
  def startStreaming(receiverSchemas: Map[String, org.apache.spark.sql.types.StructType],
                     trigger: org.apache.spark.sql.streaming.Trigger =
                       org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      : Map[String, org.apache.spark.sql.streaming.StreamingQuery] = {
    val streamCompiler = streamingCompiler(receiverSchemas)
    cfg.sinks.map { s =>
      val a = cfg.actors(s)
      require(a.module == "core.sink", s"terminal actor $s must be core.sink")
      val df = streamCompiler.outputOf(s)
      // the reference sink's reconnect discipline (sink.go:80-110 /
      // buffer.go:33-93): a failing micro-batch write retries in-batch
      // with exponential backoff — every attempt opens fresh
      // connections, so a restarted peer picks the backlog up — and an
      // exhausted batch is dead-lettered (counted via
      // [[deadLetterCounts]]), never thrown into the stream. Policy
      // knobs are sink params with the reference defaults.
      val policy = graft.streaming.ReliableSink.RetryPolicy(
        maxAttempts = p(a, "max_attempts").map(_.toInt).getOrElse(16),
        minBackoffMs = p(a, "min_backoff_ms").map(_.toLong).getOrElse(50L),
        maxBackoffMs = p(a, "max_backoff_ms").map(_.toLong).getOrElse(5000L))
      val write = graft.streaming.ReliableSink.withRetry(
        (batch, _) => writeSinkBatch(a, batch, needCount = false): Unit,
        (batch, batchId, err) => recordDeadLetter(s, batchId, batch, err),
        policy)
      val q = df.writeStream
        .queryName(s)
        .foreachBatch(write)
        .option("checkpointLocation",
          p(a, "checkpoint").getOrElse(Streams.newCheckpointDir()))
        .trigger(trigger)
        .start()
      s -> q
    }.toMap
  }

  /** memory-sink name -> the persisted DataFrame backing its temp view;
    * consulted on view replacement so the superseded cache is released. */
  private val memoryViewCaches =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** sink name -> (dead-lettered batches, dead-lettered rows): daemon
    * batches whose writes exhausted their retry budget. */
  private val deadLettered =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  def deadLetterCounts: Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    deadLettered.asScala.toMap
  }

  private def recordDeadLetter(sink: String, batchId: Long, batch: DataFrame,
                               err: Throwable): Unit = {
    // `batch` is the retry loop's pinned localCheckpoint (ReliableSink
    // pins on first failure), so this count reads materialized blocks —
    // the failed batch's pipeline is not re-evaluated to tally rows
    val rows = scala.util.Try(batch.count()).getOrElse(-1L)
    deadLettered.merge(sink, (1L, rows),
      (a, b) => (a._1 + b._1, a._2 + b._2))
    System.err.println(
      s"[graft] sink $sink dead-lettered batch $batchId ($rows rows): $err")
  }
}
