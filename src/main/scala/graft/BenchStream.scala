package graft

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.pipeline.{PipelineCompiler, PipelineConfig}

/** Ingest-path throughput bench: pushes N records over LIVE sockets into
  * a YAML `bind://` pipeline (the reference's relay shape,
  * receiver_tcp.go:105-136) and measures end-to-end rows/s — first byte
  * written by the sender to last row committed by the sink query — plus
  * per-micro-batch latency from the progress stream. Complements
  * [[Bench]] (the batch/relational surface): this is the number a relay
  * user asks first.
  *
  * Transports: tcp (4 pipelined connections, silent mode — no per-record
  * ack RTT; channel capacity pre-sized so nothing is ever throttled) and
  * http (4 keep-alive POST loops, one record per request — request
  * overhead is the point of the comparison).
  *
  * A [[StreamingQueryListener]] accumulates rows and trigger durations —
  * `recentProgress` is ring-bounded and would silently drop batches on
  * long runs.
  *
  * {{{ runMain graft.BenchStream [nTcp] [nHttp] }}}
  * prints ONE JSON line: {"metric":"stream_ingest","tcp":{...},"http":{...}}
  */
object BenchStream {

  private final case class Leg(rows: Long, sec: Double, batches: Int,
                               meanBatchMs: Double, maxBatchMs: Long) {
    def json: String =
      f"""{"rows":$rows,"sec":$sec%.3f,"rows_per_sec":${rows / sec}%.0f,""" +
        f""""batches":$batches,"mean_batch_ms":$meanBatchMs%.1f,"max_batch_ms":$maxBatchMs}"""
  }

  /** Run one transport leg: YAML pipeline up, senders in, wait for all N
    * rows to land, tear down. `send(port, n)` blocks until the sender
    * side has written everything. */
  private def runLeg(spark: SparkSession, yaml: String, receiver: String,
                     sinkName: String, channel: String, n: Int)
                    (send: (Int, Int) => Unit): Leg = {
    graft.sources.PushReceiver.clear(channel)
    val compiler = new PipelineCompiler(spark, PipelineConfig.parse(yaml))
    val port = compiler.startReceivers()(receiver)
    val rows = new AtomicLong
    val batches = new AtomicInteger
    val totalMs = new AtomicLong
    val maxMs = new AtomicLong
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name == sinkName && e.progress.numInputRows > 0) {
          rows.addAndGet(e.progress.numInputRows)
          batches.incrementAndGet()
          val d = e.progress.durationMs.getOrDefault("triggerExecution", 0L)
          totalMs.addAndGet(d)
          maxMs.updateAndGet(m => math.max(m, d))
        }
    }
    spark.streams.addListener(listener)
    val queries = compiler.startStreaming(Map.empty,
      Trigger.ProcessingTime("100 milliseconds"))
    try {
      val t0 = System.nanoTime()
      send(port, n)
      val deadline = System.currentTimeMillis() + 180000
      while (rows.get() < n && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      val sec = (System.nanoTime() - t0) / 1e9
      require(rows.get() == n,
        s"$receiver delivered ${rows.get()} of $n rows within the deadline")
      Leg(rows.get(), sec, batches.get(),
        totalMs.get().toDouble / math.max(batches.get(), 1), maxMs.get())
    } finally {
      queries.values.foreach(_.stop())
      queries.values.foreach(_.awaitTermination(30000))
      compiler.close()
      spark.streams.removeListener(listener)
      graft.sources.PushReceiver.clear(channel)
    }
  }

  /** Runs each body on its own thread, joins all, and rethrows the
    * first failure — a dead sender must surface as ITS error, not as a
    * misleading rows-missing timeout three minutes later. */
  private def joinSenders(threads: Int)(body: Int => Unit): Unit = {
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val ts = (0 until threads).map { t =>
      val th = new Thread(() =>
        try body(t) catch { case e: Throwable => failure.compareAndSet(null, e) })
      th.start(); th
    }
    ts.foreach(_.join())
    Option(failure.get()).foreach(e => throw e)
  }

  private def sendTcp(port: Int, n: Int, threads: Int = 4): Unit = {
    val per = n / threads
    joinSenders(threads) { t =>
      val cnt = per + (if (t == 0) n - per * threads else 0)
      val sock = new java.net.Socket("127.0.0.1", port)
      try {
        val out = new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16)
        var i = 0
        while (i < cnt) {
          out.write(s"evt-$t-$i\n".getBytes(StandardCharsets.UTF_8))
          i += 1
        }
        out.flush()
      } finally sock.close()
    }
  }

  private def sendHttp(port: Int, n: Int, threads: Int = 4): Unit = {
    val per = n / threads
    joinSenders(threads) { t =>
      val cnt = per + (if (t == 0) n - per * threads else 0)
      var i = 0
      while (i < cnt) {
        val conn = new java.net.URL(s"http://127.0.0.1:$port/v1alpha1")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        val body = s"evt-$t-$i".getBytes(StandardCharsets.UTF_8)
        // one packet for headers+body: the buffered default writes
        // them separately and eats a delayed-ACK stall per request
        conn.setFixedLengthStreamingMode(body.length)
        conn.getOutputStream.write(body)
        require(conn.getResponseCode == 200, s"POST $t-$i: ${conn.getResponseCode}")
        conn.getInputStream.readAllBytes()
        conn.getInputStream.close()
        i += 1
      }
    }
  }

  private def tcpYaml(channel: String, capacity: Int): String =
    s"""actors:
       |  rcv: {module: core.receiver, params: {bind: "tcp://:0", channel: $channel, capacity: $capacity, silent: true}}
       |  ingest: {module: core.sink, params: {format: noop}}
       |pipeline:
       |  rcv: {connect: [ingest]}
       |""".stripMargin

  private def httpYaml(channel: String, capacity: Int): String =
    s"""actors:
       |  rcv: {module: core.receiver, params: {bind: "http://:0/v1alpha1", channel: $channel, capacity: $capacity}}
       |  ingest: {module: core.sink, params: {format: noop}}
       |pipeline:
       |  rcv: {connect: [ingest]}
       |""".stripMargin

  /** The `"tcp":{...},"http":{...}` fragment [[Bench]] embeds as its
    * `stream` section (and [[main]] prints standalone). A failed leg
    * degrades to an `err` object — a socket hiccup here must never
    * take down the whole bench report. */
  def section(spark: SparkSession, nTcp: Int, nHttp: Int): String = {
    def leg(run: => Leg): String =
      try run.json catch {
        case e: Exception => // e.toString: getMessage may be null
          s"""{"err":"${e.toString.replaceAll("[\"\\\\\\s]+", " ").take(200)}"}"""
      }
    val tcp = leg(runLeg(spark, tcpYaml("bench-stream-tcp", nTcp + 65536),
      "rcv", "ingest", "bench-stream-tcp", nTcp)(sendTcp(_, _)))
    val http = leg(runLeg(spark, httpYaml("bench-stream-http", nHttp + 65536),
      "rcv", "ingest", "bench-stream-http", nHttp)(sendHttp(_, _)))
    s""""tcp":$tcp,"http":$http"""
  }

  def main(args: Array[String]): Unit = {
    val nTcp = if (args.length > 0) args(0).toInt else 200000
    val nHttp = if (args.length > 1) args(1).toInt else 5000
    val spark = GraftSession.get()
    println(s"""{"metric":"stream_ingest",${section(spark, nTcp, nHttp)}}""")
    spark.stop()
  }
}
