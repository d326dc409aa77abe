package graft.pipeline

import java.io.{BufferedReader, InputStreamReader}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Runs the shipped network-transport examples end-to-end over LIVE
  * sockets — the reference's fanout / replicator / throttled relay
  * shapes (examples/udp2fanout-tcp-config.yml,
  * udp2tcp_replicator-config.yml, unix2tcp-throttled-config.yml):
  * datagrams in, a routing stage, CRLF-framed records out over real
  * TCP connections. Fixed example ports are rewritten to ephemeral
  * ones so the suite never collides with a busy port. */
class NetExamplesSpec extends SparkSpec {

  /** Live loopback TCP server collecting newline-framed lines. */
  private final class LineServer {
    private val server =
      new ServerSocket(0, 50, java.net.InetAddress.getLoopbackAddress)
    private val received = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    private val acceptor = new Thread(() => {
      try {
        while (!server.isClosed) {
          val s = server.accept()
          val worker = new Thread(() => {
            val r = new BufferedReader(
              new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
            var line = r.readLine()
            while (line != null) { received.add(line); line = r.readLine() }
            s.close()
          })
          worker.setDaemon(true)
          worker.start()
        }
      } catch { case _: Exception => /* closing */ }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    def port: Int = server.getLocalPort
    def size: Int = received.size
    def lines: Seq[String] = {
      import scala.jdk.CollectionConverters._
      received.asScala.toSeq
    }
    def close(): Unit = server.close()
  }

  private def awaitAtLeast(want: Long, timeoutMs: Long = 10000)(size: => Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (size < want && System.currentTimeMillis() < deadline) Thread.sleep(50)
  }

  private def sendUdp(port: Int, payload: String): Unit = {
    val sock = new java.net.DatagramSocket()
    val bytes = payload.getBytes(StandardCharsets.UTF_8)
    sock.send(new java.net.DatagramPacket(bytes, bytes.length,
      java.net.InetAddress.getLoopbackAddress, port))
    sock.close()
  }

  /** Load an example, swap its fixed tcp sink ports for the live
    * servers' ephemeral ones and its receiver bind for `recvBind`. */
  private def rewrite(name: String, recvFrom: String, recvTo: String,
                      sinks: Seq[(String, LineServer)]): String =
    sinks.foldLeft(
      Files.readString(Paths.get(s"examples/$name")).replace(recvFrom, recvTo)) {
      case (y, (p, s)) => y.replace(s"tcp://127.0.0.1:$p", s"tcp://127.0.0.1:${s.port}")
    }

  test("udp2fanout_tcp example splits datagrams across three live tcp sinks") {
    val servers = Seq.fill(3)(new LineServer)
    try {
      val yaml = rewrite("udp2fanout_tcp.yml", "udp://:3101", "udp://:0",
        Seq("7222", "7223", "7224").zip(servers))
      graft.sources.PushReceiver.clear("udp_rcv")
      val compiler = new PipelineCompiler(spark, PipelineConfig.parse(yaml))
      val port = compiler.startReceivers()("udp_rcv")
      try {
        val lines = (1 to 9).map(i => s"msg-$i")
        sendUdp(port, lines.mkString("", "\n", "\n"))
        // datagram delivery is async: wait for the channel, then snapshot
        awaitAtLeast(9)(graft.sources.PushReceiver.size("udp_rcv"))
        val counts = compiler.runBatch()
        assert(counts.values.sum == 9L, counts.toString)
        awaitAtLeast(9)(servers.map(_.size).sum)
        // fanout: every record delivered exactly once, split across peers
        val all = servers.flatMap(_.lines)
        assert(all.size == 9 && all.toSet == lines.toSet, all.toString)
      } finally compiler.close()
    } finally servers.foreach(_.close())
  }

  test("udp2tcp_replicator example places 2 content-hash copies on 3 live sinks") {
    val servers = Seq.fill(3)(new LineServer)
    try {
      val yaml = rewrite("udp2tcp_replicator.yml", "udp://:3101", "udp://:0",
        Seq("7222", "7223", "7224").zip(servers))
      graft.sources.PushReceiver.clear("udp_rcv")
      val compiler = new PipelineCompiler(spark, PipelineConfig.parse(yaml))
      val port = compiler.startReceivers()("udp_rcv")
      try {
        val lines = (1 to 6).map(i => s"payload-$i")
        sendUdp(port, lines.mkString("", "\n", "\n"))
        awaitAtLeast(6)(graft.sources.PushReceiver.size("udp_rcv"))
        val counts = compiler.runBatch()
        // ncopy n=2 over 3 peers: exactly two copies of every message
        assert(counts.values.sum == 12L, counts.toString)
        awaitAtLeast(12)(servers.map(_.size).sum)
        lines.foreach { l =>
          val on = servers.filter(_.lines.contains(l))
          assert(on.size == 2, s"$l must land on exactly 2 distinct peers")
          on.foreach(s => assert(s.lines.count(_ == l) == 1,
            s"$l must appear once per chosen peer"))
        }
      } finally compiler.close()
    } finally servers.foreach(_.close())
  }

  test("unix2tcp_throttled example admits quota per body and relays over tcp") {
    val server = new LineServer
    val sock = Files.createTempDirectory("graft-ex-unix-").resolve("flowd.sock")
    try {
      val yaml = rewrite("unix2tcp_throttled.yml",
        "unix:///tmp/graft-flowd.sock", s"unix://$sock",
        Seq("7222" -> server))
      graft.sources.PushReceiver.clear("unix_rcv")
      val compiler = new PipelineCompiler(spark, PipelineConfig.parse(yaml))
      compiler.startReceivers()
      try {
        val ch = java.nio.channels.SocketChannel.open(
          java.net.StandardProtocolFamily.UNIX)
        ch.connect(java.net.UnixDomainSocketAddress.of(sock))
        val payload = (Seq.fill(5)("dup") ++ Seq("solo-1", "solo-2"))
          .mkString("", "\n", "\n")
        ch.write(java.nio.ByteBuffer.wrap(
          payload.getBytes(StandardCharsets.UTF_8)))
        ch.close()
        awaitAtLeast(7)(graft.sources.PushReceiver.size("unix_rcv"))
        val counts = compiler.runBatch()
        // quota=3 per body per window: 3 of the 5 dups + both solos
        assert(counts("tcp_sink") == 5L, counts.toString)
        awaitAtLeast(5)(server.size)
        assert(server.lines.count(_ == "dup") == 3, server.lines.toString)
        assert(server.lines.count(_.startsWith("solo-")) == 2, server.lines.toString)
      } finally compiler.close()
    } finally server.close()
  }
}
