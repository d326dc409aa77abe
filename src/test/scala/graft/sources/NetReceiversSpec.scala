package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.{DatagramPacket, DatagramSocket, InetAddress, Socket}
import java.nio.charset.StandardCharsets

import graft.SparkSpec
import graft.streaming.{NetSinks, Streams}

class NetReceiversSpec extends SparkSpec {
  import spark.implicits._

  private val loop = InetAddress.getLoopbackAddress

  private def drain(ch: String): Set[String] = {
    val stream = spark.readStream
      .format(classOf[PushReceiverProvider].getName).option("channel", ch).load()
    Streams.runToMemory(spark, stream, s"net_${ch.replace('-', '_')}")
      .select($"body".cast("string")).as[String].collect().toSet
  }

  private def await(ch: String, n: Int): Unit = {
    val deadline = System.currentTimeMillis() + 10000
    while (PushReceiver.size(ch) < n && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
  }

  test("tcp listener frames CRLF records and acks each with OK") {
    val ch = "net-tcp"
    PushReceiver.clear(ch)
    val h = NetReceivers.startTcp(ch)
    try {
      val sock = new Socket(loop, h.port)
      val out = sock.getOutputStream
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream))
      out.write("first record\r\nsecond record\r\n".getBytes(StandardCharsets.UTF_8))
      out.flush()
      assert(in.readLine() == "OK" && in.readLine() == "OK")
      sock.close()
      await(ch, 2)
      assert(drain(ch) == Set("first record", "second record"))
    } finally h.close()
  }

  test("channel capacity rejects overflow; tcp replies THROTTLED") {
    val ch = "net-cap"
    PushReceiver.clear(ch)
    PushReceiver.configure(ch, 2)
    try {
      val h = NetReceivers.startTcp(ch)
      try {
        val sock = new Socket(loop, h.port)
        val out = sock.getOutputStream
        val in = new BufferedReader(new InputStreamReader(sock.getInputStream))
        out.write("a\r\nb\r\nc\r\n".getBytes(StandardCharsets.UTF_8))
        out.flush()
        assert(in.readLine() == "OK")
        assert(in.readLine() == "OK")
        assert(in.readLine() == "THROTTLED") // buffer at capacity (buffer.go:11 analog)
        sock.close()
        assert(PushReceiver.size(ch) == 2)
        assert(PushReceiver.push(ch, "direct".getBytes) == -1L)
      } finally h.close()
    } finally PushReceiver.configure(ch, PushReceiver.DefaultCapacity)
  }

  test("udp listener ingests datagrams fire-and-forget") {
    val ch = "net-udp"
    PushReceiver.clear(ch)
    val h = NetReceivers.startUdp(ch)
    try {
      val sock = new DatagramSocket()
      val payload = "dgram-payload\n".getBytes(StandardCharsets.UTF_8)
      sock.send(new DatagramPacket(payload, payload.length, loop, h.port))
      sock.close()
      await(ch, 1)
      assert(drain(ch) == Set("dgram-payload"))
    } finally h.close()
  }

  test("unix socket listener frames newline records; stale file rebinds") {
    val ch = "net-unix"
    PushReceiver.clear(ch)
    val path = java.nio.file.Files.createTempDirectory("graft-unix-").resolve("s.sock")
    java.nio.file.Files.createFile(path) // stale file must be unlinked
    val h = NetReceivers.startUnix(ch, path)
    try {
      val c = java.nio.channels.SocketChannel.open(java.net.StandardProtocolFamily.UNIX)
      c.connect(java.net.UnixDomainSocketAddress.of(path))
      val msg = java.nio.ByteBuffer.wrap("via unix\r\n".getBytes(StandardCharsets.UTF_8))
      while (msg.hasRemaining) c.write(msg)
      c.close()
      await(ch, 1)
      assert(drain(ch) == Set("via unix"))
    } finally h.close()
  }

  test("http listener maps body to message and query params to meta") {
    val ch = "net-http"
    PushReceiver.clear(ch)
    val h = NetReceivers.startHttp(ch)
    try {
      val url = java.net.URI.create(
        s"http://127.0.0.1:${h.port}/v1alpha1?sendto=sink%20a&k=v").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.getOutputStream.write("http body".getBytes(StandardCharsets.UTF_8))
      assert(conn.getResponseCode == 200)
      await(ch, 1)
      val msg = PushReceiver.snapshot(ch).head
      assert(new String(msg.body, StandardCharsets.UTF_8) == "http body")
      assert(msg.meta == Map("sendto" -> "sink a", "k" -> "v"))
      // non-POST is rejected
      val bad = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      bad.setRequestMethod("GET")
      assert(bad.getResponseCode == 405)
    } finally h.close()
  }

  test("http listener maps rejection statuses: 400 invalid, 429 throttled") {
    val ch = "net-http-status"
    PushReceiver.clear(ch)
    PushReceiver.configure(ch, 1)
    val h = NetReceivers.startHttp(ch)
    try {
      val url = java.net.URI.create(s"http://127.0.0.1:${h.port}/v1alpha1").toURL
      def post(body: String): Int = {
        val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
        conn.getResponseCode
      }
      // empty body -> 400 Invalid message (receiver_http.go:27)
      assert(post("") == 400)
      // capacity 1: first accepted, second throttled -> 429 (:33)
      assert(post("one") == 200)
      assert(post("two") == 429)
      assert(PushReceiver.size(ch) == 1) // the throttled message was NOT enqueued
    } finally {
      h.close()
      PushReceiver.configure(ch, PushReceiver.DefaultCapacity)
    }
  }

  test("tcp sink writer delivers CRLF-framed rows to a live server") {
    // loopback echo collector
    val server = new java.net.ServerSocket(0, 5, loop)
    val received = scala.collection.mutable.ArrayBuffer.empty[String]
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val in = new BufferedReader(new InputStreamReader(s.getInputStream))
        var line = in.readLine()
        while (line != null) { received.synchronized(received += line); line = in.readLine() }
      } catch { case _: Exception => }
    })
    t.setDaemon(true); t.start()
    try {
      val df = Seq("row-one", "row-two").toDF("body")
      // ForeachWriter is a streaming API: drive its lifecycle directly
      // against the collected batch (open/process/close per partition)
      val w = NetSinks.tcpWriter(loop.getHostAddress, server.getLocalPort)
      w.open(0, 0)
      df.collect().foreach(w.process)
      w.close(null)
      val deadline = System.currentTimeMillis() + 5000
      while (received.synchronized(received.size) < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(received.synchronized(received.toSet) == Set("row-one", "row-two"))
    } finally server.close()
  }
}
