package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress, ServerSocket, StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.ServerSocketChannel
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean

import com.sun.net.httpserver.HttpServer

/** Network listener heads for the push receiver — the transports of the
  * reference's receiver family, each a thin adapter that frames incoming
  * bytes into messages and pushes them onto a PushReceiver channel, which
  * the DSv2 source then streams into the engine:
  *
  *  - TCP (receiver_tcp.go:59-96): newline/CRLF-framed records, replies
  *    "OK" per record unless `silent` (:70-76; full per-status replies
  *    collapse to accepted/not at the push edge — delivery statuses are
  *    batch-accounted downstream per SURVEY §3.2).
  *  - UDP (receiver_udp.go:26-113): one datagram = one message (newline
  *    split), fire-and-forget.
  *  - Unix domain socket (receiver_unix.go:27-126): like TCP without
  *    replies; stale socket files unlinked on bind (:49-62).
  *  - HTTP (receiver_http.go:45-158): POST body = message body, URL query
  *    params = meta; replies follow the reference status map
  *    (receiver_http.go:24-33) at the granularity the push edge can
  *    observe — 200 "OK" accepted, 400 "Invalid message" on an empty
  *    body, 429 "Message throttled" when the channel is at capacity
  *    (the remaining statuses are delivery-time outcomes accounted
  *    downstream per SURVEY §3.2).
  *
  * All listeners are daemon threads bound to loopback; `Handle.close()`
  * stops them. Scale note: listeners are edge processes feeding the
  * channel; engine parallelism comes from the micro-batch DAG, exactly
  * as in the reference where acceptor threads hand off to actor queues.
  */
object NetReceivers {

  // TCP_NODELAY on the JDK http server's response sockets: headers and
  // body go out as separate small writes, and with Nagle on every
  // reply stalls one delayed-ACK round (~40ms). ServerConfig reads the
  // property when the JVM's FIRST HttpServer is created — set it in
  // every object that creates one (AdminServer does the same).
  System.setProperty("sun.net.httpserver.nodelay", "true")

  final case class Handle(port: Int, close: () => Unit)

  def startTcp(channel: String, port: Int = 0, silent: Boolean = false): Handle = {
    val server = new ServerSocket(port, 50, java.net.InetAddress.getLoopbackAddress)
    val running = new AtomicBoolean(true)
    val acceptor = new Thread(() => {
      while (running.get()) {
        try {
          val sock = server.accept()
          val worker = new Thread(() => {
            val in = new BufferedReader(
              new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
            val out = sock.getOutputStream
            var line = in.readLine()
            while (line != null) {
              val off = PushReceiver.push(channel, line.getBytes(StandardCharsets.UTF_8))
              if (!silent) {
                // per-record status reply (receiver_tcp.go:25-43): accepted
                // -> OK; channel at capacity -> THROTTLED
                val reply = if (off >= 0) "OK\r\n" else "THROTTLED\r\n"
                out.write(reply.getBytes(StandardCharsets.UTF_8)); out.flush()
              }
              line = in.readLine()
            }
            sock.close()
          })
          worker.setDaemon(true)
          worker.start()
        } catch { case _: Exception if !running.get() => /* closing */ }
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    Handle(server.getLocalPort, () => { running.set(false); server.close() })
  }

  def startUdp(channel: String, port: Int = 0): Handle = {
    val socket = new DatagramSocket(
      new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, port))
    val running = new AtomicBoolean(true)
    val t = new Thread(() => {
      val buf = new Array[Byte](65536)
      while (running.get()) {
        try {
          val pkt = new DatagramPacket(buf, buf.length)
          socket.receive(pkt)
          new String(pkt.getData, pkt.getOffset, pkt.getLength, StandardCharsets.UTF_8)
            .split("\n").iterator.map(_.stripSuffix("\r")).filter(_.nonEmpty)
            .foreach(l => PushReceiver.push(channel, l.getBytes(StandardCharsets.UTF_8)))
        } catch { case _: Exception if !running.get() => }
      }
    })
    t.setDaemon(true)
    t.start()
    Handle(socket.getLocalPort, () => { running.set(false); socket.close() })
  }

  def startUnix(channel: String, path: java.nio.file.Path): Handle = {
    java.nio.file.Files.deleteIfExists(path) // rebind stale socket file
    val server = ServerSocketChannel.open(StandardProtocolFamily.UNIX)
    server.bind(UnixDomainSocketAddress.of(path))
    val running = new AtomicBoolean(true)
    val t = new Thread(() => {
      while (running.get()) {
        try {
          val ch = server.accept()
          val worker = new Thread(() => {
            val sb = new StringBuilder
            val bb = ByteBuffer.allocate(8192)
            var n = ch.read(bb)
            while (n >= 0) {
              bb.flip()
              sb.append(StandardCharsets.UTF_8.decode(bb))
              bb.clear()
              var idx = sb.indexOf("\n")
              while (idx >= 0) {
                val line = sb.substring(0, idx).stripSuffix("\r")
                if (line.nonEmpty)
                  PushReceiver.push(channel, line.getBytes(StandardCharsets.UTF_8))
                sb.delete(0, idx + 1)
                idx = sb.indexOf("\n")
              }
              n = ch.read(bb)
            }
            ch.close()
          })
          worker.setDaemon(true)
          worker.start()
        } catch { case _: Exception if !running.get() => }
      }
    })
    t.setDaemon(true)
    t.start()
    Handle(0, () => {
      running.set(false); server.close(); java.nio.file.Files.deleteIfExists(path)
    })
  }

  def startHttp(channel: String, port: Int = 0,
                endpoint: String = "/v1alpha1"): Handle = {
    val server = HttpServer.create(
      new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, port), 0)
    server.createContext(endpoint, exchange => {
      if (exchange.getRequestMethod == "POST") {
        val body = exchange.getRequestBody.readAllBytes()
        val meta = Option(exchange.getRequestURI.getRawQuery).map { q =>
          q.split("&").filter(_.nonEmpty).map { kv =>
            val Array(k, v) = (kv.split("=", 2) ++ Array("")).take(2)
            java.net.URLDecoder.decode(k, "UTF-8") ->
              java.net.URLDecoder.decode(v, "UTF-8")
          }.toMap
        }.getOrElse(Map.empty[String, String])
        // status-mapped reply (receiver_http.go:24-33): the push edge
        // can observe accepted / invalid / throttled; delivery statuses
        // are downstream concerns
        val (code, text) =
          if (body.isEmpty) (400, "Invalid message")
          else if (PushReceiver.push(channel, body, meta) >= 0) (200, "OK")
          else (429, "Message throttled")
        val resp = text.getBytes(StandardCharsets.UTF_8)
        exchange.sendResponseHeaders(code, resp.length)
        exchange.getResponseBody.write(resp)
      } else exchange.sendResponseHeaders(405, -1)
      exchange.close()
    })
    // concurrent request handling (receiver_http.go serves each
    // connection on its own goroutine via net/http; a null executor
    // here would serialize every client on the dispatcher thread)
    val pool = java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-http-receiver"); t.setDaemon(true); t
    })
    server.setExecutor(pool)
    server.start()
    Handle(server.getAddress.getPort, () => { server.stop(0); pool.shutdown() })
  }
}
