package graft

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal in-process RESP server for sink tests: accepts connections,
  * parses `*3 SET k v` command arrays, records them, replies `+OK`
  * (or `-ERR` when the key is "boom").
  */
class MockRedis extends AutoCloseable {
  val server = new ServerSocket(0)
  val port: Int = server.getLocalPort
  val store = new java.util.concurrent.ConcurrentHashMap[String, String]()
  @volatile private var running = true
  private val thread = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        new Thread(() => {
          val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
          val out: OutputStream = sock.getOutputStream
          try {
            var line = in.readLine()
            while (line != null) {
              assert(line == "*3", s"expected *3 array, got $line")
              def bulk(): String = { in.readLine(); in.readLine() } // $n then payload
              val cmd = bulk(); val k = bulk(); val v = bulk()
              assert(cmd == "SET")
              if (k == "boom") out.write("-ERR refused\r\n".getBytes(UTF_8))
              else { store.put(k, v); out.write("+OK\r\n".getBytes(UTF_8)) }
              out.flush()
              line = in.readLine()
            }
          } catch { case _: Throwable => () } finally sock.close()
        }).start()
      } catch { case _: Throwable => () }
    }
  })
  thread.setDaemon(true); thread.start()
  def snapshot: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    store.asScala.toMap
  }
  def close(): Unit = { running = false; server.close() }
}
