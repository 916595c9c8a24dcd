package graft.streaming

import graft.streaming.TweetStream.KvSink
import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** A real Redis-protocol implementation of [[TweetStream.KvSink]] — the
  * reference's sink side (its flink-redis connector issued `SET
  * Top10-<rank> = "<tag>, <count>"`, TopNHashtags.java:149-171,
  * pom.xml:95-109) with zero third-party dependencies: RESP (the
  * publicly documented REdis Serialization Protocol) is simple enough
  * to speak over a raw socket — an inline command array
  * `*3\r\n$3\r\nSET\r\n$<k>\r\n<key>\r\n$<v>\r\n<value>\r\n` answered
  * by `+OK`.
  *
  * Serialization/topology: the class is Serializable and holds NO open
  * socket across the wire — each deserialized copy (one per executor
  * task in `foreachPartition`, exactly how [[TweetStream
  * .startDynamicFilter]] uses a KvSink) lazily opens its own
  * connection on first put and reuses it for the rest of the task,
  * the same connection-per-worker shape as a Jedis pool.
  */
class RedisKvSink(host: String, port: Int) extends KvSink {

  @transient private var socket: Socket = _
  @transient private var out: BufferedOutputStream = _
  @transient private var in: BufferedInputStream = _

  private def ensureConnected(): Unit = {
    if (socket == null || socket.isClosed) {
      socket = new Socket(host, port)
      out = new BufferedOutputStream(socket.getOutputStream)
      in = new BufferedInputStream(socket.getInputStream)
    }
  }

  private def bulk(s: Array[Byte]): Array[Byte] = {
    val header = s"$$${s.length}\r\n".getBytes(UTF_8)
    header ++ s ++ "\r\n".getBytes(UTF_8)
  }

  /** Issue `SET key value`, blocking for the single-line reply.
    * Throws on an error reply (`-ERR …`) — sink failures must surface,
    * not vanish. ANY failure (IOException, error reply, partial write)
    * also drops the connection: the stream may be desynced mid-frame,
    * and reusing it would poison every subsequent put on a long-lived
    * handle — the next put reconnects cleanly instead. */
  def put(key: String, value: String): Unit = synchronized {
    ensureConnected()
    try {
      out.write("*3\r\n".getBytes(UTF_8))
      out.write(bulk("SET".getBytes(UTF_8)))
      out.write(bulk(key.getBytes(UTF_8)))
      out.write(bulk(value.getBytes(UTF_8)))
      out.flush()
      val reply = readLine()
      if (reply.isEmpty || reply.charAt(0) != '+')
        throw new java.io.IOException(s"redis SET failed: $reply")
    } catch {
      case e: Throwable => teardown(); throw e
    }
  }

  private def readLine(): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != -1 && c != '\r') { sb.append(c.toChar); c = in.read() }
    if (c == '\r') in.read() // consume \n
    sb.toString
  }

  private def teardown(): Unit = {
    if (socket != null) {
      try socket.close() catch { case _: java.io.IOException => () }
      socket = null; out = null; in = null
    }
  }

  override def close(): Unit = synchronized { teardown() }
}
