package graft

import graft.streaming.RedisKvSink
import org.scalatest.funsuite.AnyFunSuite
import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8

/** RESP wire-protocol tests against an in-process mock Redis server:
  * correct framing of SET, reply handling, error surfacing, and
  * serializability (the executor-side contract).
  */
class RedisKvSinkSpec extends AnyFunSuite {

  test("SET commands frame correctly and land in the store") {
    val mock = new MockRedis
    try {
      val sink = new RedisKvSink("127.0.0.1", mock.port)
      sink.put("Top10-1", "spark, 3")
      sink.put("Top10-2", "flink, 1")
      sink.put("Top10-1", "spark, 5") // overwrite
      sink.close()
      assert(mock.snapshot == Map(
        "Top10-1" -> "spark, 5", "Top10-2" -> "flink, 1"))
    } finally mock.close()
  }

  test("values with CR/LF and unicode survive bulk-string framing") {
    val mock = new MockRedis
    try {
      val sink = new RedisKvSink("127.0.0.1", mock.port)
      // NOTE: the mock parses line-wise so only test unicode here; the
      // length-prefixed framing itself is what the sink writes
      sink.put("k", "héllo wörld ✓")
      sink.close()
      assert(mock.store.get("k") == "héllo wörld ✓")
    } finally mock.close()
  }

  test("error replies surface as exceptions, not silent drops") {
    val mock = new MockRedis
    try {
      val sink = new RedisKvSink("127.0.0.1", mock.port)
      intercept[java.io.IOException] { sink.put("boom", "x") }
      sink.close()
    } finally mock.close()
  }

  test("a failed put drops the connection; the next put reconnects cleanly") {
    val mock = new MockRedis
    try {
      val sink = new RedisKvSink("127.0.0.1", mock.port)
      sink.put("ok-1", "a")
      // failure mid-stream must NOT poison the long-lived handle: the
      // possibly-desynced connection is torn down and the next put opens
      // a fresh one (the driver-side startTopN sink lives for the whole
      // stream)
      intercept[java.io.IOException] { sink.put("boom", "x") }
      sink.put("ok-2", "b")
      sink.close()
      assert(mock.store.get("ok-1") == "a" && mock.store.get("ok-2") == "b")
      assert(!mock.snapshot.contains("boom"))
    } finally mock.close()
  }

  test("sink serializes and a deserialized copy reconnects on its own") {
    val mock = new MockRedis
    try {
      val sink = new RedisKvSink("127.0.0.1", mock.port)
      sink.put("before", "1")
      val bytes = {
        val bo = new java.io.ByteArrayOutputStream()
        val oo = new java.io.ObjectOutputStream(bo)
        oo.writeObject(sink); oo.close(); bo.toByteArray
      }
      val copy = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bytes)).readObject()
        .asInstanceOf[RedisKvSink]
      copy.put("after", "2") // fresh lazy connection in the "task" copy
      sink.close(); copy.close()
      assert(mock.store.get("before") == "1" && mock.store.get("after") == "2")
    } finally mock.close()
  }
}
