package graft

import graft.streaming.{StateBackends, TweetStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The production state backend: graft's stateful streaming operators
  * must run UNCHANGED on the RocksDB state store (the beyond-heap
  * backend a 100 TB firehose needs) — same results, same bounded-state
  * lifecycle as on the default heap-backed provider. The provider flip
  * happens on a child session so the rest of the suite keeps the
  * default backend.
  */
class RocksDbStateSpec extends SparkSuite {

  private def tweet(id: Long, text: String, tags: Seq[String]): String = {
    val hs = tags.map(t => s"""{"text":"$t"}""").mkString(",")
    s"""{"id":$id,"text":"$text","entities":{"hashtags":[$hs]}}"""
  }
  private def at(sec: Long) = new Timestamp(sec * 1000L)

  test("stream-stream tag filter on RocksDB: same matches, bounded state, provider engaged") {
    val rocks = spark.newSession()
    StateBackends.useRocksDb(rocks)
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val tweets = MemoryStream[Raw]
    val control = MemoryStream[(String, Timestamp, Timestamp)]
    val q = TweetStream.streamStreamTagFilter(
      tweets.toDF(), control.toDF().toDF("tag", "valid_from", "valid_to"),
      tsCol = col("ts"), maxValidity = "600 seconds")
      .writeStream.format("memory").queryName("rocks_ssj").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-rocks-ssj").toString)
      .start()
    try {
      assertStateStabilizes(q, 3) { i =>
        val b = (i + 1) * 100000L
        control.addData((0 until 5).map(k =>
          (s"r${i}_$k", at(b), at(b + 300))): _*)
        tweets.addData(
          Raw(tweet(i * 10 + 1L, "hit", Seq(s"r${i}_0")), at(b + 50)),
          Raw(tweet(i * 10 + 2L, "miss", Seq("cold")), at(b + 60)))
      }
      // the provider actually engaged: RocksDB-specific custom metrics
      // appear in the state operator progress (absent on the default
      // heap provider)
      import scala.jdk.CollectionConverters._
      val metricKeys = q.recentProgress.reverseIterator
        .flatMap(_.stateOperators).flatMap(_.customMetrics.keySet.asScala)
        .toSet
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"no RocksDB metrics — provider not engaged; got: $metricKeys")
      val matched = rocks.table("rocks_ssj").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet
      assert(matched == (0 until 3).map(i => (i * 10 + 1L, s"r${i}_0")).toSet,
        s"got: $matched")
    } finally q.stop()
  }

  test("sliding window top-N pipeline on RocksDB matches the heap-provider result") {
    val rocks = spark.newSession()
    StateBackends.useRocksDb(rocks)
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val source = MemoryStream[Raw]
    val sink = new TweetStream.InMemoryKvStore
    val q = TweetStream.startTopN(
      source.toDF(), sink, n = 10,
      watermarkDelay = "1 second", tsCol = col("ts"),
      checkpoint =
        java.nio.file.Files.createTempDirectory("ckpt-rocks-topn").toString)
    try {
      source.addData(
        Raw(tweet(1, "a", Seq("Spark")), at(10)),
        Raw(tweet(2, "b", Seq("spark")), at(15)),
        Raw(tweet(3, "c", Seq("SPARK", "flink")), at(20)))
      q.processAllAvailable()
      source.addData(Raw(tweet(9, "late", Seq("late")), at(10000)))
      q.processAllAvailable()
      // identical to TweetStreamSpec's heap-provider expectation
      assert(sink.snapshot == Map(
        "Top10-1" -> "spark, 3",
        "Top10-2" -> "flink, 1"), s"got: ${sink.snapshot}")
    } finally { q.stop(); sink.dispose() }
  }
}
