package graft

import graft.streaming.TweetStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** State-BOUNDEDNESS guards for every stateful streaming query: each
  * test drives several event-time epochs through a running query and
  * asserts `stateOperators.numRowsTotal` stabilizes instead of growing
  * with the input — the property that separates "runs on a 100 TB
  * firehose" from "OOMs a state store eventually". The functional
  * semantics of these queries are pinned in TweetStreamSpec; this suite
  * pins only the state lifecycle, so a future operator change that
  * silently breaks watermark-based eviction fails here mechanically
  * (the round-6 stream-stream control-side leak would have).
  */
class StreamingStateSpec extends SparkSuite {

  private def tweet(id: Long, text: String, tags: Seq[String]): String = {
    val hs = tags.map(t => s"""{"text":"$t"}""").mkString(",")
    s"""{"id":$id,"text":"$text","entities":{"hashtags":[$hs]}}"""
  }
  private def at(sec: Long) = new Timestamp(sec * 1000L)
  /** Epoch base times far enough apart that every window/interval/dedup
    * key of epoch i-1 is expirable once epoch i's watermark lands. */
  private def base(i: Int): Long = (i + 1) * 100000L

  test("stream-stream tag filter: control-side join state is evicted, not kept forever") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tweets = MemoryStream[Raw]
    val control = MemoryStream[(String, Timestamp, Timestamp)]
    val q = TweetStream.streamStreamTagFilter(
      tweets.toDF(), control.toDF().toDF("tag", "valid_from", "valid_to"),
      tsCol = col("ts"), maxValidity = "600 seconds")
      .writeStream.format("memory").queryName("sss_join").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-sss-join").toString)
      .start()
    try {
      val epochs = 5
      val perEpochControl = 8
      assertStateStabilizes(q, epochs) { i =>
        val b = base(i)
        // fresh trending tags each epoch: state from a leak accumulates
        // across ALL epochs' control rows; eviction keeps ~one epoch's
        control.addData((0 until perEpochControl).map(k =>
          (s"tag${i}_$k", at(b), at(b + 300))): _*)
        tweets.addData(
          Raw(tweet(i * 10 + 1L, "hit", Seq(s"tag${i}_0")), at(b + 50)),
          Raw(tweet(i * 10 + 2L, "miss", Seq("nevertrending")), at(b + 60)))
      }
      // matches kept flowing the whole run — eviction must not have
      // dropped LIVE rows to get its small state
      val matched = spark.table("sss_join").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet
      assert(matched == (0 until epochs).map(i =>
        (i * 10 + 1L, s"tag${i}_0")).toSet, s"got: $matched")
    } finally q.stop()
  }

  test("stream-stream maxValidity caps over-long control intervals (documented trade)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tweets = MemoryStream[Raw]
    val control = MemoryStream[(String, Timestamp, Timestamp)]
    val q = TweetStream.streamStreamTagFilter(
      tweets.toDF(), control.toDF().toDF("tag", "valid_from", "valid_to"),
      tsCol = col("ts"), maxValidity = "100 seconds")
      .writeStream.format("memory").queryName("sss_cap").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-sss-cap").toString)
      .start()
    try {
      // the interval CLAIMS validity for 1000 s, far past the 100 s cap
      control.addData(("hot", at(1000), at(2000)))
      tweets.addData(
        Raw(tweet(1, "inside cap", Seq("hot")), at(1050)),
        Raw(tweet(2, "beyond cap, inside claimed interval", Seq("hot")), at(1500)),
        Raw(tweet(3, "watermark advancer", Seq("cold")), at(50000)))
      q.processAllAvailable()
      val got = spark.table("sss_cap").collect().map(_.getLong(0)).toSet
      // tweet 1 matches; tweet 2 is PAST valid_from + maxValidity, so
      // the cap drops it even though ts < valid_to — the documented
      // price of derivable control-side state eviction
      assert(got == Set(1L), s"got: $got")
    } finally q.stop()
  }

  test("sliding window counts: expired windows leave the state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Raw]
    val q = TweetStream.slidingTagCounts(
      TweetStream.explodeTags(
        TweetStream.parseTweets(source.toDF(), col("ts"))))
      .writeStream.format("memory").queryName("sss_slide").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-sss-slide").toString)
      .start()
    try {
      assertStateStabilizes(q, 5) { i =>
        val b = base(i)
        source.addData((0 until 10).map(k =>
          Raw(tweet(i * 100 + k, "t", Seq(s"e${i}_$k")), at(b + k))): _*)
      }
    } finally q.stop()
  }

  test("session windows: closed sessions leave the state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Raw]
    val q = TweetStream.sessionTagCounts(
      TweetStream.explodeTags(
        TweetStream.parseTweets(source.toDF(), col("ts"))))
      .writeStream.format("memory").queryName("sss_sess").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-sss-sess").toString)
      .start()
    try {
      assertStateStabilizes(q, 5) { i =>
        val b = base(i)
        source.addData((0 until 10).map(k =>
          Raw(tweet(i * 100 + k, "t", Seq(s"s${i}_$k")), at(b + k))): _*)
      }
    } finally q.stop()
  }

  test("streaming dedup: expired ids leave the state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Raw]
    val q = TweetStream.dedupedTweets(
      TweetStream.parseTweets(source.toDF(), col("ts")))
      .writeStream.format("memory").queryName("sss_dedup").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-sss-dedup").toString)
      .start()
    try {
      assertStateStabilizes(q, 5) { i =>
        val b = base(i)
        source.addData((0 until 10).map(k =>
          Raw(tweet(i * 100 + k, "t", Seq("a")), at(b + k))): _*)
      }
    } finally q.stop()
  }

  test("tagMilestones idleTtl: idle tags expire with the watermark; a revived tag restarts from scratch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Raw]
    // event-time TTL: deadline = watermark + 60 s, driven purely by the
    // event times below — deterministic, no wall-clock sleeps
    val tags = TweetStream.explodeTags(
      TweetStream.parseTweets(source.toDF(), col("ts")))
      .withWatermark("ts", "1 second")
    val q = TweetStream.tagMilestones(tags, idleTtl = Some("60 seconds"))
      .writeStream.format("memory").queryName("sss_ttl").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-sss-ttl").toString)
      .start()
    try {
      source.addData(
        Raw(tweet(1, "t", Seq("a")), at(100)),
        Raw(tweet(2, "t", Seq("a")), at(101)),
        Raw(tweet(3, "t", Seq("a")), at(102)))
      q.processAllAvailable() // a: total 3 -> milestones 1, 2
      assert(stateRowsTotal(q) == 1L, "one live tag expected")
      // watermark jumps to ~9999 s, far past a's deadline (~160 s):
      // this batch fires a's timeout and registers b
      source.addData(Raw(tweet(4, "t", Seq("b")), at(10000)))
      q.processAllAvailable()
      assert(stateRowsTotal(q) == 1L,
        "idle tag a should have been evicted, leaving only b")
      // watermark jumps again: b expires, a revives — and the
      // documented trade shows: the revived a restarts from (0, 1),
      // re-emitting milestone 1 ("first mentions since last live")
      // instead of resuming its all-time total
      source.addData(Raw(tweet(5, "t", Seq("a")), at(20000)))
      q.processAllAvailable()
      assert(stateRowsTotal(q) == 1L,
        "expired b should be gone; only the revived a remains")
      val rows = spark.table("sss_ttl").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      assert(rows == Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 1L)),
        s"got: $rows")
    } finally q.stop()
  }
}
