package graft

import graft.streaming.TweetStream
import graft.streaming.TweetStream.{InMemoryKvStore, TopNState}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming-semantics tests with MemoryStream fixtures: the tweet-JSON
  * parse, sliding-window top-N with watermark finalization, the KV sink,
  * and the dynamic top-N tweet filter — including the reference's
  * tweets-before-first-window-emit-nothing behavior
  * (/root/reference/src/main/java/TopNHashtags.java:313-320).
  */
/** Raw record: one JSON line + an injected deterministic event time
  * (production uses ingestion time like the reference). Top-level so
  * Spark can derive its encoder. */
case class Raw(json: String, ts: Timestamp)

class TweetStreamSpec extends SparkSuite {

  private def tweet(id: Long, text: String, tags: Seq[String]): String = {
    val hs = tags.map(t => s"""{"text":"$t"}""").mkString(",")
    s"""{"id":$id,"text":"$text","entities":{"hashtags":[$hs]}}"""
  }
  private def at(sec: Long) = new Timestamp(sec * 1000L)

  test("parseTweets drops malformed records and lowercases tags (batch)") {
    import spark.implicits._
    val rows = Seq(
      Raw(tweet(1, "hello #Spark", Seq("Spark", "BIG")), at(10)),
      Raw("{not json at all", at(11)),
      Raw("""{"text":"no id field"}""", at(12)),
      Raw(tweet(2, "plain", Seq.empty), at(13))
    ).toDF()
    val parsed = TweetStream.parseTweets(rows, col("ts")).collect()
    assert(parsed.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(parsed.head.getString(2) == "spark big")
    assert(parsed(1).getString(2) == "")
  }

  test("sliding top-N: watermark finalizes windows, KV store gets ranked entries, state updates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Raw]
    val sink = new InMemoryKvStore
    val state = new TopNState
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-topn").toString
    val query = TweetStream.startTopN(
      source.toDF(), sink, state, n = 10,
      windowSize = "300 seconds", windowSlide = "60 seconds",
      watermarkDelay = "1 second", tsCol = col("ts"), checkpoint = ckpt)
    try {
      // three #spark tweets and one #flink tweet, all in early windows
      source.addData(
        Raw(tweet(1, "a", Seq("Spark")), at(10)),
        Raw(tweet(2, "b", Seq("spark")), at(15)),
        Raw(tweet(3, "c", Seq("SPARK", "flink")), at(20)))
      query.processAllAvailable()
      // watermark has not passed any window end yet → nothing emitted
      assert(sink.snapshot.isEmpty, s"early emit: ${sink.snapshot}")
      assert(state.current.isEmpty)

      // advance event time far past the early windows
      source.addData(Raw(tweet(9, "late", Seq("late")), at(10000)))
      query.processAllAvailable()

      // every finalized early window ranks spark(3) > flink(1); the
      // last-write-wins store therefore holds exactly these two keys
      assert(sink.snapshot == Map(
        "Top10-1" -> "spark, 3",
        "Top10-2" -> "flink, 1"), s"got: ${sink.snapshot}")
      // the advancer's own windows are still open → "late" not ranked
      assert(!sink.snapshot.values.exists(_.startsWith("late")))
      // co-flatmap state now carries the latest finalized window's tags
      assert(state.current == Set("spark", "flink"))
    } finally query.stop()
  }

  test("dynamic filter: tweets match nothing before the first window finalizes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tagSource = MemoryStream[Raw]
    val tweetSource = MemoryStream[Raw]
    val sink = new InMemoryKvStore
    val matched = new InMemoryKvStore
    val state = new TopNState
    val q1 = TweetStream.startTopN(
      tagSource.toDF(), sink, state, n = 10,
      watermarkDelay = "1 second", tsCol = col("ts"),
      checkpoint = java.nio.file.Files.createTempDirectory("ckpt-t").toString)
    val q2 = TweetStream.startDynamicFilter(
      tweetSource.toDF(), state, matched, tsCol = col("ts"),
      checkpoint = java.nio.file.Files.createTempDirectory("ckpt-f").toString)
    try {
      // trending data not yet finalized → state empty → no matches
      tagSource.addData(
        Raw(tweet(1, "x", Seq("spark")), at(10)),
        Raw(tweet(2, "y", Seq("spark")), at(11)))
      q1.processAllAvailable()
      tweetSource.addData(Raw(tweet(100, "I love #spark", Seq("spark")), at(20)))
      q2.processAllAvailable()
      assert(matched.snapshot.isEmpty,
        s"matched before first window closed: ${matched.snapshot}")

      // finalize the early windows → state = {spark}
      tagSource.addData(Raw(tweet(3, "adv", Seq("adv")), at(10000)))
      q1.processAllAvailable()
      assert(state.current == Set("spark"))

      // now the same tweet content matches
      tweetSource.addData(
        Raw(tweet(101, "more #Spark love", Seq("Spark")), at(30)),
        Raw(tweet(102, "unrelated #other", Seq("other")), at(31)))
      q2.processAllAvailable()
      assert(matched.snapshot == Map("101" -> "more #Spark love"),
        s"got: ${matched.snapshot}")
    } finally { q1.stop(); q2.stop() }
  }

  test("restart: dynamic-filter state recovers from the KV sink, not a cold start") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tagSource = MemoryStream[Raw]
    val sink = new InMemoryKvStore
    val state = new TopNState
    val q1 = TweetStream.startTopN(
      tagSource.toDF(), sink, state, n = 10,
      watermarkDelay = "1 second", tsCol = col("ts"),
      checkpoint = java.nio.file.Files.createTempDirectory("ckpt-r").toString)
    try {
      // finalize a window so the sink holds a published ranking
      tagSource.addData(
        Raw(tweet(1, "a", Seq("spark")), at(10)),
        Raw(tweet(2, "b", Seq("spark")), at(11)),
        Raw(tweet(3, "c", Seq("flink")), at(12)))
      tagSource.addData(Raw(tweet(4, "adv", Seq("adv")), at(10000)))
      q1.processAllAvailable()
      assert(state.current == Set("spark", "flink"))
      assert(sink.snapshot.nonEmpty)
    } finally q1.stop()

    // --- simulated process restart: the in-memory state is GONE ---
    val recovered = new TopNState
    assert(recovered.current.isEmpty) // the documented unseeded cold start
    recovered.update(TweetStream.recoverTopNTags(sink.snapshot))
    // the sink's table holds exactly the last published ranking here
    // (every rank the latest window filled; no stale leftovers in this
    // fixture), so recovery reproduces the pre-restart set
    assert(recovered.current == Set("spark", "flink"),
      s"recovered ${recovered.current}")

    // and the restarted dynamic filter matches on its FIRST batch —
    // no blind window until the next finalization
    val tweetSource = MemoryStream[Raw]
    val matched = new InMemoryKvStore
    val q2 = TweetStream.startDynamicFilter(
      tweetSource.toDF(), recovered, matched, tsCol = col("ts"),
      checkpoint = java.nio.file.Files.createTempDirectory("ckpt-r2").toString)
    try {
      tweetSource.addData(
        Raw(tweet(100, "still about #spark", Seq("spark")), at(20)),
        Raw(tweet(101, "noise #other", Seq("other")), at(21)))
      q2.processAllAvailable()
      assert(matched.snapshot == Map("100" -> "still about #spark"),
        s"first post-restart batch: ${matched.snapshot}")
    } finally q2.stop()
  }

  test("recoverTopNTags: stale unfilled ranks widen recovery to a superset (documented)") {
    // the sink only overwrites, never deletes: rank 2 still holds an
    // older window's entry — recovery returns the UNION, the documented
    // briefly-more-permissive restart
    val snapshot = Map(
      "Top10-1" -> "fresh, 7",
      "Top10-2" -> "stale, 3")
    assert(TweetStream.recoverTopNTags(snapshot) == Set("fresh", "stale"))
    // values parse from the LAST ", " — a defensive guard, and ranks
    // beyond n are ignored
    assert(TweetStream.recoverTopNTags(Map("Top10-1" -> "weird, tag, 9")) ==
      Set("weird, tag"))
    assert(TweetStream.recoverTopNTags(Map("Top10-11" -> "out, 1")) == Set.empty)
  }

  test("multi-window finalization: latest window's ranking wins the KV store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Raw]
    val sink = new InMemoryKvStore
    val state = new TopNState
    val query = TweetStream.startTopN(
      source.toDF(), sink, state, n = 10,
      watermarkDelay = "1 second", tsCol = col("ts"),
      checkpoint = java.nio.file.Files.createTempDirectory("ckpt-mw").toString)
    try {
      // aaa dominates early windows, bbb dominates later ones; all the
      // windows finalize in ONE micro-batch when the advancer arrives
      source.addData(
        Raw(tweet(1, "a", Seq("aaa")), at(10)),
        Raw(tweet(2, "b", Seq("aaa")), at(15)),
        Raw(tweet(3, "c", Seq("bbb")), at(70)),
        Raw(tweet(4, "d", Seq("bbb")), at(75)),
        Raw(tweet(5, "e", Seq("bbb")), at(80)))
      query.processAllAvailable()
      source.addData(Raw(tweet(9, "adv", Seq("adv")), at(10000)))
      query.processAllAvailable()
      // latest finalized window is [60, 360) — bbb only; ascending-order
      // puts guarantee its ranking lands last. Top10-2 carries the last
      // window that ranked two tags ([0, 300): bbb > aaa).
      assert(sink.snapshot == Map(
        "Top10-1" -> "bbb, 3",
        "Top10-2" -> "aaa, 2"), s"got: ${sink.snapshot}")
      assert(state.current == Set("bbb"))
    } finally query.stop()
  }

  test("fileJsonSource: end-to-end top-N over a real readStream file source") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("tweets-in").toString
    def writeLines(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(dir, name),
        String.join("\n", lines: _*).getBytes("UTF-8"))
    val sink = new InMemoryKvStore
    val state = new TopNState
    // event time carried in-band: a top-level ts_sec field of the json
    // (parseTweets ignores unknown fields), extracted before the parse
    val tsCol = timestamp_seconds(
      get_json_object(col("json"), "$.ts_sec").cast("long"))
    def tweetT(id: Long, sec: Long, tags: Seq[String]): String = {
      val hs = tags.map(t => s"""{"text":"$t"}""").mkString(",")
      s"""{"id":$id,"ts_sec":$sec,"text":"t$id","entities":{"hashtags":[$hs]}}"""
    }
    writeLines("batch1.json", Seq(
      tweetT(1, 10, Seq("Spark")),
      tweetT(2, 15, Seq("spark")),
      tweetT(3, 20, Seq("flink"))))
    val query = TweetStream.startTopN(
      TweetStream.fileJsonSource(spark, dir), sink, state, n = 10,
      watermarkDelay = "1 second", tsCol = tsCol,
      checkpoint = Files.createTempDirectory("ckpt-fs").toString)
    try {
      query.processAllAvailable()
      assert(sink.snapshot.isEmpty) // no window finalized yet
      writeLines("batch2.json", Seq(tweetT(9, 10000, Seq("late"))))
      query.processAllAvailable()
      assert(sink.snapshot == Map(
        "Top10-1" -> "spark, 2",
        "Top10-2" -> "flink, 1"), s"got: ${sink.snapshot}")
      assert(state.current == Set("spark", "flink"))
    } finally query.stop()
  }

  test("sessionTagCounts: sessions merge within the gap and close after silence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Raw]
    val sessions = TweetStream.sessionTagCounts(
      TweetStream.explodeTags(
        TweetStream.parseTweets(source.toDF(), col("ts"))),
      gap = "300 seconds", watermarkDelay = "1 second")
    val query = sessions
      .select($"session_window.start".cast("long").as("ws"),
        $"session_window.end".cast("long").as("we"), $"tag", $"cnt")
      .writeStream.outputMode("append")
      .format("memory").queryName("session_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-sess").toString)
      .start()
    try {
      // spark at t=10 and t=200 chain one session (gap 300); flink at
      // t=10 only; a spark mention at t=1000 starts a SECOND session
      source.addData(
        Raw(tweet(1, "a", Seq("spark")), at(10)),
        Raw(tweet(2, "b", Seq("spark")), at(200)),
        Raw(tweet(3, "c", Seq("flink")), at(10)),
        Raw(tweet(4, "d", Seq("spark")), at(1000)))
      query.processAllAvailable()
      source.addData(Raw(tweet(9, "adv", Seq("adv")), at(10000)))
      query.processAllAvailable()
      val rows = spark.table("session_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
      assert(rows == Set(
        (10L, 500L, "spark", 2L),    // merged: 10..200, closes 200+300
        (10L, 310L, "flink", 1L),
        (1000L, 1300L, "spark", 1L)), s"got: $rows")
    } finally query.stop()
  }

  test("dedupedTweets drops redelivered ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Raw]
    val deduped = TweetStream.dedupedTweets(
      TweetStream.parseTweets(source.toDF(), col("ts")), "10 seconds")
    val query = deduped.writeStream
      .outputMode("append")
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-dd").toString)
      .start()
    try {
      source.addData(
        Raw(tweet(1, "first", Seq("a")), at(10)),
        Raw(tweet(1, "first again", Seq("a")), at(12)), // redelivery
        Raw(tweet(2, "second", Seq("b")), at(13)))
      query.processAllAvailable()
      // watermark advances only BETWEEN micro-batches: this batch still
      // sees id 1's live state (watermark 3 s < expiry 20 s) and drops it,
      // but it pushes the watermark to ~9990 s for the next batch
      source.addData(Raw(tweet(1, "still dup", Seq("a")), at(10000)))
      query.processAllAvailable()
      // now id 1's state is evicted -> a fresh id 1 passes again
      source.addData(Raw(tweet(1, "new epoch", Seq("a")), at(10001)))
      query.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 1L, 2L), s"got: $ids")
    } finally query.stop()
  }

  test("end-to-end reference pipeline: file source -> top-N -> Redis-protocol sink") {
    import java.nio.file.{Files, Paths}
    val mock = new MockRedis
    val dir = Files.createTempDirectory("tweets-redis").toString
    def tweetT(id: Long, sec: Long, tags: Seq[String]): String = {
      val hs = tags.map(t => s"""{"text":"$t"}""").mkString(",")
      s"""{"id":$id,"ts_sec":$sec,"text":"t$id","entities":{"hashtags":[$hs]}}"""
    }
    Files.write(Paths.get(dir, "b1.json"), String.join("\n",
      tweetT(1, 10, Seq("Spark")), tweetT(2, 15, Seq("spark")),
      tweetT(3, 20, Seq("flink"))).getBytes("UTF-8"))
    val sink = new graft.streaming.RedisKvSink("127.0.0.1", mock.port)
    val tsCol = timestamp_seconds(
      get_json_object(col("json"), "$.ts_sec").cast("long"))
    val query = TweetStream.startTopN(
      TweetStream.fileJsonSource(spark, dir), sink, new TopNState, n = 10,
      watermarkDelay = "1 second", tsCol = tsCol,
      checkpoint = Files.createTempDirectory("ckpt-rs").toString)
    try {
      query.processAllAvailable()
      Files.write(Paths.get(dir, "b2.json"),
        tweetT(9, 10000, Seq("late")).getBytes("UTF-8"))
      query.processAllAvailable()
      // the reference's observable end state: Redis holds SET Top10-k
      assert(mock.snapshot == Map(
        "Top10-1" -> "spark, 2",
        "Top10-2" -> "flink, 1"), s"got: ${mock.snapshot}")
    } finally { query.stop(); sink.close(); mock.close() }
  }

  test("streamStreamTagFilter: tweets join the top-N valid at their event time") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tweets = MemoryStream[Raw]
    val control = MemoryStream[(String, Timestamp, Timestamp)]
    val out = TweetStream.streamStreamTagFilter(
      tweets.toDF(), control.toDF().toDF("tag", "valid_from", "valid_to"),
      tsCol = col("ts"))
      .writeStream.format("memory").queryName("ssj").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-ssj").toString)
      .start()
    try {
      // "spark" trends during [100, 400); "flink" during [200, 500)
      control.addData(("spark", at(100), at(400)), ("flink", at(200), at(500)))
      tweets.addData(
        Raw(tweet(1, "in-window spark", Seq("Spark")), at(150)),
        Raw(tweet(2, "before flink trends", Seq("flink")), at(150)),
        Raw(tweet(3, "after spark expired", Seq("spark")), at(450)),
        Raw(tweet(4, "both tags in window", Seq("spark", "flink")), at(250)),
        Raw(tweet(5, "never trending", Seq("beam")), at(250)),
        Raw(tweet(6, "repeated tag", Seq("Spark", "spark", "SPARK")), at(260)))
      out.processAllAvailable()
      val rows = spark.table("ssj").collect()
        .map(r => (r.getLong(0), r.getString(2)))
      val got = rows.toSet
      // tweet 1: spark valid at 150 ✓; tweet 2: flink not yet valid ✗;
      // tweet 3: spark expired ✗; tweet 4: BOTH valid at 250 (two rows);
      // tweet 5: never trending ✗; tweet 6: repeated tag matches ONCE
      assert(got == Set((1L, "spark"), (4L, "spark"), (4L, "flink"),
        (6L, "spark")), s"got $got")
      assert(rows.length == got.size, s"duplicate emissions: ${rows.toSeq}")
    } finally out.stop()
  }

  test("tagMilestones: power-of-two alerts fire once, independent of batching") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def run(batches: Seq[Seq[String]], name: String): Seq[(String, Long)] = {
      val source = MemoryStream[String]
      val q = TweetStream.tagMilestones(source.toDF().select($"value".as("tag")))
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"ckpt-$name").toString)
        .start()
      try {
        batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      } finally q.stop()
    }

    // a×5, b×2 split across three batches...
    val split = run(Seq(Seq("a", "a", "a"), Seq("a", "b"), Seq("a", "b")), "ms1")
    // ...and the same multiset in one batch
    val oneShot = run(Seq(Seq("a", "a", "a", "a", "a", "b", "b")), "ms2")
    val expected = Seq(("a", 1L), ("a", 2L), ("a", 4L), ("b", 1L), ("b", 2L))
    assert(split == expected, s"split-batch run: $split")
    // batch boundaries must not change WHAT is emitted — only when
    assert(oneShot == expected, s"one-shot run: $oneShot")
  }

  test("tagTopicEnrich: stream-to-static join attaches topics, keeps unmatched") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Raw]
    val topics = Seq(("spark", "engines"), ("flink", "engines"),
      ("cooking", "lifestyle")).toDF("tag", "topic")
    val q = TweetStream.tagTopicEnrich(source.toDF(), topics, tsCol = col("ts"))
      .writeStream.format("memory").queryName("enrich").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-enrich").toString)
      .start()
    try {
      source.addData(
        Raw(tweet(1, "a", Seq("Spark", "beam")), at(10)),
        Raw(tweet(2, "b", Seq("cooking")), at(11)))
      q.processAllAvailable()
      val got = spark.table("enrich").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got == Set(
        (1L, "spark", "engines"), (1L, "beam", "other"),
        (2L, "cooking", "lifestyle")), s"got $got")
    } finally q.stop()
  }

  test("checkpoint recovery: window state survives a stop/restart cycle") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("tweets-recover").toString
    val ckpt = Files.createTempDirectory("ckpt-recover").toString
    def tweetT(id: Long, sec: Long, tags: Seq[String]): String = {
      val hs = tags.map(t => s"""{"text":"$t"}""").mkString(",")
      s"""{"id":$id,"ts_sec":$sec,"text":"t$id","entities":{"hashtags":[$hs]}}"""
    }
    val tsCol = timestamp_seconds(
      get_json_object(col("json"), "$.ts_sec").cast("long"))
    val sink = new InMemoryKvStore
    // run 1: counts arrive but NO window finalizes (watermark never
    // passes a window end) — they exist only in checkpointed state
    Files.write(Paths.get(dir, "b1.json"), String.join("\n",
      tweetT(1, 10, Seq("spark")), tweetT(2, 15, Seq("spark")),
      tweetT(3, 20, Seq("flink"))).getBytes("UTF-8"))
    val q1 = TweetStream.startTopN(
      TweetStream.fileJsonSource(spark, dir), sink, new TopNState,
      tsCol = tsCol, checkpoint = ckpt)
    try { q1.processAllAvailable() } finally q1.stop()
    assert(sink.snapshot.isEmpty, "no window should have finalized yet")
    // run 2: SAME checkpoint, new query instance — a late event pushes
    // the watermark past the early windows; the finalized top-N must
    // include the counts from BEFORE the restart (recovered state),
    // and the already-processed b1 file must not double-count
    Files.write(Paths.get(dir, "b2.json"),
      tweetT(9, 10000, Seq("late")).getBytes("UTF-8"))
    val q2 = TweetStream.startTopN(
      TweetStream.fileJsonSource(spark, dir), sink, new TopNState,
      tsCol = tsCol, checkpoint = ckpt)
    try { q2.processAllAvailable() } finally q2.stop()
    assert(sink.snapshot == Map(
      "Top10-1" -> "spark, 2", "Top10-2" -> "flink, 1"),
      s"state not recovered exactly once: ${sink.snapshot}")
    sink.dispose()
  }

  test("kafkaJsonSource: builds the standard json frame (guarded offline)") {
    // The kafka connector jar ships separately from Spark core and is
    // absent in this offline sandbox. Either outcome is pinned: with the
    // connector the builder yields the one-column `json` frame every
    // other source feeds parseTweets; without it, load() must fail fast
    // naming the missing data source — not return a broken frame.
    try {
      val df = TweetStream.kafkaJsonSource(spark, "localhost:9092", "tweets")
      assert(df.isStreaming)
      assert(df.columns.toSeq == Seq("json"))
      assert(df.schema.head.dataType.typeName == "string")
    } catch {
      case e: Exception =>
        val msg = (e.getMessage + Option(e.getCause).map(_.getMessage).mkString)
          .toLowerCase
        assert(msg.contains("kafka"), s"unexpected failure: $e")
    }
  }

  test("topNPerWindow + kvRows batch shape matches the Redis mapper format") {
    import spark.implicits._
    val counts = Seq(
      (at(0), at(300), "spark", 5L),
      (at(0), at(300), "flink", 3L),
      (at(0), at(300), "beam", 3L))
      .toDF("start", "end", "tag", "cnt")
      .select(struct(col("start"), col("end")).as("window"), col("tag"), col("cnt"))
    val kv = TweetStream.kvRows(TweetStream.topNPerWindow(counts, n = 2))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // beam ties flink at 3 but loses the deterministic tie-break; n=2 cuts it
    assert(kv == Seq(("Top10-1", "spark, 5"), ("Top10-2", "beam, 3")))
    assert(TweetStream.kvPair(1, "spark", 5L) == ("Top10-1", "spark, 5"))
  }
}
