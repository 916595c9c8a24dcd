package graft

import graft.queries.AnalyticsOps
import graft.streaming.BurstStream
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class BEvent(ts: Timestamp, event_type: String)

/** Streaming burst detection: equal to the batch q82 core on a shared
  * synthetic feed (non-empty windows), including gap-fill baselines
  * and cold-start suppression.
  */
class BurstStreamSpec extends SparkSuite {

  private val W = AnalyticsOps.BurstWindowSec.toLong

  private def at(slot: Long, offSec: Long = 1): Timestamp =
    new Timestamp((slot * W + offSec) * 1000)

  // type "c" deliberately joins LATE (slot 5): under the declared
  // origin its ring zero-fills from the stream's global slot 0 —
  // exactly the batch grid's lo — so its first active window flags
  // (the "new trending topic" case); "a"/"b" start at the origin
  private def feed: Seq[BEvent] = {
    def n(slot: Long, t: String, k: Int) = Seq.fill(k)(BEvent(at(slot), t))
    n(0, "a", 1) ++ n(0, "b", 2) ++
      n(1, "a", 1) ++ n(1, "b", 2) ++
      n(2, "a", 2) ++ n(2, "b", 1) ++
      n(3, "a", 1) ++ n(3, "b", 2) ++
      // slot 4: "a" bursts (5 > 2x mean of 4/3); "b" stays flat
      n(4, "a", 5) ++ n(4, "b", 2) ++
      // "b" goes silent for slots 5-7; "a" keeps a trickle; NEW type
      // "c" appears with enough traffic to flag against its all-zero
      // origin-filled baseline
      n(5, "a", 1) ++ n(5, "c", 6) ++ n(6, "a", 1) ++ n(7, "a", 1) ++
      // slot 8: "b" returns with 4 — its trailing window is the
      // zero-filled gap, so this MUST flag in both engines
      n(8, "a", 1) ++ n(8, "b", 4)
  }

  test("streaming bursts == batch q82 core on the same feed; gap baselines zero-filled") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batchInput = feed.toDF()
    val expected = AnalyticsOps.burstDetect(batchInput)
      .filter($"n" > 0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet

    val in = MemoryStream[BEvent]
    val q = BurstStream.bursts(in.toDF(), watermarkDelay = "1 seconds",
      originSec = Some(0L))
      .writeStream.format("memory").queryName("burst_out")
      .outputMode("append").start()
    try {
      val (first, rest) = feed.partition(_.ts.getTime / 1000 / W < 3)
      in.addData(first.toIndexedSeq); q.processAllAvailable()
      in.addData(rest.toIndexedSeq); q.processAllAvailable()
      // sentinel far in the future pushes the watermark past every
      // real window so they all finalize; its own window stays open
      in.addData(IndexedSeq(BEvent(at(100), "zz"))); q.processAllAvailable()
      // one more empty pass lets event-time timeouts fire for types
      // whose last windows finalized via the sentinel's watermark
      in.addData(IndexedSeq(BEvent(at(101), "zz"))); q.processAllAvailable()

      val got = spark.table("burst_out")
        .filter($"event_type" =!= "zz").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getInt(4))).toSet
      assert(got == expected,
        s"stream diverges from batch; only-stream=${(got -- expected).take(3)} " +
          s"only-batch=${(expected -- got).take(3)}")
      // the scenarios the operator exists for actually occurred
      assert(expected.exists(r => r._1 == "a" && r._5 == 1),
        "in-traffic burst missing from the fixture feed")
      assert(expected.exists(r => r._1 == "b" && r._2 == 8 * W && r._5 == 1),
        "reactivation-after-silence burst missing — gap fill broken?")
      assert(expected.filter(_._2 < 3 * W).forall(_._5 == 0),
        "a cold-start window flagged")
      // the late-joining type flagged on arrival in BOTH engines —
      // the origin seeding matches the batch grid's global lo
      assert(expected.exists(r => r._1 == "c" && r._2 == 5 * W && r._5 == 1),
        "late-joining type did not flag in batch — feed broken")
      // one state row per type — the bounded-alphabet claim
      assert(stateRowsTotal(q) <= feed.map(_.event_type).distinct.size + 1,
        "state exceeded the type alphabet")
    } finally q.stop()
  }

  test("reactivation after a gap far longer than the ring matches batch (fast-forward path)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // type "g" runs slots 0-3, goes silent for ~500 windows, then
    // returns hot — the gap is >> trail, so the stream takes the
    // O(trail) fast-forward instead of pushing one zero per slot;
    // output must still equal the batch dense grid's
    def n(slot: Long, t: String, k: Int) = Seq.fill(k)(BEvent(at(slot), t))
    val gapFeed = n(0, "g", 2) ++ n(1, "g", 2) ++ n(2, "g", 2) ++
      n(3, "g", 2) ++ n(503, "g", 5)

    val expected = AnalyticsOps.burstDetect(gapFeed.toDF())
      .filter($"n" > 0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    assert(expected.exists(r => r._2 == 503 * W && r._5 == 1),
      "post-gap window did not flag in batch — zero baseline broken in fixture")

    val in = MemoryStream[BEvent]
    val q = BurstStream.bursts(in.toDF(), watermarkDelay = "1 seconds",
      originSec = Some(0L))
      .writeStream.format("memory").queryName("burst_gap_out")
      .outputMode("append").start()
    try {
      in.addData(gapFeed.toIndexedSeq); q.processAllAvailable()
      in.addData(IndexedSeq(BEvent(at(600), "zz"))); q.processAllAvailable()
      in.addData(IndexedSeq(BEvent(at(601), "zz"))); q.processAllAvailable()
      val got = spark.table("burst_gap_out")
        .filter($"event_type" =!= "zz").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getInt(4))).toSet
      assert(got == expected,
        s"stream diverges from batch across the long gap; " +
          s"only-stream=${(got -- expected).take(3)} " +
          s"only-batch=${(expected -- got).take(3)}")
    } finally q.stop()
  }
}
