package graft

import graft.queries.TextOps
import graft.streaming.NeardupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Doc(doc_id: Long, text: String, ts: Timestamp)

/** Specs for the streaming SimHash near-dup screen: the pure bucket
  * transition, narrow-vs-aggregate fingerprint parity, end-to-end
  * flagging across micro-batches, and TTL state boundedness. Fixture
  * hammings were chosen by computing the md5-derived fingerprints
  * offline (A vs one-token-replaced A: hamming 1; unrelated pairs:
  * 17-20) and are re-asserted as preconditions, so a hash change makes
  * the test fail loudly rather than vacuously pass. */
class NeardupStreamSpec extends SparkSuite {

  private val docA = (1 to 40).map(i => s"w$i").mkString(" ")
  private val docAnear =
    (1 to 40).map(i => if (i == 20) "zzz" else s"w$i").mkString(" ")
  private val docB = (1 to 40).map(i => s"unrel$i").mkString(" ")
  private val docC = (1 to 40).map(i => s"other$i").mkString(" ")

  private def at(sec: Long) = new Timestamp(sec * 1000L)

  private def fingerprints(texts: (Long, String)*): Map[Long, Long] = {
    import spark.implicits._
    texts.toSeq.toDF("doc_id", "text")
      .withColumn("hs", TextOps.hsCol(col("text")))
      .select(col("doc_id"), TextOps.simhashFromHashes(col("hs")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("advanceBucket: match, keep-first, in-batch dup, cap guard") {
    import NeardupStream.advanceBucket
    val (e1, r1) = advanceBucket(Nil, Seq((1L, 0xF0L)), 3, 8)
    assert(e1.isEmpty && r1 == List((1L, 0xF0L)))
    // hamming(0xF0, 0xF1) = 1 -> flagged against rep 1, NOT stored
    val (e2, r2) = advanceBucket(r1, Seq((2L, 0xF1L)), 3, 8)
    assert(e2 == Seq((2L, 1L, 1)) && r2 == r1)
    // hamming(0xF0, 0x0F) = 8 -> admitted as a second rep
    val (e3, r3) = advanceBucket(r1, Seq((3L, 0x0FL)), 3, 8)
    assert(e3.isEmpty && r3 == List((1L, 0xF0L), (3L, 0x0FL)))
    // a dup of a doc admitted EARLIER IN THE SAME BATCH is flagged
    val (e5, r5) = advanceBucket(Nil, Seq((1L, 0xF0L), (2L, 0xF1L)), 3, 8)
    assert(e5 == Seq((2L, 1L, 1)) && r5 == List((1L, 0xF0L)))
    // full bucket refuses new reps (skew guard): passes unflagged-unstored
    val (e4, r4) = advanceBucket(List((1L, 0xF0L)), Seq((4L, 0x0FL)), 3, 1)
    assert(e4.isEmpty && r4 == List((1L, 0xF0L)))
  }

  test("hammingMax at or above the band count is rejected (pigeonhole guard)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val e = intercept[IllegalArgumentException] {
      NeardupStream.screen(in.toDF(), hammingMax = TextOps.SimhashBands)
    }
    assert(e.getMessage.contains("pigeonhole"))
  }

  test("idleTtl inside the allowed-lateness window is rejected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    // a TTL at or below the watermark delay could evict a bucket while
    // rows it must screen are still admissible — constructor-rejected
    val e = intercept[IllegalArgumentException] {
      NeardupStream.screen(in.toDF(),
        watermarkDelay = "10 seconds", idleTtl = Some("5 seconds"))
    }
    assert(e.getMessage.contains("idleTtl"))
  }

  test("narrow per-row simhash == the q15 aggregate, row for row") {
    val agg = TextOps.simhashFrame(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val narrow = fingerprints(Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
    assert(agg.nonEmpty)
    agg.foreach { case (id, fp) =>
      assert(narrow(id) == fp, s"fingerprint drift for doc $id")
    }
  }

  test("screen flags near-dups across micro-batches; unrelated docs pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // fixture preconditions (see class doc)
    val fps = fingerprints(1L -> docA, 2L -> docB, 3L -> docAnear, 4L -> docC)
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(3L)) <= 3, "fixture drifted")
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(2L)) > 3)
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(4L)) > 3)
    assert(java.lang.Long.bitCount(fps(2L) ^ fps(4L)) > 3)

    val in = MemoryStream[Doc]
    val q = NeardupStream.screen(in.toDF())
      .writeStream.format("memory").queryName("neardup_screen")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-ndscreen").toString)
      .start()
    try {
      in.addData(Doc(1, docA, at(100)), Doc(2, docB, at(101)))
      q.processAllAvailable()
      assert(spark.table("neardup_screen").count() == 0L)

      in.addData(Doc(3, docAnear, at(200)), Doc(4, docC, at(201)))
      q.processAllAvailable()
      def flaggedPairs = spark.table("neardup_screen").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(flaggedPairs == Set((3L, 1L)))

      // an exact copy arriving two batches later still matches: the
      // representative state persists (hamming 0, all four bands fire)
      in.addData(Doc(5, docA, at(300)))
      q.processAllAvailable()
      assert(flaggedPairs == Set((3L, 1L), (5L, 1L)))
      val rows = spark.table("neardup_screen").collect()
      rows.foreach { r =>
        assert(r.getInt(3) <= 3 && r.getInt(2) >= 0 && r.getInt(2) < 4)
      }
      assert(rows.exists(r => r.getLong(0) == 5L && r.getInt(3) == 0))
    } finally q.stop()
  }

  test("checkpoint recovery: representative state survives a stop/restart") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("nd-recover").toString
    val ckpt = Files.createTempDirectory("ckpt-nd-recover").toString
    def doc(id: Long, sec: Long, text: String): String =
      s"""{"doc_id":$id,"ts_sec":$sec,"text":"$text"}"""
    def source() = spark.readStream
      .schema("doc_id LONG, ts_sec LONG, text STRING")
      .json(dir)
      .select(col("doc_id"), col("text"),
        timestamp_seconds(col("ts_sec")).as("ts"))
    // memory sink cannot recover from a checkpoint — collect flags via
    // foreachBatch (the recoverable sink family), driver-side buffer
    val flags = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def start() = NeardupStream.screen(source())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => flags.add((r.getLong(0), r.getLong(1))))
        ()
      }.start()
    // run 1: the base docs become representatives — no flags; the rep
    // state exists only in the checkpoint afterwards
    Files.write(Paths.get(dir, "b1.json"), String.join("\n",
      doc(1, 100, docA), doc(2, 101, docB)).getBytes("UTF-8"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(flags.isEmpty)
    // run 2: SAME checkpoint, new query — the near-dup of doc 1 must be
    // flagged against the RECOVERED representative (a lost state would
    // silently admit it as fresh), and the already-processed b1 file
    // must not replay (a replayed doc 1/2 would re-admit silently, but
    // any replayed emission would duplicate into the buffer)
    Files.write(Paths.get(dir, "b2.json"),
      doc(3, 200, docAnear).getBytes("UTF-8"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    import scala.jdk.CollectionConverters._
    assert(flags.asScala.toSet == Set((3L, 1L)),
      s"recovered state did not flag the near-dup: ${flags.asScala.toList}")
  }

  test("idleTtl bounds bucket state on an ever-fresh stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = NeardupStream.screen(in.toDF(), idleTtl = Some("100 seconds"))
      .writeStream.format("memory").queryName("neardup_ttl")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-ndttl").toString)
      .start()
    try {
      // every epoch ships entirely FRESH content: without the TTL each
      // epoch's reps (≤ 8 docs × 4 buckets) would accumulate forever
      assertStateStabilizes(q, 5) { i =>
        val b = (i + 1) * 100000L
        in.addData((0 until 8).map { k =>
          Doc(i * 100L + k,
            (1 to 40).map(j => s"e${i}_${k}_t$j").mkString(" "),
            at(b + k))
        }: _*)
      }
    } finally q.stop()
  }
}
