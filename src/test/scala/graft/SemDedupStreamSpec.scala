package graft

import graft.queries.SimilarityOps
import graft.streaming.SemDedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class Vec(vec_id: Long, embedding: Array[Float], ts: Timestamp)

/** Specs for the streaming semantic-dedup screen: the pure cell
  * transition (keep-first, cap, chain semantics under both store
  * modes), end-to-end agreement with batch q88 on id-ordered arrival
  * (subset by default, EQUALITY with storeFlagged), and TTL state
  * boundedness on an ever-fresh stream. */
class SemDedupStreamSpec extends SparkSuite {

  private def at(sec: Long) = new Timestamp(sec * 1000L)

  private def unit2(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("advanceCell: keep-first, cap guard, chain semantics per store mode") {
    val a = unit2(0); val b = unit2(15); val c = unit2(30)
    val th = 0.95
    // fixture preconditions: a~b and b~c clear, a~c does not
    assert(SemDedupStream.cos(a, b) >= th && SemDedupStream.cos(b, c) >= th)
    assert(SemDedupStream.cos(a, c) < th)

    // default (keep-first): b flags against a and is NOT stored, so the
    // chain's tail c passes — the NeardupStream memory bound
    val (e1, r1) = SemDedupStream.advanceCell(
      Nil, Seq((1L, a), (2L, b), (3L, c)), th, 64, storeFlagged = false)
    assert(e1.map(t => (t._1, t._2)) == Seq((2L, 1L)))
    assert(r1.map(_._1) == List(1L, 3L))

    // storeFlagged: b is stored as an anchor, so c flags against it —
    // exactly q88's "exists an earlier neighbor" chain rule
    val (e2, r2) = SemDedupStream.advanceCell(
      Nil, Seq((1L, a), (2L, b), (3L, c)), th, 64, storeFlagged = true)
    assert(e2.map(t => (t._1, t._2)) == Seq((2L, 1L), (3L, 2L)))
    assert(r2.map(_._1) == List(1L, 2L, 3L))

    // cap: a full cell stops accepting reps; overflow passes
    // unflagged-and-unstored (recall traded for the hard bound)
    val far = unit2(90)
    val (e3, r3) = SemDedupStream.advanceCell(
      Nil, Seq((1L, a), (4L, far), (5L, far)), th, 1, storeFlagged = false)
    assert(e3.isEmpty, "overflow vector must pass unflagged")
    assert(r3.map(_._1) == List(1L))
  }

  test("stream screen == batch q88 on id-ordered arrival: subset default, equality with storeFlagged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cents = (0 until SimilarityOps.NumCells)
      .map(c => (0 until SimilarityOps.Dim)
        .map(SimilarityOps.centroidComponent(c, _)))
    val rows = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").collect()
      .sortBy(_.getLong(0))
      .map(r => Vec(r.getLong(0), r.getSeq[Float](1).toArray,
        at(r.getLong(0))))
    val pruned = SimilarityOps.q88SemDedup(spark, sf).collect()
      .filter(_.getInt(2) == 0).map(_.getLong(0)).toSet
    assert(pruned.nonEmpty, "fixture prunes nothing — vacuous")
    val cellOf = SimilarityOps.q88SemDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

    def run(name: String, storeFlagged: Boolean): Seq[(Long, Long, Int, Double)] = {
      val in = MemoryStream[Vec]
      val q = SemDedupStream.screen(in.toDF(), cents,
        storeFlagged = storeFlagged)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        val (x, y) = rows.splitAt(rows.length / 2)
        in.addData(x.toIndexedSeq); q.processAllAvailable()
        in.addData(y.toIndexedSeq); q.processAllAvailable()
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
          .toSeq
      } finally q.stop()
    }

    val dflt = run("semdedup_dflt", storeFlagged = false)
    val flaggedDflt = dflt.map(_._1).toSet
    assert(flaggedDflt.nonEmpty)
    assert(flaggedDflt.subsetOf(pruned),
      s"stream flagged a vector batch q88 keeps: ${(flaggedDflt -- pruned).take(3)}")
    // every emitted row is a valid in-cell verdict: earlier anchor,
    // same cell as the batch assignment, threshold honored
    dflt.foreach { case (id, dupOf, cell, sim) =>
      assert(dupOf < id && cell == cellOf(id) && cell == cellOf(dupOf))
      assert(sim >= SimilarityOps.NeardupCosine)
    }

    val anchored = run("semdedup_anchored", storeFlagged = true)
    assert(anchored.map(_._1).toSet == pruned,
      "storeFlagged stream must flag EXACTLY q88's pruned set on " +
        "id-ordered arrival")
  }

  test("idleTtl bounds cell state on an ever-fresh stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cents = (0 until SimilarityOps.NumCells)
      .map(c => (0 until SimilarityOps.Dim)
        .map(SimilarityOps.centroidComponent(c, _)))
    // fresh deterministic directions per epoch: no cross-epoch dups,
    // so without eviction reps accumulate forever
    def epochVecs(i: Int): Seq[Vec] = (0 until 40).map { j =>
      val v = Array.tabulate(SimilarityOps.Dim)(d =>
        (math.sin(0.1 * (i * 40 + j) * (d + 1)) +
          math.cos(0.03 * (i * 40 + j + d))).toFloat)
      Vec(i * 1000L + j, v, at(i * 100L + j))
    }
    val in = MemoryStream[Vec]
    val q = SemDedupStream.screen(in.toDF(), cents,
      idleTtl = Some("30 seconds"))
      .writeStream.format("memory").queryName("semdedup_ttl")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt-semdedup").toString)
      .start()
    try {
      assertStateStabilizes(q, epochs = 6) { i =>
        in.addData(epochVecs(i).toIndexedSeq)
      }
    } finally q.stop()
  }
}
