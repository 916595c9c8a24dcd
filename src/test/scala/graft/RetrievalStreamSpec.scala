package graft

import graft.queries.RetrievalOps
import graft.streaming.RetrievalStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class SDoc(doc_id: Long, text: String)

/** Standing-query matcher specs: streaming == batch on the same rows
  * (the stage is a stateless projection), and the frozen-stats scores
  * agree bit-for-bit with q76's on the shared support.
  */
class RetrievalStreamSpec extends SparkSuite {

  private def frozenStats() = {
    val path = java.nio.file.Files
      .createTempDirectory("graft-standing-idx").toString
    RetrievalOps.writeInvertedIndex(Tables.documents(spark, sf), path)
    RetrievalOps.indexStats(spark, path)
  }

  test("standingMatches: stream == batch row for row; every query non-vacuous") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stats = frozenStats()
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val batchOut = RetrievalStream.standingMatches(docs, stats).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getDouble(3))).toSet

    val in = MemoryStream[SDoc]
    val q = RetrievalStream.standingMatches(in.toDF(), stats)
      .writeStream.format("memory").queryName("standing_out")
      .outputMode("append").start()
    try {
      val rows = docs.collect().map(r => SDoc(r.getLong(0), r.getString(1)))
      val (a, b) = rows.splitAt(rows.length / 2)
      in.addData(a.toIndexedSeq); q.processAllAvailable()
      in.addData(b.toIndexedSeq); q.processAllAvailable()
      val streamOut = spark.table("standing_out").collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getDouble(3))).toSet
      assert(streamOut == batchOut,
        s"stream diverges from batch; only-stream=${(streamOut -- batchOut).take(3)} " +
          s"only-batch=${(batchOut -- streamOut).take(3)}")
    } finally q.stop()

    // each standing query alerts on something, and nothing dips below
    // its threshold
    RetrievalStream.MatchThresholds.foreach { case (qid, thr) =>
      val hits = batchOut.filter(_._2 == qid)
      assert(hits.nonEmpty, s"query $qid matched nothing — threshold too high")
      assert(hits.forall(_._3 >= thr), s"sub-threshold row for query $qid")
    }
  }

  test("index-refresh handshake: scores flip to the new generation's stats exactly at the restart boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // generation 1: index over half the corpus
    val docs = Tables.documents(spark, sf)
    val base = docs.filter($"doc_id" % 2 === 0)
    val delta = docs.filter($"doc_id" % 2 =!= 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-refresh-idx").toString
    RetrievalOps.writeInvertedIndex(base, path)
    val statsV1 = RetrievalOps.indexStats(spark, path)

    val probeDf = docs.select($"doc_id", $"text")
    val probeRows = probeDf.collect()
      .map(r => SDoc(r.getLong(0), r.getString(1))).toIndexedSeq
    def run(name: String, stats: org.apache.spark.sql.DataFrame): Set[(Long, Int, Double)] = {
      val in = MemoryStream[SDoc]
      val q = RetrievalStream.standingMatches(in.toDF(), stats)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        in.addData(probeRows); q.processAllAvailable()
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getInt(2), r.getDouble(3))).toSet
      } finally q.stop() // the generation boundary: query retired
    }
    def batch(stats: org.apache.spark.sql.DataFrame): Set[(Long, Int, Double)] =
      RetrievalStream.standingMatches(probeDf, stats).collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getDouble(3))).toSet

    // before the refresh: every emitted score is generation 1's
    val gotV1 = run("refresh_v1", statsV1)
    assert(gotV1 == batch(statsV1), "pre-refresh scores not under v1 stats")

    // the refresh: crash-atomic append commits generation 2; the
    // handshake is restart-with-recollected-stats (standingMatches
    // freezes stats at construction BY DESIGN — a running query never
    // drifts; the swap happens only at a query boundary)
    RetrievalOps.appendInvertedIndex(delta, path)
    assert(RetrievalOps.currentGeneration(path) == 2L)
    val statsV2 = RetrievalOps.indexStats(spark, path)
    val expectV2 = batch(statsV2)
    assert(expectV2 != gotV1,
      "append did not move any score — refresh check vacuous")

    // after the restart: every emitted score is generation 2's,
    // bit-identical to the batch projection under the new stats —
    // the flip is exact at the boundary, no mixed-generation scoring
    val gotV2 = run("refresh_v2", statsV2)
    assert(gotV2 == expectV2, "post-refresh scores not under v2 stats")
  }

  test("frozen-stats scores are bit-identical to q76's on the shared support") {
    val stats = frozenStats()
    val matched = RetrievalStream
      .standingMatches(Tables.documents(spark, sf).select(col("doc_id"), col("text")), stats)
      .collect().map(r => (r.getInt(2), r.getLong(0)) -> r.getDouble(3)).toMap
    val q76 = RetrievalOps.q76Bm25TopK(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2)) -> r.getDouble(3))
    // every q76 top-10 row above its query's threshold must appear in
    // the standing matches with the SAME rounded score — one BM25
    // definition across batch, served, and streaming surfaces
    val shared = q76.filter { case ((qid, _), s) =>
      s >= RetrievalStream.MatchThresholds(qid)
    }
    assert(shared.nonEmpty, "no q76 row clears its threshold — vacuous check")
    shared.foreach { case (key, s) =>
      assert(matched.get(key).contains(s),
        s"score mismatch for $key: q76=$s standing=${matched.get(key)}")
    }
  }

  private def frozenPassageStats() = {
    val path = java.nio.file.Files
      .createTempDirectory("graft-standing-passage-idx").toString
    RetrievalOps.writePassageIndex(Tables.documents(spark, sf), path)
    RetrievalOps.indexStats(spark, path)
  }

  test("standingPassageMatches: stream == batch; alerts carry their passage; non-vacuous") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stats = frozenPassageStats()
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val batch = RetrievalStream.standingPassageMatches(docs, stats)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Int]("qid"), r.getAs[Double]("score"),
        r.getAs[String]("passage"))
    val batchOut = batch.collect().map(key).toSet

    val in = MemoryStream[SDoc]
    val q = RetrievalStream.standingPassageMatches(in.toDF(), stats)
      .writeStream.format("memory").queryName("standing_passage_out")
      .outputMode("append").start()
    try {
      val rows = docs.collect().map(r => SDoc(r.getLong(0), r.getString(1)))
      val (a, b) = rows.splitAt(rows.length / 2)
      in.addData(a.toIndexedSeq); q.processAllAvailable()
      in.addData(b.toIndexedSeq); q.processAllAvailable()
      val streamOut = spark.table("standing_passage_out").collect()
        .map(key).toSet
      assert(streamOut == batchOut,
        s"stream diverges from batch; only-stream=${(streamOut -- batchOut).take(3)} " +
          s"only-batch=${(batchOut -- streamOut).take(3)}")
    } finally q.stop()

    RetrievalStream.PassageThresholds.foreach { case (qid, thr) =>
      val hits = batchOut.filter(_._3 == qid)
      assert(hits.nonEmpty, s"passage query $qid matched nothing")
      assert(hits.forall(_._4 >= thr), s"sub-threshold passage for query $qid")
    }
    // the alert's evidence: every emitted passage is a q75 chunk — its
    // token count is bounded by the window and it is non-empty
    batchOut.foreach { case (_, _, _, _, passage) =>
      val n = passage.split(" ").count(_.nonEmpty)
      assert(n >= 1 && n <= graft.queries.TextOps.ChunkToks,
        s"emitted passage is not a chunk-sized window: '$passage'")
    }
  }

  test("standing passage scores are bit-identical to q87's serving on the shared support") {
    val stats = frozenPassageStats()
    val standing = RetrievalStream.standingPassageMatches(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")), stats,
      // accept everything a hit produces: q87's top rows must be a subset
      Map(1 -> -100.0, 2 -> -100.0, 3 -> -100.0))
      .collect()
      .map(r => (r.getAs[Int]("qid"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("chunk_idx")) -> r.getAs[Double]("score")).toMap
    val q87 = RetrievalOps.q87PassageIndexed(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3)) -> r.getDouble(4))
    assert(q87.nonEmpty)
    q87.foreach { case (k, s) =>
      assert(standing.get(k).contains(s),
        s"passage score mismatch at $k: q87=$s standing=${standing.get(k)}")
    }
  }
}
