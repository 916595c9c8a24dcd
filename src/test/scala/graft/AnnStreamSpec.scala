package graft

import graft.queries.SimilarityOps
import graft.streaming.AnnStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.collection.mutable.ArrayBuffer

case class Probe(probe_id: Long, embedding: Seq[Double])

/** Streaming vector-query serving spec: a probe stream answered from
  * the persisted IVF-PQ index returns, across batches, exactly what
  * one batch serving call returns for the same probes.
  */
class AnnStreamSpec extends SparkSuite {

  test("serveProbes: stream across batches == one batch ivfPqServe call") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sf)
    val centroids = (0 until SimilarityOps.NumCells)
      .map(c => (0 until SimilarityOps.Dim).map(SimilarityOps.centroidComponent(c, _)))
    val path = java.nio.file.Files
      .createTempDirectory("ann-stream-idx").toString
    SimilarityOps.writeIvfPqIndex(
      emb, path, centroids, SimilarityOps.defaultPqCodebooks, residual = false)
    val ck = java.nio.file.Files
      .createTempDirectory("ann-stream-ck").toString

    val probes = emb.filter($"vec_id" < 6)
      .select($"vec_id", $"embedding").collect()
      .map(r => Probe(r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
    val expected = SimilarityOps.ivfPqServe(
      spark, path, emb, probes.map(p => (p.probe_id, p.embedding)).toSeq)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getInt(4))).toSet

    val got = ArrayBuffer.empty[(Long, Long, Int, Double, Int)]
    val in = MemoryStream[Probe]
    val q = AnnStream.serveProbes(in.toDF(), path, emb, ck) { res =>
      got ++= res.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2), r.getDouble(3), r.getInt(4)))
    }
    try {
      val (a, b) = probes.splitAt(3)
      in.addData(a.toIndexedSeq); q.processAllAvailable()
      in.addData(b.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    assert(got.size == expected.size, s"row count ${got.size} != ${expected.size}")
    assert(got.toSet == expected,
      s"stream serving diverged; only-stream=${(got.toSet -- expected).take(3)}")
    // every probe answered with a full top-10
    assert(got.groupBy(_._1).forall(_._2.size == 10))
  }
}
