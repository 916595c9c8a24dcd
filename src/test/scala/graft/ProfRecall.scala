package graft

import graft.queries.SimilarityOps
import org.apache.spark.sql.SparkSession

/** Recall-frontier probe for the q67/q70 serving stack (VERDICT r10
  * task #3): sweep probed-cell count × rerank shortlist against the
  * brute-force exact-cosine ground truth and print recall@10 next to
  * the candidate volume each configuration pays — the data that
  * ATTRIBUTES q70's recall ceiling (cell pruning vs shortlist vs
  * codebook quality) instead of asserting it. probedCells = 16 probes
  * every cell, so that row isolates the non-pruning losses; the LCG
  * vs trained codebook comparison isolates quantization loss.
  *
  * Run: sbt "Test/runMain graft.ProfRecall" (PROF_BASE to change the
  * fixture dir). Results recorded in bench/NOTES.md.
  */
object ProfRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = sys.env.getOrElse("PROF_BASE", "/root/testdata/sf0.01")
    val k = 10
    val nProbes = 10

    val emb = Tables.embeddings(spark, dir)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val n = vecs.size
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val truth = (0L until nProbes.toLong).map { p =>
      p -> vecs.toSeq.map { case (id, v) => (id, cos(vecs(p), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    }.toMap
    def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val byProbe = rows.groupBy(_.getLong(0))
      byProbe.map { case (p, rs) =>
        rs.map(_.getLong(1)).count(truth(p)).toDouble / k
      }.sum / byProbe.size
    }

    // candidate volume: per-probe sum of probed-cell sizes, driver-side
    val centroids = (0 until SimilarityOps.NumCells)
      .map(c => (0 until SimilarityOps.Dim).map(SimilarityOps.centroidComponent(c, _)))
    val cellOf = vecs.map { case (id, v) =>
      id -> centroids.zipWithIndex
        .map { case (c, i) => (i, dot(v, c.toArray)) }
        .maxBy { case (i, s) => (s, -i) }._1
    }
    val cellSizes = cellOf.groupBy(_._2).view.mapValues(_.size).toMap
    def candidates(probedCells: Int): Double =
      (0L until nProbes.toLong).map { p =>
        SimilarityOps.probeCells(vecs(p).toSeq, centroids, probedCells)
          .map(c => cellSizes.getOrElse(c, 0)).sum
      }.sum.toDouble / nProbes

    println(s"[recall] fixture: $n vectors, $nProbes probes, k=$k, " +
      s"${SimilarityOps.NumCells} cells (ground truth: exact cosine)")
    println("[recall] cells  shortlist  cand/probe  q67@10  q70@10")
    for (cells <- Seq(4, 8, 16); shortlist <- Seq(50, 200)) {
      val r67 = recall(SimilarityOps
        .q67IvfPqTopK(spark, dir, k, nProbes, cells).collect())
      val r70 = recall(SimilarityOps
        .q70RerankTopK(spark, dir, k, nProbes, shortlist, cells).collect())
      println(f"[recall] $cells%5d  $shortlist%9d  ${candidates(cells)}%10.1f" +
        f"  $r67%6.3f  $r70%6.3f")
    }

    // quantization-loss isolation: exhaustive ADC (no pruning) with the
    // LCG books vs 3-iteration trained books — persisted-serving path
    val probes = (0L until nProbes.toLong).map(p => (p, vecs(p).toSeq)).toSeq
    val lcgPath = java.nio.file.Files.createTempDirectory("profrecall-lcg").toString
    SimilarityOps.writePqIndex(emb, lcgPath)
    val rLcg = recall(SimilarityOps.pqSearchIndex(
      spark, lcgPath, probes, SimilarityOps.readPqQuantizer(spark, lcgPath), k).collect())
    val trainedPath = java.nio.file.Files.createTempDirectory("profrecall-tr").toString
    SimilarityOps.trainAndWritePq(emb, trainedPath, iters = 3)
    val rTrained = recall(SimilarityOps.pqSearchIndex(
      spark, trainedPath, probes, SimilarityOps.readPqQuantizer(spark, trainedPath), k).collect())
    println(f"[recall] exhaustive ADC (no pruning): LCG books $rLcg%.3f, " +
      f"trained books $rTrained%.3f")
    spark.stop()
  }
}
