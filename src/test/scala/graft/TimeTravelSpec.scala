package graft

import graft.queries.{DedupOps, GenerationManifest, RetrievalOps, SimilarityOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PROTOCOL-LEVEL time travel (round 15): `labelsServeAt`'s as-of read
  * generalized to every GenerationManifest family via
  * [[GenerationManifest.windowAt]]. The contract under test is always
  * the same REPLAY theorem: capture a serve between appends, append
  * more, and the as-of serve at the captured head must reproduce the
  * capture bit for bit — appends are monotone (generations only
  * accrue), so truncating the window IS the historical state. */
class TimeTravelSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def split(dir: String) = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    (docs.filter($"doc_id" % DedupOps.DeltaMod =!= DedupOps.DeltaRem),
      docs.filter($"doc_id" % DedupOps.DeltaMod === DedupOps.DeltaRem))
  }

  test("inverted index: bm25SearchIndex(asOfGen=1) replays the pre-append serve; head serves the append") {
    val (base, delta) = split(sf)
    val idx = tmp("graft-tt-inverted")
    RetrievalOps.writeInvertedIndex(base, idx)
    val atGen1 = rows(RetrievalOps.bm25SearchIndex(spark, idx))
    RetrievalOps.appendInvertedIndex(delta, idx)
    val atHead = rows(RetrievalOps.bm25SearchIndex(spark, idx))
    assert(atHead != atGen1,
      "fixture vacuous: the delta changed nothing, the replay proves nothing")
    assert(rows(RetrievalOps.bm25SearchIndex(spark, idx, asOfGen = 1L)) == atGen1,
      "as-of serve diverged from the captured pre-append serve")
    assert(rows(RetrievalOps.bm25SearchIndex(spark, idx, asOfGen = 2L)) == atHead,
      "as-of at the head diverged from the default serve")
    // stats travel WITH the postings: the as-of idf must be computed
    // from the gen-1 cumulative totals, not the head's
    val n1 = RetrievalOps.indexStats(spark, idx, asOfGen = 1L)
      .select(col("n")).head().getLong(0)
    val n2 = RetrievalOps.indexStats(spark, idx)
      .select(col("n")).head().getLong(0)
    assert(n1 < n2, s"stats did not time-travel: n@1=$n1 vs n@head=$n2")
  }

  test("passage index: as-of serve replays the pre-append passage ranking") {
    val (base, delta) = split(sf)
    val idx = tmp("graft-tt-passage")
    RetrievalOps.writePassageIndex(base, idx)
    val atGen1 = rows(RetrievalOps.passageSearchIndex(spark, idx))
    RetrievalOps.appendPassageIndex(delta, idx)
    assert(rows(RetrievalOps.passageSearchIndex(spark, idx, asOfGen = 1L))
      == atGen1, "passage as-of serve diverged")
  }

  test("dedup index: deltaScreen(asOfGen) answers 'would gen g have flagged this doc'") {
    import spark.implicits._
    // base gen 1 holds one text; gen 2 appends a near-identical one.
    // A probe near-dup of BOTH must flag 1 base doc as of gen 1 and 2
    // as of the head — the screen sees exactly the sealed state.
    val a = "w1 w2 w3 w4 w5 w6 w7 w8"
    val b = "w1 w2 w3 w4 w5 w6 w7 z8"
    val idx = tmp("graft-tt-dedup")
    DedupOps.writeDedupIndex(Seq((10L, a)).toDF("doc_id", "text"), idx)
    DedupOps.appendDedupIndex(Seq((20L, b)).toDF("doc_id", "text"), idx)
    val probe = Seq((99L, a)).toDF("doc_id", "text")
    val hitsAt1 = DedupOps.deltaScreen(spark, idx, probe, asOfGen = 1L)
      .select($"base_id").collect().map(_.getLong(0)).toSeq.sorted
    val hitsHead = DedupOps.deltaScreen(spark, idx, probe)
      .select($"base_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(hitsAt1 == Seq(10L), s"as-of screen saw the future: $hitsAt1")
    assert(hitsHead == Seq(10L, 20L), s"head screen missed the append: $hitsHead")
    spark.catalog.clearCache() // plain-form deltaScreen persists its delta
  }

  test("IVF index: as-of search replays the pre-append top-k") {
    import spark.implicits._
    val centroids = (0 until SimilarityOps.NumCells)
      .map(c => (0 until SimilarityOps.Dim)
        .map(SimilarityOps.centroidComponent(c, _)))
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val delta = emb.filter($"vec_id" % 5 === 0)
    val idx = tmp("graft-tt-ivf")
    SimilarityOps.writeIvfIndex(base, centroids, idx)
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .toSeq
    val atGen1 = rows(
      SimilarityOps.ivfSearchIndex(spark, idx, probes, centroids))
    SimilarityOps.writeQuantizer(spark, centroids, idx)
    SimilarityOps.appendIvfIndex(delta, idx)
    val atHead = rows(
      SimilarityOps.ivfSearchIndex(spark, idx, probes, centroids))
    assert(atHead != atGen1, "fixture vacuous: append changed no top-k")
    assert(rows(SimilarityOps.ivfSearchIndex(
      spark, idx, probes, centroids, asOfGen = 1L)) == atGen1,
      "IVF as-of search diverged from the captured serve")
  }

  test("compaction reclaims history: as-of below the window floor refuses loudly") {
    val (base, delta) = split(sf)
    val idx = tmp("graft-tt-floor")
    RetrievalOps.writeInvertedIndex(base, idx)
    RetrievalOps.appendInvertedIndex(delta, idx)
    val atHead = rows(RetrievalOps.bm25SearchIndex(spark, idx))
    RetrievalOps.compactIndex(spark, idx)
    // the snapshot generation still serves, identically
    assert(rows(RetrievalOps.bm25SearchIndex(spark, idx)) == atHead,
      "compaction changed the serve")
    // but pre-compaction points are reclaimed, not silently misserved
    val e = intercept[IllegalArgumentException] {
      RetrievalOps.bm25SearchIndex(spark, idx, asOfGen = 1L).collect()
    }
    assert(e.getMessage.contains("window floor"),
      s"wrong refusal: ${e.getMessage}")
  }
}
