package graft

import graft.queries.{GenerationManifest, RetrievalOps}
import org.apache.spark.sql.functions.col

/** READER ISOLATION under the round-20 retention protocol — the r19
  * verdict's top gap, end to end on a real index family: at 100 TB a
  * serve's scan runs minutes-to-hours while a maintenance stream
  * appends every trigger, so a mutation's leading purge must NEVER
  * delete committed history a recently-planned reader still scans.
  * Pre-retention, `purgeOutside` deleted below `lo` at the start of
  * the NEXT mutation — one compaction plus one append yanked any
  * in-flight reader of the old window with `FileNotFoundException`
  * mid-collect. Round 20: replaced generations survive every mutation
  * and are reclaimed only by an explicit [[GenerationManifest.gc]]
  * whose floor is committed (`G` record) before anything is deleted.
  */
class RetentionSpec extends SparkSuite {

  test("a serve planned before a compaction collects correctly after compaction + appends; gc reclaims past the horizon") {
    val docs = Tables.documents(spark, sf)
    def part(i: Int) = docs.filter(col("doc_id") % 4 === i)
    val path = java.nio.file.Files
      .createTempDirectory("graft-retention").toString
    def gens(): Seq[String] = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith("gen=")).sorted.toSeq

    RetrievalOps.writeInvertedIndex(part(0), path)
    RetrievalOps.appendInvertedIndex(part(1), path) // window [1, 2]

    // the long-running reader: plan (and file-list) NOW, collect LATER
    val inFlight = RetrievalOps.bm25SearchIndex(spark, path)
    val want = RetrievalOps.bm25SearchIndex(spark, path).collect().toSeq

    // mutations land mid-scan: a compaction folds [1,2] -> [3,3], then
    // two appends grow the window to [3,5] — each one runs the
    // protocol's leading purge
    RetrievalOps.compactIndex(spark, path)
    RetrievalOps.appendInvertedIndex(part(2), path)
    RetrievalOps.appendInvertedIndex(part(3), path)
    assert(gens() ==
      Seq("gen=1", "gen=2", "gen=3", "gen=4", "gen=5"), gens().toString)

    // pre-retention this threw FileNotFoundException (the append's
    // purge deleted gens 1-2 out from under the planned scan)
    assert(inFlight.collect().toSeq == want,
      "in-flight reader of the replaced window was yanked or drifted")

    // gc honors the horizon: retainGens=2 keeps everything at or above
    // lo-2 = 1, so nothing is reclaimed yet
    assert(RetrievalOps.gcIndex(path, retainGens = 2) == 1L)
    assert(gens().size == 5, s"gc over-reclaimed: ${gens()}")

    // past the horizon it actually reclaims, and records the floor
    val head = RetrievalOps.bm25SearchIndex(spark, path).collect().toSeq
    assert(RetrievalOps.gcIndex(path, retainGens = 0) == 3L)
    assert(gens() == Seq("gen=3", "gen=4", "gen=5"),
      s"gc did not reclaim the replaced history: ${gens()}")
    assert(GenerationManifest.state(path).floor == 3L,
      "gc's floor was not committed to the manifest")
    assert(RetrievalOps.bm25SearchIndex(spark, path).collect().toSeq == head,
      "gc changed serving results")

    // the committed floor governs every later mutation's purge: a
    // further compaction retains [3,5] even though lo moves to 6
    RetrievalOps.compactIndex(spark, path) // [3,5] -> [6,6]
    assert(gens() == Seq("gen=3", "gen=4", "gen=5", "gen=6"),
      s"retention after gc broken: ${gens()}")
    assert(GenerationManifest.state(path).floor == 3L)
    assert(RetrievalOps.bm25SearchIndex(spark, path).collect().toSeq == head,
      "post-gc compaction changed serving results")
  }
}
