package graft

import org.apache.spark.sql.SparkSession
import graft.queries.{DedupOps, GenerationManifest}

/** Round-16 probe: the sealed-id WATERMARK's effect on the label-index
  * append — r15's one `weak` was the idempotency read scanning the
  * ENTIRE sealed base's shingle doc-id column per append. With
  * per-generation watermark records the check is a range compare:
  * fresh-id appends skip the scan outright, replays prune it to the
  * one overlapped generation. This probe times a FIXED 5k-doc append
  * (fresh ids, then a replay) against 1×/2×/4× sealed bases, in both
  * watermarked and LEGACY (records wiped) modes — flat watermarked
  * walls beside growing legacy walls is the claim as a measurement.
  * Findings recorded in bench/NOTES.md. Run via test:runMain
  * graft.ProfR16. */
object ProfR16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val deltaN = 5000
    for (baseN <- Seq(50000, 100000, 200000)) {
      val all = StreamBench.labelsCorpusRows(baseN + deltaN, seed = 11)
      val baseDocs = all.take(baseN).toDF("doc_id", "text")
        .localCheckpoint(true)
      val deltaDocs = all.slice(baseN, baseN + deltaN)
        .toDF("doc_id", "text").localCheckpoint(true)

      // watermarked (the round-16 default): fresh ids skip the scan,
      // the replay prunes to the delta's own generation
      val wmIdx = java.nio.file.Files
        .createTempDirectory("graft-prof-wm").toString
      DedupOps.writeLabelIndex(baseDocs, wmIdx)
      time(s"append ${deltaN} fresh onto ${baseN} base [watermark]") {
        DedupOps.appendLabelIndex(deltaDocs, wmIdx)
      }
      time(s"replay ${deltaN} onto ${baseN} base  [watermark]") {
        DedupOps.appendLabelIndex(deltaDocs, wmIdx)
      }

      // legacy (records wiped — the pre-round-16 manifest): every
      // append pays the full sealed-base id scan
      val lgIdx = java.nio.file.Files
        .createTempDirectory("graft-prof-legacy").toString
      DedupOps.writeLabelIndex(baseDocs, lgIdx)
      val (lo, hi) = GenerationManifest.window(lgIdx)
      GenerationManifest.commit(lgIdx, lo, hi)
      time(s"append ${deltaN} fresh onto ${baseN} base [legacy]   ") {
        DedupOps.appendLabelIndex(deltaDocs, lgIdx)
      }
      Seq(wmIdx, lgIdx)
        .foreach(p => graft.queries.SimilarityOps
          .deleteRecursively(java.nio.file.Paths.get(p)))
    }

    // ---- gate trainer cost: full-batch vs sampled epochs (verdict
    // r15 #7 — q111 tops the board because every epoch scans the
    // corpus; the sampled trainer's epochs scan only the sample)
    locally {
      import graft.queries.TextOps
      val sfDir = sys.env.getOrElse("PROF_SF_DIR", "/root/testdata/sf0.1")
      val gdocs = Tables.documents(spark, sfDir)
      time("gateTrainCore (full-batch epochs, sf0.1)") {
        TextOps.gateTrainCore(gdocs, TextOps.DistillEpochs, TextOps.DistillFeatDim)
      }
      for (mille <- Seq(500, 200, 50)) {
        time(s"gateTrainSampled ${mille} permille (sf0.1)") {
          TextOps.gateTrainSampled(gdocs, sampleMille = mille)
        }
      }
    }
    spark.stop()
  }
}
