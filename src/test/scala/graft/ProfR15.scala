package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.DedupOps

/** Round-15 probe: where does the label-index APPEND's wall go on the
  * StreamBench labels corpus (50k docs, ~10% one-edit near-dups), and
  * how does `labelsServe` scale with remap-journal length? Findings
  * recorded in bench/NOTES.md. Run via test:runMain graft.ProfR15. */
object ProfR15 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // the StreamBench labels generator — ONE shared definition
    val nDocs = sys.env.getOrElse("PROF_N", "50000").trim.toInt
    val docs = StreamBench.labelsCorpusRows(nDocs, seed = 42)
      .toDF("doc_id", "text").localCheckpoint(true)

    // stage-by-stage equivalents of one appendLabelIndex over an
    // empty base (the StreamBench single-batch shape)
    val pairs = time("within-delta verified pairs (q13 core)") {
      val p = DedupOps.neardupPairs(docs).localCheckpoint(true)
      println(s"[prof]   pairs: ${p.count()}")
      p
    }
    spark.catalog.clearCache()
    time("connected components over those pairs") {
      println(s"[prof]   labels: " +
        DedupOps.connectedComponents(pairs.select($"doc_a", $"doc_b")).count())
    }
    val idx = java.nio.file.Files.createTempDirectory("graft-prof-label").toString
    time("writeLabelIndex (verify + closure + 4 writes + commit)") {
      DedupOps.writeLabelIndex(docs, idx)
    }
    val empty = java.nio.file.Files
      .createTempDirectory("graft-prof-label-empty").toString
    DedupOps.writeLabelIndex(Seq.empty[(Long, String)].toDF("doc_id", "text"), empty)
    time("appendLabelIndex of all 50k onto an EMPTY base (the stream batch)") {
      DedupOps.appendLabelIndex(docs, empty)
    }

    // ---- append wall vs DELTA size onto a FIXED sealed base (the
    // O(delta) claim as a measurement): near-linear growth in the
    // delta, never the base, is what makes the daily loop affordable
    locally {
      val all = StreamBench.labelsCorpusRows(100000, seed = 7)
      val baseDocs = all.take(50000).toDF("doc_id", "text")
        .localCheckpoint(true)
      for (dn <- Seq(6250, 12500, 25000, 50000)) {
        val deltaDocs = all.slice(50000, 50000 + dn)
          .toDF("doc_id", "text").localCheckpoint(true)
        val idx = java.nio.file.Files
          .createTempDirectory("graft-prof-delta").toString
        DedupOps.writeLabelIndex(baseDocs, idx)
        time(f"append of a $dn-doc delta onto the sealed 50k base") {
          DedupOps.appendLabelIndex(deltaDocs, idx)
        }
      }
    }

    // ---- serve wall vs journal length (verdict #7): fabricate a
    // journal of L remap rows directly (each old_root occurs once — the
    // journal's invariant) and measure labelsServe's driver fold + map
    val base = java.nio.file.Files.createTempDirectory("graft-prof-journal").toString
    DedupOps.writeLabelIndex(docs, base)
    for (len <- Seq(0, 1000, 10000, 100000)) {
      val (lo, hi) = graft.queries.GenerationManifest.window(base)
      // a worst-case CHAIN: k -> k-1 for k in 1..len (max fold depth)
      (1 to len).map(k => (k.toLong, k.toLong - 1))
        .toDF("old_root", "new_root")
        .write.mode("overwrite").parquet(s"$base/remaps/gen=${hi + 1}")
      spark.emptyDataFrame.sparkSession // no-op
      Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
        .write.mode("overwrite").parquet(s"$base/labels/gen=${hi + 1}")
      graft.queries.GenerationManifest.commit(base, lo, hi + 1)
      time(s"labelsServe with a $len-row worst-case-chain journal") {
        println(s"[prof]   served: ${DedupOps.labelsServe(spark, base).count()}")
      }
      graft.queries.GenerationManifest.commit(base, lo, hi) // rewind
    }
    spark.stop()
  }
}
