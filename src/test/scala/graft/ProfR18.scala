package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.queries.{DedupOps, RetrievalOps}

/** Round-18 probe: Spark JOBS per hybrid append before/after the
  * combinedRange fold — the r17 nit was four tiny range jobs per
  * append (two per-frame min/max aggregates, computed twice: the raw
  * delta's range for watermark pruning, the kept frames' range for the
  * sealed record) stacked on the maintenance stream's ~5 s batch
  * floor. The union form scans the same rows in ONE action per range,
  * so the append's fixed job overhead drops by two jobs in the
  * replay-overlap path and one in the fresh path. This probe counts
  * jobs around a fresh append and a full replay against a sealed base.
  * Findings recorded in bench/NOTES.md. Run via test:runMain
  * graft.ProfR18. */
object ProfR18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def countJobs(name: String)(f: => Unit): Unit = {
      // the listener bus is async — settle before and after sampling
      // (job starts are submitted synchronously with the actions, so a
      // short drain is enough for an exact count here)
      Thread.sleep(1000)
      jobs.set(0)
      val t0 = System.nanoTime(); f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      println(f"[prof] $name: ${jobs.get()} jobs, $wall%.2f s")
    }

    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    def baseP(c: org.apache.spark.sql.Column) =
      c % DedupOps.DeltaMod =!= DedupOps.DeltaRem
    val idx = java.nio.file.Files
      .createTempDirectory("graft-prof18-hybrid").toString
    RetrievalOps.writeHybridIndex(
      docs.filter(baseP(col("doc_id"))), emb.filter(baseP(col("vec_id"))),
      idx)
    countJobs("fresh append (1 range action)") {
      RetrievalOps.appendHybridIndex(
        docs.filter(!baseP(col("doc_id"))), emb.filter(!baseP(col("vec_id"))),
        idx)
    }
    countJobs("full replay (2 range actions + anti-join no-op)") {
      RetrievalOps.appendHybridIndex(
        docs.filter(!baseP(col("doc_id"))), emb.filter(!baseP(col("vec_id"))),
        idx)
    }
    spark.stop()
  }
}
