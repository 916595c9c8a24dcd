package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import graft.queries.{RetrievalOps, SimilarityOps, TextOps}

/** Opt-round-21 job ledger: run ONE query form and print every Spark
  * job's call site + wall time, so the driver-round-trip counts in
  * OPTIMIZATION_r21.md decompose into named causes instead of one
  * opaque total. Test-scope measurement tooling (guide §1), not part
  * of the driver contract. Usage:
  *   Test/runMain graft.ProfJobs <form> [sfDir]
  * where <form> is one of the cases below. */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val form = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    @volatile var rows = Seq.empty[(Int, Long, String)]
    val lock = new Object
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties.getProperty("callSite.short"))
          .getOrElse(j.stageInfos.lastOption.map(_.name).getOrElse("?"))
        starts.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, site) =>
          val ms = (System.nanoTime() - t0) / 1000000
          lock.synchronized { rows = rows :+ ((e.jobId, ms, site)) }
        }
      }
    })

    def run(): Unit = form match {
      case "q72" => TextOps.q72Collocations(spark, dir).count()
      case "q79" => TextOps.q79BigramLm(spark, dir).count()
      case "q27" => graft.queries.DedupOps.q27NgramJaccard(spark, dir).count()
      case "q98" => graft.queries.DedupOps.q98Containment(spark, dir).count()
      case "q119" =>
        val qd = SimilarityOps.tempIndexDir("profjobs-quant-drift")
        val emb = Tables.embeddings(spark, dir)
        SimilarityOps.trainIvfPq(emb, qd, ivfIters = 3, pqIters = 3)
        SimilarityOps.retrainIvfPq(emb, qd, ivfIters = 3, pqIters = 3,
          trainSample = Some(emb.filter(
            org.apache.spark.sql.functions.col("vec_id")
              % SimilarityOps.QuantRetrainMod === 0)))
        println("=== build done; serve jobs below ===")
        lock.synchronized { rows = Seq.empty }
        SimilarityOps.quantizerDriftServed(spark, dir, qd).count()
      case "q126" =>
        val hd = SimilarityOps.tempIndexDir("profjobs-hybrid-drift")
        val docs = Tables.documents(spark, dir)
        val emb = Tables.embeddings(spark, dir)
        RetrievalOps.writeTrainedHybridIndex(docs, emb, hd)
        RetrievalOps.retrainHybridDense(spark, hd, ivfIters = 3, pqIters = 3,
          trainSample = Some(emb.filter(
            org.apache.spark.sql.functions.col("vec_id")
              % SimilarityOps.QuantRetrainMod === 0)))
        println("=== build done; serve jobs below ===")
        lock.synchronized { rows = Seq.empty }
        RetrievalOps.hybridDriftServed(spark, hd).count()
      case other => sys.error(s"unknown form $other")
    }
    run()
    Thread.sleep(400)
    lock.synchronized {
      println(f"=== ${rows.size} jobs ===")
      rows.sortBy(_._1).foreach { case (id, ms, site) =>
        println(f"job $id%3d  $ms%5d ms  $site")
      }
    }
    spark.stop()
  }
}
