package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import graft.queries.{DedupOps, RetrievalOps, SimilarityOps, TextOps}

/** Opt-round-21 serve-path profile: the board times SERVE-ONLY forms
  * for the persisted-store rows (the bench's build/serve split), but
  * `graft.Profile` can only run registered forms — so the job/stage
  * counts it reports for q119/q120/q122/q126 are dominated by their
  * per-call builds. This probe builds each store ONCE and profiles the
  * serve alone (jobs = driver round-trips, the sf0.1 fixed-cost axis;
  * VERDICT r20 #3/#4/#8 want these measured). Run via Test/runMain. */
object ProfR21 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("PROF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var taskMs = 0L
    val lock = new Object
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        lock.synchronized { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          stages += 1
          taskMs += s.stageInfo.taskMetrics.executorRunTime
        }
    }
    spark.sparkContext.addSparkListener(listener)
    def profile(name: String)(f: => Unit): Unit = {
      f // warmup
      Thread.sleep(200)
      lock.synchronized { jobs = 0; stages = 0; taskMs = 0L }
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      lock.synchronized {
        println(f"$name%-28s wall=$dt%6.2f s  jobs=$jobs%3d stages=$stages%3d task_ms=$taskMs%6d")
      }
    }

    def baseP(c: org.apache.spark.sql.Column, m: Long, r: Long) = c % m =!= r

    // hybrid store (q120 serve / q122 serve shape)
    val hp = SimilarityOps.tempIndexDir("prof-r21-hybrid")
    RetrievalOps.writeHybridIndex(
      docs.filter(baseP(col("doc_id"), DedupOps.DeltaMod, DedupOps.DeltaRem)),
      emb.filter(baseP(col("vec_id"), DedupOps.DeltaMod, DedupOps.DeltaRem)),
      hp)
    RetrievalOps.appendHybridIndex(
      docs.filter(!baseP(col("doc_id"), DedupOps.DeltaMod, DedupOps.DeltaRem)),
      emb.filter(!baseP(col("vec_id"), DedupOps.DeltaMod, DedupOps.DeltaRem)),
      hp)
    profile("q120 hybridServeAt")(
      RetrievalOps.hybridServeAt(spark, hp).count())

    // hybrid drift store (q126 serve)
    val hd = SimilarityOps.tempIndexDir("prof-r21-hybrid-drift")
    RetrievalOps.writeTrainedHybridIndex(docs, emb, hd)
    RetrievalOps.retrainHybridDense(spark, hd, ivfIters = 3, pqIters = 3,
      trainSample = Some(emb.filter(
        col("vec_id") % SimilarityOps.QuantRetrainMod === 0)))
    profile("q126 hybridDriftServed")(
      RetrievalOps.hybridDriftServed(spark, hd).count())

    // quantizer drift store (q119 serve)
    val qd = SimilarityOps.tempIndexDir("prof-r21-quant-drift")
    SimilarityOps.trainIvfPq(emb, qd, ivfIters = 3, pqIters = 3)
    SimilarityOps.retrainIvfPq(emb, qd, ivfIters = 3, pqIters = 3,
      trainSample = Some(emb.filter(
        col("vec_id") % SimilarityOps.QuantRetrainMod === 0)))
    profile("q119 quantizerDriftServed")(
      SimilarityOps.quantizerDriftServed(spark, dir, qd).count())
    // q119 sub-steps (same store)
    profile("q119: readQuantizer x2") {
      SimilarityOps.readQuantizer(spark, s"$qd/_epochs/gen=2")
      SimilarityOps.readQuantizer(spark, s"$qd/_epochs/gen=2")
    }
    profile("q119: readQuantizer schema'd") {
      spark.read
        .schema("cell INT, centroid ARRAY<DOUBLE>")
        .parquet(s"$qd/_epochs/gen=2/_quantizer")
        .select(col("cell"), col("centroid")).collect()
    }
    profile("q119: meta head") {
      spark.read.parquet(s"$qd/_meta").head()
    }
    profile("q119: ivfPqServe leg") {
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
        .toSeq
      SimilarityOps.ivfPqServe(spark, qd, emb, probes, 10).count()
    }

    // LM drift store (q123 serve)
    val lp = SimilarityOps.tempIndexDir("prof-r21-lm-drift")
    TextOps.writeLmModel(docs, lp)
    TextOps.retrainLmModel(
      docs.filter(col("doc_id") % TextOps.DriftRetrainMod === 0), lp)
    profile("q123 lmDriftServed")(
      TextOps.lmDriftServed(spark, dir, lp).count())

    // gate drift (q117 serve)
    val gp = SimilarityOps.tempIndexDir("prof-r21-gate-drift")
    TextOps.writeGateModel(docs, gp)
    TextOps.retrainGateModel(
      docs.filter(col("doc_id") % TextOps.DriftRetrainMod === 0), gp)
    profile("q117 gateDriftServed")(
      TextOps.gateDriftServed(spark, dir, gp).count())

    // registered in-session rows the round is touching
    profile("q103 yieldReport") {
      graft.queries.CorpusPipeline
        .yieldReport(docs).count()
      spark.catalog.clearCache()
    }
    profile("q79 bigramLm") {
      TextOps.q79BigramLm(spark, dir).count()
      spark.catalog.clearCache()
    }
    profile("q72 collocations") {
      TextOps.q72Collocations(spark, dir).count()
      spark.catalog.clearCache()
    }
    profile("q21 simhashPairs")(
      TextOps.q21SimhashPairs(spark, dir).count())
    profile("q42 tfidfTopTerms")(
      TextOps.q42TfidfTopTerms(spark, dir).count())
    profile("q61 sq8Indexed")(
      SimilarityOps.q61Sq8Indexed(spark, dir).count())
    spark.stop()
  }
}
