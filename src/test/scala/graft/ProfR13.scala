package graft

import graft.queries.{CorpusPipeline, DedupOps, PipelineOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 scale probe: the COMPOSED pipeline with every optional
  * stage on (excision → passage dedup → heuristic/model gates →
  * perplexity band → decontamination → cluster near-dup → mixture
  * rebalance), end to end through the packing terminal, at base
  * (sf0.1) and at a 10× suffixed-replica corpus (ProfScale's recipe:
  * replicas share no phrases, so each reproduces the base corpus's
  * intra-replica duplication structure and every stage has real work
  * at both scales).
  *
  * Records the q53-style per-stage yield table ([[CorpusPipeline
  * .yieldReport]]) and the wall for report + prepare→packShuffled at
  * each scale — the integration datapoint VERDICT r12 item 5 asks
  * for. The perplexity band self-calibrates per corpus (10th/90th
  * percentile of mean bigram xent over the gate's own input) because
  * the suffixed replicas shift the vocabulary and with it the xent
  * distribution.
  */
object ProfR13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "8000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val baseDir = sys.env.getOrElse("PROF_BASE", "/root/testdata/sf0.1")
    val scaleDir = sys.env.getOrElse("PROF_SCALE_DIR", "/tmp/scale10_r13")
    val replicas = sys.env.getOrElse("PROF_REPLICAS", "10").toInt
    val off = 10000000L

    // --- synthesize the suffixed 10× corpus --------------------------
    val base = Tables.documents(spark, baseDir)
    (0 until replicas).map { r =>
      if (r == 0) base
      else base.select(
        ($"doc_id" + lit(r * off)).as("doc_id"), $"lang", $"source",
        concat_ws(" ",
          transform(split($"text", " "), t => concat(t, lit(s"~$r"))))
          .as("text"),
        $"n_chars")
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$scaleDir/documents.parquet")

    // perMille: the bigram LM's heavy-hitter vocabulary floor. The
    // suffixed replicas dilute every token ~10× (replica vocabularies
    // are disjoint), so the base 10‰ floor keeps NOTHING at 10× — the
    // model degenerates to xent 0 and the band can't bite. The knob
    // exists for exactly this (Config.perplexityPerMille): the floor
    // must track vocabulary dilution. First 10× run (floor 10‰)
    // recorded band=[0,0], 0 dropped — kept as the negative datapoint.
    def runAt(tag: String, dir: String, perMille: Int): Unit = {
      val docs = Tables.documents(spark, dir)

      // calibrate the band on the gate's own input (the all-stages
      // spec's rule), timed separately — train-time vs run-time
      var t0 = System.nanoTime()
      val byHash = org.apache.spark.sql.expressions.Window
        .partitionBy($"h").orderBy($"doc_id")
      val keepLangs = CorpusPipeline.Config().keepLangs
      val exact = docs.withColumn("h", xxhash64($"text"))
        .withColumn("rn", row_number().over(byHash))
        .filter($"rn" === 1).drop("h", "rn")
      val gateInput = DedupOps.passageRewrite(
        DedupOps.exciseRewrite(
          exact.filter($"lang".isInCollection(keepLangs)))
          .localCheckpoint(false))
        .localCheckpoint(false)
        .filter(size(TextOps.toks($"text")) >= CorpusPipeline.Config().minTokens)
        .filter(TextOps.linearScoreMicro($"text") >= 0)
      val (scores, xh) = TextOps.bigramXentBuild(gateInput, perMille)
      val means = scores.collect()
        .map(r => r.getLong(2).toDouble / r.getLong(1)).sorted
      xh.foreach(_.unpersist())
      val lo = math.ceil(means(means.length / 10)).toLong
      val hi = math.floor(means(means.length * 9 / 10)).toLong
      println(f"[r13] $tag calibrate: ${(System.nanoTime() - t0) / 1e9}%.1f s" +
        s" band=[$lo, $hi] over ${means.length} gate-input docs")

      val evalDocs = docs.orderBy(length($"text").desc, $"doc_id")
        .limit(5).select($"doc_id", $"text").localCheckpoint(true)
      val cfg = CorpusPipeline.Config(
        phraseExcise = true, passageDedup = true, modelGate = true,
        perplexityBand = Some((lo, hi)), perplexityPerMille = perMille,
        clusterNeardups = true,
        mixWeights = Some(PipelineOps.MixWeights))

      t0 = System.nanoTime()
      val yld = CorpusPipeline.yieldReport(docs, cfg, Some(evalDocs)).collect()
      println(f"[r13] $tag yieldReport: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      yld.foreach(r => println(s"[r13] $tag | ${r.getString(0)} | " +
        s"${r.getLong(1)} | ${r.getLong(2)} | ${r.getLong(3)} |"))

      t0 = System.nanoTime()
      val packed = CorpusPipeline.withPrepared(docs, cfg, Some(evalDocs)) {
        prepared => CorpusPipeline.packShuffled(prepared).count()
      }
      println(f"[r13] $tag prepare+packShuffled: " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s, $packed packed docs")
      spark.catalog.clearCache()
    }

    runAt("base", baseDir, 10)
    runAt("10x", scaleDir, 1)
    spark.stop()
  }
}
