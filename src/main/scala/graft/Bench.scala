package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main — runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line on stdout, additionally written to
  * `target/bench.json` so the signal survives sbt's `[info]` log prefixes
  * (build.sbt also sets `outputStrategy := StdoutOutput` so the forked
  * process's line reaches the caller unprefixed).
  *
  * Signal-integrity rules:
  *   - a query that throws is recorded with an `err` string and excluded
  *     from the total;
  *   - the whole suite gets one untimed warmup pass (JIT/codegen/
  *     filesystem cache), then ITERS timed passes run ROUND-ROBIN over
  *     the queries; the reported number is the per-query MEDIAN and all
  *     samples are emitted. Measured on this host, a single execution of
  *     a 0.8 s query has recorded 17-27 s during multi-second
  *     environmental stall bursts (observed while external CPU steal was
  *     <1% — host-level, not plan-level). Round-robin interleaving
  *     spreads one query's samples across the run so a contiguous burst
  *     can inflate at most one sample per query; the median then
  *     discards it. Back-to-back per-query iterations (the previous
  *     design) put all of a query's samples inside one burst — observed
  *     as q06=[23.1,27.2,27.4] in a run where the same query's median
  *     was 1.3 s minutes later.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.get("SPARK_GRAFT_BENCH_ITERS") match {
      case None => 5
      case Some(s) =>
        val n = try s.trim.toInt catch {
          case _: NumberFormatException =>
            sys.error(s"SPARK_GRAFT_BENCH_ITERS must be an integer >= 1, got '$s'")
        }
        require(n >= 1, s"SPARK_GRAFT_BENCH_ITERS must be >= 1, got $n " +
          "(0 iterations would emit a bogus all-zero benchmark)")
        n
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bound diagnostic plan strings (the CorpusPipeline all-stages
      // lesson: AQE explain of a deep composed plan OOMed a JVM)
      .config("spark.sql.maxPlanStringLength", "8000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Res(name: String, samples: Seq[Double], err: Option[String]) {
      def median: Double = {
        val s = samples.sorted
        if (s.isEmpty) 0.0
        else if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      }
    }

    // Optional comma-separated allowlist of query keys (debug/bisect aid).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val registered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // Build-vs-serve split for the persisted-index queries. The
    // REGISTERED q77/q83/q84/q87 rebuild their on-disk index inside
    // every call — a fixture-scale convenience that keeps each one a
    // self-contained (spark, dir) => DataFrame for Verify's oracle. A
    // deployment builds an index once per compact generation and
    // serves many queries, so timing build+serve per sample conflates
    // a per-generation cost with the per-query one. The bench builds
    // each index ONCE per run (timed, reported under "phases" — not in
    // the total) and the timed samples measure the serving path alone.
    // Serving plans are byte-identical to the registered queries'
    // tails (the build/serve seams are the same functions the
    // registered forms compose).
    val phases = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def phase(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      phases(name) = (System.nanoTime() - t0) / 1e9
    }
    val serveOnly = scala.collection.mutable.Map
      .empty[String, (SparkSession, String) => org.apache.spark.sql.DataFrame]
    // The per-run build dirs are deleted EXPLICITLY once the sampling
    // loop ends (round-13 ADVICE): tempIndexDir's shutdown hook only
    // fires at JVM exit, so in a long-lived JVM repeated runs would
    // stack index trees in /tmp until then.
    val buildDirs = scala.collection.mutable.Buffer.empty[String]
    def buildDir(prefix: String): String = {
      val p = queries.SimilarityOps.tempIndexDir(prefix)
      buildDirs += p
      p
    }
    val selNames = registered.map(_._1).toSet
    if (selNames("q77_bm25_indexed")) {
      val p = buildDir("graft-bench-inverted")
      phase("q77_build")(
        queries.RetrievalOps.writeInvertedIndex(Tables.documents(spark, sfDir), p))
      serveOnly("q77_bm25_indexed") =
        (s, _) => queries.RetrievalOps.bm25SearchIndex(s, p)
    }
    if (selNames("q87_passage_indexed")) {
      val p = buildDir("graft-bench-passage")
      phase("q87_build")(
        queries.RetrievalOps.writePassageIndex(Tables.documents(spark, sfDir), p))
      serveOnly("q87_passage_indexed") =
        (s, _) => queries.RetrievalOps.passageSearchIndex(s, p)
    }
    if (selNames("q83_hybrid_indexed")) {
      val p = buildDir("graft-bench-hybrid")
      phase("q83_build")(queries.RetrievalOps.q83BuildIndex(spark, sfDir, p))
      serveOnly("q83_hybrid_indexed") =
        (s, d) => queries.RetrievalOps.q83ServeHybrid(s, d, p)
    }
    if (selNames("q62_delta_dedup")) {
      val p = buildDir("graft-bench-dedup")
      phase("q62_build") {
        import spark.implicits._
        queries.DedupOps.writeDedupIndex(Tables.documents(spark, sfDir)
          .filter($"doc_id" % queries.DedupOps.DeltaMod =!=
            queries.DedupOps.DeltaRem), p)
      }
      serveOnly("q62_delta_dedup") = (s, d) => {
        import s.implicits._
        queries.DedupOps.deltaScreen(s, p, Tables.documents(s, d)
          .filter($"doc_id" % queries.DedupOps.DeltaMod ===
            queries.DedupOps.DeltaRem))
      }
    }
    // ONE trained IVF-PQ build serves both q84 (trained top-k) and
    // q129 (the trained recall curve sweeps the same quantizers)
    if (selNames("q84_trained_ann") || selNames("q129_recall_trained")) {
      val p = buildDir("graft-bench-trained")
      phase("q84_train")(queries.SimilarityOps.trainIvfPq(
        Tables.embeddings(spark, sfDir), p, ivfIters = 3, pqIters = 3))
      if (selNames("q84_trained_ann"))
        serveOnly("q84_trained_ann") =
          (s, d) => queries.SimilarityOps.q84ServeTrained(s, d, p)
      if (selNames("q129_recall_trained"))
        serveOnly("q129_recall_trained") =
          (s, d) => queries.SimilarityOps.q129ServeTrained(s, d, p)
    }
    // The label index serves FOUR queries off one build: q112 (its own
    // registered form) plus the q47/q80/q104 consumers, whose served
    // twins are spec-pinned row-identical to the recomputing forms
    // (append == rebuild makes the base+delta index equal the
    // full-corpus closure). q43 stays on the recomputing path — the
    // closure IS the operator q43 times; serving it would time a scan.
    val labelConsumers = Set("q112_labels_indexed", "q47_cluster_sizes",
      "q80_contrastive", "q104_leak_split")
    if (labelConsumers.exists(selNames)) {
      val p = buildDir("graft-bench-labels")
      phase("q112_build") {
        import spark.implicits._
        val docs = Tables.documents(spark, sfDir)
        queries.DedupOps.writeLabelIndex(
          docs.filter($"doc_id" % queries.DedupOps.DeltaMod =!=
            queries.DedupOps.DeltaRem), p)
        queries.DedupOps.appendLabelIndex(
          docs.filter($"doc_id" % queries.DedupOps.DeltaMod ===
            queries.DedupOps.DeltaRem), p)
      }
      serveOnly("q112_labels_indexed") =
        (s, _) => queries.DedupOps.labelsServe(s, p)
          .orderBy(org.apache.spark.sql.functions.col("doc_id"))
      serveOnly("q47_cluster_sizes") =
        (s, _) => queries.DedupOps.clusterSizesServed(s, p)
      serveOnly("q104_leak_split") =
        (s, d) => queries.DedupOps.leakSplitServed(s, d, p)
      serveOnly("q80_contrastive") =
        (s, d) => queries.SimilarityOps.contrastiveServed(s, d, p)
    }
    // The gate model serves TWO queries off one train (q114 scoring +
    // q116 calibration); the BPE model serves q115's encode. The
    // registered forms re-pay train+persist per call for the oracle;
    // a deployment trains once per seal (the q112 argument applied to
    // models). Serving paths are the same functions the registered
    // forms compose, spec-pinned identical in ModelStoreSpec.
    val gateConsumers = Set("q114_gate_served", "q116_roc_served")
    if (gateConsumers.exists(selNames)) {
      val p = buildDir("graft-bench-gate-model")
      phase("q114_train")(
        queries.TextOps.writeGateModel(Tables.documents(spark, sfDir), p))
      serveOnly("q114_gate_served") =
        (s, d) => queries.TextOps.gateScoreServed(s, d, p)
      serveOnly("q116_roc_served") =
        (s, d) => queries.TextOps.gateRocServed(s, d, p)
    }
    if (selNames("q115_bpe_served")) {
      val p = buildDir("graft-bench-bpe-model")
      phase("q115_train")(
        queries.TextOps.writeBpeModel(Tables.documents(spark, sfDir), p))
      serveOnly("q115_bpe_served") =
        (s, d) => queries.TextOps.bpeEncodeServed(s, d, p)
    }
    if (selNames("q118_lm_served")) {
      val p = buildDir("graft-bench-lm-model")
      phase("q118_train")(
        queries.TextOps.writeLmModel(Tables.documents(spark, sfDir), p))
      serveOnly("q118_lm_served") =
        (s, d) => queries.TextOps.lmScoreServed(s, d, p)
    }
    if (selNames("q121_lm_foreign")) {
      val p = buildDir("graft-bench-lm-foreign")
      phase("q121_train") {
        import spark.implicits._
        queries.TextOps.writeLmModel(
          Tables.documents(spark, sfDir).filter($"doc_id" % 2 === 0), p)
      }
      serveOnly("q121_lm_foreign") =
        (s, d) => queries.TextOps.lmForeignServed(s, d, p)
    }
    if (selNames("q120_hybrid_served")) {
      // the hybrid store: base-build + correlated delta-append once
      // per run; timed samples measure the joint serve
      val p = buildDir("graft-bench-hybrid-store")
      phase("q120_build") {
        import spark.implicits._
        val docs = Tables.documents(spark, sfDir)
        val emb = Tables.embeddings(spark, sfDir)
        def baseP(c: org.apache.spark.sql.Column) =
          c % queries.DedupOps.DeltaMod =!= queries.DedupOps.DeltaRem
        queries.RetrievalOps.writeHybridIndex(
          docs.filter(baseP($"doc_id")), emb.filter(baseP($"vec_id")), p)
        queries.RetrievalOps.appendHybridIndex(
          docs.filter(!baseP($"doc_id")), emb.filter(!baseP($"vec_id")), p)
      }
      serveOnly("q120_hybrid_served") =
        (s, _) => queries.RetrievalOps.hybridServeAt(s, p)
    }
    if (selNames("q122_hybrid_trained")) {
      val p = buildDir("graft-bench-hybrid-trained")
      phase("q122_train")(queries.RetrievalOps.writeTrainedHybridIndex(
        Tables.documents(spark, sfDir), Tables.embeddings(spark, sfDir), p))
      serveOnly("q122_hybrid_trained") =
        (s, _) => queries.RetrievalOps.hybridServeAt(s, p)
    }
    if (selNames("q119_quantizer_drift")) {
      // quantizer drift needs a TWO-EPOCH store: gen 1 base-trained,
      // gen 2 the retrained+re-encoded snapshot — built once per run
      val p = buildDir("graft-bench-quant-drift")
      phase("q119_train") {
        import spark.implicits._
        val emb = Tables.embeddings(spark, sfDir)
        queries.SimilarityOps.trainIvfPq(emb, p, ivfIters = 3, pqIters = 3)
        queries.SimilarityOps.retrainIvfPq(emb, p, ivfIters = 3, pqIters = 3,
          trainSample = Some(emb.filter(
            $"vec_id" % queries.SimilarityOps.QuantRetrainMod === 0)))
      }
      serveOnly("q119_quantizer_drift") =
        (s, d) => queries.SimilarityOps.quantizerDriftServed(s, d, p)
    }
    if (selNames("q126_hybrid_drift")) {
      // hybrid drift needs a TWO-GENERATION store: gen 1 the trained
      // build, gen 2 the dense-leg epoch retrain from the store's own
      // float sidecar — sealed once per run; timed samples measure the
      // two joint as-of serves + the one-join review
      val p = buildDir("graft-bench-hybrid-drift")
      phase("q126_train") {
        import spark.implicits._
        val emb = Tables.embeddings(spark, sfDir)
        queries.RetrievalOps.writeTrainedHybridIndex(
          Tables.documents(spark, sfDir), emb, p)
        queries.RetrievalOps.retrainHybridDense(spark, p,
          ivfIters = 3, pqIters = 3,
          trainSample = Some(emb.filter(
            $"vec_id" % queries.SimilarityOps.QuantRetrainMod === 0)))
      }
      serveOnly("q126_hybrid_drift") =
        (s, _) => queries.RetrievalOps.hybridDriftServed(s, p)
    }
    if (selNames("q117_gate_drift")) {
      // drift needs TWO generations — its own store (gen 1 full
      // corpus, gen 2 the drifted even-id half), trained once per run
      val p = buildDir("graft-bench-gate-drift")
      phase("q117_train") {
        import spark.implicits._
        val docs = Tables.documents(spark, sfDir)
        queries.TextOps.writeGateModel(docs, p)
        queries.TextOps.retrainGateModel(
          docs.filter($"doc_id" % queries.TextOps.DriftRetrainMod === 0), p)
      }
      serveOnly("q117_gate_drift") =
        (s, d) => queries.TextOps.gateDriftServed(s, d, p)
    }
    if (selNames("q123_lm_drift")) {
      // LM drift needs TWO generations — gen 1 the full corpus, gen 2
      // the drifted even-id half, trained once per run; timed samples
      // measure the two-generation scoring compare
      val p = buildDir("graft-bench-lm-drift")
      phase("q123_train") {
        import spark.implicits._
        val docs = Tables.documents(spark, sfDir)
        queries.TextOps.writeLmModel(docs, p)
        queries.TextOps.retrainLmModel(
          docs.filter($"doc_id" % queries.TextOps.DriftRetrainMod === 0), p)
      }
      serveOnly("q123_lm_drift") =
        (s, d) => queries.TextOps.lmDriftServed(s, d, p)
    }
    if (selNames("q124_bpe_drift")) {
      // tokenizer drift needs TWO generations — gen 1 the full corpus,
      // gen 2 the drifted even-id half, trained once per run
      val p = buildDir("graft-bench-bpe-drift")
      phase("q124_train") {
        import spark.implicits._
        val docs = Tables.documents(spark, sfDir)
        queries.TextOps.writeBpeModel(docs, p)
        queries.TextOps.retrainBpeModel(
          docs.filter($"doc_id" % queries.TextOps.DriftRetrainMod === 0), p)
      }
      serveOnly("q124_bpe_drift") =
        (s, d) => queries.TextOps.bpeDriftServed(s, d, p)
    }
    if (selNames("q125_decontam_served")) {
      // the eval bank is sealed once per run (two generations — the
      // new-release append loop); timed samples measure the screen
      val p = buildDir("graft-bench-eval-bank")
      phase("q125_build") {
        import spark.implicits._
        val eval = Tables.documents(spark, sfDir).filter($"doc_id" % 97 === 0)
        queries.PipelineOps.writeEvalBank(eval.filter($"doc_id" % 2 === 0), p)
        queries.PipelineOps.appendEvalBank(eval.filter($"doc_id" % 2 =!= 0), p)
      }
      serveOnly("q125_decontam_served") = (s, d) => {
        import s.implicits._
        queries.PipelineOps.decontamServed(
          Tables.documents(s, d).filter($"doc_id" % 97 =!= 0), p)
          .orderBy($"doc_id")
      }
    }
    val selected = registered.map { case (n, fn) =>
      (n, serveOnly.getOrElse(n, fn))
    }

    val samplesByName =
      scala.collection.mutable.Map.empty[String, Vector[Double]]
    val errByName = scala.collection.mutable.Map.empty[String, String]
    // DRIFT SENTINEL (round 19 — automates bench/NOTES.md's manual
    // host-drift adjudication): a fixed, DATA-INDEPENDENT calibration
    // op — a constant-size in-memory hash aggregate, no I/O, no
    // parquet, no plan reuse with any query — timed once per pass in
    // the same round-robin. Environmental drift (host contention, CPU
    // steal, thermal state) moves the sentinel and the queries
    // together; a plan regression moves only its query. Movers across
    // boards are adjudicated against the sentinel ratio (NOTES.md
    // rule) instead of hand-rerun archaeology.
    // TWO sentinels, because the host drifts in two modes (observed on
    // this machine at round 18/19): CPU contention moves the in-memory
    // aggregate; filesystem/page-cache contention moves parquet scans
    // while barely touching pure CPU. `sentinel` calibrates the first,
    // `sentinel_io` (a scan of a constant synthetic parquet written
    // fresh each run — same bytes every board, zero dependence on the
    // SF dir) the second. Scan-heavy rows normalize by sentinel_io,
    // compute-heavy by sentinel (NOTES.md rule).
    val sentinelSamples = scala.collection.mutable.Buffer.empty[Double]
    val sentinelIoSamples = scala.collection.mutable.Buffer.empty[Double]
    val sentinelDir = buildDir("graft-bench-sentinel")
    phase("sentinel_build") {
      import org.apache.spark.sql.functions.{col, xxhash64}
      spark.range(0L, 16L << 20, 1L, 32)
        .select(col("id"), xxhash64(col("id")).as("h"))
        .write.mode("overwrite").parquet(sentinelDir)
    }
    def runSentinel(pass: Int): Unit = {
      import org.apache.spark.sql.functions.{col, shiftright, sum, xxhash64}
      val t0 = System.nanoTime()
      // shiftright(.., 33) bounds each term under 2^31 so the 256M-row
      // sum stays far from long overflow (ANSI mode throws on it)
      spark.range(0L, 256L << 20, 1L, 32)
        .select(sum(shiftright(xxhash64(col("id")), 33))).head()
      val t1 = System.nanoTime()
      spark.read.parquet(sentinelDir)
        .select(sum(shiftright(col("h"), 33))).head()
      val t2 = System.nanoTime()
      if (pass > 0) {
        sentinelSamples += (t1 - t0) / 1e9
        sentinelIoSamples += (t2 - t1) / 1e9
      }
    }
    // pass 0 = untimed warmup; passes 1..iters timed, interleaved so one
    // environmental stall burst cannot cover all samples of one query.
    for (pass <- 0 to iters) {
      runSentinel(pass)
      for ((name, fn) <- selected if !errByName.contains(name)) {
        try {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          // Queries that persist() intermediates (q13) would otherwise hand
          // later samples a warm cache — every sample must pay the same
          // cost for the medians to mean anything.
          spark.catalog.clearCache()
          if (pass > 0)
            samplesByName(name) = samplesByName.getOrElse(name, Vector.empty) :+ dt
        } catch {
          case e: Throwable =>
            errByName(name) =
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
      }
    }
    // the sentinels report under phases (not queries: excluded from the
    // total and from the oracle-facing queries map), with the SAME
    // statistic as the query rows (Res.median — one definition)
    phases("sentinel") = Res("sentinel", sentinelSamples.toSeq, None).median
    phases("sentinel_io") =
      Res("sentinel_io", sentinelIoSamples.toSeq, None).median
    val results = selected.map { case (name, _) =>
      Res(name, samplesByName.getOrElse(name, Vector.empty),
        errByName.get(name))
    }
    // last sample taken — reclaim the per-run index trees now
    buildDirs.foreach(d =>
      queries.SimilarityOps.deleteRecursively(Paths.get(d)))

    // SENTINEL-NORMALIZED BOARD COMPARISON (round 20 — bench/NOTES.md's
    // adjudication rule as code, the r19 verdict's #8): with
    // SPARK_GRAFT_BENCH_BASELINE naming a prior board JSON, every
    // common query row gets a normalized ratio and the board itself
    // carries the ≥1.5 mover list — the adjudication ships WITH the
    // board instead of living in NOTES prose. A row's raw ratio is
    // divided by BOTH sentinel ratios and the smaller quotient is
    // reported: a genuine plan regression exceeds the threshold under
    // whichever drift mode (CPU or I/O) actually moved the host, so
    // requiring both keeps environmental drift out of the mover list
    // without a per-query scan/compute classification table. Prior
    // boards without sentinel rows (pre-r19) normalize by 1.0 —
    // NOTES.md's manual untouched-row method still applies to those.
    def esc(s: String): String =
      s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c    => c.toString
      }
    // Locale.ROOT: f"$d%.3f" uses the JVM default locale — a
    // comma-decimal locale would corrupt the JSON metric line
    def f3(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val baselinePath = sys.env.get("SPARK_GRAFT_BENCH_BASELINE")
    val comparison: Option[(String, String, String)] = baselinePath.flatMap {
      bp =>
        try {
          val txt = Files.readString(Paths.get(bp))
          // scope the parse to the NAMED object's body (balanced-brace
          // scan): a prior board that itself carried a comparison has
          // "movers"/"normalized" blocks whose qNN keys would
          // otherwise shadow the medians under last-wins toMap —
          // chained baselines then normalized by ratios, not seconds
          def obj(name: String): String = {
            val at = txt.indexOf(s""""$name":{""")
            if (at < 0) ""
            else {
              val start = txt.indexOf('{', at)
              var i = start; var depth = 0
              while (i < txt.length && (depth != 0 || i == start)) {
                if (txt.charAt(i) == '{') depth += 1
                else if (txt.charAt(i) == '}') depth -= 1
                i += 1
              }
              txt.substring(start, i)
            }
          }
          // scalar "qNN_x":1.234 entries only ({"err":...} rows and
          // nested objects never match the numeric form)
          val qRe = """"(q[0-9][A-Za-z0-9_]*)":([0-9]+(?:\.[0-9]+)?)""".r
          val prior = qRe.findAllMatchIn(obj("queries"))
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
          val phasesTxt = obj("phases")
          def ph(name: String): Option[Double] =
            (s""""$name":([0-9]+(?:\\.[0-9]+)?)""").r
              .findFirstMatchIn(phasesTxt).map(_.group(1).toDouble)
          val sR = ph("sentinel").filter(_ > 0)
            .map(phases("sentinel") / _).getOrElse(1.0)
          val ioR = ph("sentinel_io").filter(_ > 0)
            .map(phases("sentinel_io") / _).getOrElse(1.0)
          val norm = results.filter(_.err.isEmpty).flatMap { r =>
            prior.get(r.name).filter(_ > 0).map { old =>
              val raw = r.median / old
              r.name -> math.min(raw / sR, raw / ioR)
            }
          }
          val normJson = norm
            .map { case (n, v) => s""""$n":${f3(v)}""" }
            .mkString("{", ",", "}")
          val movers = norm.filter(_._2 >= 1.5)
            .map { case (n, v) => s""""$n":${f3(v)}""" }
            .mkString("{", ",", "}")
          Some((
            s""""baseline":"${esc(bp)}","sentinel_ratio":${f3(sR)},"sentinel_io_ratio":${f3(ioR)},"movers":$movers""",
            normJson,
            movers))
        } catch {
          case e: Exception =>
            System.err.println(s"[bench] baseline compare failed: $e")
            None
        }
    }

    val qs = results.map { r =>
      r.err match {
        case None    => s""""${r.name}":${f3(r.median)}"""
        case Some(e) => s""""${r.name}":{"err":"${esc(e)}"}"""
      }
    }.mkString("{", ",", "}")
    val samples = (results.collect { case r if r.err.isEmpty =>
      s""""${r.name}":[${r.samples.map(f3).mkString(",")}]"""
    } :+ s""""_sentinel":[${sentinelSamples.map(f3).mkString(",")}]"""
      :+ s""""_sentinel_io":[${sentinelIoSamples.map(f3).mkString(",")}]""")
      .mkString("{", ",", "}")
    val ok = results.filter(_.err.isEmpty)
    val total = ok.map(_.median).sum
    val phasesJson = phases
      .map { case (n, s) => s""""$n":${f3(s)}""" }.mkString("{", ",", "}")
    val cmpCompact = comparison.map(c => "," + c._1).getOrElse("")
    val cmpFull = comparison
      .map(c => "," + c._1 + s""","normalized":${c._2}""").getOrElse("")
    val tail =
      s""""phases":$phasesJson,"iters":$iters,"stat":"median","sf":"$sfDir","n_ok":${ok.size},"n_err":${results.size - ok.size}"""
    // stdout gets the COMPACT line (medians only): the full 26-query ×
    // iters samples blob outgrew the caller's output-tail capture in
    // round 4 ("parsed: null"), silencing the whole bench signal. Full
    // samples go to target/bench.json only.
    val line =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,$tail$cmpCompact}"""
    val fullLine =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"samples":$samples,$tail$cmpFull}"""
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/bench.json"), fullLine + "\n")
    println(line)
    spark.stop()
  }
}
