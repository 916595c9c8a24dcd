package graft

import java.sql.Timestamp

import graft.queries.CorpusPipeline
import graft.streaming.CorpusStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class CDoc(
    doc_id: Long, lang: String, source: String, text: String, ts: Timestamp)

/** End-to-end spec for the STREAMING corpus ingest — the same fixture
  * flows through [[CorpusStream.ingest]] (gates + streaming exact dedup
  * + near-dup screen + read-side reconcile) and through the batch
  * [[CorpusPipeline.prepare]], and the kept-doc sets must agree. The
  * documented keep-rule divergence (first-arrival vs min-id) is
  * neutralized by feeding in id order, which is when the two rules
  * coincide.
  */
class CorpusStreamSpec extends SparkSuite {

  private def t(s: Long) = new Timestamp(s * 1000L)

  private val baseToks: Seq[String] =
    ("the quick brown fox jumps over the lazy dog while seventeen other " +
      "animals watch quietly from the tall grass near the river bank as " +
      "evening settles and the water slides past the old stone bridge " +
      "carrying leaves someone dropped upstream this morning").split(' ').toSeq

  /** Two far-apart tokens swapped: the token BAG is identical, so the
    * streaming screen sees the same SimHash (hamming 0); only ~6 of
    * ~40 3-word shingles change, so the batch MinHash path verifies
    * Jaccard ≈ 0.73 ≥ 0.6. Both detectors must drop it. */
  private val swapped: Seq[String] = {
    val (i, j) = (5, 25)
    baseToks.updated(i, baseToks(j)).updated(j, baseToks(i))
  }

  private def fixture: Seq[CDoc] = Seq(
    CDoc(1, "en", "web", baseToks.mkString(" "), t(1)),
    CDoc(2, "en", "web", baseToks.mkString(" "), t(2)), // exact dup of 1
    CDoc(3, "en", "web", swapped.mkString(" "), t(3)),  // near-dup of 1
    CDoc(4, "en", "web", "completely different content about catalyst " +
      "optimizer internals and shuffle partitioning strategies for very " +
      "large clusters", t(4)),
    CDoc(5, "xx", "web", baseToks.mkString(" "), t(5)), // language gate
    CDoc(6, "en", "web", "too short", t(6)),            // quality gate
    CDoc(7, "de", "web", "ein ganz anderer text über verteilte systeme " +
      "und die freuden der fehlersuche in produktionsumgebungen spät in " +
      "der nacht", t(7)))

  // keep-everything rebalance so the batch path's stage 4 cannot
  // subsample the comparison away
  private val cfg = CorpusPipeline.Config(
    stratRates = Seq.empty, defaultPerMille = 1000)

  test("streaming ingest == batch prepare on an id-ordered feed; flag state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir =
      java.nio.file.Files.createTempDirectory("corpus-stream-out").toString
    val ckDir =
      java.nio.file.Files.createTempDirectory("corpus-stream-ck").toString
    val in = MemoryStream[CDoc]
    val (docsQ, flagsQ) = CorpusStream.ingest(in.toDF(), outDir, ckDir, cfg)
    try {
      in.addData(fixture)
      docsQ.processAllAvailable()
      flagsQ.processAllAvailable()
      val stateAfterFirst = stateRowsTotal(flagsQ)
      assert(stateAfterFirst > 0, "screen holds no representatives")

      // numRowsTotal guard: re-feed the whole fixture as NEW doc ids
      // (every admissible row is now a duplicate of a stored rep) —
      // flagged docs are never admitted as reps, so screen state must
      // not grow
      in.addData(fixture.map(d =>
        d.copy(doc_id = d.doc_id + 100, ts = t(7 + d.doc_id))))
      docsQ.processAllAvailable()
      flagsQ.processAllAvailable()
      assert(stateRowsTotal(flagsQ) == stateAfterFirst,
        s"flag state grew on an all-duplicate feed: " +
          s"$stateAfterFirst -> ${stateRowsTotal(flagsQ)}")
    } finally {
      docsQ.stop(); flagsQ.stop()
    }

    // staging layout: the docs sink is lang-partitioned like the batch
    // CorpusPipeline.write terminal
    val langDirs = new java.io.File(s"$outDir/docs").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).toSet
    assert(langDirs == Set("lang=en", "lang=de"), s"bad layout: $langDirs")

    // reconciliation: every re-fed admissible doc was flagged against a
    // first-feed rep, so the kept corpus is exactly the first feed's
    // survivors — and those must equal the batch path's
    val streamKept = CorpusStream.keptCorpus(spark, outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batchKept = CorpusPipeline
      .prepare(fixture.toDF().drop("ts"), cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept == Set(1L, 4L, 7L), s"batch kept $batchKept")
    assert(streamKept == batchKept,
      s"stream kept $streamKept, batch kept $batchKept")
  }

  test("compact seals delta + tombstones into base/; ingest resumes beside it") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val outDir = Files.createTempDirectory("corpus-compact-out").toString
    val ckDir = Files.createTempDirectory("corpus-compact-ck").toString

    def jdoc(d: CDoc): String =
      s"""{"doc_id":${d.doc_id},"lang":"${d.lang}","source":"${d.source}",""" +
        s""""text":"${d.text}","ts_sec":${d.ts.getTime / 1000}}"""
    // one FILE-source dir per input epoch — compact is a generation
    // boundary (checkpoints die with it), so each generation ingests
    // the NEXT epoch's files
    def source(srcDir: String) = spark.readStream
      .schema("doc_id LONG, lang STRING, source STRING, text STRING, ts_sec LONG")
      .json(srcDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        timestamp_seconds(col("ts_sec")).as("ts"))
    def runEpoch(docs: Seq[CDoc]): Unit = {
      val srcDir = Files.createTempDirectory("corpus-compact-src").toString
      Files.write(Paths.get(srcDir, "input.json"),
        docs.map(jdoc).mkString("\n").getBytes("UTF-8"))
      val (docsQ, flagsQ) =
        CorpusStream.ingest(source(srcDir), outDir, ckDir, cfg)
      try {
        docsQ.processAllAvailable()
        flagsQ.processAllAvailable()
      } finally { docsQ.stop(); flagsQ.stop() }
    }
    def kept(): Set[Long] = CorpusStream.keptCorpus(spark, outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // --- epoch 1: ingest the fixture, drain, stop cleanly ---
    runEpoch(fixture)
    assert(kept() == Set(1L, 4L, 7L))

    // --- generation boundary: seal the reconciled corpus ---
    // only the near-dup tombstone (doc 3) is physically present to
    // remove: the exact dup (doc 2) was dropped IN-stream by
    // dropDuplicatesWithinWatermark and never reached staging
    val removed = CorpusStream.compact(spark, outDir, ckDir, cfg)
    assert(removed == 1, s"expected doc 3 physically removed, got $removed")
    val root = new java.io.File(outDir)
    assert(new java.io.File(root, "base").isDirectory)
    assert(!new java.io.File(root, "docs").exists, "delta not dropped")
    assert(!new java.io.File(root, "flags").exists, "tombstones not dropped")
    assert(!new java.io.File(ckDir, "docs").exists &&
      !new java.io.File(ckDir, "flags").exists, "generation checkpoints kept")
    assert(CorpusStream.generation(outDir, "base") == Some(1L),
      "first compact must seal generation 1")
    // base carries the CorpusPipeline.write layout
    val baseLangs = new java.io.File(root, "base").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).toSet
    assert(baseLangs == Set("lang=en", "lang=de"), s"base layout: $baseLangs")
    assert(kept() == Set(1L, 4L, 7L))

    // --- epoch 2: a fresh generation (fresh screen state) beside the
    // sealed base; its near-dup of a SEALED doc is invisible to the
    // stream screen — by design — and survives into the delta
    runEpoch(Seq(
      CDoc(30, "en", "web", "a genuinely fresh document about stream " +
        "compaction and the maintenance windows it quietly requires", t(20)),
      CDoc(31, "en", "web", swapped.mkString(" "), t(21)))) // dup of SEALED 1
    assert(kept() == Set(1L, 4L, 7L, 30L, 31L),
      s"epoch-2 delta should hold both new docs, got ${kept()}")

    // --- second boundary: the BATCH pass is what catches the
    // cross-generation near-dup (min-id rule drops 31 against sealed 1);
    // this compact also emits the q51 pack manifest over the sealed base
    val removed2 =
      CorpusStream.compact(spark, outDir, ckDir, cfg, packBudget = Some(16))
    assert(removed2 == 1, s"expected doc 31 removed by batch dedup, got $removed2")
    assert(kept() == Set(1L, 4L, 7L, 30L), s"final corpus: ${kept()}")
    // pack manifest: same generation as the base it describes, present,
    // covers the sealed base exactly once, and its offsets are the
    // per-shard prefix sums of its token counts (read through the
    // VERIFYING reader — it must serve when generations match)
    assert(CorpusStream.generation(outDir, "base") == Some(2L) &&
      CorpusStream.generation(outDir, "pack") == Some(2L),
      "base and pack must carry the same generation marker")
    val pack = CorpusStream.packManifest(spark, outDir).collect()
    assert(pack.map(_.getLong(0)).toSet == Set(1L, 4L, 7L, 30L) &&
      pack.length == 4, s"manifest rows: ${pack.toSeq}")
    pack.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(3) == cum / 16 && r.getLong(4) == cum % 16,
          s"shard $shard row $r: expected offset $cum")
        cum += r.getLong(2)
      }
    }

    // --- third boundary WITHOUT packBudget: the old manifest must not
    // survive to describe a base it no longer matches
    val removed3 = CorpusStream.compact(spark, outDir, ckDir, cfg)
    assert(removed3 == 0, s"idle compact removed $removed3")
    assert(!new java.io.File(root, "pack").exists,
      "stale pack manifest left beside a newer base")
    assert(kept() == Set(1L, 4L, 7L, 30L))
    assert(CorpusStream.generation(outDir, "base") == Some(3L))
    // without a pack, the verifying reader must refuse, naming the repair
    val e = intercept[IllegalArgumentException](
      CorpusStream.packManifest(spark, outDir))
    assert(e.getMessage.contains("re-run compact"), e.getMessage)
  }

  test("compact crash windows: recover() repairs them from the generation markers") {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val outDir = Files.createTempDirectory("corpus-crash-out").toString
    val ckDir = Files.createTempDirectory("corpus-crash-ck").toString
    // a plain (non-streaming) delta is enough: staged() reads any
    // parquet under docs/, and the crash machinery is pure filesystem
    Seq(
      (1L, "en", "web", "the first document with comfortably many tokens inside"),
      (2L, "en", "web", "a second entirely different document of ample length"),
      (3L, "de", "web", "ein drittes deutsches dokument mit genug vielen woertern"))
      .toDF("doc_id", "lang", "source", "text")
      .write.parquet(s"$outDir/docs")
    assert(CorpusStream.compact(spark, outDir, ckDir, cfg,
      packBudget = Some(16)) == 0)
    def kept(): Set[Long] = CorpusStream.keptCorpus(spark, outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept() == Set(1L, 2L, 3L) &&
      CorpusStream.generation(outDir, "base") == Some(1L))

    // --- window A: crash between move(base, base.old) and
    // move(base.next, base) — no base/, a COMPLETE base.next/ (marker
    // present), and the retired delta still on disk
    Files.move(Paths.get(outDir, "base"), Paths.get(outDir, "base.next"))
    Seq((99L, "en", "web", "stale delta row already folded into the next base"))
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$outDir/docs")
    CorpusStream.recover(outDir, ckDir)
    assert(kept() == Set(1L, 2L, 3L),
      "recover must promote the complete base.next and drop the folded delta")
    assert(CorpusStream.generation(outDir, "base") == Some(1L) &&
      !new java.io.File(outDir, "base.next").exists &&
      !new java.io.File(outDir, "docs").exists)
    // pack (gen 1) still matches the recovered base (gen 1): served
    assert(CorpusStream.packManifest(spark, outDir).count() == 3)

    // --- window B: crash between the base and pack swaps — base is
    // already generation 2, pack/ still describes generation 1, the
    // complete pack.next/ carries 2
    Files.write(Paths.get(outDir, "base", "_GENERATION"), "2".getBytes("UTF-8"))
    val packDir = new java.io.File(outDir, "pack")
    val nextDir = new java.io.File(outDir, "pack.next")
    Files.walk(packDir.toPath).forEach { p =>
      val q = nextDir.toPath.resolve(packDir.toPath.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(q)
      else Files.copy(p, q)
    }
    Files.write(nextDir.toPath.resolve("_GENERATION"), "2".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](
      CorpusStream.packManifest(spark, outDir)) // reader refuses pre-repair
    assert(e.getMessage.contains("generation"), e.getMessage)
    CorpusStream.recover(outDir, ckDir)
    assert(CorpusStream.generation(outDir, "pack") == Some(2L) &&
      !nextDir.exists, "recover must promote the matching pack.next")
    assert(CorpusStream.packManifest(spark, outDir).count() == 3)

    // --- window C: stale pack with NO repair candidate — recover
    // deletes it rather than leave a manifest of a vanished base
    Files.write(Paths.get(outDir, "base", "_GENERATION"), "3".getBytes("UTF-8"))
    CorpusStream.recover(outDir, ckDir)
    assert(!packDir.exists, "stale pack must be removed")
  }

  test("model gate in the admission path matches q68's keep flag exactly") {
    import spark.implicits._
    // the gate is stateless, so its batch evaluation IS its streaming
    // evaluation (same codegen'd predicate per row) — assert against
    // q68 on the fixture corpus with the heuristics gates wide open
    val docs = Tables.documents(spark, sf)
      .withColumn("ts", org.apache.spark.sql.functions.lit(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val cfg = graft.queries.CorpusPipeline.Config(
      keepLangs = docs.select($"lang").distinct()
        .collect().map(_.getString(0)).toSet,
      minTokens = 0, modelGate = true)
    val admitted = graft.streaming.CorpusStream.gate(docs, cfg)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val keep = graft.queries.TextOps.q68LinearScore(spark, sf).collect()
      .filter(_.getInt(3) == 1).map(_.getLong(0)).toSet
    assert(admitted == keep, "streaming admission disagrees with q68")
  }

  test("empty docs are neither screened nor stored (batch q15 omission contract)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CDoc]
    // two empty docs and a whitespace-only doc: with the all-zero
    // fingerprint they would all "match" at hamming 0; the screen must
    // instead drop them from consideration entirely
    val q = graft.streaming.NeardupStream.screen(in.toDF())
      .writeStream.format("memory").queryName("empty_screen").start()
    try {
      in.addData(Seq(
        CDoc(1, "en", "web", "", t(1)),
        CDoc(2, "en", "web", "", t(2)),
        CDoc(3, "en", "web", "   ", t(3))))
      q.processAllAvailable()
      assert(spark.table("empty_screen").count() == 0,
        "token-less docs flagged each other")
      assert(stateRowsTotal(q) == 0, "token-less docs stored as reps")
    } finally q.stop()
  }

  test("streaming mixture gate keeps exactly the batch rebalance's rows; unknown sources admit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // rates derived BATCH-side from a sealed corpus (the lambda split):
    // src0 premium, src1 half, srcX absent from the table entirely
    val sealedDocs = (0 until 200).map(i =>
      (i.toLong, "en", if (i % 2 == 0) "src0" else "src1",
        s"sealed doc number $i with some words", t(i.toLong)))
      .toDF("doc_id", "lang", "source", "text", "ts")
    // materialized through parquet, as the scaladoc demands: the
    // static side re-evaluates per micro-batch, so production passes
    // a read-back table, not the derived plan
    val ratesPath = java.nio.file.Files
      .createTempDirectory("mix-rates").toString
    graft.queries.PipelineOps.mixtureRates(
        sealedDocs, Seq("src0" -> 3, "src1" -> 1), 1)
      .write.mode("overwrite").parquet(ratesPath)
    val rates = spark.read.parquet(ratesPath)
    val ratesLocal = rates.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val in = MemoryStream[CDoc]
    val q = graft.streaming.CorpusStream.mixtureGate(in.toDF(), rates)
      .writeStream.format("memory").queryName("mix_gate").start()
    val arriving = (0 until 90).map { i =>
      val src = i % 3 match {
        case 0 => "src0"; case 1 => "src1"; case _ => "srcX" }
      CDoc(1000L + i, "en", src, s"arriving doc $i with streamed words", t(i.toLong))
    }
    try {
      in.addData(arriving)
      q.processAllAvailable()
      val kept = spark.table("mix_gate").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      // the contract: kept on the stream == the batch predicate at the
      // same rates (content-hash per-mille against rate, absent → 1000)
      val expected = arriving.toDF()
        .withColumn("hb", graft.queries.RelationalOps
          .contentHashMod(graft.queries.RelationalOps.PerMille))
        .collect().filter { r =>
          r.getLong(5) < ratesLocal.getOrElse(r.getString(2), 1000L) }
        .map(_.getLong(0)).toSet
      assert(kept == expected, "streaming gate diverged from the batch predicate")
      // srcX is absent from the rates table: every srcX doc admits
      val srcX = arriving.filter(_.source == "srcX").map(_.doc_id).toSet
      assert(srcX.subsetOf(kept), "unknown source silently dropped")
      // and the gate is stateless — stream-static joins hold no state
      assert(stateRowsTotal(q) == 0, "mixture gate must not hold state")
    } finally q.stop()
  }

  test("streaming chunk stage == batch chunkTokens on the same docs; ts passes through") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CDoc]
    val q = graft.streaming.CorpusStream.chunk(in.toDF())
      .writeStream.format("memory").queryName("chunk_out").start()
    val docs = Seq(
      CDoc(1, "en", "web", baseToks.mkString(" "), t(1)),
      CDoc(2, "en", "web", baseToks.take(40).mkString(" "), t(2)),
      CDoc(3, "en", "web", "short doc", t(3)),
      CDoc(4, "en", "web", "", t(4))) // token-less: no chunk rows
    try {
      in.addData(docs)
      q.processAllAvailable()
      val streamed = spark.table("chunk_out")
        .select($"doc_id", $"ts", $"chunk_idx", $"start_tok", $"n_toks", $"chunk_text")
        .collect().map(_.toSeq).toSet
      val batch = graft.queries.TextOps.chunkTokens(docs.toDF())
        .select($"doc_id", $"ts", $"chunk_idx", $"start_tok", $"n_toks", $"chunk_text")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch, "streaming chunk stage diverged from the batch transform")
      assert(streamed.nonEmpty && !streamed.exists(_.head == 4L),
        "token-less doc produced chunk rows")
      // the stage is STATELESS: nothing in any state store
      assert(stateRowsTotal(q) == 0, "chunking must not hold state")
    } finally q.stop()
  }

  test("baseScreen: stream-screened flags == batch deltaScreen on the same delta; stateless") {
    import graft.queries.DedupOps
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the q62 split on the real fixture corpus: sealed base vs incoming
    // delta — the batch deltaScreen over the WHOLE delta is the ground
    // truth the per-batch stream screen must reproduce regardless of
    // how arrivals chop into micro-batches
    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") % DedupOps.DeltaMod =!= DedupOps.DeltaRem)
    val delta = docs.filter(col("doc_id") % DedupOps.DeltaMod === DedupOps.DeltaRem)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft-basescreen-idx").toString
    DedupOps.writeDedupIndex(base, idxPath)
    val expected = DedupOps.deltaScreen(spark, idxPath, delta).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(expected.nonEmpty, "fixture delta has no cross-split dups — vacuous")

    val deltaRows = delta.select($"doc_id", $"text").as[(Long, String)]
      .collect().toIndexedSeq
    val (batch1, batch2) = deltaRows.partition(_._1 < deltaRows.map(_._1).sorted
      .apply(deltaRows.length / 2))

    val flagsDir = java.nio.file.Files
      .createTempDirectory("graft-basescreen-flags").toString + "/flags_base"
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-basescreen-ck").toString
    // the batch deltaScreen above left its documented session-lifetime
    // cache; start the stream from a clean registry so the final
    // no-leak check sees only what baseScreen's batches did
    spark.catalog.clearCache()
    val in = MemoryStream[(Long, String)]
    val q = CorpusStream.baseScreen(
      in.toDF().toDF("doc_id", "text"), idxPath, flagsDir, ckDir)
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      val got = spark.read.parquet(flagsDir)
        .select($"doc_id", $"dup_of", $"n_common", $"n_union").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected,
        s"stream screen diverges from batch deltaScreen; " +
          s"only-stream=${(got -- expected).take(3)} " +
          s"only-batch=${(expected -- got).take(3)}")
      // stateless by construction — nothing may land in a state store
      assert(stateRowsTotal(q) == 0, "baseScreen must not hold state")
      // the loan released each batch's shingle cache
      assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark),
        "baseScreen leaked a cached shingle frame across batches")
    } finally q.stop()
  }

  test("phraseScrub: stream-scrubbed rows == batch scrubAgainst on the same delta; stateless") {
    import graft.queries.DedupOps
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") % DedupOps.DeltaMod =!= DedupOps.DeltaRem)
    val delta = docs.filter(col("doc_id") % DedupOps.DeltaMod === DedupOps.DeltaRem)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft-scrub-idx").toString
    DedupOps.writePhraseIndex(base, idxPath)
    val expected = DedupOps.scrubAgainst(spark, idxPath, delta).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(expected.exists(_._2 > 0), "fixture delta scrubs nothing — vacuous")

    val deltaRows = delta.select($"doc_id", $"text").as[(Long, String)]
      .collect().toIndexedSeq
    val (batch1, batch2) = deltaRows.partition(_._1 < deltaRows.map(_._1).sorted
      .apply(deltaRows.length / 2))

    val outDir = java.nio.file.Files
      .createTempDirectory("graft-scrub-out").toString + "/scrubbed"
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-scrub-ck").toString
    val in = MemoryStream[(Long, String)]
    val q = CorpusStream.phraseScrub(
      in.toDF().toDF("doc_id", "text"), idxPath, outDir, ckDir)
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      val out = spark.read.parquet(outDir)
      // metadata-preserving contract: the batch schema survives with
      // text replaced, plus the two audit columns
      assert(out.columns.toSet ==
        Set("doc_id", "text", "n_spans", "n_removed"))
      val got = out
        .select($"doc_id", $"n_spans", $"n_removed", $"text").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(got == expected,
        s"stream scrub diverges from batch scrubAgainst; " +
          s"only-stream=${(got -- expected).take(3)} " +
          s"only-batch=${(expected -- got).take(3)}")
      assert(stateRowsTotal(q) == 0, "phraseScrub must not hold state")
    } finally q.stop()
  }

  test("noveltyGate: admits == batch score filter; short docs admitted; stateless") {
    import graft.queries.DedupOps
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") % DedupOps.DeltaMod =!= DedupOps.DeltaRem)
    val delta = docs.filter(col("doc_id") % DedupOps.DeltaMod === DedupOps.DeltaRem)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft-gate-idx").toString
    DedupOps.writePhraseIndex(base, idxPath)
    val maxPm = 500L
    val scores = DedupOps.noveltyScore(spark, idxPath, delta).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val deltaRows = delta.select($"doc_id", $"text").as[(Long, String)]
      .collect().toIndexedSeq
    // batch expectation: scored docs under the cap + unscored short docs
    val expected = deltaRows.map(_._1)
      .filter(id => scores.getOrElse(id, 0L) <= maxPm).toSet
    assert(expected.nonEmpty && expected.size < deltaRows.size,
      "gate is vacuous on the fixture — nothing filtered or everything")

    val outDir = java.nio.file.Files
      .createTempDirectory("graft-gate-out").toString + "/admitted"
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-gate-ck").toString
    val in = MemoryStream[(Long, String)]
    val q = CorpusStream.noveltyGate(
      in.toDF().toDF("doc_id", "text"), idxPath, outDir, ckDir, maxPm)
    try {
      val (b1, b2) = deltaRows.splitAt(deltaRows.length / 2)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      val admitted = spark.read.parquet(outDir)
      val got = admitted.select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(got == expected,
        s"gate diverges: only-stream=${(got -- expected).take(3)} " +
          s"only-batch=${(expected -- got).take(3)}")
      // score columns ride along for auditability
      assert(Set("n_windows", "n_known", "known_pm")
        .subsetOf(admitted.columns.toSet))
      assert(stateRowsTotal(q) == 0, "noveltyGate must not hold state")
    } finally q.stop()
  }

  test("lmBandGate: stream kept set == perplexityGateServed; generation pinned under concurrent retrain; stateless") {
    import graft.queries.TextOps
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // train the LM on the sealed base; the stream feeds the DELTA — a
    // corpus the model never saw, so the round-17 backoff is on the
    // scoring path (unseen transitions must cost, not drop)
    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") % 4 =!= 0L)
    val delta = docs.filter(col("doc_id") % 4 === 0L)
    val modelPath = java.nio.file.Files
      .createTempDirectory("graft-lmband-model").toString
    TextOps.writeLmModel(base, modelPath, perMille = 10)

    // pick the band FROM the served score distribution so it bites:
    // lo = 0, hi = the median mean bigram cost
    val served = TextOps.lmScoreServed(spark, sf, modelPath)
      .filter(col("doc_id") % 4 === 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val meanCosts = served.map(t => t._3 / t._2).sorted
    val lo = 0L; val hi = meanCosts(meanCosts.length / 2)
    val expected = served
      .filter(t => t._3 >= lo * t._2 && t._3 <= hi * t._2)
      .map(_._1).toSet
    assert(expected.nonEmpty && expected.size < served.length,
      "band is vacuous on the fixture")

    val deltaRows = delta.select($"doc_id", $"text").as[(Long, String)]
      .collect().toIndexedSeq
    val (b1, b2) = deltaRows.splitAt(deltaRows.length / 2)
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-lmband-out").toString + "/banded"
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-lmband-ck").toString
    val in = MemoryStream[(Long, String)]
    val q = CorpusStream.lmBandGate(
      in.toDF().toDF("doc_id", "text"), lo, hi, modelPath, outDir, ckDir)
    try {
      in.addData(b1); q.processAllAvailable()
      // CONCURRENT RETRAIN between batches: the live stream must keep
      // banding with its construction-time generation (bands are not
      // comparable across models) — a skewed gen-2 model that WOULD
      // change the verdicts proves the pin is load-bearing
      TextOps.retrainLmModel(
        docs.filter(col("doc_id") < 50), modelPath, perMille = 10)
      val gen2Kept = TextOps
        .perplexityGateServed(delta.select($"doc_id", $"text"), lo, hi,
          modelPath)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(gen2Kept != expected,
        "retrain fixture vacuous: gen-2 model bands identically")
      in.addData(b2); q.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(got == expected,
        s"stream band diverges from the pinned-generation batch gate; " +
          s"only-stream=${(got -- expected).take(3)} " +
          s"only-batch=${(expected -- got).take(3)}")
      assert(stateRowsTotal(q) == 0, "lmBandGate must not hold state")
      assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark),
        "lmBandGate leaked cached frames across batches")
    } finally q.stop()
  }

  test("phrase-bank refresh handshake: a generation flip mid-stream lands at the next batch") {
    import graft.queries.DedupOps
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the gate re-resolves the bank's _GENERATION window at every
    // batch (noveltyScore reads the manifest per call), so a
    // crawl-side append or compaction lands WITHOUT a stream restart —
    // the streaming twin of the retrieval stats-refresh handshake.
    // The flip is atomic: a batch sees the old window or the new,
    // never torn, and compaction's deferred reclamation means a batch
    // straddling the flip still finishes its scan.
    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") % 4 === 1 || col("doc_id") % 4 === 2)
    val day2 = docs.filter(col("doc_id") % 4 === 3)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft-handshake-idx").toString
    DedupOps.writePhraseIndex(base, idxPath)

    // a day-2 text that the base bank admits but the refreshed bank
    // must reject (after the append its every window is sealed)
    val baseScores = DedupOps.noveltyScore(spark, idxPath, day2).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val candidate = day2.select($"doc_id", $"text").as[(Long, String)]
      .collect()
      .find { case (id, t) =>
        t.split(" ").count(_.nonEmpty) >= DedupOps.ExciseTokens &&
          baseScores.getOrElse(id, 0L) <= 500L
      }
    assert(candidate.nonEmpty, "no day-2 doc is base-novel — vacuous fixture")
    val knownText = candidate.get._2
    val novelText = (1 to DedupOps.ExciseTokens + 4)
      .map(i => s"zq$i").mkString(" ")

    val outDir = java.nio.file.Files
      .createTempDirectory("graft-handshake-out").toString + "/admitted"
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-handshake-ck").toString
    val in = MemoryStream[(Long, String)]
    val q = CorpusStream.noveltyGate(
      in.toDF().toDF("doc_id", "text"), idxPath, outDir, ckDir, 500L)
    def admittedIds(): Set[Long] =
      spark.read.parquet(outDir).select($"doc_id").collect()
        .map(_.getLong(0)).toSet
    try {
      // batch 1 against the base-only bank: both admitted
      in.addData(Seq((900001L, knownText), (900002L, novelText)))
      q.processAllAvailable()
      assert(admittedIds() == Set(900001L, 900002L),
        s"pre-flip admits wrong: ${admittedIds()}")

      // the flip: day-2 appended, one atomic manifest rename
      DedupOps.appendPhraseIndex(day2, idxPath)

      // batch 2, same texts under fresh ids: the re-fetch of sealed
      // day-2 text must now be rejected; genuinely novel text passes
      in.addData(Seq((910001L, knownText), (910002L, novelText)))
      q.processAllAvailable()
      assert(admittedIds() == Set(900001L, 900002L, 910002L),
        s"post-append admits wrong: ${admittedIds()}")

      // compaction flips again mid-stream; decisions are unchanged
      // (bit-identical serve across the compaction flip)
      DedupOps.compactPhraseIndex(spark, idxPath)
      in.addData(Seq((920001L, knownText), (920002L, novelText)))
      q.processAllAvailable()
      assert(admittedIds() == Set(900001L, 900002L, 910002L, 920002L),
        s"post-compaction admits wrong: ${admittedIds()}")
      assert(stateRowsTotal(q) == 0, "noveltyGate must not hold state")
    } finally q.stop()

    // the scrub side of the same handshake: a batch scrubbed after
    // the flip excises the sealed day-2 spans a pre-flip batch kept
    val scrubOut = java.nio.file.Files
      .createTempDirectory("graft-handshake-scrub").toString + "/scrubbed"
    val scrubCk = java.nio.file.Files
      .createTempDirectory("graft-handshake-sck").toString
    val in2 = MemoryStream[(Long, String)]
    val q2 = CorpusStream.phraseScrub(
      in2.toDF().toDF("doc_id", "text"), idxPath, scrubOut, scrubCk)
    try {
      in2.addData(Seq((930001L, knownText))); q2.processAllAvailable()
      val post = spark.read.parquet(scrubOut)
        .select($"doc_id", $"n_removed").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every window of the sealed text is bank-held: full excision
      assert(post(930001L) > 0, "refreshed bank scrubbed nothing")
    } finally q2.stop()
  }

  test("decontamGate: stream admits == batch bank screen; generation pinned under concurrent release; stateless") {
    import graft.queries.PipelineOps
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // seal the fixture suite as the bank (q125's split), stream the
    // corpus through the front-door screen
    val docs = Tables.documents(spark, sf)
    val eval = docs.filter(col("doc_id") % 97 === 0).select($"doc_id", $"text")
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bank = java.nio.file.Files
      .createTempDirectory("graft-decontam-bank").toString
    PipelineOps.writeEvalBank(eval, bank)

    val corpusRows = corpus.select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect().toIndexedSeq
    val flagged = PipelineOps
      .decontamServed(corpus.select($"doc_id", $"text"), bank)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.nonEmpty && flagged.size < corpusRows.length,
      "screen fixture vacuous")
    val expected = corpusRows.map(_._1).toSet -- flagged

    val (b1, b2) = corpusRows.splitAt(corpusRows.length / 2)
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-decontam-out").toString + "/admitted"
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-decontam-ck").toString
    val in = MemoryStream[(Long, String, String)]
    val q = CorpusStream.decontamGate(
      in.toDF().toDF("doc_id", "lang", "text"), bank, outDir, ckDir)
    try {
      in.addData(b1); q.processAllAvailable()
      // CONCURRENT RELEASE between batches: append a suite containing
      // a to-be-admitted doc's verbatim text — the new HEAD would flag
      // it, so the stream's verdict proves the construction-time pin
      val victim = b2.find(r => expected(r._1)).get
      PipelineOps.appendEvalBank(
        Seq((9001L, victim._3)).toDF("doc_id", "text"), bank)
      val headFlagged = PipelineOps
        .decontamServed(corpus.select($"doc_id", $"text"), bank)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(headFlagged.contains(victim._1),
        "release fixture vacuous: the new head does not flag the victim")
      in.addData(b2); q.processAllAvailable()
      val admitted = spark.read.parquet(outDir)
      assert(admitted.columns.toSeq == Seq("doc_id", "lang", "text"),
        "the gate must pass the batch schema through")
      val got = admitted.select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(got == expected,
        s"stream screen diverges from the pinned-generation batch gate; " +
          s"only-stream=${(got -- expected).take(3)} " +
          s"only-batch=${(expected -- got).take(3)}")
      assert(stateRowsTotal(q) == 0, "decontamGate must not hold state")
      assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark),
        "decontamGate leaked cached frames across batches")
    } finally q.stop()
  }

  test("fullGate: EVERY optional stage composed — stream admitted set == batch pipeline kept set, scrubbed text identical") {
    import graft.queries.{CorpusPipeline, DedupOps, PipelineOps, TextOps}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.catalog.clearCache()

    // make the BATCH-GLOBAL stages no-ops so the stateless stream can
    // match the full pipeline exactly: drop every exact-dup family and
    // every near-dup family member from the feed (near-dup pairs of a
    // subset are a subset of the superset's pairs, so the pruned feed
    // is pair-free by construction)
    val docs = Tables.documents(spark, sf)
    val dupTexts = docs.groupBy($"text").count()
      .filter($"count" > 1).select($"text")
    val noExact = docs.join(dupTexts, Seq("text"), "left_anti")
    val ndIds = DedupOps.neardupPairs(
      noExact.select($"doc_id", $"text"),
      CorpusPipeline.Config().neardupThreshold)
      .select($"doc_a".as("doc_id"))
      .unionByName(DedupOps.neardupPairs(
        noExact.select($"doc_id", $"text"),
        CorpusPipeline.Config().neardupThreshold)
        .select($"doc_b".as("doc_id")))
      .distinct().collect().map(_.getLong(0)).toSet
    spark.catalog.clearCache() // neardupPairs persists: test-owned
    // q125's suite split: the eval half seals the bank, the rest feeds
    val feed = noExact
      .filter(!$"doc_id".isInCollection(
        if (ndIds.isEmpty) Seq(-1L) else ndIds.toSeq))
      .filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", $"lang", $"source", $"text")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toIndexedSeq.sortBy(_._1)
    assert(feed.size > 100, s"fixture vacuous after pruning: ${feed.size}")

    // seal EVERY optional artifact: gate model, LM model, eval bank.
    // The gate store carries the q68 fixed weights instead of a fresh
    // distill: on this fixture the q53 teacher keeps a 26% minority,
    // so the distill's POCKET is legitimately the all-negative model
    // (the q111-documented non-separable outcome) — which would zero
    // the pipeline and make every downstream stage vacuous. The
    // serving path (weights/gen=N + manifest + gateWeightsAt) is
    // byte-identical either way; ModelStoreSpec pins the trained
    // store ≡ loaded-weight filter separately.
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val gateP = tmp("graft-full-gate-model")
    val lmP = tmp("graft-full-lm-model")
    val bankP = tmp("graft-full-bank")
    (0 until TextOps.HashDim).map(f => (f, TextOps.weightComponent(f)))
      .toDF("feature", "weight").coalesce(1)
      .write.mode("overwrite").parquet(s"$gateP/weights/gen=1")
    graft.queries.GenerationManifest.commit(gateP, 1L, 1L)
    TextOps.writeLmModel(docs, lmP)
    PipelineOps.writeEvalBank(
      docs.filter($"doc_id" % 97 === 0).select($"doc_id", $"text"), bankP)

    // self-calibrating band: 10th/90th pct of the served mean bigram
    // cost over the SURVIVORS of the earlier gates (the band stage's
    // actual input — percentiles of the raw feed can sit entirely
    // inside the survivors' range and never bite)
    val feedDf = feed.toDF("doc_id", "lang", "source", "text")
    val cfg0 = CorpusPipeline.Config(
      modelGate = true, gateModelPath = Some(gateP))
    val bandInput = feedDf
      .filter($"lang".isInCollection(cfg0.keepLangs.toSeq))
      .filter(org.apache.spark.sql.functions.size(
        TextOps.toks($"text")) >= cfg0.minTokens)
      .filter(CorpusPipeline.gateScoreColumn(spark, cfg0) >= 0)
    val means = TextOps.lmScoreFrame(bandInput, lmP).collect()
      .map(r => r.getAs[Long]("xent_e5nats").toDouble /
        r.getAs[Long]("n_bigrams")).sorted
    assert(means.length > 50, s"band input vacuous: ${means.length} docs")
    val lo = math.ceil(means(means.length / 10)).toLong
    val hi = math.floor(means(means.length * 9 / 10)).toLong
    assert(lo <= hi, s"degenerate band [$lo, $hi]")

    val cfg = CorpusPipeline.Config(
      modelGate = true, gateModelPath = Some(gateP),
      perplexityBand = Some((lo, hi)), lmModelPath = Some(lmP),
      evalBankPath = Some(bankP),
      piiScrub = true)

    // --- the batch truth: composed yield boundaries + kept rows ------
    val yld = CorpusPipeline.yieldReport(feedDf, cfg).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(yld.map(_._1).toSeq == Seq("01_exact", "02_lang", "05_floor",
      "06_model", "07_perplexity", "08_decontam", "09_neardup",
      "10_rebalance", "11_pii"), s"stage set: ${yld.map(_._1).toSeq}")
    val drops = yld.map(t => t._1 -> t._3).toMap
    assert(drops("01_exact") == 0 && drops("09_neardup") == 0,
      s"feed pruning failed — batch-global stages bit: $drops")
    assert(drops("06_model") > 0, "served gate model did not bite")
    assert(drops("07_perplexity") > 0, "band did not bite")
    assert(drops("08_decontam") > 0, "bank screen did not bite")
    assert(drops("10_rebalance") > 0, "stratified keep did not bite")
    assert(drops("11_pii") == 0, "the scrub must drop nothing")
    val want = CorpusPipeline.withPrepared(feedDf, cfg)(
      _.select($"doc_id", $"lang", $"source", $"text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3))).toSet)
    assert(want.nonEmpty, "batch pipeline kept nothing")

    // --- the stream: same rows, arbitrary chunking, one composed sink
    val outDir = tmp("graft-full-gate-out") + "/admitted"
    val ckDir = tmp("graft-full-gate-ck")
    val in = MemoryStream[(Long, String, String, String)]
    val q = CorpusStream.fullGate(
      in.toDF().toDF("doc_id", "lang", "source", "text"), cfg, outDir, ckDir)
    try {
      feed.grouped((feed.size + 2) / 3).foreach { b =>
        in.addData(b); q.processAllAvailable()
      }
      val admitted = spark.read.parquet(outDir)
      assert(admitted.columns.toSeq ==
        Seq("doc_id", "lang", "source", "text"),
        "the composed sink must pass the batch schema through")
      val got = admitted.collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3))).toSet
      // kept set AND text (scrubbed, stage-ordered) identical — the
      // composition is exactly where ordering bugs would hide, and
      // this pins the whole chain, not each stage alone
      assert(got == want,
        s"composed stream diverges from the composed batch pipeline; " +
          s"only-stream=${(got -- want).map(_._1).take(3)} " +
          s"only-batch=${(want -- got).map(_._1).take(3)}")
      assert(stateRowsTotal(q) == 0, "fullGate must not hold state")
    } finally q.stop()
    // mixture rates are batch-derived: the composed sink refuses them
    intercept[IllegalArgumentException] {
      CorpusStream.fullGate(in.toDF().toDF("doc_id", "lang", "source", "text"),
        cfg.copy(mixWeights = Some(PipelineOps.MixWeights)),
        outDir + "2", ckDir + "2")
    }
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark),
      "fullGate leaked cached frames")
  }

  test("gate chain with piiScrub: admitted rows carry scrubbed text; schema preserved") {
    import graft.queries.{CorpusPipeline, TextOps}
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "mail bob@host.org " + (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "xx", "dropped lang bob@host.org one two three four five"),
      (3L, "en", "too short")
    ).toDF("doc_id", "lang", "text")
    val got = CorpusStream.gate(docs,
      CorpusPipeline.Config(piiScrub = true)).collect()
    // admission first (lang gate, token floor), scrub second — and the
    // scrub is a schema-preserving projection (counters dropped)
    assert(got.map(_.getLong(0)).toSet == Set(1L))
    assert(got.head.schema.fieldNames.toSeq == Seq("doc_id", "lang", "text"))
    val expected = TextOps.piiScrub(docs).filter($"doc_id" === 1L)
      .select($"text").head().getString(0)
    assert(got.head.getString(2) == expected)
    assert(got.head.getString(2).contains("[EMAIL]"))
  }

  test("piiScrub applies to a stream unchanged: stream rows == batch scrub; stateless") {
    import graft.queries.TextOps
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // planted PII rides a stream through the SAME narrow projection the
    // batch op runs — no wrapper needed, which is the point: the scrub
    // is a stage any CorpusStream pipeline can insert per micro-batch
    val rows = Seq(
      (1L, "mail bob@host.org from 127.0.0.1 tel 555-123-9876"),
      (2L, "server at 10.0.0.1 rebooted"),
      (3L, "plain words only"),
      (4L, "call +1 (555) 123-4567 now"))
    val expected = TextOps.piiScrub(rows.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4))).toSet
    assert(expected.exists(t => t._3 + t._4 + t._5 > 0), "vacuous fixture")

    val in = MemoryStream[(Long, String)]
    val q = TextOps.piiScrub(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pii_stream")
      .outputMode("append").start()
    try {
      in.addData(rows.take(2)); q.processAllAvailable()
      in.addData(rows.drop(2)); q.processAllAvailable()
      val got = spark.table("pii_stream").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
          r.getInt(4))).toSet
      assert(got == expected, s"stream scrub diverges: $got vs $expected")
      assert(stateRowsTotal(q) == 0, "piiScrub must not hold state")
    } finally q.stop()
  }

  test("fullGate with the rewrite stages (r20): phrase + passage scrubs and the base screen composed — stream == batch pipeline kept set on the delta") {
    import graft.queries.{CorpusPipeline, DedupOps, GenerationManifest, PipelineOps, TextOps}
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{broadcast, col, collect_set, count, explode, expr, lit, size, split}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.catalog.clearCache()

    // exciseTokens ABOVE passageTokens: a sealed 16-token chunk holds
    // no 24-token window, so the passage stage sees work the phrase
    // stage did not already excise (with l < p the sliding windows
    // inside every shared chunk would be eaten first)
    val l = 24
    val p = CorpusPipeline.Config().passageTokens // 16

    // ---- fixture: the corpus-global stages' divergence is made
    // vacuous BY CONSTRUCTION (the sibling everything-on spec's
    // method, extended to the rewrite stages): exact-dup families
    // pruned globally; delta ids all ABOVE the base's so batch
    // keep-first rules resolve to "first occurrences live in the
    // sealed base"; delta-internal window/chunk duplication and
    // delta-delta near-dup pairs pruned (those are what only a
    // batch-global pass can see)
    val docsAll = Tables.documents(spark, sf)
    val dupTexts = docsAll.groupBy($"text").count()
      .filter($"count" > 1).select($"text")
    val noExact = docsAll.join(dupTexts, Seq("text"), "left_anti")
    val eval = noExact.filter($"doc_id" % 97 === 0).select($"doc_id", $"text")
    val rest = noExact.filter($"doc_id" % 97 =!= 0)
    val ids = rest.select($"doc_id").collect().map(_.getLong(0)).sorted
    val mid = ids(ids.length / 2)
    val baseRaw = rest.filter($"doc_id" < mid)
    val deltaRaw = rest.filter($"doc_id" >= mid)

    def tmp(s: String) = java.nio.file.Files.createTempDirectory(s).toString
    val gateP = tmp("graft-rw-gate"); val lmP = tmp("graft-rw-lm")
    val bankP = tmp("graft-rw-bank")
    (0 until TextOps.HashDim).map(f => (f, TextOps.weightComponent(f)))
      .toDF("feature", "weight").coalesce(1)
      .write.mode("overwrite").parquet(s"$gateP/weights/gen=1")
    GenerationManifest.commit(gateP, 1L, 1L)
    TextOps.writeLmModel(docsAll, lmP)
    PipelineOps.writeEvalBank(eval, bankP)

    val cfg = CorpusPipeline.Config(
      phraseExcise = true, exciseTokens = l,
      passageDedup = true, passageTokens = p,
      modelGate = true, gateModelPath = Some(gateP),
      // the band stage runs (served, pinned) but is calibrated wide —
      // its bite is the sibling spec's subject; here every slot in the
      // chain must be OCCUPIED so ordering bugs have nowhere to hide
      perplexityBand = Some((0L, 100000000L)),
      lmModelPath = Some(lmP),
      evalBankPath = Some(bankP),
      piiScrub = true)

    // ---- sealed base artifacts, built from exactly the text each
    // batch stage sees: phrase bank over the RAW lang-gated base
    // (stage 03's input), passage bank over the PHRASE-REWRITTEN base
    // (stage 04's input), dedup index over the stage-02..08 SURVIVORS
    // (stage 09's input)
    val langBase = baseRaw.filter($"lang".isInCollection(cfg.keepLangs.toSeq))
    val phraseP = tmp("graft-rw-phrase")
    DedupOps.writePhraseIndex(langBase.select($"doc_id", $"text"), phraseP, l)
    val rewrittenBase = DedupOps.exciseRewrite(langBase, l).localCheckpoint(true)
    val passageP = tmp("graft-rw-passage")
    DedupOps.writePassageBank(
      rewrittenBase.select($"doc_id", $"text"), passageP, p)
    var baseCur: DataFrame = DedupOps.passageRewrite(rewrittenBase, p)
    baseCur = baseCur.filter(size(TextOps.toks($"text")) >= cfg.minTokens)
    baseCur = baseCur.filter(CorpusPipeline.gateScoreColumn(spark, cfg) >= 0)
    baseCur = TextOps.perplexityGateServed(baseCur, 0L, 100000000L, lmP)
    val flaggedBase = PipelineOps
      .decontamServed(baseCur.select($"doc_id", $"text"), bankP)
      .select($"doc_id")
    val baseSurvivors = baseCur
      .join(broadcast(flaggedBase), Seq("doc_id"), "left_anti")
      .select($"doc_id", $"text").localCheckpoint(true)
    val dedupP = tmp("graft-rw-dedup")
    DedupOps.writeDedupIndex(baseSurvivors, dedupP, cfg.lshBands, cfg.lshRows)

    // ---- plants: one deterministic bite per new stage, sourced from
    // long UNEXCISED base survivors (post-rewrite text == raw text, so
    // their runs are in every bank)
    val rawById = langBase.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pickPool = baseSurvivors.collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, t) =>
        rawById.get(id).contains(t) && t.split(" ").length >= 80 }
    assert(pickPool.length >= 3,
      s"fixture vacuous: ${pickPool.length} long unexcised base survivors")
    val Seq(pb1, pb2, pb3) = pickPool.take(3).toSeq
    val maxId = ids.max
    // P1 — phrase bite: an (l+2)-token base run + unique filler; the
    // run is excised, the filler survives the floor
    val t1 = pb1._2.split(" ").toSeq
    val plant1 = (maxId + 1, "en", "plant",
      (t1.take(l + 2) ++ (1 to 12).map(i => s"zqfill1x$i")).mkString(" "))
    // P2 — passage bite: two NON-ADJACENT sealed chunks (no intact
    // l-token run, so the phrase stage passes it untouched) + filler
    val t2 = pb2._2.split(" ").toSeq
    val plant2 = (maxId + 2, "en", "plant",
      (t2.slice(0, p) ++ t2.slice(2 * p, 3 * p) ++
        (1 to p).map(i => s"zqfill2x$i")).mkString(" "))
    // P3 — base-screen bite: pairwise-swapped 16-token blocks behind
    // an 8-token prefix — 3-shingle Jaccard vs the original stays
    // high, but no 24-token run survives intact (phrase stage blind)
    // and the 16-chunks are misaligned by the prefix (passage blind)
    val t3 = pb3._2.split(" ").toSeq
    val swapped = t3.drop(8).grouped(16).toSeq.grouped(2)
      .flatMap(g => if (g.length == 2) Seq(g(1), g(0)) else g)
      .flatten.toSeq
    val plant3 = (maxId + 3, "en", "plant",
      (t3.take(8) ++ swapped).mkString(" "))
    // each plant's target stage provably bites on it
    val s1 = DedupOps.scrubAgainst(spark, phraseP,
      Seq((plant1._1, plant1._4)).toDF("doc_id", "text"), l,
      selfExclude = false).collect().head
    assert(s1.getAs[Long]("n_removed") > 0, "phrase-bite fixture vacuous")
    val s2pre = DedupOps.scrubAgainst(spark, phraseP,
      Seq((plant2._1, plant2._4)).toDF("doc_id", "text"), l,
      selfExclude = false).collect().head
    assert(s2pre.getAs[Long]("n_removed") == 0,
      "passage plant must pass the phrase stage untouched")
    val s2 = DedupOps.passageScrubAgainst(spark, passageP,
      Seq((plant2._1, plant2._4)).toDF("doc_id", "text"), p,
      selfExclude = false).select($"text").head().getString(0)
    assert(s2 == (1 to p).map(i => s"zqfill2x$i").mkString(" "),
      s"passage-bite fixture vacuous: '$s2'")
    val p3Flag = DedupOps.deltaScreen(spark, dedupP,
      Seq((plant3._1, plant3._4)).toDF("doc_id", "text"),
      cfg.neardupThreshold, cfg.lshBands, cfg.lshRows).collect()
    spark.catalog.clearCache() // deltaScreen persists: test-owned
    assert(p3Flag.nonEmpty,
      "base-screen fixture vacuous: swapped-block plant not flagged")

    // ---- prune the delta to the first-occurrences-in-base regime:
    // an l-window or p-chunk occurring MORE THAN ONCE within the delta
    // and NOT sealed in the base diverges (batch keep-first excises
    // the later copy, the per-doc bank scrub keeps both) — as do
    // delta-delta near-dup pairs (batch stage 09 drops the higher id,
    // the base screen sees only the sealed corpus)
    def dupHolders(wins: DataFrame, baseWins: DataFrame): Set[Long] =
      wins.join(baseWins.select($"w").distinct(), Seq("w"), "left_anti")
        .groupBy($"w")
        .agg(count(lit(1)).as("c"), collect_set($"doc_id").as("ds"))
        .filter($"c" > 1).select(explode($"ds").as("doc_id"))
        .distinct().collect().map(_.getLong(0)).toSet
    def winsOf(df: DataFrame, n: Int): DataFrame =
      df.select($"doc_id", split($"text", " ").as("t"))
        .filter(size($"t") >= n)
        .select($"doc_id", explode(expr(
          s"transform(sequence(0, size(t) - $n), i -> array_join(slice(t, i + 1, $n), ' '))")).as("w"))
    def chunksOf(df: DataFrame): DataFrame =
      df.select($"doc_id", split($"text", " ").as("t"))
        .select($"doc_id", explode(expr(
          s"transform(sequence(0, cast((size(t) + ${p - 1}) div $p as int) - 1), i -> array_join(slice(t, i * $p + 1, $p), ' '))")).as("w"))
    val winPrune = dupHolders(
      winsOf(deltaRaw.select($"doc_id", $"text"), l),
      winsOf(langBase.select($"doc_id", $"text"), l))
    val deltaA = deltaRaw.filter(!$"doc_id".isInCollection(
      if (winPrune.isEmpty) Seq(-1L) else winPrune.toSeq))
    val scrubbedA = DedupOps.scrubAgainst(spark, phraseP,
      deltaA.select($"doc_id", $"text"), l, selfExclude = false)
      .filter($"clean_text" =!= "")
      .select($"doc_id", $"clean_text".as("text"))
    val chunkPrune = dupHolders(chunksOf(scrubbedA),
      chunksOf(rewrittenBase.select($"doc_id", $"text")))
    val deltaB = deltaA.filter(!$"doc_id".isInCollection(
      if (chunkPrune.isEmpty) Seq(-1L) else chunkPrune.toSeq))
    val rewrittenB = DedupOps.passageScrubAgainst(spark, passageP,
      scrubbedA.join(deltaB.select($"doc_id"), Seq("doc_id")), p,
      selfExclude = false)
    val ndIds = DedupOps.neardupPairs(rewrittenB, cfg.neardupThreshold,
      cfg.lshBands, cfg.lshRows)
      .select(explode(org.apache.spark.sql.functions.array(
        $"doc_a", $"doc_b")).as("doc_id"))
      .distinct().collect().map(_.getLong(0)).toSet
    spark.catalog.clearCache() // neardupPairs persists: test-owned
    val feed = deltaB.filter(!$"doc_id".isInCollection(
      if (ndIds.isEmpty) Seq(-1L) else ndIds.toSeq))
      .select($"doc_id", $"lang", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toIndexedSeq.sortBy(_._1) ++ Seq(plant1, plant2, plant3)
    assert(feed.size > 50, s"fixture vacuous after pruning: ${feed.size}")

    // ---- batch truth: the full pipeline over base ∪ delta, kept set
    // restricted to the delta
    val corpusDf = baseRaw.select($"doc_id", $"lang", $"source", $"text")
      .unionByName(feed.toDF("doc_id", "lang", "source", "text"))
    val want = CorpusPipeline.withPrepared(corpusDf, cfg)(
      _.filter($"doc_id" >= mid)
        .select($"doc_id", $"lang", $"source", $"text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3))).toSet)
    assert(want.nonEmpty, "batch pipeline kept no delta docs")

    // ---- the stream: same delta rows, every stage on, banks pinned
    val outDir = tmp("graft-rw-out") + "/admitted"
    val ckDir = tmp("graft-rw-ck")
    val in = MemoryStream[(Long, String, String, String)]
    val q = CorpusStream.fullGate(
      in.toDF().toDF("doc_id", "lang", "source", "text"), cfg,
      outDir, ckDir,
      phraseIndexPath = Some(phraseP),
      passageBankPath = Some(passageP),
      dedupIndexPath = Some(dedupP))
    try {
      feed.grouped((feed.size + 2) / 3).foreach { b =>
        in.addData(b); q.processAllAvailable()
      }
      val admitted = spark.read.parquet(outDir)
      assert(admitted.columns.toSeq ==
        Seq("doc_id", "lang", "source", "text"),
        "the composed sink must pass the batch schema through")
      val got = admitted.collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3))).toSet
      assert(got == want,
        s"composed stream (rewrites on) diverges from the batch " +
          s"pipeline; only-stream=${(got -- want).map(_._1).take(3)} " +
          s"only-batch=${(want -- got).map(_._1).take(3)}")
      // the rewrite chain acted inside the composition, not just in
      // the pre-checks: some admitted doc's text differs from its feed
      // text by MORE than the pii scrub (the phrase/passage stages cut
      // tokens; the scrub only substitutes placeholders)
      val rawText = feed.map(r => r._1 -> r._4).toMap
      assert(got.exists { case (id, _, _, t) =>
        t.split(" ").length < rawText(id).split(" ").length },
        "no admitted doc lost tokens — rewrite stages vacuous in composition")
      assert(stateRowsTotal(q) == 0, "fullGate must not hold state")
    } finally q.stop()
    // a configured rewrite without its sealed artifact still refuses
    intercept[IllegalArgumentException] {
      CorpusStream.fullGate(
        in.toDF().toDF("doc_id", "lang", "source", "text"), cfg,
        outDir + "2", ckDir + "2")
    }
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark),
      "composed fullGate leaked cached frames")
  }
}
