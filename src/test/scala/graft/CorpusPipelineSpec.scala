package graft

import graft.queries.{CorpusPipeline, DedupOps, TextOps}
import org.apache.spark.sql.functions._

/** Integration spec for the composed training-data pipeline: every
  * stage's contract must HOLD ON THE OUTPUT (closure properties), not
  * just inside its own unit test — re-running the dedup machinery on
  * the prepared corpus must find nothing left to do.
  */
class CorpusPipelineSpec extends SparkSuite {

  test("prepared corpus satisfies every stage's closure property") {
    import spark.implicits._
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    val cfg = CorpusPipeline.Config()
    val out = CorpusPipeline.withPrepared(docs, cfg)(_.collect())

    // shrank, non-empty, unique ids drawn from the input
    val inIds = docs.select($"doc_id").collect().map(_.getLong(0)).toSet
    val ids = out.map(_.getLong(0))
    assert(out.nonEmpty && out.length < inIds.size)
    assert(ids.distinct.length == ids.length)
    assert(ids.forall(inIds))

    // closure 1: no identical texts survive
    val texts = out.map(_.getString(3))
    assert(texts.distinct.length == texts.length, "exact dups left")

    // closure 2: gates hold row by row
    out.foreach { r =>
      assert(cfg.keepLangs(r.getString(1)))
      val nToks = r.getString(3).toLowerCase.split(" ").count(_.nonEmpty)
      assert(nToks >= cfg.minTokens)
    }

    // closure 3: re-running near-dup detection on the OUTPUT finds
    // nothing — the defining property of a deduplicated corpus
    val outDf = out.map(r => (r.getLong(0), r.getString(3)))
      .toSeq.toDF("doc_id", "text")
    assert(DedupOps.neardupPairs(outDf, cfg.neardupThreshold).count() == 0L,
      "near-dup pairs survived the pipeline")
    spark.catalog.clearCache() // neardupPairs persist above: test-owned

    // closure 4: keyword arrays are rank-ordered tf-idf top terms of
    // the doc — non-empty (every doc has >= minTokens tokens), bounded,
    // and drawn from the doc's own token set
    out.foreach { r =>
      val kws = r.getSeq[String](4)
      assert(kws.nonEmpty && kws.length <= cfg.topKeywords)
      val toks = r.getString(3).toLowerCase.split(" ").filter(_.nonEmpty).toSet
      kws.foreach(k => assert(toks(k), s"keyword $k not in doc"))
    }

    // determinism: a rerun prepares the identical corpus
    val again = CorpusPipeline.withPrepared(docs, cfg)(_.collect())
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)

    // loan released the pipeline's internal cache
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
  }

  test("model gate keeps exactly the q68-positive survivors") {
    import spark.implicits._
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    val keepByModel = TextOps.q68LinearScore(spark, sf).collect()
      .filter(_.getInt(3) == 1).map(_.getLong(0)).toSet

    // exactness, with the near-dup stage neutralized (threshold 1.0 —
    // post-exact-dedup docs can't reach Jaccard 1): the gated run is
    // precisely the ungated run minus the q68 keep=0 docs
    val iso = CorpusPipeline.Config(
      stratRates = Seq.empty, neardupThreshold = 1.0)
    val without = CorpusPipeline.withPrepared(docs, iso)(
      _.select($"doc_id").collect().map(_.getLong(0)).toSet)
    val withGate = CorpusPipeline.withPrepared(
      docs, iso.copy(modelGate = true))(
      _.select($"doc_id").collect().map(_.getLong(0)).toSet)
    assert(withGate == without.filter(keepByModel),
      "model gate disagrees with q68's keep flag")
    assert(withGate.size < without.size, "gate didn't bite")

    // under the FULL default pipeline the interaction with later
    // stages may reshape the near-dup pair set (dropping a pair's low
    // id can resurrect its partner) — but no model-negative doc can
    // ever ship
    val full = CorpusPipeline.withPrepared(
      docs, CorpusPipeline.Config(modelGate = true))(
      _.select($"doc_id").collect().map(_.getLong(0)).toSet)
    assert(full.forall(keepByModel),
      "a model-negative doc survived the gated pipeline")
  }

  test("perplexity band gate keeps exactly the in-band survivors, both tails cut") {
    import spark.implicits._
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    val lo = 330000L; val hi = 345000L

    // isolate the gate: neutralize near-dup and rebalance so the
    // pipeline output IS the gate stage's input (the model-gate spec's
    // pattern)
    val iso = CorpusPipeline.Config(
      stratRates = Seq.empty, neardupThreshold = 1.0)
    val without = CorpusPipeline.withPrepared(docs, iso)(
      _.select($"doc_id").collect().map(_.getLong(0)).toSet)

    // reference: q79's scores over the reconstructed gate input (the
    // MODEL itself is pinned against a driver-side recomputation in
    // TextOpsSpec; this spec pins the pipeline PLUMBING — placement,
    // join, integer band arithmetic, cache lifecycle)
    val gateInput = docs.filter($"doc_id".isInCollection(without))
    val (scores, handles) = TextOps.bigramXentBuild(gateInput, 10)
    val means = scores.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    handles.foreach(_.unpersist())
    val inBand = without.filter { id =>
      val (n, x) = means(id); x >= lo * n && x <= hi * n
    }
    assert(inBand.size < without.size, "band didn't bite")
    val dropped = without -- inBand
    assert(dropped.exists(id => { val (n, x) = means(id); x < lo * n }) &&
      dropped.exists(id => { val (n, x) = means(id); x > hi * n }),
      "band should cut BOTH tails on the fixture")

    val withGate = CorpusPipeline.withPrepared(
      docs, iso.copy(perplexityBand = Some((lo, hi))))(
      _.select($"doc_id").collect().map(_.getLong(0)).toSet)
    assert(withGate == inBand, "perplexity gate disagrees with q79's scores")

    // lmModelPath (round 16): a model self-trained on the gate's input
    // and served back must reproduce the self-training stage bit for
    // bit — the run now pins ONE LM generation instead of retraining
    val modelPath = java.nio.file.Files
      .createTempDirectory("graft-pipe-lm").toString
    TextOps.writeLmModel(gateInput, modelPath, perMille = 10)
    val served = CorpusPipeline.withPrepared(
      docs, iso.copy(perplexityBand = Some((lo, hi)),
        lmModelPath = Some(modelPath)))(
      _.select($"doc_id").collect().map(_.getLong(0)).toSet)
    assert(served == inBand,
      "lmModelPath band diverged from the self-training stage")
    // the misconfiguration fails at construction, not silently
    intercept[IllegalArgumentException] {
      CorpusPipeline.Config(lmModelPath = Some(modelPath))
    }
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
  }

  test("phrase-excise stage rewrites every surviving doc by the q96 rule") {
    import spark.implicits._
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    val cfg = CorpusPipeline.Config(phraseExcise = true)
    val out = CorpusPipeline.withPrepared(docs, cfg)(_.collect())
    assert(out.nonEmpty)

    // driver-side recount of stages 1-2a (exact dedup -> lang gate ->
    // keep-first excision): every surviving doc's text must equal its
    // q96 rewrite — later stages only DROP docs, never edit text
    val rows = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val exact = rows.groupBy(_._3).values.map(_.minBy(_._1)).toSeq
    val langGated = exact.filter(r => cfg.keepLangs(r._2)).sortBy(_._1)
    val l = cfg.exciseTokens
    val wins = langGated.flatMap { case (id, _, t) =>
      val toks = t.split(" ", -1).toSeq
      (0 to toks.size - l).map(i => (id, i, toks.slice(i, i + l).mkString(" ")))
    }
    val byGram = wins.groupBy(_._3)
    val rewritten = langGated.map { case (id, _, t) =>
      val toks = t.split(" ", -1).toSeq
      val covered = wins.filter(_._1 == id).flatMap { case (_, p, g) =>
        val occ = byGram(g)
        val first = occ.minBy(o => (o._1, o._2))
        if (occ.size >= 2 && (first._1, first._2) != ((id, p))) p until p + l
        else Nil
      }.toSet
      id -> toks.indices.filterNot(covered).map(toks).mkString(" ")
    }.toMap
    out.foreach { r =>
      assert(rewritten(r.getLong(0)) == r.getString(3),
        s"doc ${r.getLong(0)} text is not its q96 rewrite")
    }
    // non-vacuous: the excision changed some lang-gated doc
    assert(langGated.exists { case (id, _, t) => rewritten(id) != t })
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
  }

  test("passage stage rewrites every surviving doc by the q56 rule") {
    import spark.implicits._
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    val cfg = CorpusPipeline.Config(passageDedup = true)
    val out = CorpusPipeline.withPrepared(docs, cfg)(_.collect())
    assert(out.nonEmpty)

    // driver-side recount of stages 1–2 (exact dedup → lang gate →
    // passage rewrite): every surviving doc's text must equal its
    // expected rewrite — later stages only DROP docs, never edit text
    val rows = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val exact = rows.groupBy(_._3).values.map(_.minBy(_._1)).toSeq
    val langGated = exact.filter(r => cfg.keepLangs(r._2)).sortBy(_._1)
    val p = cfg.passageTokens
    val passages = langGated.flatMap { case (id, _, t) =>
      t.split(" ", -1).toSeq.grouped(p).zipWithIndex.map {
        case (c, i) => (id, i, c.mkString(" ")) }
    }
    val firstOf = passages.groupBy(_._3).view
      .mapValues(_.minBy(x => (x._1, x._2))).toMap
    val rewritten = passages.groupBy(_._1).view.mapValues { ps =>
      ps.filter(x => firstOf(x._3) == x).sortBy(_._2).map(_._3).mkString(" ")
    }.toMap
    out.foreach { r =>
      assert(rewritten(r.getLong(0)) == r.getString(3),
        s"doc ${r.getLong(0)} text is not its q56 rewrite")
    }
    // the stage is non-vacuous on the fixture: the rewrite changed
    // some lang-gated doc before the token floor
    assert(langGated.exists { case (id, _, t) => rewritten(id) != t })
    // gates still hold on the REWRITTEN text
    out.foreach { r =>
      val nToks = r.getString(3).toLowerCase.split(" ").count(_.nonEmpty)
      assert(nToks >= cfg.minTokens)
    }
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
  }

  test("write terminal: lang-partitioned parquet round-trips and prunes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corpus-out").toString
    val docs = Tables.documents(spark, sf)
    CorpusPipeline.withPrepared(docs) { prepared =>
      val expected = prepared.collect()
      CorpusPipeline.write(prepared, dir)
      // partition directories per surviving language
      val langs = expected.map(_.getString(1)).distinct.sorted
      langs.foreach { l =>
        assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, s"lang=$l")),
          s"missing partition dir for $l")
      }
      // round trip: same rows (partition column survives read-back)
      val back = spark.read.parquet(dir)
        .select($"doc_id", $"lang", $"source", $"text", $"keywords")
        .orderBy($"doc_id").collect()
      assert(back.map(_.toString).toSeq == expected.map(_.toString).toSeq)
      // a per-language read is PARTITION-pruned, not a filter over all files
      val pruned = spark.read.parquet(dir).filter($"lang" === langs.head)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") &&
        plan.contains("lang"), s"no partition pruning:\n$plan")
    }
  }

  test("stratified stage downsamples inside the pipeline like q41 standalone") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    // rates that keep nothing for en: the pipeline must emit no en docs
    val cfg = CorpusPipeline.Config(stratRates = Seq("en" -> 0))
    CorpusPipeline.withPrepared(docs, cfg) { df =>
      val langs = df.select($"lang").distinct()
        .collect().map(_.getString(0)).toSet
      assert(!langs("en"), "en docs survived a 0-per-mille rate")
      assert(langs.nonEmpty)
    }
  }

  test("mixture rebalance stage: kept set closes over the q64 derived-rate arithmetic") {
    import spark.implicits._
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    // reference: the SAME pipeline with the rebalance stage open (keep
    // everything) — its output is exactly the survivor set the derived
    // rates are trained on, so the closure property is checkable from
    // the outside
    val openCfg = CorpusPipeline.Config(
      stratRates = Seq.empty,
      defaultPerMille = graft.queries.RelationalOps.PerMille)
    val survivors = CorpusPipeline.withPrepared(docs, openCfg)(
      _.select($"doc_id", $"source", $"text").collect())

    // driver-side q64 arithmetic over the survivor histogram
    val weights = graft.queries.PipelineOps.MixWeights.toMap
    val defaultW = graft.queries.PipelineOps.DefaultMixWeight
    val nBySource = survivors.groupBy(_.getString(1)).view.mapValues(_.size.toLong).toMap
    val w = nBySource.keys.map(s => s -> weights.getOrElse(s, defaultW).toLong).toMap
    val wSum = w.values.sum
    val tMax = nBySource.map { case (s, n) => n * wSum / w(s) }.min
    val ratePm = nBySource.map { case (s, n) =>
      s -> math.min(1000L, tMax * w(s) * 1000 / (wSum * n))
    }

    // expected kept ids: the content-hash predicate at those rates,
    // evaluated with Spark's own xxhash64 over the survivor rows
    val survDf = survivors.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq.toDF("doc_id", "source", "text")
    val hashed = survDf.withColumn("hb",
      graft.queries.RelationalOps.contentHashMod(graft.queries.RelationalOps.PerMille))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val expected = hashed.collect {
      case (id, src, hb) if hb < ratePm(src) => id
    }.toSet

    val mixCfg = CorpusPipeline.Config(
      mixWeights = Some(graft.queries.PipelineOps.MixWeights))
    CorpusPipeline.withPrepared(docs, mixCfg) { df =>
      val got = df.select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(got == expected,
        s"mixture stage kept ${got.size} ids, closure arithmetic says ${expected.size}")
      // composition sanity: the binding source keeps ~everything (the
      // double floor in T and rate can shave a few per-mille off the
      // exact 1000) and at least one tail source downsamples
      assert(ratePm.values.max >= 990L,
        s"no source near full keep: $ratePm")
      assert(ratePm.values.min < 1000L,
        s"no source downsampled — the stage was a no-op: $ratePm")
    }
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
  }

  test("keyword tagging reflects the FINAL corpus statistics, not the raw input") {
    import spark.implicits._
    // two near-identical docs + one distinct: the near-dup loser must
    // not contribute to document frequencies, or idf would be skewed
    val base = (0 until 30).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok7", "CHANGED")
    val docs = Seq(
      (1L, "en", "s", base),
      (2L, "en", "s", nearDup),
      (3L, "en", "s", "totally different words here now friend")
    ).toDF("doc_id", "lang", "source", "text")
    // sampling off (keep-all rates): this test isolates the df statistics
    val cfg = CorpusPipeline.Config(stratRates = Seq.empty)
    CorpusPipeline.withPrepared(docs, cfg) { df =>
      val got = df.collect()
      // doc 2 is the higher id of the verified near-dup pair -> dropped
      assert(got.map(_.getLong(0)).toSet == Set(1L, 3L))
      // with doc 2 gone, every term of doc 1 has df=1 over N=2 docs:
      // all tf-idf scores tie, so keywords are the alphabetically first
      // TopK tokens (the deterministic tie-break, post-rounding)
      val kw1 = got.find(_.getLong(0) == 1L).get.getSeq[String](4)
      val expected = base.split(" ").sorted.take(TextOps.TfidfTopK).toSeq
      assert(kw1 == expected, s"got $kw1, expected $expected")
    }
  }

  test("cluster mode keeps one representative per duplicate family") {
    import spark.implicits._
    spark.catalog.clearCache()
    // Hub-and-satellites: docs 1 and 3 each near-dup the hub 5 (Jaccard
    // 58/78 ≈ 0.74) but NOT each other (58/98 ≈ 0.59 < 0.6) — the
    // geometry where the two drop rules diverge. Doc 7 is unrelated.
    val common = (1 to 60).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, "en", "s", (1 to 20).map(i => s"a$i").mkString(" ") + " " + common),
      (3L, "en", "s", (1 to 20).map(i => s"b$i").mkString(" ") + " " + common),
      (5L, "en", "s", common),
      (7L, "en", "s", (1 to 30).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "lang", "source", "text")
    // pin the fixture's pair structure first, so a drop-rule failure
    // below is attributable
    val pairs = DedupOps.neardupPairs(docs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache() // neardupPairs persist: test-owned
    assert(pairs == Set((1L, 5L), (3L, 5L)))

    val noSampling = CorpusPipeline.Config(stratRates = Seq.empty)
    // pairwise (default): only the hub — the doc_b of both pairs — drops;
    // the satellites, linked only THROUGH it, both survive
    val pairwise = CorpusPipeline.withPrepared(docs, noSampling)(
      _.collect().map(_.getLong(0)).toSet)
    assert(pairwise == Set(1L, 3L, 7L))
    // cluster: {1,3,5} is one family -> its minimum alone survives
    val cluster = CorpusPipeline.withPrepared(
      docs, noSampling.copy(clusterNeardups = true))(
      _.collect().map(_.getLong(0)).toSet)
    assert(cluster == Set(1L, 7L))
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark),
      "cluster-mode loan leaked cached frames")

    // cluster mode SERVED from a sealed label index: same fixture, no
    // pair build / closure inside the pipeline — identical output when
    // no family bridge is gated away
    val idx = java.nio.file.Files
      .createTempDirectory("graft-pipeline-labels").toString
    DedupOps.writeLabelIndex(docs, idx)
    val servedCfg = noSampling.copy(
      clusterNeardups = true, labelIndexPath = Some(idx))
    val served = CorpusPipeline.withPrepared(docs, servedCfg)(
      _.collect().map(_.getLong(0)).toSet)
    assert(served == cluster, "served labels diverged from the recompute")

    // the DOCUMENTED semantic difference: gate the hub (5) away via its
    // language. The recomputing stage closes pairs over GATED docs only
    // — no hub, no pairs, both satellites survive. The sealed index
    // still families {1,3,5}, so keep-min among the gated survivors
    // keeps 1 and drops 3 (family identity does not depend on today's
    // gates — what a deployment wants from a sealed artifact).
    val gatedHub = docs.withColumn("lang",
      when(col("doc_id") === 5L, lit("xx")).otherwise(col("lang")))
    val recomputeGated = CorpusPipeline.withPrepared(
      gatedHub, noSampling.copy(clusterNeardups = true))(
      _.collect().map(_.getLong(0)).toSet)
    assert(recomputeGated == Set(1L, 3L, 7L))
    val idx2 = java.nio.file.Files
      .createTempDirectory("graft-pipeline-labels2").toString
    DedupOps.writeLabelIndex(gatedHub, idx2)
    val servedGated = CorpusPipeline.withPrepared(
      gatedHub, noSampling.copy(
        clusterNeardups = true, labelIndexPath = Some(idx2)))(
      _.collect().map(_.getLong(0)).toSet)
    assert(servedGated == Set(1L, 7L),
      "sealed-family keep-min must not depend on the gate set")
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark),
      "served-label mode leaked cached frames")
  }

  test("decontamination gate drops exactly the benchmark-overlapping docs") {
    import spark.implicits._
    spark.catalog.clearCache()
    val docs = Seq(
      (1L, "en", "s", "alpha beta gamma delta epsilon zeta"),
      (2L, "en", "s", (1 to 30).map(i => s"x$i").mkString(" ")),
      (3L, "en", "s", (1 to 30).map(i => s"y$i").mkString(" "))
    ).toDF("doc_id", "lang", "source", "text")
    // the eval doc shares the 4-gram "alpha beta gamma delta" with doc 1
    val evalDocs = Seq((100L, "question: alpha beta gamma delta ?"))
      .toDF("doc_id", "text")
    val cfg = CorpusPipeline.Config(stratRates = Seq.empty)
    val without = CorpusPipeline.withPrepared(docs, cfg)(
      _.collect().map(_.getLong(0)).toSet)
    assert(without == Set(1L, 2L, 3L))
    val decon = CorpusPipeline.withPrepared(docs, cfg, Some(evalDocs))(
      _.collect().map(_.getLong(0)).toSet)
    assert(decon == Set(2L, 3L))
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
    // the gate's anti join must not add a corpus-wide shuffle join:
    // the flagged-id side is broadcast, so the with-eval plan carries
    // exactly as many sort-merge joins as the without-eval plan
    def smjCount(ev: Option[org.apache.spark.sql.DataFrame]) = {
      val p = CorpusPipeline.prepare(docs, cfg, ev)
        .queryExecution.executedPlan.toString
      spark.catalog.clearCache()
      "SortMergeJoin".r.findAllIn(p).length
    }
    assert(smjCount(Some(evalDocs)) == smjCount(None),
      "decontamination gate planned a sort-merge join")
  }

  test("decontamination gate served from the sealed eval bank == the raw-suite gate; generation pinned per run") {
    import spark.implicits._
    spark.catalog.clearCache()
    val docs = Seq(
      (1L, "en", "s", "alpha beta gamma delta epsilon zeta"),
      (2L, "en", "s", (1 to 30).map(i => s"x$i").mkString(" ")),
      (3L, "en", "s", (1 to 30).map(i => s"y$i").mkString(" "))
    ).toDF("doc_id", "lang", "source", "text")
    val evalDocs = Seq((100L, "question: alpha beta gamma delta ?"))
      .toDF("doc_id", "text")
    val cfg = CorpusPipeline.Config(stratRates = Seq.empty)
    val raw = CorpusPipeline.withPrepared(docs, cfg, Some(evalDocs))(
      _.collect().map(_.getLong(0)).toSet)
    assert(raw == Set(2L, 3L))
    // the bank-served gate must keep EXACTLY the raw-suite gate's set
    // on the same suite (round-18 Config.evalBankPath)
    val bank = java.nio.file.Files
      .createTempDirectory("graft-pipe-eval-bank").toString
    graft.queries.PipelineOps.writeEvalBank(evalDocs, bank)
    val cfgBank = cfg.copy(evalBankPath = Some(bank))
    val served = CorpusPipeline.withPrepared(docs, cfgBank)(
      _.collect().map(_.getLong(0)).toSet)
    assert(served == raw, "bank-served gate diverged from the raw-suite gate")
    // two gram sources at once is ambiguous provenance — refused
    intercept[IllegalArgumentException] {
      CorpusPipeline.prepare(docs, cfgBank, Some(evalDocs))
    }
    // the bank generation pins at PLAN CONSTRUCTION (the lmModelPath
    // rollout rule): a benchmark release appended mid-run must not
    // change what an already-built plan drops — while a FRESH run sees
    // the new head
    val planned = CorpusPipeline.prepare(docs, cfgBank)
    graft.queries.PipelineOps.appendEvalBank(
      Seq((101L, (1 to 30).map(i => s"x$i").mkString(" ")))
        .toDF("doc_id", "text"),
      bank)
    assert(planned.collect().map(_.getLong(0)).toSet == raw,
      "a mid-run bank append changed a pinned plan's kept set")
    spark.catalog.clearCache() // prepare() is the caller-owned form
    val afterRelease = CorpusPipeline.withPrepared(docs, cfgBank)(
      _.collect().map(_.getLong(0)).toSet)
    assert(afterRelease == Set(3L),
      s"a fresh run must screen at the new bank head: $afterRelease")
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
  }

  test("pii scrub stage: schema preserved, q107 transform applied, nothing dropped, keywords tokenize scrubbed text") {
    import spark.implicits._
    spark.catalog.clearCache()
    val docs = Seq(
      (1L, "en", "s", "contact bob@example.com about alpha beta gamma delta"),
      (2L, "en", "s", "host 10.0.0.1 served alpha beta gamma epsilon zeta"),
      (3L, "en", "s", (1 to 30).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "lang", "source", "text")
    val cfg = CorpusPipeline.Config(stratRates = Seq.empty, piiScrub = true)
    val out = CorpusPipeline.withPrepared(docs, cfg)(_.collect())
    // schema contract: the documents shape survives, counters dropped
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "lang", "source", "text", "keywords"))
    // a rewrite, not a gate: nothing dropped
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // the text is EXACTLY the q107 transform of the survivors
    val expected = graft.queries.TextOps.piiScrub(docs)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(r.getString(3) == expected(r.getLong(0)),
        s"pipeline scrub diverged from TextOps.piiScrub for ${r.getLong(0)}")
    }
    assert(out.find(_.getLong(0) == 1L).get.getString(3).contains("[EMAIL]"))
    assert(out.find(_.getLong(0) == 2L).get.getString(3).contains("[IP]"))
    // scrub-before-tokenize: keyword tagging saw the SCRUBBED text
    val kws = out.flatMap(_.getSeq[String](4))
    assert(!kws.exists(_.contains("@")),
      s"a raw email leaked into the keyword stage: ${kws.mkString(",")}")
    // yield accounting: an 11_pii boundary after 10_rebalance, 0 dropped
    val y = CorpusPipeline.yieldReport(docs, cfg).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(y.map(_._1).contains("11_pii"), s"no pii boundary: ${y.toSeq}")
    assert(y.toMap.apply("11_pii") == 0L, "the scrub dropped rows")
    assert(y.map(_._1).sorted.toSeq == y.map(_._1).toSeq,
      "stage names out of execution order in the report")
    // default chain untouched when off
    val yOff = CorpusPipeline
      .yieldReport(docs, CorpusPipeline.Config(stratRates = Seq.empty))
      .collect().map(_.getString(0))
    assert(!yOff.contains("11_pii"))
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
  }

  test("pack terminal covers every surviving doc exactly once, offsets consistent") {
    import spark.implicits._
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    CorpusPipeline.withPrepared(docs, CorpusPipeline.Config()) { prepared =>
      val budget = 512
      val packed = CorpusPipeline.pack(prepared, budget).collect()
      val ids = prepared.select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(packed.length == ids.size &&
        packed.map(_.getLong(0)).toSet == ids,
        "packing must assign every surviving doc exactly once")
      // per shard, (seq, seq_off) reconstruct the doc-id-ordered prefix sum
      packed.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
        var cum = 0L
        rows.sortBy(_.getLong(0)).foreach { r =>
          assert(r.getLong(3) == cum / budget && r.getLong(4) == cum % budget,
            s"shard $shard row $r: expected offset $cum")
          cum += r.getLong(2)
        }
      }
    }
  }

  test("packShuffled terminal: the manifest IS the training order") {
    import spark.implicits._
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    CorpusPipeline.withPrepared(docs, CorpusPipeline.Config()) { prepared =>
      val budget = 512
      val packed = CorpusPipeline.packShuffled(prepared, budget).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getInt(6)))
      val ids = prepared.select($"doc_id").collect().map(_.getLong(0)).toSet
      // same coverage contract as the doc-id-ordered terminal: every
      // surviving doc exactly once — composing the shuffle changes the
      // ORDER, never the membership
      assert(packed.length == ids.size && packed.map(_._1).toSet == ids,
        "shuffled packing must assign every surviving doc exactly once")
      // global_pos is a permutation of [0, n)
      val byPos = packed.sortBy(_._2)
      assert(byPos.map(_._2).toSeq == (0L until packed.length).toSeq)
      // walked in global_pos order, the offsets are one gap-free token
      // stream cut every `budget` tokens — so each sequence's docs are
      // CONTIGUOUS in training order (the verdict property): a doc's
      // slot starts exactly where its predecessor ended
      var cum = 0L
      byPos.foreach { case (id, _, n, seq, seqOff, crosses) =>
        assert(seq == cum / budget && seqOff == cum % budget,
          s"doc $id: expected global offset $cum, got seq=$seq off=$seqOff")
        assert(crosses == (if (cum % budget + n > budget) 1 else 0))
        cum += n
      }
      // contiguity stated directly: the docs of any one sequence occupy
      // an unbroken global_pos interval
      byPos.groupBy(_._4).foreach { case (seq, rows) =>
        val ps = rows.map(_._2)
        assert(ps.max - ps.min + 1 == ps.length,
          s"sequence $seq holds non-contiguous positions ${ps.toSeq.sorted}")
      }
    }
  }

  test("ALL optional stages composed: yield accounting + closure on the output") {
    import spark.implicits._
    import graft.queries.{PipelineOps, TextOps}
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)

    // self-calibrating perplexity band: 10th/90th percentile of the
    // mean bigram xent over the gate's OWN input (reconstructed via the
    // public stage functions), so both tails cut at any fixture scale
    val byHash = org.apache.spark.sql.expressions.Window
      .partitionBy($"h").orderBy($"doc_id")
    val exact = docs.withColumn("h", xxhash64($"text"))
      .withColumn("rn", row_number().over(byHash))
      .filter($"rn" === 1).drop("h", "rn")
    val keepLangs = CorpusPipeline.Config().keepLangs
    // lineage breaks between the rewrites — the same plan-size rule the
    // pipeline itself applies (each rewrite's text is a computed column
    // every downstream expression would re-inline)
    val gateInput = DedupOps.passageRewrite(
      DedupOps.exciseRewrite(
        exact.filter($"lang".isInCollection(keepLangs)))
        .localCheckpoint(false))
      .localCheckpoint(false)
      .filter(size(TextOps.toks($"text")) >= CorpusPipeline.Config().minTokens)
      .filter(TextOps.linearScoreMicro($"text") >= 0)
    val (scores, xh) = TextOps.bigramXentBuild(gateInput, 10)
    val means = scores.collect()
      .map(r => r.getLong(2).toDouble / r.getLong(1)).sorted
    xh.foreach(_.unpersist())
    val lo = math.ceil(means(means.length / 10)).toLong
    val hi = math.floor(means(means.length * 9 / 10)).toLong
    assert(lo <= hi, s"degenerate band [$lo, $hi] on ${means.length} docs")

    val noEval = CorpusPipeline.Config(
      phraseExcise = true, passageDedup = true, modelGate = true,
      perplexityBand = Some((lo, hi)), clusterNeardups = true,
      mixWeights = Some(PipelineOps.MixWeights))

    // benchmark frame drawn from the pipeline's OWN survivors (longest
    // texts, so they carry 4-gram shingles) => guaranteed contamination
    val evalDocs = CorpusPipeline.withPrepared(docs, noEval) { df =>
      df.select($"doc_id", $"text").collect()
        .sortBy(-_.getString(1).length).take(3)
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    }.toDF("doc_id", "text")
    val evalIds = evalDocs.collect().map(_.getLong(0)).toSet

    // --- yield accounting over the composed chain --------------------
    val yld = CorpusPipeline
      .yieldReport(docs, noEval, Some(evalDocs)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(yld.map(_._1).toSeq == Seq("01_exact", "02_lang", "03_phrase",
      "04_passage", "05_floor", "06_model", "07_perplexity", "08_decontam",
      "09_neardup", "10_rebalance"), s"stage set: ${yld.map(_._1).toSeq}")
    assert(yld.head._2 == docs.count(), "raw n_in")
    yld.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 == b._2, s"chain broken ${a._1} -> ${b._1}")
    }
    yld.foreach { case (st, nIn, nDrop, nOut) =>
      assert(nDrop >= 0 && nOut == nIn - nDrop && nOut >= 0, s"$st arithmetic")
    }
    val drops = yld.map(t => t._1 -> t._3).toMap
    assert(drops("07_perplexity") > 0, "perplexity band did not bite")
    assert(drops("08_decontam") >= evalIds.size,
      s"decontam must drop at least the ${evalIds.size} planted docs")

    // --- closure on the final output ---------------------------------
    val out = CorpusPipeline.withPrepared(docs, noEval, Some(evalDocs))(_.collect())
    assert(out.length.toLong == yld.last._4,
      "prepared count != yield's final n_out")
    val texts = out.map(_.getString(3))
    assert(texts.distinct.length == texts.length, "exact dups left")
    out.foreach { r =>
      assert(keepLangs(r.getString(1)))
      val nToks = r.getString(3).toLowerCase.split(" ").count(_.nonEmpty)
      assert(nToks >= CorpusPipeline.Config().minTokens)
    }
    assert(out.map(_.getLong(0)).toSet.intersect(evalIds).isEmpty,
      "planted benchmark docs survived decontamination")
    val outDf = out.map(r => (r.getLong(0), r.getString(3)))
      .toSeq.toDF("doc_id", "text")
    assert(outDf.filter(TextOps.linearScoreMicro($"text") < 0).count() == 0L,
      "model-gate-negative doc survived")
    assert(DedupOps.neardupPairs(outDf, noEval.neardupThreshold).count() == 0L,
      "near-dup pairs survived the composed pipeline")
    spark.catalog.clearCache() // neardupPairs persist: test-owned
    assert(PipelineOps.decontamReport(outDf, evalDocs).count() == 0L,
      "shared benchmark grams survived")
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
  }

  test("single-aggregate yield path is row-identical to the traced path") {
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf)
    // every fast-path-eligible stage combination: the default chain,
    // the model gate (extra 06_model boundary), and cluster-mode
    // near-dup (losers from the closure instead of the pairwise rule)
    val cfgs = Seq(
      CorpusPipeline.Config(),
      CorpusPipeline.Config(modelGate = true),
      CorpusPipeline.Config(clusterNeardups = true),
      CorpusPipeline.Config(modelGate = true, clusterNeardups = true),
      CorpusPipeline.Config(stratRates = Seq.empty))
    cfgs.foreach { cfg =>
      assert(CorpusPipeline.fastYieldEligible(cfg), s"eligibility: $cfg")
      val fast = CorpusPipeline.yieldReportCounted(docs, cfg)
        .collect().map(_.toSeq).toSeq
      val traced = CorpusPipeline.yieldReportTraced(docs, cfg, None)
        .collect().map(_.toSeq).toSeq
      assert(fast == traced, s"yield paths diverged under $cfg:\n" +
        s"fast   = $fast\ntraced = $traced")
    }
    // ineligible configs stay on the traced path (rewrites, models,
    // joins mid-chain — the flag model does not cover them)
    assert(!CorpusPipeline.fastYieldEligible(
      CorpusPipeline.Config(phraseExcise = true)))
    assert(!CorpusPipeline.fastYieldEligible(
      CorpusPipeline.Config(passageDedup = true)))
    assert(!CorpusPipeline.fastYieldEligible(
      CorpusPipeline.Config(piiScrub = true)))
    assert(!CorpusPipeline.fastYieldEligible(
      CorpusPipeline.Config(mixWeights = Some(graft.queries.PipelineOps.MixWeights))))
    assert(!CorpusPipeline.fastYieldEligible(
      CorpusPipeline.Config(perplexityBand = Some((0L, 1000000L)))))
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
  }
}
