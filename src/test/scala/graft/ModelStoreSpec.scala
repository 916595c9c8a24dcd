package graft

import graft.queries.TextOps
import org.apache.spark.sql.functions._

/** The persisted MODEL artifact family (round 15): the gate model
  * (pocket perceptron weights + trajectory card) and the BPE model
  * (ordered merge table) under the shared GenerationManifest. The
  * contracts under test: round-trip identity (persist → load returns
  * exactly what training produced), served twins bit-identical to an
  * in-session train-then-score, retrain-appends with as-of reads, and
  * the model card carrying the full trajectory. */
class ModelStoreSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("gate model: persist -> load returns the in-session pocket vector bit for bit") {
    val docs = Tables.documents(spark, sf)
    val (rows, snaps) = TextOps.gateTrainCore(
      docs, TextOps.DistillEpochs, TextOps.DistillFeatDim)
    val pocket = TextOps.gatePocketEpoch(rows)
    val want = snaps((pocket - 1).toInt)
    val path = tmp("graft-gate-model")
    TextOps.writeGateModel(docs, path)
    assert(TextOps.gateWeightsAt(spark, path) == want,
      "loaded weights diverged from the in-session pocket vector")
    // the card IS q111's trajectory (same rows, same pocket flag)
    val card = TextOps.gateModelCard(spark, path)
      .select(col("epoch"), col("err"), col("is_pocket")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(card.length == TextOps.DistillEpochs + 1)
    assert(card.filter(_._3 == 1L).map(_._1) == Seq(pocket),
      s"card pocket flag wrong: $card")
  }

  test("gate model: served score and ROC twins == in-session train-then-score") {
    val docs = Tables.documents(spark, sf)
    val (rows, snaps) = TextOps.gateTrainCore(
      docs, TextOps.DistillEpochs, TextOps.DistillFeatDim)
    val w = snaps((TextOps.gatePocketEpoch(rows) - 1).toInt)
    val path = tmp("graft-gate-model")
    TextOps.writeGateModel(docs, path)
    val servedScores = TextOps.gateScoreServed(spark, sf, path)
      .collect().map(_.toString).toSeq
    val inSession = TextOps.gateScoresWith(docs, w)
      .collect().map(_.toString).toSeq
    assert(servedScores == inSession, "served scoring twin diverged")
    val servedRoc = TextOps.gateRocServed(spark, sf, path)
      .collect().map(_.toString).toSeq
    val rocInSession = TextOps.gateRocWith(
      docs, TextOps.linearScoreMicroWith(col("text"), w), TextOps.RocShards)
      .collect().map(_.toString).toSeq
    assert(servedRoc == rocInSession, "served ROC twin diverged")
  }

  test("gate model: retrain appends a generation; as-of reads answer 'which model did run g deploy'") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val path = tmp("graft-gate-retrain")
    TextOps.writeGateModel(docs, path)
    val w1 = TextOps.gateWeightsAt(spark, path)
    // retrain on a shifted corpus -> a different model at gen 2
    TextOps.retrainGateModel(docs.filter($"doc_id" % 2 === 0), path)
    val w2 = TextOps.gateWeightsAt(spark, path)
    assert(w2 != w1, "retrain fixture vacuous: same model")
    assert(TextOps.gateWeightsAt(spark, path, asOfGen = 1L) == w1,
      "as-of read lost the generation-1 model")
    assert(TextOps.gateWeightsAt(spark, path, asOfGen = 2L) == w2)
  }

  test("bpe model: persist -> load returns the trained merge table in apply order") {
    val docs = Tables.documents(spark, sf)
    val want = TextOps.q102BpeTrain(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val path = tmp("graft-bpe-model")
    TextOps.writeBpeModel(docs, path)
    assert(TextOps.bpeMergesAt(spark, path) == want,
      "loaded merge table diverged from the in-session trainer")
    // served encode == q89's core under the same table
    val served = TextOps.bpeEncodeServed(spark, sf, path)
      .collect().map(_.toString).toSeq
    val inSession = TextOps.q89BpeEncode(spark, sf, want)
      .collect().map(_.toString).toSeq
    assert(served == inSession, "served encode twin diverged")
  }

  test("pipeline gate consumes the trained model: gateModelPath == in-session loaded-weight filter") {
    import graft.queries.CorpusPipeline
    val docs = Tables.documents(spark, sf)
    val path = tmp("graft-gate-pipeline")
    TextOps.writeGateModel(docs, path)
    val w = TextOps.gateWeightsAt(spark, path)
    val cfg = CorpusPipeline.Config(
      modelGate = true, gateModelPath = Some(path))
    val got = graft.streaming.CorpusStream.gate(docs, cfg)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    val want = graft.streaming.CorpusStream
      .gate(docs, CorpusPipeline.Config(modelGate = false))
      .filter(TextOps.linearScoreMicroWith(col("text"), w) >= 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, "gateModelPath gate diverged from loaded-weight filter")
    // the misconfiguration fails at construction, not silently
    intercept[IllegalArgumentException] {
      CorpusPipeline.Config(gateModelPath = Some(path))
    }
  }

  test("bpe model: retrain appends; as-of serves the historical tokenizer") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val path = tmp("graft-bpe-retrain")
    TextOps.writeBpeModel(docs, path, merges = 4)
    val m1 = TextOps.bpeMergesAt(spark, path)
    TextOps.retrainBpeModel(docs.filter($"doc_id" % 3 === 0), path, merges = 4)
    val m2 = TextOps.bpeMergesAt(spark, path)
    assert(m1.nonEmpty && m2.nonEmpty)
    assert(TextOps.bpeMergesAt(spark, path, asOfGen = 1L) == m1,
      "as-of read lost the generation-1 tokenizer")
    assert(graft.queries.GenerationManifest.window(path) == (1L, 2L))
  }

  test("lm model: persist -> load -> serve == in-session q79 bit for bit; retrain/as-of/compact") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val path = tmp("graft-lm-model")
    TextOps.writeLmModel(docs, path)
    // the served twin reproduces the in-session train-then-score
    val want = TextOps.q79BigramLm(spark, sf)
      .collect().map(_.toString).toSeq
    val served = TextOps.lmScoreServed(spark, sf, path)
      .collect().map(_.toString).toSeq
    assert(served == want, "served LM scoring diverged from in-session q79")
    // the model card is bounded by construction: <= (|V|+1)^2 rows
    val v = spark.read.parquet(s"$path/vocab/gen=1").count()
    val card = TextOps.lmModelCard(spark, path)
    assert(card.count() <= (v + 1) * (v + 1),
      "cost table exceeded its (|V|+1)^2 bound")
    // retrain on a shifted corpus appends gen 2; as-of serves gen 1
    TextOps.retrainLmModel(docs.filter($"doc_id" % 2 === 0), path)
    val headScores = TextOps.lmScoreServed(spark, sf, path)
      .collect().map(_.toString).toSeq
    assert(TextOps.lmScoreServed(spark, sf, path, asOfGen = 1L)
      .collect().map(_.toString).toSeq == served,
      "as-of read lost the generation-1 LM")
    assert(headScores != served, "retrain fixture vacuous: same scores")
    // compaction through the round-17 threshold rule: quiet at
    // maxGens = 2 (the window spans exactly 2), fires at 1; head
    // serves identically, floor refuses
    assert(!TextOps.maybeCompactLmModel(spark, path, maxGens = 2),
      "generation rule fired below the knob")
    assert(TextOps.maybeCompactLmModel(spark, path, maxGens = 1),
      "generation rule failed to fire past the knob")
    assert(TextOps.lmScoreServed(spark, sf, path)
      .collect().map(_.toString).toSeq == headScores,
      "lm compaction changed the served scores")
    intercept[IllegalArgumentException] {
      TextOps.lmModelCard(spark, path, asOfGen = 1L)
    }
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark),
      "lm model store leaked cached frames")
  }

  test("lm backoff (round 17): a foreign corpus scores EVERY bigram; self-trained scoring unchanged; legacy stores fall back") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val train = docs.filter($"doc_id" % 2 === 0)
    val path = tmp("graft-lm-backoff")
    TextOps.writeLmModel(train, path)
    val servedAll = TextOps.lmScoreServed(spark, sf, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the artifact's primary use case: n_bigrams on the FOREIGN half
    // is the TRUE bigram count of every >=2-token doc — nothing drops
    val wantN = docs.filter($"doc_id" % 2 =!= 0)
      .select($"doc_id",
        (size(TextOps.toks($"text")) - 1).cast("long").as("want"))
      .filter($"want" >= 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotN = servedAll.filter(_._1 % 2 != 0).map(t => t._1 -> t._2).toMap
    assert(gotN.keySet == wantN.keySet,
      "foreign docs dropped from the served scoring")
    assert(gotN == wantN,
      "foreign n_bigrams under-counted despite the backoff row")
    // self-trained scoring is bit-identical: on the training corpus
    // the backoff row is never hit (q118's oracle-level theorem,
    // pinned here per doc against the in-session score)
    val (selfScores, handles) =
      TextOps.bigramXentBuild(train, TextOps.HeavyHitterPerMille)
    val want = try selfScores.orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    finally handles.foreach(_.unpersist())
    assert(servedAll.filter(_._1 % 2 == 0).toSeq == want,
      "backoff branch changed self-trained scoring")
    // legacy (pre-r17) store: no backoff artifact -> the serve falls
    // back to the inner join (model-support scoring), not an error
    val boDir = new org.apache.hadoop.fs.Path(s"$path/backoff")
    boDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(boDir, true)
    val legacy = TextOps.lmScoreServed(spark, sf, path)
      .agg(sum($"n_bigrams")).head().getLong(0)
    assert(legacy < servedAll.map(_._2).sum,
      "fixture vacuous: no foreign bigram ever hit the backoff row")
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark),
      "lm backoff test leaked cached frames")
  }

  test("gate drift: served matrix == in-session two-train compare; score drift non-vacuous") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val path = tmp("graft-gate-drift-spec")
    TextOps.writeGateModel(docs, path)
    TextOps.retrainGateModel(
      docs.filter($"doc_id" % TextOps.DriftRetrainMod === 0), path)
    val served = TextOps.gateDriftServed(spark, sf, path).head()
    val w1 = TextOps.gateWeightsAt(spark, path, asOfGen = 1L)
    val w2 = TextOps.gateWeightsAt(spark, path)
    val want = TextOps.gateDriftWith(docs, w1, w2).head()
    assert(served == want, s"served drift diverged: $served vs $want")
    assert(w1 != w2, "drift fixture vacuous: identical models")
    // the score-level counters must register the model change even
    // when the flip counters are zero (both models on one side)
    val up = served.getLong(5); val down = served.getLong(6)
    assert(up + down > 0, s"score drift vacuous: up=$up down=$down")
    // a one-generation store refuses the comparison loudly
    val single = tmp("graft-gate-drift-single")
    TextOps.writeGateModel(docs, single)
    intercept[IllegalArgumentException] {
      TextOps.gateDriftServed(spark, sf, single)
    }
  }

  test("lm drift (round 17): matrix is total over the corpus (backoff covers the foreign half), non-vacuous, and guarded") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val path = tmp("graft-lm-drift-spec")
    TextOps.writeLmModel(docs, path)
    TextOps.retrainLmModel(
      docs.filter($"doc_id" % TextOps.DriftRetrainMod === 0), path)
    val m = TextOps.lmDriftServed(spark, sf, path).head()
    val nDocs = m.getLong(0)
    // TOTALITY: the matrix covers every >=2-token doc — the backoff is
    // what makes the retrained (even-half) model well-defined on the
    // odd half it never trained on; without it the inner support join
    // would silently shrink n_docs
    val want = docs.filter(size(TextOps.toks(col("text"))) >= 2).count()
    assert(nDocs == want,
      s"drift matrix covers $nDocs docs, corpus has $want scoreable")
    // sanity: flips are a partition of the keep deltas; cost drift must
    // register the model change (the fixture is non-vacuous)
    val (keepOld, keepNew) = (m.getLong(1), m.getLong(2))
    val (dropped, admitted) = (m.getLong(3), m.getLong(4))
    assert(keepNew == keepOld - dropped + admitted, s"flip arithmetic: $m")
    assert(m.getLong(5) + m.getLong(6) > 0,
      s"cost drift vacuous: up=${m.getLong(5)} down=${m.getLong(6)}")
    // a one-generation store refuses the comparison loudly
    val single = tmp("graft-lm-drift-single")
    TextOps.writeLmModel(docs, single)
    intercept[IllegalArgumentException] {
      TextOps.lmDriftServed(spark, sf, single)
    }
    // a pre-r17 generation (no backoff artifact) must refuse, not
    // silently score support-only with a model-dependent denominator
    val boDir = new org.apache.hadoop.fs.Path(s"$path/backoff/gen=1")
    boDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(boDir, true)
    val be = intercept[IllegalArgumentException] {
      TextOps.lmDriftServed(spark, sf, path)
    }
    assert(be.getMessage.contains("no backoff"),
      s"wrong legacy refusal: ${be.getMessage}")
  }

  test("bpe drift (round 17): matrix is total, the fixture models genuinely differ, and the guards hold") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val path = tmp("graft-bpe-drift-spec")
    TextOps.writeBpeModel(docs, path)
    TextOps.retrainBpeModel(
      docs.filter($"doc_id" % TextOps.DriftRetrainMod === 0), path)
    // the fixture must be non-vacuous: the half-corpus retrain picks a
    // genuinely different merge table, and the differing merges fire
    // in at least one document's encode
    assert(TextOps.bpeMergesAt(spark, path, asOfGen = 1L)
      != TextOps.bpeMergesAt(spark, path),
      "drift fixture vacuous: identical merge tables")
    val m = TextOps.bpeDriftServed(spark, sf, path).head()
    // TOTALITY: every document encodes under any merge table (no
    // support join to shrink the matrix — zero-word docs count too)
    assert(m.getLong(0) == docs.count(),
      s"drift matrix covers ${m.getLong(0)} docs")
    assert(m.getLong(3) + m.getLong(4) > 0,
      s"token drift vacuous: up=${m.getLong(3)} down=${m.getLong(4)}")
    // fertility is floor(total tokens * 1000 / total words) per table
    assert(m.getLong(5) > 0 && m.getLong(6) > 0)
    // a one-generation store refuses the comparison loudly
    val single = tmp("graft-bpe-drift-single")
    TextOps.writeBpeModel(docs, single)
    intercept[IllegalArgumentException] {
      TextOps.bpeDriftServed(spark, sf, single)
    }
  }

  test("rollout gate under concurrent retrain: a live stream keeps scoring its construction-time generation; restart rolls") {
    import spark.implicits._
    import graft.queries.CorpusPipeline
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val path = tmp("graft-gate-roll")
    TextOps.writeGateModel(docs, path)
    val w1 = TextOps.gateWeightsAt(spark, path)
    val cfg = CorpusPipeline.Config(modelGate = true, gateModelPath = Some(path))
    def keptWith(w: Seq[Long]): Seq[Long] = graft.streaming.CorpusStream
      .gate(docs, CorpusPipeline.Config(modelGate = false))
      .filter(TextOps.linearScoreMicroWith(col("text"), w) >= 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq

    val rows = docs.select($"doc_id", $"lang", $"text")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val in = MemoryStream[(Long, String, String)]
    val gated = graft.streaming.CorpusStream.gate(
      in.toDF().toDF("doc_id", "lang", "text"), cfg)
    val q = gated.select($"doc_id").writeStream.format("memory")
      .queryName("gate_roll").outputMode("append").start()
    try {
      in.addData(b1); q.processAllAvailable()
      // the RETRAIN lands generation 2 while the stream is live —
      // the rollout decision (ship it or not) is q117's drift table,
      // read between this append and any restart
      TextOps.retrainGateModel(docs.filter($"doc_id" % 2 === 0), path)
      assert(TextOps.gateWeightsAt(spark, path) != w1,
        "retrain fixture vacuous: identical model")
      in.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("gate_roll").collect()
      .map(_.getLong(0)).sorted.toSeq
    // EVERY batch — including the one processed AFTER the retrain —
    // was gated by the construction-time generation-1 model: the
    // stream never silently rolls mid-flight
    assert(streamed == keptWith(w1),
      "a live stream picked up a concurrent retrain mid-flight")
    // an explicit RESTART (a fresh plan) rolls to the head generation
    val in2 = MemoryStream[(Long, String, String)]
    val gated2 = graft.streaming.CorpusStream.gate(
      in2.toDF().toDF("doc_id", "lang", "text"), cfg)
    val q2 = gated2.select($"doc_id").writeStream.format("memory")
      .queryName("gate_roll2").outputMode("append").start()
    try { in2.addData(rows); q2.processAllAvailable() } finally q2.stop()
    assert(spark.table("gate_roll2").collect()
      .map(_.getLong(0)).sorted.toSeq ==
      keptWith(TextOps.gateWeightsAt(spark, path)),
      "a restarted stream did not score with the head generation")
  }

  test("model compaction: head serves identically, history below the floor refuses") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val gate = tmp("graft-gate-compact")
    TextOps.writeGateModel(docs, gate)
    TextOps.retrainGateModel(docs.filter($"doc_id" % 2 === 0), gate)
    val head = TextOps.gateWeightsAt(spark, gate)
    val card = TextOps.gateModelCard(spark, gate).collect().map(_.toString).toSeq
    TextOps.compactGateModel(spark, gate)
    assert(TextOps.gateWeightsAt(spark, gate) == head,
      "gate compaction changed the served model")
    assert(TextOps.gateModelCard(spark, gate).collect().map(_.toString).toSeq
      == card, "gate compaction changed the model card")
    intercept[IllegalArgumentException] {
      TextOps.gateWeightsAt(spark, gate, asOfGen = 1L)
    }
    val bpe = tmp("graft-bpe-compact")
    TextOps.writeBpeModel(docs, bpe, merges = 4)
    TextOps.retrainBpeModel(docs.filter($"doc_id" % 3 === 0), bpe, merges = 4)
    val headM = TextOps.bpeMergesAt(spark, bpe)
    TextOps.compactBpeModel(spark, bpe)
    assert(TextOps.bpeMergesAt(spark, bpe) == headM,
      "bpe compaction changed the served table")
    intercept[IllegalArgumentException] {
      TextOps.bpeMergesAt(spark, bpe, asOfGen = 1L)
    }
  }
}
