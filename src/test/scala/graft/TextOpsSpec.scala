package graft

import graft.queries.TextOps

/** Text-analysis operator specs: structural invariants on the sf0.001
  * fixture plus determinism/equality properties (exact expected values
  * live in the DuckDB oracle compare, which these queries pass at
  * sf0.01).
  */
class TextOpsSpec extends SparkSuite {

  /** Driver-side re-implementation of q68's full scoring rule — md5
    * bucket hash, integer micro-weights, integer sum, keep threshold —
    * so the zero-shuffle in-plan fold is pinned against independent
    * arithmetic, not just the oracle. */
  test("q68 hashed linear score == in-memory reimplementation; keep splits") {
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split(" ", -1).filter(_.nonEmpty)
        val score = toks.map(t =>
          TextOps.weightComponent((h32(t) % TextOps.HashDim).toInt)).sum
        (r.getLong(0), toks.length, score, if (score >= 0) 1 else 0)
      }.sortBy(_._1).toSeq
    val got = TextOps.q68LinearScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got == want)
    // non-vacuous classifier: both classes present on the fixture
    val keeps = got.count(_._4 == 1)
    assert(keeps > 0 && keeps < got.size, s"degenerate keep split: $keeps/${got.size}")
  }

  test("q71 Misra-Gries summary: every local heavy hitter survives, memory bounded") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val cap = 10
      // planted distribution: a few heavy tokens + a long random tail
      val heavy = Seq.fill(400)("h" + rnd.nextInt(3))
      val tail = Seq.fill(600)("t" + rnd.nextInt(500))
      val stream = rnd.shuffle(heavy ++ tail)
      val (it, total) = TextOps.mgSummary(stream.iterator, cap)
      val survivors = it.toSet
      assert(total == stream.length.toLong)
      assert(survivors.size <= cap, s"trial $trial: summary exceeded cap")
      // the MG guarantee: true count > n/(cap+1) => present
      val counts = stream.groupBy(identity).view.mapValues(_.size)
      counts.foreach { case (t, c) =>
        if (c > stream.length / (cap + 1))
          assert(survivors(t), s"trial $trial: heavy '$t' ($c) evicted")
      }
    }
  }

  test("q71 heavy hitters: output is partition-layout-independent and exact") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    def run(d: org.apache.spark.sql.DataFrame): Seq[(String, Long)] = {
      val (res, handles) = TextOps.heavyHittersBuild(d, TextOps.HeavyHitterPerMille)
      val out = res.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      handles.foreach(_.unpersist())
      out
    }
    val a = run(docs)
    val b = run(docs.repartition(3, col("lang")))
    val c = run(docs.coalesce(1))
    // exact algorithm: the candidate SET varies with layout, the
    // answer cannot (false candidates die in the exact recount)
    assert(a == b && b == c, "heavy-hitter output depends on partitioning")
    assert(a.nonEmpty, "no heavy hitters on the fixture")
    // sanity: every reported token really clears the threshold
    val tokens = docs.select(org.apache.spark.sql.functions
      .explode(org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.lower(col("text")), " ")).as("t"))
      .filter(org.apache.spark.sql.functions.length(col("t")) > 0)
      .collect().map(_.getString(0))
    val n = tokens.length.toLong
    val byTok = tokens.groupBy(identity).view.mapValues(_.length.toLong).toMap
    a.foreach { case (t, cnt) =>
      assert(byTok(t) == cnt, s"count mismatch for '$t'")
      assert(cnt * 1000 >= TextOps.HeavyHitterPerMille * n, s"'$t' below threshold")
    }
    // and none missed: the driver-side full count finds the same set
    val wantSet = byTok.filter { case (_, c) =>
      c * 1000 >= TextOps.HeavyHitterPerMille * n }.keySet
    assert(a.map(_._1).toSet == wantSet, "heavy-hitter set differs from exhaustive count")
  }

  test("q72 collocations: vocabulary-bounded, counts exact, broadcast-filtered") {
    val hh = TextOps.withQ71HeavyHitters(spark, sf)(
      _.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    TextOps.withQ72Collocations(spark, sf) { df =>
      df.collect() // settle AQE before reading the executed plan
      val rows = df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // pair space bounded by the heavy-hitter vocabulary
      assert(rows.nonEmpty && rows.length <= hh.size * hh.size)
      rows.foreach { case (x, y, _, _) =>
        assert(hh.contains(x) && hh.contains(y), s"non-HH pair ($x,$y)")
      }
      // counts exact: re-count a handful of pairs from the raw corpus
      val toks = Tables.documents(spark, sf).select("text").collect()
        .map(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty))
      val sample = rows.take(5) ++ rows.takeRight(5)
      sample.foreach { case (x, y, nXy, _) =>
        val want = toks.map(_.sliding(2).count(w =>
          w.length == 2 && w(0) == x && w(1) == y)).sum
        assert(want.toLong == nXy, s"($x,$y): counted $want, q72 says $nXy")
      }
      // the corpus pair stream is filtered by BROADCAST, never sort-merge
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), s"q72 lost its broadcast joins:\n$p")
      assert(!p.contains("SortMergeJoin"), s"q72 degraded to sort-merge:\n$p")
    }
  }

  test("q15 simhash: 32-bit fingerprints, identical docs hash identically") {
    val rows = TextOps.q15Simhash(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val fp = r.getLong(1)
      assert(fp >= 0L && fp < (1L << 32), s"fingerprint out of range: $fp")
    }
    // determinism across runs
    val again = TextOps.q15Simhash(spark, sf).collect()
    assert(rows.map(_.getLong(1)).toSeq == again.map(_.getLong(1)).toSeq)
  }

  test("q15 simhash: near-dup fixture pairs are closer than random pairs") {
    val fp = TextOps.q15Simhash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // near-dup pairs straight from the verified q13 output — loan form:
    // the plain form's persist is caller-owned and would outlive this
    // test in the shared suite session (the round-13 red-board lesson)
    val nearPairs = graft.queries.DedupOps.withQ13NeardupPairs(spark, sf)(
      _.collect().map(r => (r.getLong(0), r.getLong(1))))
    assert(nearPairs.nonEmpty)
    val nearAvg = nearPairs.map(p => hamming(fp(p._1), fp(p._2))).sum.toDouble / nearPairs.length
    val ids = fp.keys.toSeq.sorted
    val randomPairs = ids.take(40).zip(ids.reverse.take(40)).filter(p => p._1 != p._2)
    val randAvg = randomPairs.map(p => hamming(fp(p._1), fp(p._2))).sum.toDouble / randomPairs.length
    info(f"avg hamming: near-dup $nearAvg%.2f vs random $randAvg%.2f")
    assert(nearAvg < randAvg, s"simhash does not separate near-dups: $nearAvg vs $randAvg")
  }

  test("q16 lang id: prediction is the argmax with alphabetical tie-break") {
    val rows = TextOps.q16LangId(spark, sf).collect()
    assert(rows.length == 500)
    val langs = TextOps.LangProfiles.map(_._1)
    rows.foreach { r =>
      val scores = langs.indices.map(i => r.getLong(2 + i))
      val best = scores.max
      val expected = langs(scores.indexOf(best)) // first max = alphabetical
      assert(r.getString(1) == expected,
        s"doc ${r.getLong(0)}: pred ${r.getString(1)} != $expected ($scores)")
    }
  }

  test("q17 quality: counter invariants and exact ratio") {
    val rows = TextOps.q17TextQuality(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (n, bpe, stop, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getDouble(5))
      assert(n > 0 && bpe >= n, s"BPE-ish split must be >= whitespace split: $r")
      assert(stop <= n)
      assert(math.abs(ratio - math.rint(stop * 1000000.0 / n * 1e6) / 1e6) < 1e-6)
    }
  }

  test("q21 banded simhash pairs == exact all-pairs hamming (pigeonhole recall 1)") {
    val fp = TextOps.q15Simhash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // exact all-pairs ground truth, computed directly
    val expected = (for {
      (ida, fa) <- fp; (idb, fb) <- fp if ida < idb
      h = java.lang.Long.bitCount(fa ^ fb)
      if h <= TextOps.HammingMax
    } yield (ida, idb, h.toLong)).toSet
    val banded = TextOps.q21SimhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == expected,
      s"banded(${banded.size}) != exact(${expected.size}); " +
        s"missed=${(expected -- banded).take(5)} extra=${(banded -- expected).take(5)}")
    assert(expected.nonEmpty) // the fixture has near-dups; test is not vacuous
  }

  test("q18 winnowing: fingerprint bounds and determinism") {
    val rows = TextOps.q18Fingerprint(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (nGrams, nFp, fpMin) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nGrams >= TextOps.WinnowWindow)
      assert(nFp >= 1 && nFp <= nGrams - (TextOps.WinnowWindow - 1))
      assert(fpMin >= 0L && fpMin < (1L << 32))
    }
    val again = TextOps.q18Fingerprint(spark, sf).collect()
    assert(rows.map(_.getLong(3)).toSeq == again.map(_.getLong(3)).toSeq)
  }

  test("q42: tf-idf top terms match hand-computed scores on a tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple")
    ).toDF("doc_id", "text")
    // N=3; df: apple 2, banana 2, cherry 1
    // doc1: apple 2·ln(1.5)=0.810930, banana 1·ln(1.5)=0.405465
    // doc2: cherry ln(3)=1.098612 > banana 0.405465
    // doc3: apple 0.405465
    val got = TextOps.tfidfTopTerms(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      (1L, 1, "apple", 0.81093),
      (1L, 2, "banana", 0.405465),
      (2L, 1, "cherry", 1.098612),
      (2L, 2, "banana", 0.405465),
      (3L, 1, "apple", 0.405465)), s"got: $got")
  }

  test("q42 on the fixture: ranked per doc, deterministic, broadcast df join") {
    val out = TextOps.q42TfidfTopTerms(spark, sf)
    val rows = out.collect()
    // every doc with tokens contributes, ranks are 1..k without gaps
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.size == 500)
    byDoc.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= TextOps.TfidfTopK)
    }
    // scores are non-negative (df <= N) and descending within a doc
    byDoc.values.foreach { rs =>
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted.reverse)
      scores.foreach(s => assert(s >= 0.0))
    }
    // vocabulary-sized df side broadcasts; no sort-merge join on corpus
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"df join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("q44: bigram repetition counts on hand fixtures; short docs excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b A b a"),   // bigrams: "a b","b a","a b","b a" (lowercased)
      (2L, "x"),           // < 2 tokens -> no row
      (3L, "p q r"),       // two distinct bigrams
      (4L, "t t  t t")     // "t t" x3 (double space drops an empty token)
    ).toDF("doc_id", "text")
    val out = TextOps.bigramRep(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      1L -> ((4L, 2L, 2L)),
      3L -> ((2L, 2L, 1L)),
      4L -> ((3L, 1L, 3L))))
  }

  test("q44 on the fixture matches a driver-side recount") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      if (toks.length < 2) None
      else {
        val counts = toks.sliding(2).map(_.mkString(" ")).toSeq
          .groupBy(identity).view.mapValues(_.size.toLong)
        Some(id -> ((counts.values.sum, counts.size.toLong, counts.values.max)))
      }
    }
    val out = TextOps.q44BigramRep(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == expected)
    assert(out.nonEmpty)
  }

  test("q53 gate yield == in-memory cascade; one scan, one tiny exchange") {
    // independent reimplementation of the four cumulative gates
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split(" ", -1).filter(_.nonEmpty)
        val stop = toks.count(TextOps.Stopwords.contains)
        val g1 = TextOps.YieldLangs.contains(r.getString(0))
        val g2 = g1 && toks.length >= TextOps.YieldMinTokens &&
          toks.length <= TextOps.YieldMaxTokens
        val g3 = g2 &&
          toks.distinct.length * 100 >= toks.length * TextOps.YieldMinDistinctPct
        val g4 = g3 && stop * 100 >= toks.length * TextOps.YieldMinStopPct
        (g1, g2, g3, g4)
      }
    val n0 = docs.length.toLong
    val Seq(n1, n2, n3, n4) = Seq(
      docs.count(_._1), docs.count(_._2), docs.count(_._3), docs.count(_._4))
      .map(_.toLong)
    val df = TextOps.q53GateYield(spark, sf)
    val got = df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      "1_lang" -> ((n0, n0 - n1, n1)),
      "2_length" -> ((n1, n1 - n2, n2)),
      "3_repetition" -> ((n2, n2 - n3, n3)),
      "4_stopword" -> ((n3, n3 - n4, n4))))
    // every gate drops someone in the fixture — the report is not vacuous
    assert(got.values.forall(_._2 > 0), s"vacuous gate in $got")
    // one scan; the only exchange is the SinglePartition gather of the
    // 5-long partial-aggregate row — the 100 TB contract: map-side
    // partials, nothing keyed ever shuffles
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      s"unexpected keyed exchange:\n$p")
    assert(p.contains("Exchange SinglePartition"), s"no partial agg gather:\n$p")
  }

  test("q55 token surprisal == in-memory unigram reference; broadcast cost join") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ", -1).filter(_.nonEmpty).toSeq).toMap
    val tf = docs.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = tf.values.sum
    // the same float-once-per-type rule: Math.log IS Spark's log
    val icost = tf.map { case (t, f) =>
      t -> math.floor(math.log(n.toDouble / f.toDouble) * 1e6).toLong }
    val expected = docs.collect { case (id, toks) if toks.nonEmpty =>
      id -> ((toks.length.toLong, toks.map(icost).sum)) }
    val df = TextOps.q55TokenSurprisal(spark, sf)
    val got = df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected && got.size == 500)
    // positive surprisal (every tf < N), deterministic repeat
    assert(got.values.forall(_._2 > 0))
    // the vocab cost table broadcasts; the exploded corpus never sort-merges
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token join shuffled the corpus:\n$p")
  }

  test("q58 source drift == exact-integer reference, hand corpus + fixture") {
    import spark.implicits._
    // hand corpus: s1 = {a:2, b:1}, s2 = {b:3}; global {a:2, b:4}, N=6.
    // TV(s1) = TV(s2) = 1/3 exactly -> floor(1e6/3) = 333333 ppm.
    val hand = Seq(("s1", "a a b"), ("s2", "b b b")).toDF("source", "text")
    val gotHand = TextOps.sourceDrift(hand).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(gotHand == Map(
      "s1" -> ((3L, 2L, 333333L)),
      "s2" -> ((3L, 1L, 333333L))))

    // fixture recount with the very same integer formula
    val rows = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => r.getString(0) ->
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).toSeq)
    val stf = rows.flatMap { case (s, ts) => ts.map(s -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tf = stf.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nsM = stf.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n = nsM.values.sum
    val expected = nsM.map { case (s, ns) =>
      val inSrc = stf.collect { case ((`s`, t), f) => t -> f }
      val devSum = inSrc.map { case (t, f) => math.abs(f * n - tf(t) * ns) }.sum
      val gS = inSrc.map { case (t, _) => tf(t) }.sum
      val ppm = (devSum + ns * (n - gS)) * 1000000L / (2 * n * ns)
      s -> ((ns, inSrc.size.toLong, ppm))
    }
    val df = TextOps.q58SourceDrift(spark, sf)
    val got = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
    assert(got.size == 20)
    // drift is non-degenerate on the fixture
    assert(got.values.exists(_._3 > 0))
  }

  test("q75 text chunks: full coverage, fixed overlap, lossless stride reconstruction") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    // driver-side reference tokenizer: the toks rule (lowercase,
    // single-space split, drop empties) re-derived independently
    val tokRows = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).toVector)
      .toMap
    val chunks = TextOps.q75TextChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val size = TextOps.ChunkToks
    val stride = TextOps.ChunkTokStride
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val toksOf = tokRows(id)
      val sorted = cs.sortBy(_._2)
      // chunk indices are consecutive from 0; starts ride the stride
      assert(sorted.map(_._2).toSeq == (0L until sorted.length.toLong))
      sorted.foreach { case (_, idx, start, n, text) =>
        assert(start == idx * stride)
        assert(n == math.min(size.toLong, toksOf.length - start))
        // the chunk text IS the token slice, space-joined
        assert(text == toksOf.slice(start.toInt, start.toInt + size).mkString(" "))
      }
      // coverage: the last chunk reaches the final token
      val (_, _, lastStart, lastN, _) = sorted.last
      assert(lastStart + lastN == toksOf.length.toLong,
        s"doc $id: tail tokens uncovered")
      // lossless reconstruction from stride-prefixes: taking the first
      // `stride` tokens of every chunk (all of the last) re-yields the
      // document's token stream exactly — the property that lets a
      // reader de-overlap deterministically
      val rebuilt = sorted.flatMap { case (_, idx, start, n, text) =>
        val ts = text.split(" ").toVector
        if (idx == sorted.length - 1) ts else ts.take(stride)
      }.toVector
      assert(rebuilt == toksOf, s"doc $id: stride reconstruction diverged")
    }
    // every non-empty doc chunked; empty-token docs absent
    val nonEmpty = tokRows.filter(_._2.nonEmpty).keySet
    assert(chunks.map(_._1).toSet == nonEmpty)
  }

  test("q79 == exact driver-side bigram-LM recomputation; unk exercised") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).toVector)
    // heavy-hitter vocabulary by the q71 threshold rule
    val all = docs.flatMap(_._2)
    val nTok = all.length.toLong
    val vocab = all.groupBy(identity).collect {
      case (t, o) if o.length.toLong * 1000 >= TextOps.HeavyHitterPerMille * nTok => t
    }.toSet
    assert(docs.exists(_._2.exists(t => !vocab.contains(t))),
      "fixture has no OOV token — the unk path is untested")
    val mapTok = (t: String) => if (vocab.contains(t)) t else TextOps.UnkToken
    val bigrams = docs.flatMap { case (id, tk) =>
      if (tk.length < 2) Nil
      else tk.zip(tk.tail).map { case (x, y) => (id, mapTok(x), mapTok(y)) }
    }
    val cxy = bigrams.groupBy(b => (b._2, b._3)).map { case (k, o) => k -> o.length.toLong }
    val cx = cxy.groupBy(_._1._1).map { case (x, m) => x -> m.values.sum }
    val vp = vocab.size.toLong + 1
    val cost = cxy.map { case ((x, y), n) =>
      (x, y) -> math.floor(
        math.log((cx(x) + vp).toDouble / (n + 1).toDouble) * 1e5).toLong
    }
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      (id, bs.length.toLong, bs.map(b => cost((b._2, b._3))).sum)
    }.toSeq.sortBy(_._1)
    val got = TextOps.q79BigramLm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected,
      s"bigram LM diverges; got=${got.take(3)} expected=${expected.take(3)}")
    assert(got.forall(_._3 > 0), "cross-entropy must be positive")
  }

  test("q86 == exact driver-side BPE pair recount; overlapping repeats counted") {
    import spark.implicits._
    val tokens = Tables.documents(spark, sf).select($"text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty))
    val vocab = tokens.groupBy(identity).map { case (t, o) => t -> o.length.toLong }
    val pairCounts = vocab.toSeq.filter(_._1.length >= 2)
      .flatMap { case (t, n) =>
        t.toSeq.zip(t.toSeq.tail).map { case (a, b) => (a.toString, b.toString) -> n }
      }
      .groupBy(_._1).map { case (k, o) => k -> o.map(_._2).sum }
    val expected = pairCounts.toSeq
      .sortBy { case ((l, r), n) => (-n, l, r) }
      .take(TextOps.BpeTopMerges)
      .zipWithIndex
      .map { case (((l, r), n), i) => (i + 1, l, r, n) }
    val got = TextOps.q86BpePairs(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected,
      s"BPE pairs diverge; got=${got.take(4)} expected=${expected.take(4)}")

    // per-occurrence rule on a synthetic frame (the fixture vocabulary
    // has no repeated adjacent pair): "aaa aaa ab" ⇒ (a,a) counted
    // twice per "aaa" occurrence, weighted by the 2 occurrences
    val tiny = Seq((1L, "aaa aaa ab")).toDF("doc_id", "text")
    val pairs = TextOps.bpePairsFrom(tiny).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(pairs(("a", "a")) == 4L,
      s"per-occurrence counting broken: ${pairs.toSeq.sorted}")
    assert(pairs(("a", "b")) == 1L)
  }

  test("q102 BPE training loop: round-2+ merges match the hand computation; early stop") {
    import spark.implicits._
    // vocab: abab:2, ab:1, ba:1
    //   round 1: (a,b) 2·2+1 = 5 beats (b,a) 3         → merge (a,b)
    //   round 2: abab = (ab)(ab) → (ab,ab) 2 beats (b,a) 1 — an
    //            operand that is itself a MERGE OUTPUT, the thing a
    //            one-round induction can never produce
    //   round 3: only ba has a pair left → (b,a) 1
    //   round 4: every token is one symbol → early stop
    val docs = Seq((1L, "abab abab ab ba")).toDF("doc_id", "text")
    val got = TextOps.bpeTrain(docs, rounds = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1, "a", "b", 5L), (2, "ab", "ab", 2L), (3, "b", "a", 1L)),
      s"training loop diverges from the hand computation: $got")

    // the SEAM: the trained table flows straight into q89's encode —
    // the tokenizer build consumes its own upstream
    val table = got.map { case (_, l, r, _) => (l, r) }
    val enc = TextOps.bpeEncodeCounts(docs, table).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // abab→(abab), abab→(abab), ab→(ab), ba→(ba): 4 tokens, 12 chars
    assert(enc == Seq((1L, 4L, 12L, 4L)),
      s"trained table does not encode through q89's core: $enc")

    // round 1 on the real fixture IS q86's rank-1 row
    val r1 = TextOps.q102BpeTrain(spark, sf, rounds = 1).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).head
    val q86r1 = TextOps.q86BpePairs(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).head
    assert(r1 == q86r1, s"round 1 != q86 rank 1: $r1 vs $q86r1")
  }

  test("batched BPE trainer == sequential loop, merge for merge (exhaustion included)") {
    import spark.implicits._
    // deep enough that several multi-merge batches fire AND the
    // trainer hits vocabulary exhaustion (every word fully merged) —
    // both the guard logic and the stop rule face the sequential spec
    val docs = Tables.documents(spark, sf)
    for (m <- Seq(1, 5, 30, 500)) {
      val seqRows = TextOps.bpeTrain(docs, m).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      val batRows = TextOps.bpeTrainBatched(docs, m).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      assert(batRows == seqRows,
        s"batched trainer diverged from the sequential loop at merges=$m:\n" +
          s"batched: ${batRows.take(20)}\nsequential: ${seqRows.take(20)}")
      val autoRows = TextOps.bpeTrainAuto(docs, m).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      assert(autoRows == seqRows,
        s"two-phase trainer diverged from the sequential loop at merges=$m:\n" +
          s"auto: ${autoRows.take(20)}\nsequential: ${seqRows.take(20)}")
    }
    // the driver-side loop on a cascade-heavy vocabulary (shared
    // prefixes + digit runs — the self-overlap cases the incremental
    // bookkeeping must survive) against the distributed sequential spec
    import spark.implicits._
    val cascade = Tables.customer(spark, sf)
      .select($"c_name".as("text")).limit(200)
    val cSeq = TextOps.bpeTrain(cascade, 60).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val cAuto = TextOps.bpeTrainAuto(cascade, 60).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(cAuto == cSeq, "driver loop diverged on the cascade vocabulary")
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
  }

  test("q89 == exact driver-side BPE encode recount; merges fire") {
    def encCount(w: String): Long = {
      var s = w.map(c => s"($c)").mkString
      TextOps.BpeMerges.foreach { case (l, r) =>
        s = s.replace(s"($l)($r)", s"($l$r)")
      }
      s.count(_ == '(').toLong
    }
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val expected = docs.map { case (id, text) =>
      val ws = text.toLowerCase.split(" ").filter(_.nonEmpty)
      (id, ws.length.toLong, ws.map(_.length.toLong).sum,
        ws.map(encCount).sum)
    }.toSeq
    val got = TextOps.q89BpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected,
      s"BPE encode diverges; got=${got.take(3)} expected=${expected.take(3)}")
    // merges actually fire on the fixture: tokens strictly under chars
    assert(got.map(_._4).sum < got.map(_._3).sum)
    // every token count is at least ceil(chars/longest-merged-symbol)
    assert(got.forall(r => r._4 >= r._2), "a word never encodes below 1 token")
  }

  test("q89 merge semantics: non-overlapping repeats, multi-level merges, empty doc") {
    import spark.implicits._
    // leftmost non-overlapping: "abab" under merge (a,b) -> (ab)(ab) = 2
    val tiny = Seq((1L, "abab"), (2L, ""), (3L, "the")).toDF("doc_id", "text")
    val gotAb = TextOps.bpeEncodeCounts(tiny, Seq(("a", "b"))).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(gotAb(1L) == ((1L, 4L, 2L)),
      s"overlap rule broken: ${gotAb(1L)} (both (a)(b) occurrences must merge)")
    assert(gotAb(2L) == ((0L, 0L, 0L)), "empty doc must count zeroes")
    // the full table's chained merges: t,h -> th; th,e -> the = 1 token
    val gotFull = TextOps.bpeEncodeCounts(tiny).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(gotFull(3L) == 1L,
      s"multi-level merge broken: 'the' encoded to ${gotFull(3L)} tokens")
    // cross-symbol false match must NOT fire: with merges (a,t) then
    // (t,h), "ath" becomes (at)(h) and the (t)(h) merge cannot apply
    // inside (at)(h)
    val cross = Seq((1L, "ath")).toDF("doc_id", "text")
    val gotCross = TextOps.bpeEncodeCounts(
      cross, Seq(("a", "t"), ("t", "h"))).collect()
    assert(gotCross.head.getLong(3) == 2L,
      "wrapper representation must prevent cross-symbol merges")
  }

  test("q90 == exact driver-side budget recount over the fixture") {
    def encCount(w: String): Long = {
      var s = w.map(c => s"($c)").mkString
      TextOps.BpeMerges.foreach { case (l, r) =>
        s = s.replace(s"($l)($r)", s"($l$r)")
      }
      s.count(_ == '(').toLong
    }
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val keepIds = docs.groupBy(_._3).values.map(_.map(_._1).min).toSet
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val toks = ds.map { case (id, _, text) =>
        val ws = text.toLowerCase.split(" ").filter(_.nonEmpty)
        (id, ws.length.toLong, ws.map(encCount).sum)
      }
      (src, ds.length.toLong, toks.map(_._2).sum, toks.map(_._3).sum,
        toks.count(t => keepIds(t._1)).toLong,
        toks.filter(t => keepIds(t._1)).map(_._3).sum)
    }.toSeq.sortBy(_._1)
    val got = TextOps.q90TokenBudget(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected,
      s"budget diverges; got=${got.take(2)} expected=${expected.take(2)}")
  }

  test("q90 dedup debit: cross-source duplicates book to the keeper's source") {
    import spark.implicits._
    // texts of unmergeable single-letter words: 1 token per word
    val tiny = Seq(
      (1L, "srcA", "x y"), (2L, "srcB", "x y"),
      (3L, "srcB", "z"), (4L, "srcB", "x y")
    ).toDF("doc_id", "source", "text")
    val got = TextOps.tokenBudget(tiny).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // srcA keeps its copy (min doc_id); srcB's two copies are debited
    // and only "z" survives — net tokens 1 of gross 5
    assert(got("srcA") == ((1L, 2L, 2L, 1L, 2L)), s"srcA: ${got("srcA")}")
    assert(got("srcB") == ((3L, 5L, 5L, 1L, 1L)), s"srcB: ${got("srcB")}")
  }

  test("q94 on the fixture == exact driver-side coverage curve") {
    val tokens = graft.Tables.documents(spark, sf)
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty))
    val total = tokens.length.toLong
    val ranked = tokens.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, n) => (-n, t) }
    val cums = ranked.scanLeft(0L)(_ + _._2).drop(1)
    val expected = TextOps.CoverageTargets.map { p =>
      val i = cums.indexWhere(c => c * 100 >= p * total)
      (p, (i + 1).toLong, cums(i), total)
    }
    val got = TextOps.q94VocabCoverage(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the curve is monotone and ends under the full vocab (Zipf head)
    assert(got.map(_._2) == got.map(_._2).sorted)
    assert(got.last._2 <= ranked.size)
  }

  test("q105 entropy: planted analytic cases + fixture recount") {
    import spark.implicits._
    val planted = Seq(
      (1L, "a b c d"),          // uniform: H = ln 4
      (2L, "a a a a"),          // constant: H = 0
      (3L, ""),                 // empty: defined 0
      (4L, "a a b")             // mixed: -(2/3)ln(2/3)-(1/3)ln(1/3)
    ).toDF("doc_id", "text")
    val got = TextOps.tokenEntropy(planted).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    assert(got(1L) == ((4L, 4L, r6(math.log(4)))))
    assert(got(2L) == ((4L, 1L, 0.0)))
    assert(got(3L) == ((0L, 0L, 0.0)))
    val h4 = -(2.0 / 3) * math.log(2.0 / 3) - (1.0 / 3) * math.log(1.0 / 3)
    assert(got(4L) == ((3L, 2L, r6(h4))))

    // fixture: recount independently and pin the analytic bounds
    val rows = TextOps.q105TokenEntropy(spark, sf).collect()
    val texts = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val toks = texts(r.getLong(0)).toLowerCase.split(" ").filter(_.nonEmpty)
      val n = toks.length.toDouble
      val expect =
        if (n == 0) 0.0
        else toks.groupBy(identity).values
          .map(g => -(g.length / n) * math.log(g.length / n)).sum
      assert(r.getLong(1) == toks.length && r.getLong(2) == toks.distinct.length)
      assert(math.abs(r.getDouble(3) - expect) < 1e-6,
        s"doc ${r.getLong(0)}: ${r.getDouble(3)} vs $expect")
      assert(r.getDouble(3) >= 0 &&
        r.getDouble(3) <= math.log(math.max(r.getLong(2), 1)) + 1e-6,
        "entropy outside [0, ln d]")
    }
  }

  test("q107 PII scrub: planted positives redact in order; clean text untouched") {
    import spark.implicits._
    val planted = Seq(
      (1L, "contact jane.doe+spam@sub.example.co.uk today"),
      (2L, "server at 10.0.0.1 and 192.168.255.3 rebooted"),
      (3L, "call +1 (555) 123-4567 or 020 7946 0958 now"),
      (4L, "mail bob@host.org from 127.0.0.1 tel 555-123-9876"),
      (5L, "plain words only no identifiers here"),
      (6L, "")
    ).toDF("doc_id", "text")
    val got = TextOps.piiScrub(planted).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap

    assert(got(1L) == (("contact [EMAIL] today", 1, 0, 0)))
    assert(got(2L) == (("server at [IP] and [IP] rebooted", 0, 2, 0)))
    assert(got(3L) == (("call [PHONE] or [PHONE] now", 0, 0, 2)))
    assert(got(4L) == (("mail [EMAIL] from [IP] tel [PHONE]", 1, 1, 1)))
    assert(got(5L) == (("plain words only no identifiers here", 0, 0, 0)))
    assert(got(6L) == (("", 0, 0, 0)))

    // ordering property: the digits inside an email's host or an IP
    // must never be re-counted as a phone (each pattern scans the
    // PREVIOUS stage's output)
    val tricky = Seq((7L, "x 123456789@example.com y 11.22.33.44 z"))
      .toDF("doc_id", "text")
    val t = TextOps.piiScrub(tricky).collect().head
    assert(t.getString(1) == "x [EMAIL] y [IP] z")
    assert((t.getInt(2), t.getInt(3), t.getInt(4)) == ((1, 1, 0)))

    // fixture: the word-soup corpus is clean — zero matches in every
    // category, text bit-identical (the q107 oracle's zeros)
    val audit = TextOps.q107PiiAudit(spark, sf).collect().head
    assert(audit.getLong(1) == 0 && audit.getLong(2) == 0 &&
      audit.getLong(3) == 0 && audit.getLong(4) == 0,
      s"false positives on clean corpus: $audit")
    val docs = Tables.documents(spark, sf)
    assert(TextOps.piiScrub(docs).select("text").collect().map(_.getString(0))
      .sameElements(docs.select("text").collect().map(_.getString(0))),
      "scrub rewrote clean text")
  }

  test("q108 novelty curve: exact driver recount over textual grams") {
    import spark.implicits._
    val rows = TextOps.q108NoveltyCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def grams(t: String): Set[String] = {
      val toks = t.toLowerCase.split(" ").filter(_.nonEmpty)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val byBucket = docs.groupBy(_._1 / TextOps.NoveltyBucketDocs).view
      .mapValues(_.flatMap(d => grams(d._2)).toSet).toMap
    assert(rows.map(_._1).toSet == byBucket.keySet)
    val seenBefore = collection.mutable.Set.empty[String]
    rows.sortBy(_._1).foreach { case (b, nGrams, nNew) =>
      val g = byBucket(b)
      assert(nGrams == g.size.toLong, s"bucket $b n_grams")
      assert(nNew == (g -- seenBefore).size.toLong, s"bucket $b n_new")
      seenBefore ++= g
    }
    // conservation: every distinct gram is minted exactly once
    assert(rows.map(_._3).sum == seenBefore.size.toLong)
    // bucket 0 mints everything it sees
    val b0 = rows.find(_._1 == rows.map(_._1).min).get
    assert(b0._2 == b0._3)
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
  }

  test("q108 gram source: HashedShingles generator == gramHashes lambda") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // opt round 20 swapped q108's interpreted per-gram lambda chain
    // (TextOps.gramHashes — retained as the executable specification,
    // the simhashFromHashesHof precedent) for the codegen'd
    // HashedShingles generator. Pin the distinct-gram-hash identity the
    // swap relies on: per doc, the generator's emission set equals the
    // lambda form's distinct set.
    val docs = Tables.documents(spark, sf)
    val gen = docs.select($"doc_id",
      graft.functions.HashedShingles.hashedShingles($"text", 3).as("gh"))
    val lam = docs
      .select($"doc_id", TextOps.toks($"text").as("t"))
      .select($"doc_id", explode(TextOps.gramHashes($"t", 3)).as("gh"))
      .distinct()
    assert(gen.exceptAll(lam).isEmpty && lam.exceptAll(gen).isEmpty,
      "generator and lambda gram-hash sets diverge")
  }

  test("q113 gate ROC == driver recount; monotone cumulative structure") {
    import spark.implicits._
    // independent driver recount: q68 score + q53 cascade verdict per
    // doc, grouped by distinct score, cumulative from the top
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16)
    }
    val rows = Tables.documents(spark, sf)
      .select($"lang", $"text").collect().map { r =>
        val toks = r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
        val score = toks.map(t => TextOps.weightComponent(
          (h32(t) % TextOps.HashDim).toInt)).sum
        val n = toks.length.toLong
        val keep = TextOps.YieldLangs.contains(r.getString(0)) &&
          n >= TextOps.YieldMinTokens && n <= TextOps.YieldMaxTokens &&
          toks.distinct.length * 100 >= n * TextOps.YieldMinDistinctPct &&
          toks.count(TextOps.Stopwords.contains) * 100 >= n * TextOps.YieldMinStopPct
        (score, if (keep) 1L else 0L)
      }
    val totalPos = rows.map(_._2).sum
    val grouped = rows.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toSeq
      .sortBy(-_._1)
    var (cumN, cumTp) = (0L, 0L)
    val expected = grouped.map { case (thr, (n, npos)) =>
      cumN += n; cumTp += npos
      (thr, cumN, cumTp, cumN - cumTp,
        cumTp * 1000000L / cumN,
        if (totalPos == 0) 0L else cumTp * 1000000L / totalPos)
    }
    val got = TextOps.q113GateRoc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // structure: thresholds strictly descending, n_ge strictly
    // ascending, recall non-decreasing, last row covers the corpus
    assert(got.map(_._1) == got.map(_._1).sorted.reverse)
    assert(got.last._2 == rows.length.toLong)
    assert(got.map(_._6) == got.map(_._6).sorted)
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
  }

  test("q109 fertility: per-lang rollup == driver recount of q89 per-doc counts") {
    import spark.implicits._
    val lang = Tables.documents(spark, sf).select($"doc_id", $"lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val per = TextOps.q89BpeEncode(spark, sf).collect()
      .map(r => (lang(r.getLong(0)), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = per.groupBy(_._1).view.mapValues { g =>
      val (w, c, t) = (g.map(_._2).sum, g.map(_._3).sum, g.map(_._4).sum)
      (g.size.toLong, w, c, t, t * 1000 / w, c * 1000 / t)
    }.toMap
    val got = TextOps.q109BpeFertility(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == expect, s"fertility rollup drifted: $got vs $expect")
    // equity reading is possible: every lang has a defined fertility
    assert(got.values.forall(_._5 >= 1000L),
      "BPE cannot emit fewer tokens than words")
  }

  test("q111 gate distillation: trajectory == driver perceptron; pocket rule") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val featDim = TextOps.DistillFeatDim
    def h32(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val feat = docs.map { case (lang, text) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val n = toks.length; val d = toks.distinct.length
      val stp = toks.count(TextOps.Stopwords.contains)
      val keep = TextOps.YieldLangs.contains(lang) &&
        n >= TextOps.YieldMinTokens && n <= TextOps.YieldMaxTokens &&
        d.toLong * 100 >= n.toLong * TextOps.YieldMinDistinctPct &&
        stp.toLong * 100 >= n.toLong * TextOps.YieldMinStopPct
      val x = Array.fill(featDim)(0L)
      toks.foreach(t => x((h32(t) % featDim).toInt) += 1)
      (if (keep) 1L else -1L, x)
    }
    var w = Array.fill(featDim)(0L)
    val expect = (1 to TextOps.DistillEpochs + 1).map { epoch =>
      var tp = 0L; var fp = 0L; var tn = 0L; var fn = 0L
      val delta = Array.fill(featDim)(0L)
      feat.foreach { case (y, x) =>
        val sc = (0 until featDim).map(i => w(i) * x(i)).sum
        if (sc >= 0) { if (y == 1) tp += 1 else fp += 1 }
        else { if (y == -1) tn += 1 else fn += 1 }
        if (y * sc <= 0) (0 until featDim).foreach(i => delta(i) += y * x(i))
      }
      if (epoch <= TextOps.DistillEpochs)
        w = w.zip(delta).map { case (a, b) => a + b }
      (epoch.toLong, tp, fp, tn, fn)
    }
    val pocket = expect.minBy { case (e, _, fp, _, fn) => (fp + fn, e) }._1
    val expectRows = expect.map { case (e, tp, fp, tn, fn) =>
      (e, tp, fp, tn, fn, fp + fn, if (e == pocket) 1L else 0L) }

    val got = TextOps.q111GateDistill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expectRows, s"trajectory drifted:\n$got\nvs\n$expectRows")
    assert(got.map(_._7).sum == 1L, "exactly one pocket epoch")
    assert(got.map(t => t._2 + t._3 + t._4 + t._5).distinct.size == 1,
      "confusion rows must partition the corpus")
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
  }

  test("gateTrainSampled: deterministic subsample epochs, pocket quality within the full-batch envelope") {
    val docs = Tables.documents(spark, sf)
    val (rowsF, snapsF) = TextOps.gateTrainCore(
      docs, TextOps.DistillEpochs, TextOps.DistillFeatDim)
    val wF = snapsF((TextOps.gatePocketEpoch(rowsF) - 1).toInt)
    val (rowsS, snapsS) = TextOps.gateTrainSampled(docs)
    val wS = snapsS((TextOps.gatePocketEpoch(rowsS) - 1).toInt)
    // the sample is real: epochs see strictly fewer docs
    def corpus(rows: Seq[(Long, Long, Long, Long, Long)]): Long =
      rows.head._2 + rows.head._3 + rows.head._4 + rows.head._5
    assert(corpus(rowsS) < corpus(rowsF),
      s"sampled trainer saw the whole corpus: ${corpus(rowsS)}")
    assert(corpus(rowsS) > 0, "sample vacuous")
    // deterministic: a re-run reproduces the trajectory bit for bit
    assert(TextOps.gateTrainSampled(docs)._1 == rowsS,
      "sampled trainer is not reproducible")
    // quality envelope on the FULL corpus: the sampled pocket model's
    // error rate within 5 points of the full-batch pocket's (the
    // stated contract; fixture values recorded in bench/NOTES.md)
    val (tpF, fpF, tnF, fnF) = TextOps.gateConfusionWith(docs, wF)
    val (_, fpS, _, fnS) = TextOps.gateConfusionWith(docs, wS)
    val n = tpF + fpF + tnF + fnF
    val (errF, errS) = (fpF + fnF, fpS + fnS)
    info(s"full-corpus err: full-batch $errF/$n, " +
      s"sampled(${TextOps.GateSampleMille}permille) $errS/$n")
    assert(errS <= errF + n / 20,
      s"sampled pocket fell out of the envelope: $errS vs $errF of $n")
    assert(org.apache.spark.sql.graftShims.cacheIsEmpty(spark))
  }
}
