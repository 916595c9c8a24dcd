package graft

import graft.queries.{DedupOps, PipelineOps, SimilarityOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the dedup chain (bench/NOTES.md): synthesize a 10×
  * corpus from sf0.1 and measure q13/q27/q43/q47 solo, plus the
  * closure's measured round count — the O(log² n) and LSH-cap claims
  * argued in the scaladocs, checked against a real scale step.
  *
  * The 10× corpus is ten replicas of the sf0.1 documents; replica
  * r > 0 suffixes every token with `~r`, so replicas share no shingles
  * (no cross-replica near-dups) and each replica reproduces the base
  * corpus's intra-replica pair structure — pairs and nodes both scale
  * ~10×, which is the clean scaling question ("same data distribution,
  * ten times more of it").
  */
object ProfScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val baseDir = sys.env.getOrElse("PROF_BASE", "/root/testdata/sf0.1")
    val scaleDir = sys.env.getOrElse("PROF_SCALE_DIR", "/tmp/scale10")
    val replicas = sys.env.getOrElse("PROF_REPLICAS", "10").toInt

    // PROF_RETRIEVAL_ONLY: synthesize only the PLAIN replicas and run
    // only the retrieval block (q76/q77/q79) — the 100×-decade probe
    // (VERDICT r11 #6): PROF_REPLICAS=100 takes the block to 500k docs
    // the way the closure chain went in round 11.
    val retrievalOnly = sys.env.contains("PROF_RETRIEVAL_ONLY")

    // --- synthesize the Nx corpus ---------------------------------
    val base = Tables.documents(spark, baseDir)
    if (!retrievalOnly) {
      val union = (0 until replicas).map { r =>
        if (r == 0) base
        else base.select(
          ($"doc_id" + lit(r.toLong * 10000000L)).as("doc_id"),
          $"lang", $"source",
          concat_ws(" ",
            transform(split($"text", " "), t => concat(t, lit(s"~$r"))))
            .as("text"),
          $"n_chars")
      }.reduce(_ unionByName _)
      union.repartition(32).write.mode("overwrite")
        .parquet(s"$scaleDir/documents.parquet")
      println(s"[scale] corpus: ${Tables.documents(spark, scaleDir).count()} docs " +
        s"($replicas x ${base.count()})")
    }

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $name: $s%.2f s, $n rows")
      s
    }

    // PROF_SKIP_OLD: synthesize the corpus but only time the newest
    // section (dev loop for incremental probe extensions).
    val skipOld = sys.env.contains("PROF_SKIP_OLD")
    // PROF_CHAIN_ONLY: time ONLY the q13→q43→q47 dedup/closure chain
    // (the two heaviest bench queries) — the second-decade probe
    // VERDICT r10 #6 asks for, runnable without paying the full sweep.
    val chainOnly = sys.env.contains("PROF_CHAIN_ONLY")

    // --- solo timings, base then Nx -------------------------------
    if ((!skipOld || chainOnly) && !retrievalOnly)
      Seq("base" -> baseDir, s"${replicas}x" -> scaleDir).foreach {
      case (tag, dir) =>
        var nPairs = 0L
        time(s"q13 $tag") {
          nPairs = DedupOps.withQ13NeardupPairs(spark, dir)(_.count())
          nPairs
        }
        if (!chainOnly) time(s"q27 $tag") {
          val n = DedupOps.q27NgramJaccard(spark, dir).count()
          spark.catalog.clearCache(); n
        }
        time(s"q43 $tag") {
          DedupOps.withQ43DupClusters(spark, dir)(_.count())
        }
        time(s"q47 $tag") {
          val n = DedupOps.q47ClusterSizes(spark, dir).count()
          spark.catalog.clearCache(); n
        }
        // closure rounds: same pair relation q43 closes. Pair volume
        // (q13's count above) must scale ~linearly with the corpus and
        // rounds must stay DIAMETER-driven (constant across replicas:
        // replicas don't link, so the largest component is unchanged).
        DedupOps.withQ13NeardupPairs(spark, dir) { pairs =>
          val (labels, rounds) = DedupOps.ccWithRounds(
            pairs.select($"doc_a", $"doc_b"))
          val n = labels.count()
          labels.unpersist()
          println(s"[scale] closure $tag: $rounds rounds, $n labeled nodes, " +
            s"$nPairs pairs")
          n
        }
    }

    // chain-only mode ends here: everything below is the full sweep
    // (replica synthesis for other tables included) the flag skips
    if (chainOnly) { spark.stop(); return }

    // --- round-9 pipeline operators at the same scale step ----------
    // embeddings replicas for q54: same vectors under shifted ids, so
    // the quantizer stats are identical by construction — timing-valid
    if (!retrievalOnly) {
    val embBase = Tables.embeddings(spark, baseDir)
    (0 until replicas).map { r =>
      if (r == 0) embBase
      else embBase.select(($"vec_id" + lit(r.toLong * 10000000L)).as("vec_id"),
        $"embedding", $"label")
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$scaleDir/embeddings.parquet")

    if (!skipOld) Seq("base" -> baseDir, s"${replicas}x" -> scaleDir).foreach {
      case (tag, dir) =>
        // folds, not counts: a bare count() lets column pruning drop
        // the computation under test from the narrow plans
        time(s"q51 $tag") {
          PipelineOps.q51SeqPack(spark, dir)
            .agg(bit_xor($"seq"), sum($"n_tokens")).collect(); 1L
        }
        time(s"q52 $tag") { PipelineOps.q52Decontam(spark, dir).count() }
        time(s"q53 $tag") { TextOps.q53GateYield(spark, dir).collect().length.toLong }
        time(s"q54 $tag") { SimilarityOps.q54Sq8TopK(spark, dir).collect().length.toLong }
        time(s"q55 $tag") {
          TextOps.q55TokenSurprisal(spark, dir)
            .agg(bit_xor($"surprisal_unats")).collect(); 1L
        }
        // this session's additions: consume the rewritten text / the
        // drift score so pruning can't drop the work under test
        time(s"q56 $tag") {
          DedupOps.q56PassageDedup(spark, dir)
            .agg(bit_xor(xxhash64($"clean_text")), sum($"n_kept")).collect(); 1L
        }
        time(s"q57 $tag") {
          DedupOps.withQ57DupProvenance(spark, dir)(_.count())
        }
        time(s"q58 $tag") {
          TextOps.withQ58SourceDrift(spark, dir)(
            _.agg(bit_xor($"tv_ppm")).collect()); 1L
        }
    }

    // --- round-10 additions at the same scale step ------------------
    // q63 needs orders + lineitem: same replica trick — keys shift,
    // dates stay, so each replica reproduces the base's interval/point
    // density and the day axis stays CALENDAR-sized (the per-day
    // aggregate's cardinality must not grow with corpus size; only its
    // counts do — exactly the property the probe checks).
    import graft.queries.RelationalOps
    val ordBase = Tables.orders(spark, baseDir)
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    (0 until replicas).map { r =>
      if (r == 0) ordBase
      else ordBase.select(($"o_orderkey" + lit(r.toLong * 100000000L)).as("o_orderkey"),
        $"o_orderdate", $"o_orderpriority")
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$scaleDir/orders.parquet")
    val liBase = Tables.lineitem(spark, baseDir).select($"l_shipdate")
    (0 until replicas).map(_ => liBase).reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$scaleDir/lineitem.parquet")

    if (!skipOld) Seq("base" -> baseDir, s"${replicas}x" -> scaleDir).foreach {
      case (tag, dir) =>
        time(s"q62 $tag") {
          val n = DedupOps.q62DeltaDedup(spark, dir).count()
          spark.catalog.clearCache(); n
        }
        time(s"q63 $tag") {
          RelationalOps.q63RangeJoin(spark, dir)
            .agg(bit_xor($"n_shipped"), sum($"n_shipped")).collect(); 1L
        }
        time(s"q64 $tag") {
          val n = PipelineOps.q64MixtureBalance(spark, dir).count()
          spark.catalog.clearCache(); n
        }
    }

    // --- retrieval terminal + model gates at the same scale step ----
    // q67/q70 probe vec_id < 10 and q69's eval set is vec_id < 20 —
    // replica ids are shifted by 10M, so the probe/eval sides stay
    // base-sized while the corpus side scales: exactly the serving
    // question (10× corpus, same query load).
    Seq("base" -> baseDir, s"${replicas}x" -> scaleDir).foreach {
      case (tag, dir) =>
        time(s"q67 $tag") {
          SimilarityOps.q67IvfPqTopK(spark, dir).collect().length.toLong
        }
        time(s"q68 $tag") {
          TextOps.q68LinearScore(spark, dir)
            .agg(bit_xor($"score_micro"), sum($"n_tokens")).collect(); 1L
        }
        time(s"q69 $tag") {
          SimilarityOps.q69SemanticDecontam(spark, dir).count()
        }
        time(s"q70 $tag") {
          SimilarityOps.q70RerankTopK(spark, dir).collect().length.toLong
        }
        time(s"q74 $tag") {
          SimilarityOps.q74ResidualIvfPq(spark, dir).collect().length.toLong
        }
        time(s"q75 $tag") {
          TextOps.q75TextChunks(spark, dir)
            .agg(bit_xor(xxhash64($"chunk_text")), sum($"n_toks")).collect(); 1L
        }
    }
    } // !retrievalOnly

    // --- vocabulary-statistics invariants under exact duplication ----
    // The dedup-probe corpus suffixes replica tokens (so replicas share
    // no shingles) — that DILUTES relative frequencies 10× and empties
    // the heavy-hitter set, which is correct but uninformative. For the
    // vocabulary operators the right scale question is exact
    // duplication: token texts unchanged, every count ×N. Then q71's
    // set must keep its MEMBERSHIP with counts ×N, and q72's PMI is
    // bit-identical (the ratio is scale-free: ×N cancels between
    // numerator and denominator) while its pair counts scale ×N —
    // exact invariants, asserted, not eyeballed.
    val plainDir = s"$scaleDir/plain"
    (0 until replicas).map { r =>
      if (r == 0) base
      else base.select(
        ($"doc_id" + lit(r.toLong * 10000000L)).as("doc_id"),
        $"lang", $"source", $"text", $"n_chars")
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$plainDir/documents.parquet")

    if (!retrievalOnly) {
    val hhBase = TextOps.withQ71HeavyHitters(spark, baseDir)(
      _.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    time(s"q71 plain${replicas}x") {
      val m = TextOps.withQ71HeavyHitters(spark, plainDir)(
        _.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      require(m == hhBase.map { case (t, n) => t -> n * replicas },
        s"q71 heavy-hitter invariant broke: base=${hhBase.size} scaled=${m.size}")
      m.size.toLong
    }
    println(s"[scale] q71 invariant held: ${hhBase.size} heavy hitters, " +
      s"membership identical, counts x$replicas exactly")
    val pmiBase = TextOps.withQ72Collocations(spark, baseDir)(
      _.collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap)
    // pmi_e5nats equality rides the q55-class acceptance: the scaled
    // doubles differ by a few ulps, so the floored 10-µnat unit can
    // flip only when ln lands within ~1e-10 of a boundary (~1e-8 over
    // the whole pair table at the widened 1e5 floor)
    time(s"q72 plain${replicas}x") {
      val m = TextOps.withQ72Collocations(spark, plainDir)(
        _.collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap)
      require(m == pmiBase.map { case (k, (nXy, pmi)) =>
        k -> (nXy * replicas, pmi) },
        s"q72 PMI invariant broke: base=${pmiBase.size} scaled=${m.size}")
      m.size.toLong
    }
    println(s"[scale] q72 invariant held: ${pmiBase.size} pairs, counts " +
      s"x$replicas, pmi_e5nats bit-identical")
    } // !retrievalOnly

    // --- round-11 retrieval block at the same scale step ------------
    // q76/q77 over plain replicas: no exact output invariant (BM25's
    // +0.5 idf smoothing and the add-one LM are deliberately not
    // scale-invariant), so these are WALL-CLOCK probes — both should
    // scale ~linearly (scan-bound; the top-k exchange is fixed) — plus
    // structural checks that the result stays a full top-k.
    import graft.queries.RetrievalOps
    Seq("base" -> baseDir, s"plain${replicas}x" -> plainDir).foreach {
      case (tag, dir) =>
        time(s"q76 $tag") {
          val rows = RetrievalOps.q76Bm25TopK(spark, dir).collect()
          require(rows.length == 30, s"expected 3x10 rows, got ${rows.length}")
          rows.length.toLong
        }
        time(s"q77 $tag") {
          RetrievalOps.q77Bm25Indexed(spark, dir).count()
        }
    }
    // q79 invariant on plain replicas: the model is GLOBAL and scores
    // depend only on text, so every replica copy of a doc must score
    // identically to its base copy (same n_bigrams, same xent) — the
    // layout/scale-independence the scaladoc claims. The cost VALUES
    // shift with scale (add-one smoothing), so the check compares
    // copies within the scaled run, not against base.
    time(s"q79 plain${replicas}x copies-consistent") {
      val scores = TextOps.q79BigramLm(spark, plainDir).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val baseIds = scores.keySet.filter(_ < 10000000L)
      baseIds.foreach { id =>
        (1 until replicas).foreach { r =>
          val copy = id + r.toLong * 10000000L
          require(scores(copy) == scores(id),
            s"replica copy $copy scored differently from base $id")
        }
      }
      baseIds.size.toLong
    }
    println(s"[scale] q79 invariant held: every replica copy scores " +
      "identically to its base doc")

    // --- round-12 additions at the same scale step -------------------
    // q85/q87 over plain replicas: wall probes (scan/build-bound like
    // q76/q77, fixed top-k exchange) + full-result structural check.
    Seq("base" -> baseDir, s"plain${replicas}x" -> plainDir).foreach {
      case (tag, dir) =>
        time(s"q85 $tag") {
          val rows = RetrievalOps.q85PassageBm25(spark, dir).collect()
          require(rows.length == 30, s"expected 3x10 rows, got ${rows.length}")
          rows.length.toLong
        }
        time(s"q87 $tag") {
          RetrievalOps.q87PassageIndexed(spark, dir).count()
        }
    }
    // q89 invariant on plain replicas: a pure per-row encode — every
    // replica copy must count identically to its base doc; wall scales
    // with input bytes.
    time(s"q89 plain${replicas}x copies-consistent") {
      val counts = TextOps.q89BpeEncode(spark, plainDir).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val baseIds = counts.keySet.filter(_ < 10000000L)
      baseIds.foreach { id =>
        (1 until replicas).foreach { r =>
          require(counts(id + r.toLong * 10000000L) == counts(id),
            s"replica copy of $id encoded differently")
        }
      }
      baseIds.size.toLong
    }
    println(s"[scale] q89 invariant held: every replica copy encodes " +
      "identically to its base doc")
    // q88 invariant on EXACT embedding replicas (same vectors, shifted
    // ids): every r>0 copy has its r=0 twin at cosine 1.0 in the same
    // cell with a smaller id, so ALL replicas must be pruned and the
    // r=0 decisions must equal the base run exactly. This is also the
    // honest quadratic probe: in-cell pairs scale ×N² under exact
    // duplication (they ARE dups — the work is the answer), which is
    // why a production run grows nlist with n to keep cells bounded.
    val embReplicaDir = s"$scaleDir/embdup"
    val embBase10 = Tables.embeddings(spark, baseDir)
    (0 until replicas).map { r =>
      if (r == 0) embBase10
      else embBase10.select(
        ($"vec_id" + lit(r.toLong * 10000000L)).as("vec_id"),
        $"embedding", $"label")
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$embReplicaDir/embeddings.parquet")
    val keptBase = SimilarityOps.q88SemDedup(spark, baseDir).collect()
      .map(r => (r.getLong(0), r.getInt(2))).toMap
    time(s"q88 dup${replicas}x") {
      val dec = SimilarityOps.q88SemDedup(spark, embReplicaDir).collect()
        .map(r => (r.getLong(0), r.getInt(2))).toMap
      dec.foreach { case (id, kept) =>
        if (id >= 10000000L)
          require(kept == 0, s"replica $id survived its exact twin")
        else require(kept == keptBase(id),
          s"base decision flipped under duplication at vec $id")
      }
      dec.size.toLong
    }
    println(s"[scale] q88 invariant held: all ${replicas - 1}x replicas " +
      "pruned, base decisions unchanged")
    spark.stop()
  }
}
