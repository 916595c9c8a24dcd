package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The operators composed into the thing they exist for: one
  * training-data preparation pipeline over a raw `(doc_id, lang,
  * source, text)` corpus. Each stage is the verified machinery of an
  * inventory query, chained in the order a real corpus run uses:
  *
  *   1. EXACT dedup (q09 rule) — keep the lowest doc_id per identical
  *      text; cheapest filter first, and near-dup must not waste work
  *      on byte-identical copies.
  *   2. Language gate (q16's downstream contract), then the OPTIONAL
  *      passage-level rewrite (q56's first-occurrence rule —
  *      boilerplate spans removed from INSIDE surviving docs,
  *      fully-duplicated docs dropped), then the minimum-length
  *      quality gate (q17's n_tokens) judging the rewritten text,
  *      then the OPTIONAL model gate (q68's hashed linear classifier,
  *      the heuristics→model filter order production pipelines use),
  *      then the OPTIONAL LM-perplexity band gate (q79's bigram model
  *      trained on the gate's own input, both tails cut — the CCNet
  *      heuristics→model→LM order; the costliest gate, so it runs
  *      last of the quality gates) —
  *      narrow-or-hash-keyed stages, run before anything that
  *      shuffles text — then the OPTIONAL decontamination gate (q52's
  *      broadcast gram join against a benchmark frame), placed before
  *      the near-dup build so contaminated docs never pay for
  *      shingling twice.
  *   3. NEAR-dup removal (q13 machinery) — MinHash-LSH candidates,
  *      exact Jaccard verify, then one of two deterministic drop rules
  *      (`Config.clusterNeardups`):
  *      - PAIRWISE (default): drop the HIGHER doc_id of every verified
  *        pair. Greedy-by-id; a doc similar to several others is
  *        dropped once, and docs linked only THROUGH a hub survive
  *        (A~B and B~C do not imply A~C at the threshold) — the rule
  *        stays local and auditable, keeps more data.
  *      - CLUSTER: close the pair relation transitively (q43's
  *        [[DedupOps.connectedComponents]]) and keep only each
  *        component's minimum id — the "one per duplicate family"
  *        rule production corpus dedups use when boilerplate chains
  *        would otherwise survive pair-local dropping.
  *   4. Rebalance — content-keyed sampling, reproducible across
  *      reruns and engines: fixed per-language rates (q41) by
  *      default, or per-source rates DERIVED from the survivor
  *      mixture (q64's arithmetic, `Config.mixWeights`) when the run
  *      targets a composition instead of keep fractions.
  *   4a. Optionally (`Config.piiScrub`), the q107 PII scrub rewrites
  *      the surviving text (emails/IPv4/phones → typed placeholders)
  *      — after the gates so only shipping docs pay the regex chain,
  *      before tagging/packing so everything downstream tokenizes
  *      scrubbed text.
  *   5. Keyword tagging (q42 core) — each surviving doc gets its
  *      TF-IDF top terms (computed over the FINAL corpus, so the df
  *      statistics describe what ships), as a rank-ordered array.
  *   6. Optionally, the [[pack]] terminal (q51 core) assigns each
  *      surviving doc its fixed-budget training-sequence slot.
  *
  * Scale shape is inherited stage by stage: 1/2/4 are narrow filters
  * (one window shuffle for the dedup keep-rule), 3 shuffles fixed-width
  * hashes in LSH buckets, 5 is two hash aggregates + a broadcast join.
  * Nothing here re-reads the corpus more than the stages need, and the
  * one internal persist (the shingle frame) is released by the loan
  * form.
  */
object CorpusPipeline {

  /** Pipeline knobs, defaulting to the inventory queries' constants.
    *
    * `neardupThreshold` and the LSH banding (`lshBands` × `lshRows`)
    * must be chosen TOGETHER: candidate recall at Jaccard j is
    * `1-(1-j^rows)^bands`, so the 16×4 default is steep around j≈0.6
    * and collapses for low thresholds (at j=0.35 it finds only ~21% of
    * true pairs — silently, since a rerun misses the same pairs the
    * first run missed). The constructor therefore REJECTS a threshold
    * below 0.5 under the default banding; lower thresholds need more
    * rows-per-band-adjusted banding supplied explicitly (e.g. 32×2 for
    * j≈0.3). */
  case class Config(
      keepLangs: Set[String] = Set("en", "de", "es", "fr", "zh"),
      minTokens: Int = 5,
      neardupThreshold: Double = 0.6,
      lshBands: Int = 16,
      lshRows: Int = 4,
      stratRates: Seq[(String, Int)] = RelationalOps.StratRates,
      defaultPerMille: Int = RelationalOps.DefaultKeepPerMille,
      topKeywords: Int = TextOps.TfidfTopK,
      clusterNeardups: Boolean = false,
      phraseExcise: Boolean = false,
      exciseTokens: Int = DedupOps.ExciseTokens,
      passageDedup: Boolean = false,
      passageTokens: Int = DedupOps.PassageTokens,
      modelGate: Boolean = false,
      perplexityBand: Option[(Long, Long)] = None,
      perplexityPerMille: Int = TextOps.HeavyHitterPerMille,
      mixWeights: Option[Seq[(String, Int)]] = None,
      defaultMixWeight: Int = PipelineOps.DefaultMixWeight,
      labelIndexPath: Option[String] = None,
      gateModelPath: Option[String] = None,
      lmModelPath: Option[String] = None,
      evalBankPath: Option[String] = None,
      piiScrub: Boolean = false) {
    require(passageTokens > 0, s"passageTokens must be > 0, got $passageTokens")
    require(exciseTokens > 0, s"exciseTokens must be > 0, got $exciseTokens")
    require(defaultMixWeight > 0,
      s"defaultMixWeight must be > 0, got $defaultMixWeight")
    mixWeights.toSeq.flatten.foreach { case (s, w) =>
      // zero divides inside the rate arithmetic (NULL under non-ANSI,
      // silently ignored by the window min — a source wiped with no
      // error); negative corrupts t_max. Fail at construction.
      require(w > 0, s"mixture weight for '$s' must be > 0, got $w")
    }
    require(neardupThreshold > 0 && neardupThreshold <= 1,
      s"neardupThreshold must be in (0, 1], got $neardupThreshold")
    perplexityBand.foreach { case (lo, hi) =>
      require(lo >= 0 && lo <= hi,
        s"perplexityBand must satisfy 0 <= lo <= hi, got [$lo, $hi]")
      // a doc needs >= 2 tokens for a defined bigram perplexity; the
      // token floor must guarantee that or the gate silently drops
      require(minTokens >= 2,
        s"perplexityBand needs minTokens >= 2, got $minTokens")
    }
    require(neardupThreshold >= 0.5 || (lshBands, lshRows) != (16, 4),
      s"neardupThreshold=$neardupThreshold is below the recall knee of " +
        "the default 16x4 LSH banding (candidate P = 1-(1-j^rows)^bands); " +
        "supply lshBands/lshRows tuned for the lower threshold")
    // the label index only replaces the CLUSTER-mode dedup stage; the
    // pairwise path would silently recompute the corpus-wide pair build
    // while the caller believes the sealed index is serving
    require(labelIndexPath.isEmpty || clusterNeardups,
      "labelIndexPath is only consumed by the cluster-dedup stage — " +
        "set clusterNeardups = true (the pairwise path never reads it)")
    // same misconfiguration class as labelIndexPath: a trained model
    // path with the gate off would silently score nothing
    require(gateModelPath.isEmpty || modelGate,
      "gateModelPath is only consumed by the model-gate stage — " +
        "set modelGate = true (no other stage scores)")
    require(lmModelPath.isEmpty || perplexityBand.nonEmpty,
      "lmModelPath is only consumed by the perplexity-band stage — " +
        "set perplexityBand (no other stage scores with the LM)")
  }

  /** The model-gate score column under `cfg`: the TRAINED pocket
    * vector loaded from `gateModelPath` when set (the round-15 model
    * artifact — the pipeline finally gates with the model it trained,
    * not the fixture constant), else q68's fixed-weight scorer. The
    * load is a featDim-row driver read at plan-construction time, so
    * a batch run (and a stream, at start) pins ONE model generation
    * for its lifetime — reproducible by `gateWeightsAt(path, gen)`. */
  private[graft] def gateScoreColumn(
      spark: org.apache.spark.sql.SparkSession, cfg: Config,
      text: org.apache.spark.sql.Column = col("text"))
    : org.apache.spark.sql.Column = cfg.gateModelPath match {
    case Some(p) =>
      TextOps.linearScoreMicroWith(text, TextOps.gateWeightsAt(spark, p))
    case None => TextOps.linearScoreMicro(text)
  }

  /** Run `f` over the prepared corpus, then release the pipeline's
    * internal cache — the composition-safe entry point.
    *
    * `evalDocs`: optional `(doc_id, text)` benchmark frame; when
    * present, documents sharing any n-gram with it are DROPPED right
    * after the narrow gates (the q52 decontamination check as a
    * pipeline stage — before the near-dup build so contaminated docs
    * never pay for shingling twice). */
  def withPrepared[T](
      docs: DataFrame, cfg: Config = Config(),
      evalDocs: Option[DataFrame] = None)(
      f: DataFrame => T): T = {
    val (result, handles) = build(docs, cfg, evalDocs)
    try f(result) finally handles.foreach(_.unpersist())
  }

  /** Plain form: prepared corpus `(doc_id, lang, source, text,
    * keywords)`, one row per surviving doc, ordered by doc_id. Cache
    * lifecycle is caller-owned (see [[withPrepared]]). */
  def prepare(
      docs: DataFrame, cfg: Config = Config(),
      evalDocs: Option[DataFrame] = None): DataFrame =
    build(docs, cfg, evalDocs)._1

  /** Packing terminal: assign every prepared doc its fixed-budget
    * training-sequence slot (the q51 operator over the pipeline's
    * output — the LAST stage of a real corpus run, after which the
    * writer groups by (shard, seq) to emit training files). Returns
    * `(doc_id, shard, n_tokens, seq, seq_off, crosses)`, unordered. */
  def pack(
      prepared: DataFrame,
      budget: Int = 512, shards: Int = 8): DataFrame =
    PipelineOps.seqPack(prepared, budget, shards)

  /** Shuffled-order packing terminal (q60 core): concatenate the
    * prepared corpus in the deterministic EPOCH-SHUFFLE order (q59's
    * permutation) and cut fixed-budget sequences — the manifest the
    * trainer actually consumes, where `global_pos`/`seq` are resume
    * offsets into the training stream. [[pack]] remains the
    * doc-id-ordered variant for layouts that shuffle at read time.
    * Returns `(doc_id, shard, global_pos, n_tokens, seq, seq_off,
    * crosses)`, unordered; a new `epoch` yields an independent,
    * equally-deterministic order without touching the corpus. */
  def packShuffled(
      prepared: DataFrame,
      budget: Int = 512,
      epoch: Int = PipelineOps.ShuffleEpoch,
      shards: Int = PipelineOps.ShuffleShards): DataFrame =
    PipelineOps.shuffledSeqPack(prepared, epoch, shards, budget)

  /** Pipeline terminal: persist the prepared corpus as
    * LANG-PARTITIONED parquet — the layout downstream training reads
    * want (a per-language consumer prunes to its own partition
    * directories; the partition filter never touches file contents).
    * Rows are repartitioned by `lang` so each partition value is
    * written by few tasks (not `shuffle.partitions` fragments), sorted
    * by doc_id within files for run-length-friendly encoding and
    * reproducible file bytes, and capped at `maxRecordsPerFile` so one
    * giant language still yields object-store-sized files. */
  def write(
      prepared: DataFrame,
      path: String,
      maxRecordsPerFile: Long = 1000000L): Unit =
    prepared
      .repartition(col("lang"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("lang")
      .mode("overwrite")
      .parquet(path)

  /** Per-stage yield table over the composed pipeline — the q53 report
    * shape (`stage, n_in, n_dropped, n_out`, one row per stage that
    * RAN) computed on the REAL chain, not a re-derivation: [[build]]
    * hands back its stage-boundary frames and this counts them in
    * order, persisting each boundary so every stage's work executes
    * exactly once (stage k's count reuses stage k−1's cache). An AUDIT
    * op — the persists are the price of per-stage observability and
    * are all released before returning; the result itself is a local
    * relation of ≤ 10 rows, so nothing corpus-sized outlives the call.
    * [[yieldOracleSql]] is the DuckDB twin for the DEFAULT config. */
  def yieldReport(
      docs: DataFrame, cfg: Config = Config(),
      evalDocs: Option[DataFrame] = None): DataFrame =
    if (evalDocs.isEmpty && fastYieldEligible(cfg))
      yieldReportCounted(docs, cfg)
    else yieldReportTraced(docs, cfg, evalDocs)

  /** The configs [[yieldReportCounted]] covers: every active stage is a
    * per-row FILTER over an unchanged text column (plus the one
    * loser-id relation the near-dup stage derives), so the whole yield
    * table reduces to flag sums in ONE aggregate pass. Rewrite stages
    * (phrase/passage) change `text` mid-chain, the perplexity band
    * trains a model on a stage boundary, decontam/mixture add their own
    * joins/aggregates over intermediate frames — those configs keep the
    * traced path. */
  private[graft] def fastYieldEligible(cfg: Config): Boolean =
    !cfg.phraseExcise && !cfg.passageDedup &&
      cfg.perplexityBand.isEmpty && cfg.evalBankPath.isEmpty &&
      !cfg.piiScrub && cfg.mixWeights.isEmpty && cfg.labelIndexPath.isEmpty

  /** Traced yield: persist every stage-boundary frame of the REAL
    * chain and count them in order (stage k's count reuses stage k−1's
    * cache) — the general path for configs with rewrite stages or
    * stage-internal models, where boundary counts are not expressible
    * as flags over one frame. */
  private[graft] def yieldReportTraced(
      docs: DataFrame, cfg: Config,
      evalDocs: Option[DataFrame]): DataFrame = {
    val trace = scala.collection.mutable.Buffer.empty[(String, DataFrame)]
    val (_, handles) = build(docs, cfg, evalDocs, Some(trace))
    try {
      trace.foreach(_._2.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val counts = ("00_raw", docs.count()) +:
        trace.toSeq.map { case (n, df) => (n, df.count()) }
      yieldRows(docs, counts)
    } finally {
      trace.foreach(_._2.unpersist())
      handles.foreach(_.unpersist())
    }
  }

  /** The report's local tail, shared by both yield paths: boundary
    * counts → (stage, n_in, n_dropped, n_out) rows, ordered. */
  private def yieldRows(
      docs: DataFrame, counts: Seq[(String, Long)]): DataFrame = {
    val rows = counts.sliding(2).collect {
      case Seq((_, nIn), (stage, nOut)) => (stage, nIn, nIn - nOut, nOut)
    }.toSeq
    import docs.sparkSession.implicits._
    rows.toDF("stage", "n_in", "n_dropped", "n_out").orderBy("stage")
  }

  /** Single-aggregate yield (opt round 21, guide §1.2 "don't compute
    * things you throw away" + §2.3 "project before the exchange"): for
    * [[fastYieldEligible]] configs every boundary count is a FLAG SUM
    * over the exact-dedup window frame — a doc survives stage k iff it
    * survives stages 1..k, and each stage past the window is a per-row
    * predicate — so the traced path's five full-width boundary
    * persists + five count jobs collapse into the near-dup loser build
    * (the chain's one irreducible join machine) plus ONE narrow
    * aggregate: the corpus's text crosses exactly the exchanges the
    * PIPELINE itself needs (the window; the LSH build), never a cache
    * or count-only exchange. The loser join carries (doc_id, 5 flags)
    * rows — fixed-width, projected before the exchange. Row-for-row
    * identical to [[yieldReportTraced]] (pinned in CorpusPipelineSpec);
    * the collision guard, gate expressions and strat predicate are the
    * build()'s verbatim, evaluated under short-circuiting ANDs in
    * stage order so a collision still raises and later stages never
    * score rows an earlier stage dropped. */
  private[graft] def yieldReportCounted(
      docs: DataFrame, cfg: Config): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wholeGroup = Window.partitionBy(col("content_hash"))
    // the exact-dedup window columns over the RAW corpus — no filter:
    // the same frame carries n0 = count(*) and every survivor flag
    val flagged = docs
      .withColumn("content_hash", xxhash64(col("text")))
      .withColumn("_mnid", min(col("doc_id")).over(wholeGroup))
      .withColumn("_tmin", min(col("text")).over(wholeGroup))
      .withColumn("_tmax", max(col("text")).over(wholeGroup))
    // build()'s collision-guarded text, verbatim; only reached for
    // rows past keepExact (And short-circuits), so the raise fires on
    // exactly the rows the traced chain would raise on
    val gtext = when(col("_tmin") === col("_tmax"), col("text"))
      .otherwise(raise_error(concat(
        lit("xxhash64 collision in exact-dedup stage on content hash "),
        col("content_hash").cast("string"))))
    val keepExact = col("doc_id") === col("_mnid")
    val keepLang = keepExact && col("lang").isInCollection(cfg.keepLangs)
    val keepFloor = keepLang && (size(TextOps.toks(gtext)) >= cfg.minTokens)
    val keepGated =
      if (cfg.modelGate)
        keepFloor && (gateScoreColumn(docs.sparkSession, cfg, gtext) >= 0)
      else keepFloor
    val keepStrat = keepGated &&
      RelationalOps.stratifiedKeep(cfg.stratRates, cfg.defaultPerMille)

    // the near-dup loser relation over EXACTLY build()'s gated-survivor
    // frame (same lineage: filter → guard → gates), pairwise or cluster
    val survivors0 = flagged
      .filter(keepExact)
      .withColumn("text", gtext)
      .drop("_mnid", "content_hash", "_tmin", "_tmax")
      .filter(col("lang").isInCollection(cfg.keepLangs))
      .filter(size(TextOps.toks(col("text"))) >= cfg.minTokens)
    val survivors =
      if (cfg.modelGate)
        survivors0.filter(gateScoreColumn(docs.sparkSession, cfg) >= 0)
      else survivors0
    val (pairs, pairHandles) = DedupOps.neardupBuild(
      survivors, cfg.neardupThreshold, cfg.lshBands, cfg.lshRows,
      ordered = false)
    val (losers, ccHandles) =
      if (cfg.clusterNeardups) {
        val labels =
          try DedupOps.connectedComponentsCanonical(
            pairs.select(col("doc_a"), col("doc_b")))
          catch {
            case t: Throwable => pairHandles.foreach(_.unpersist()); throw t
          }
        (labels.filter(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id")), Seq(labels))
      } else
        (pairs.select(col("doc_b").as("doc_id")).distinct(),
          Seq.empty[DataFrame])
    val handles = pairHandles ++ ccHandles
    try {
      def cnt(c: org.apache.spark.sql.Column) =
        coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
      val r = flagged
        .select(col("doc_id"), keepExact.as("k1"), keepLang.as("k2"),
          keepFloor.as("k3"), keepGated.as("kg"), keepStrat.as("ks"))
        .join(losers.select(col("doc_id"), lit(true).as("_loser")),
          Seq("doc_id"), "left_outer")
        .agg(count(lit(1)).as("n0"), cnt(col("k1")), cnt(col("k2")),
          cnt(col("k3")), cnt(col("kg")),
          cnt(col("kg") && col("_loser").isNull),
          cnt(col("ks") && col("_loser").isNull))
        .head()
      val counts = Seq(
        Some("00_raw" -> r.getLong(0)),
        Some("01_exact" -> r.getLong(1)),
        Some("02_lang" -> r.getLong(2)),
        Some("05_floor" -> r.getLong(3)),
        if (cfg.modelGate) Some("06_model" -> r.getLong(4)) else None,
        Some("09_neardup" -> r.getLong(5)),
        Some("10_rebalance" -> r.getLong(6))).flatten
      yieldRows(docs, counts)
    } finally handles.foreach(_.unpersist())
  }

  /** DuckDB twin of [[yieldReport]] under the DEFAULT [[Config]]: the
    * q09 keep-min-id rule, the lang set, the q17 token floor, the
    * q13 all-pairs Jaccard pairwise drop (drop the higher id of every
    * verified pair — the oracle computes TRUE pairs where the engine
    * verifies LSH candidates, the q13 equivalence), and the q41
    * stratified keep, each counted at its boundary. */
  def yieldOracleSql(cfg: Config = Config()): String = {
    val langs = cfg.keepLangs.toSeq.sorted.map(l => s"'$l'").mkString(", ")
    val cases = cfg.stratRates
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")
    s"""WITH ex AS (
       |  SELECT doc_id, lang, text FROM documents
       |  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
       |), lg AS (
       |  SELECT * FROM ex WHERE lang IN ($langs)
       |), fl AS (
       |  SELECT * FROM lg
       |  WHERE len(list_filter(string_split(lower(text), ' '),
       |            x -> len(x) > 0)) >= ${cfg.minTokens}
       |), t AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(
       |           generate_series(1, greatest(len(toks) - 2, 0)),
       |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |  FROM (SELECT doc_id,
       |               list_filter(string_split(lower(text), ' '),
       |                 x -> len(x) > 0) AS toks
       |        FROM fl)
       |), losers AS (
       |  SELECT DISTINCT b.doc_id
       |  FROM t a JOIN t b ON a.doc_id < b.doc_id
       |  WHERE len(a.sh) > 0 AND len(b.sh) > 0
       |    AND len(list_intersect(a.sh, b.sh)) >=
       |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |          * ${cfg.neardupThreshold}
       |), nd AS (
       |  SELECT * FROM fl
       |  WHERE doc_id NOT IN (SELECT doc_id FROM losers)
       |), st AS (
       |  SELECT * FROM nd
       |  WHERE ${RelationalOps.contentHashModSql(RelationalOps.PerMille)} <
       |        (CASE $cases ELSE ${cfg.defaultPerMille} END)
       |), c AS (
       |  SELECT (SELECT count(*) FROM documents) AS n0,
       |         (SELECT count(*) FROM ex) AS n1,
       |         (SELECT count(*) FROM lg) AS n2,
       |         (SELECT count(*) FROM fl) AS n3,
       |         (SELECT count(*) FROM nd) AS n4,
       |         (SELECT count(*) FROM st) AS n5
       |)
       |SELECT stage, n_in, n_in - n_out AS n_dropped, n_out FROM (
       |  SELECT '01_exact' AS stage, n0 AS n_in, n1 AS n_out FROM c
       |  UNION ALL SELECT '02_lang', n1, n2 FROM c
       |  UNION ALL SELECT '05_floor', n2, n3 FROM c
       |  UNION ALL SELECT '09_neardup', n3, n4 FROM c
       |  UNION ALL SELECT '10_rebalance', n4, n5 FROM c
       |) ORDER BY stage""".stripMargin
  }

  private def build(
      docs: DataFrame, cfg: Config,
      evalDocs: Option[DataFrame] = None,
      trace: Option[scala.collection.mutable.Buffer[(String, DataFrame)]] =
        None): (DataFrame, Seq[DataFrame]) = {
    import org.apache.spark.sql.expressions.Window
    // stage-boundary hook for [[yieldReport]]: identity on the frame,
    // records (name, frame) when a trace rides along
    def mark(name: String, df: DataFrame): DataFrame = {
      trace.foreach(_ += name -> df); df
    }

    // 1. exact dedup: lowest doc_id wins per identical text. The window
    // partitions on xxhash64(text) — an 8-byte shuffle key — not on the
    // text itself (q09's 100 TB rule: full rows ride the exchange as
    // payload exactly once regardless, but the KEY the exchange hashes
    // and the window sorts must stay fixed-width). Collisions are
    // verified, not assumed: the kept row's text is guarded by
    // whole-group min(text) === max(text) — same single shuffle, one
    // extra unordered Window pass — and the stage raises rather than
    // silently dropping a distinct document (q09 scaladoc has the
    // probability analysis; q43 documents the same acceptance bound).
    // All three whole-group aggregates ride ONE unordered window spec
    // (opt round 20): the previous keep-rule was `row_number() === 1`
    // over (content_hash, doc_id) — an ORDERED window that forced a
    // sort by both keys, while `doc_id === min(doc_id)` selects the
    // identical row (doc_id is unique) from the same single exchange
    // with a partition-key-only sort. DEPENDS on doc_id uniqueness
    // (ADVICE r20): rows TYING at the minimum would all be kept where
    // row_number kept exactly one — a future multi-source union must
    // re-key or restore the ordered form.
    val wholeGroup = Window.partitionBy(col("content_hash"))
    val exact = docs
      .withColumn("content_hash", xxhash64(col("text")))
      .withColumn("_mnid", min(col("doc_id")).over(wholeGroup))
      .withColumn("_tmin", min(col("text")).over(wholeGroup))
      .withColumn("_tmax", max(col("text")).over(wholeGroup))
      .filter(col("doc_id") === col("_mnid"))
      .withColumn("text",
        when(col("_tmin") === col("_tmax"), col("text"))
          .otherwise(raise_error(concat(
            lit("xxhash64 collision in exact-dedup stage on content hash "),
            col("content_hash").cast("string")))))
      .drop("_mnid", "content_hash", "_tmin", "_tmax")
    mark("01_exact", exact)

    // 2. language gate (narrow), then the OPTIONAL passage-level
    // rewrite (q56 core — RefinedWeb's span dedup): placed after the
    // lang gate so dropped languages never pay passage hashing, and
    // BEFORE the token floor so the floor judges the REWRITTEN doc
    // (a doc hollowed out to boilerplate-free stubs should fail the
    // gate). Pure-duplicate docs (every passage already seen) leave
    // here entirely; the exact-dedup stage upstream stays — byte-dups
    // are cheaper to kill on the whole-doc hash than per passage.
    val langGated = mark("02_lang",
      exact.filter(col("lang").isInCollection(cfg.keepLangs)))
    // 2a. OPTIONAL keep-first phrase excision (q96 core — Lee et al.'s
    // ExactSubstr training-dedup rule) BEFORE the coarser passage
    // stage: phrase granularity edits inside passages, so running it
    // first leaves the passage stage only whole-chunk dups; docs
    // excised to pure repetition leave here, and the token floor below
    // judges the REWRITTEN doc (same argument as the passage stage).
    // Each REWRITE stage ends in a LAZY lineage break
    // (localCheckpoint(false)): its output `text` is a computed column,
    // and every downstream reference (the token floor, the model gate's
    // hashed features, the next rewrite's window generate) would
    // otherwise re-inline the whole rewrite expression tree — stacking
    // both rewrites with the gates multiplied the composed plan past
    // what Catalyst (and the AQE explain string) can hold. The break
    // restarts the plan from a leaf; blocks materialize once at first
    // downstream use (exactly the run that was re-deriving the rewrite
    // per consumer before) and are reclaimed by the context cleaner. A
    // 100 TB deployment checkpoints these mega-stage boundaries to
    // durable storage instead ([[write]]); same idea, different medium.
    val phraseClean =
      if (cfg.phraseExcise)
        mark("03_phrase",
          DedupOps.exciseRewrite(langGated, cfg.exciseTokens)
            .localCheckpoint(false))
      else langGated
    val passageClean =
      if (cfg.passageDedup)
        mark("04_passage",
          DedupOps.passageRewrite(phraseClean, cfg.passageTokens)
            .localCheckpoint(false))
      else phraseClean
    // heuristics first (cheap floor), then the OPTIONAL model gate
    // (q68's hashed linear classifier, score ≥ 0 keeps) — the
    // heuristics→model order every production pipeline uses; both are
    // narrow maps, so gate order costs nothing and the model never
    // scores docs the floor already killed.
    val floorGated = mark("05_floor", passageClean
      .filter(size(TextOps.toks(col("text"))) >= cfg.minTokens))
    val narrowGated =
      if (cfg.modelGate)
        mark("06_model", floorGated.filter(
          gateScoreColumn(floorGated.sparkSession, cfg) >= 0))
      else floorGated

    // 2a'. optional LM-perplexity BAND gate (q79 core — the CCNet
    // filter order: heuristics → linear model → language model): the
    // bigram LM trains on the gate's own input (self-perplexity) and
    // keeps docs whose mean bigram cost sits in the configured 10-µnat
    // band — both tails cut (low = boilerplate loops, high = token
    // soup). The most expensive gate, so it runs LAST of the quality
    // gates and before anything that shingles text. The input is a
    // diamond (heavy-hitter pass, model pass, scoring pass, and the
    // gate join's left side) — persist it; the q79 machinery's own
    // caches ride the returned handles.
    // with cfg.lmModelPath the band scores with the LOADED q118 model
    // artifact instead of self-training — the gateModelPath move for
    // the LM: the most expensive gate loses both training passes, and
    // the run pins ONE model generation (reproducible by
    // lmScoreServed(path, gen))
    val (perpGated, perpHandles) = cfg.perplexityBand match {
      case Some((lo, hi)) =>
        val shared = narrowGated
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cfg.lmModelPath match {
          case Some(p) =>
            (mark("07_perplexity",
              TextOps.perplexityGateServed(shared, lo, hi, p)),
              Seq(shared))
          case None =>
            val (kept, xentHandles) =
              TextOps.perplexityGate(shared, lo, hi, cfg.perplexityPerMille)
            (mark("07_perplexity", kept), xentHandles :+ shared)
        }
      case None => (narrowGated, Seq.empty[DataFrame])
    }

    // 2b. optional decontamination gate (q52 core): drop any doc
    // sharing an n-gram with the benchmark suite. Two sources for the
    // eval-gram relation, mutually exclusive:
    //   - `evalDocs` — the RAW suite frame, shingled in-session
    //     (q52's report);
    //   - `cfg.evalBankPath` — the PERSISTED q125 eval-gram bank,
    //     served at the generation committed when the plan is built
    //     (the lmModelPath rollout rule: one run screens against ONE
    //     bank version, and "which eval-set version was this corpus
    //     decontaminated against" is answered by that pinned
    //     generation — the question q125 exists to answer, now asked
    //     BY the pipeline instead of only alongside it).
    // Left-anti against the flagged-id relation — the broadcast gram
    // join filters map-side, so the gate costs one narrow pass over
    // survivors. The flagged-id side is bounded by contamination (rare
    // by construction) and must be BROADCAST: without the hint the
    // static planner sizes the aggregate at its exploded-gram child and
    // picks a sort-merge anti join — a full-corpus shuffle, text and
    // all. perpGated is a diamond here (the anti-join's left side AND
    // the gram probe inside the report) — persist it so the exact-dedup
    // window (and the optional passage rewrite, which shuffles text)
    // runs once, not once per branch; released with the other handles
    require(evalDocs.isEmpty || cfg.evalBankPath.isEmpty,
      "pass the eval suite EITHER as a raw frame (evalDocs) OR as a " +
        "sealed bank (cfg.evalBankPath), not both — two gram sources " +
        "would make the screen's provenance ambiguous")
    val (gated, gateHandles) =
      if (evalDocs.isEmpty && cfg.evalBankPath.isEmpty)
        (perpGated, Seq.empty[DataFrame])
      else {
        val shared = perpGated
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val flagged = cfg.evalBankPath match {
          case Some(bank) =>
            // pin the bank generation NOW (plan construction), so the
            // whole run screens against one committed version even if
            // a new benchmark release appends mid-run
            PipelineOps.decontamServed(shared, bank,
              asOfGen = GenerationManifest.window(bank)._2)
          case None => PipelineOps.decontamReport(shared, evalDocs.get)
        }
        (mark("08_decontam", shared.join(
          broadcast(flagged.select(col("doc_id"))),
          Seq("doc_id"), "left_anti")),
          Seq(shared))
      }

    // 3. near-dup removal: pairwise-greedy or cluster keep-min (see
    // the object doc). Cluster mode's closure runs its driver-side
    // fixpoint loop eagerly here; its labels frame comes back persisted
    // and joins the handle set. With `cfg.labelIndexPath` set (cluster
    // mode only), the stage SERVES the sealed duplicate-family labels
    // instead of re-closing the corpus — the round-14 label-index
    // consumer path: no pair build, no closure, one label join + a
    // family-keyed min window. Semantics note: sealed families were
    // closed over the WHOLE corpus, so two gated survivors whose only
    // connecting path was gated away still share a family (the index
    // drops ≥ the recomputing stage — family identity does not depend
    // on today's gates, which is exactly why a deployment seals it);
    // the keep-min is evaluated among the GATED survivors of each
    // family, so every family that reaches this stage keeps a row.
    val (losers, dedupHandles2) = cfg.labelIndexPath match {
      case Some(path) if cfg.clusterNeardups =>
        val labels = DedupOps.labelsServe(gated.sparkSession, path)
        val fam = Window.partitionBy(col("cluster_id"))
        (gated.select(col("doc_id")).join(labels, Seq("doc_id"))
          .withColumn("mn", min(col("doc_id")).over(fam))
          .filter(col("doc_id") =!= col("mn"))
          .select(col("doc_id")),
          Seq.empty[DataFrame])
      case _ =>
        val (pairs, dedupHandles) = DedupOps.neardupBuild(
          gated, cfg.neardupThreshold, cfg.lshBands, cfg.lshRows,
          ordered = false)
        if (cfg.clusterNeardups) {
          // the closure runs eagerly BEFORE build returns its handles to
          // the loan — release the pair-stage caches ourselves if it throws
          val labels =
            try DedupOps.connectedComponentsCanonical(
              pairs.select(col("doc_a"), col("doc_b")))
            catch { case t: Throwable => dedupHandles.foreach(_.unpersist()); throw t }
          (labels.filter(col("doc_id") =!= col("cluster_id")).select(col("doc_id")),
            dedupHandles :+ labels)
        } else
          (pairs.select(col("doc_b").as("doc_id")).distinct(), dedupHandles)
    }
    val neardupFree =
      mark("09_neardup", gated.join(losers, Seq("doc_id"), "left_anti"))

    // 4. rebalance (content-keyed, reproducible). Two modes:
    //    - FIXED rates (default): q41's per-language stratified keep,
    //      a narrow filter.
    //    - DERIVED rates (`cfg.mixWeights`): q64's mixture arithmetic
    //      over the SURVIVOR histogram — one extra aggregate pass over
    //      the post-dedup frame (so it gets its own persist: histogram
    //      + filter are two consumers), then the per-source rates ride
    //      a broadcast back into the same content-hash predicate.
    //      The rates relation is bounded by the SOURCE ALPHABET (q58's
    //      bounded-by-construction category) but derives from a
    //      corpus-scan aggregate, so Catalyst's estimate is
    //      corpus-sized and the hint must be explicit — the q52
    //      flagged-id rule, not a scale hazard.
    // Persisted either way: the frame is a diamond with FOUR consumers
    // (the final join's left side plus tf/df/nDocs inside the keyword
    // stage), and without the cache the whole stage-1..4 chain
    // re-executes per consumer — the same diamond rule the shingle
    // frame's persist encodes in DedupOps. Released with the other
    // handles by the loan form.
    val (rebalanced, mixHandles) = cfg.mixWeights match {
      case Some(weights) =>
        val survivors = neardupFree
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rates =
          PipelineOps.mixtureRates(survivors, weights, cfg.defaultMixWeight)
        (PipelineOps.applyMixtureRates(survivors, rates), Seq(survivors))
      case None =>
        (neardupFree.filter(
          RelationalOps.stratifiedKeep(cfg.stratRates, cfg.defaultPerMille)),
          Seq.empty[DataFrame])
    }
    val balanced0 = mark("10_rebalance", rebalanced
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val handles =
      (dedupHandles2 ++ gateHandles ++ perpHandles ++ mixHandles) :+ balanced0

    // 4a. optional PII scrub (q107 core) — the pre-training redaction
    // pass, placed AFTER the gates and rebalance (scrub only what
    // ships: regexing docs the gates will drop is wasted work at
    // 100 TB) and BEFORE keyword tagging and any packing terminal, so
    // everything that tokenizes downstream sees the SCRUBBED text.
    // Schema-preserving rewrite, drops nothing (its yield row recounts
    // at n_dropped = 0); the audit counters are q107's job, so they
    // are projected away here and the documents schema rides through.
    // A narrow codegen'd projection over the cached rebalance frame —
    // no shuffle, no extra persist (each downstream consumer re-runs
    // the regex chain over cached input, cheaper than another
    // materialization).
    val balanced =
      if (cfg.piiScrub)
        mark("11_pii", TextOps.piiScrub(balanced0)
          .drop("n_email", "n_ip", "n_phone"))
      else balanced0

    // 5. keyword tagging over the FINAL corpus; rank order preserved in
    // the array via sort_array over (rank, token) structs
    val keywords = TextOps
      .tfidfTopTerms(balanced, cfg.topKeywords)
      .groupBy(col("doc_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("rank"), col("token")))),
        s => s("token")).as("keywords"))

    val result = balanced
      .join(keywords, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        coalesce(col("keywords"), array().cast("array<string>"))
          .as("keywords"))
      .orderBy(col("doc_id"))
    (result, handles)
  }
}
