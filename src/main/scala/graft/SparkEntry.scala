package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2.3 for the inventory.
  *
  * Every key in [[queries]] is one operator from the reference (or a
  * north-star training-data-pipeline operator), expressed as a pure batch
  * query over the fixture tables; [[oracleSql]] carries the equivalent
  * ANSI SQL the driver runs in DuckDB on the same parquet for the
  * hash-compare. Column names and values are aligned on both sides.
  */
object SparkEntry {

  /** Flagship: sliding-window top-N (the reference's whole job as one
    * query) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceOps.q06SlidingTopN(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter"      -> (ReferenceOps.q01ScanFilter _),
    "q02_track_filter"     -> (ReferenceOps.q02TrackFilter _),
    "q03_tokenize_project" -> (ReferenceOps.q03TokenizeProject _),
    "q04_explode_count"    -> (ReferenceOps.q04ExplodeCount _),
    "q05_window_count"     -> (ReferenceOps.q05WindowCount _),
    "q06_sliding_topn"     -> ((s, d) => ReferenceOps.q06SlidingTopN(s, d)),
    "q07_semi_join"        -> (ReferenceOps.q07SemiJoin _),
    "q08_kv_format"        -> (ReferenceOps.q08KvFormat _),
    "q09_dedup_exact"      -> (PipelineOps.q09DedupExact _),
    "q10_text_stats"       -> (PipelineOps.q10TextStats _),
    "q11_join_enrich"      -> (PipelineOps.q11JoinEnrich _),
    "q12_sim_topk"         -> ((s, d) => PipelineOps.q12SimTopK(s, d)),
    "q13_neardup_pairs"    -> ((s, d) => DedupOps.q13NeardupPairs(s, d)),
    "q14_ann_topk"         -> ((s, d) => SimilarityOps.q14AnnTopK(s, d)),
    "q15_simhash"          -> (TextOps.q15Simhash _),
    "q16_lang_id"          -> (TextOps.q16LangId _),
    "q17_text_quality"     -> (TextOps.q17TextQuality _),
    "q18_fingerprint"      -> (TextOps.q18Fingerprint _),
    "q19_media_meta"       -> (MultimodalOps.q19MediaMeta _),
    "q20_media_embed"      -> (MultimodalOps.q20MediaEmbed _),
    "q21_simhash_pairs"    -> (TextOps.q21SimhashPairs _),
    "q22_session_count"    -> (AnalyticsOps.q22SessionCount _),
    "q23_rollup"           -> (AnalyticsOps.q23Rollup _),
    "q24_asof_join"        -> (AnalyticsOps.q24AsofJoin _),
    "q25_moving_sum"       -> (AnalyticsOps.q25MovingSum _),
    "q26_pivot"            -> (AnalyticsOps.q26Pivot _),
    "q27_ngram_jaccard"    -> (DedupOps.q27NgramJaccard _),
    "q28_ivf_topk"         -> ((s, d) => SimilarityOps.q28IvfTopK(s, d)),
    "q29_top_revenue"      -> (RelationalOps.q29TopRevenue _),
    "q30_set_ops"          -> (RelationalOps.q30SetOps _),
    "q31_sample_hash"      -> (RelationalOps.q31SampleHash _),
    "q32_cube"             -> (RelationalOps.q32Cube _),
    // q33 has NO oracle entry by design: HLL++ estimates are
    // engine-specific (driver records the weaker rows-only check; the
    // spec pins relative error vs the exact count).
    "q33_approx_distinct"  -> (RelationalOps.q33ApproxDistinct _),
    "q34_frame_sample"     -> (MultimodalOps.q34FrameSample _),
    "q35_percentiles"      -> (RelationalOps.q35Percentiles _),
    "q36_json_extract"     -> (RelationalOps.q36JsonExtract _),
    "q37_cosine_neardup"   -> ((s, d) => SimilarityOps.q37CosineNeardup(s, d)),
    "q38_outer_join"       -> (RelationalOps.q38OuterJoin _),
    "q39_window_funcs"     -> (RelationalOps.q39WindowFuncs _),
    "q40_resample_fill"    -> (RelationalOps.q40ResampleFill _),
    "q41_strat_sample"     -> (RelationalOps.q41StratifiedSample _),
    "q42_tfidf_topterms"   -> ((s, d) => TextOps.q42TfidfTopTerms(s, d)),
    "q43_dup_clusters"     -> ((s, d) => DedupOps.q43DupClusters(s, d)),
    "q44_bigram_rep"       -> (TextOps.q44BigramRep _),
    "q45_crossmodal_dups"  -> (DedupOps.q45CrossmodalDups _),
    "q46_repeated_windows" -> ((s, d) => DedupOps.q46RepeatedWindows(s, d)),
    "q47_cluster_sizes"    -> (DedupOps.q47ClusterSizes _),
    "q48_funnel"           -> ((s, d) => AnalyticsOps.q48Funnel(s, d)),
    "q49_cohort_retention" -> (AnalyticsOps.q49CohortRetention _),
    "q50_ivf_indexed"      -> ((s, d) => SimilarityOps.q50IvfIndexed(s, d)),
    "q51_seq_pack"         -> ((s, d) => PipelineOps.q51SeqPack(s, d)),
    "q52_decontam"         -> (PipelineOps.q52Decontam _),
    "q53_gate_yield"       -> (TextOps.q53GateYield _),
    "q54_sq8_topk"         -> ((s, d) => SimilarityOps.q54Sq8TopK(s, d)),
    "q55_token_surprisal"  -> (TextOps.q55TokenSurprisal _),
    "q56_passage_dedup"    -> (DedupOps.q56PassageDedup _),
    "q57_dup_provenance"   -> ((s, d) => DedupOps.q57DupProvenance(s, d)),
    "q58_source_drift"     -> (TextOps.q58SourceDrift _),
    "q59_epoch_shuffle"    -> (PipelineOps.q59EpochShuffle _),
    "q60_shuffled_pack"    -> ((s, d) => PipelineOps.q60ShuffledPack(s, d)),
    "q61_sq8_indexed"      -> ((s, d) => SimilarityOps.q61Sq8Indexed(s, d)),
    "q62_delta_dedup"      -> (DedupOps.q62DeltaDedup _),
    "q63_range_join"       -> (RelationalOps.q63RangeJoin _),
    "q64_mixture_balance"  -> (PipelineOps.q64MixtureBalance _),
    "q65_pq_adc_topk"      -> ((s, d) => SimilarityOps.q65PqAdcTopK(s, d)),
    "q66_pq_indexed"       -> ((s, d) => SimilarityOps.q66PqIndexed(s, d)),
    "q67_ivfpq_topk"       -> ((s, d) => SimilarityOps.q67IvfPqTopK(s, d)),
    "q68_linear_score"     -> (TextOps.q68LinearScore _),
    "q69_sem_decontam"     -> ((s, d) => SimilarityOps.q69SemanticDecontam(s, d)),
    "q70_rerank_topk"      -> ((s, d) => SimilarityOps.q70RerankTopK(s, d)),
    "q71_heavy_hitters"    -> ((s, d) => TextOps.q71HeavyHitters(s, d)),
    "q72_collocations"     -> ((s, d) => TextOps.q72Collocations(s, d)),
    "q73_audio_chunks"     -> (MultimodalOps.q73AudioChunks _),
    "q74_ivfpq_residual"   -> ((s, d) => SimilarityOps.q74ResidualIvfPq(s, d)),
    "q75_text_chunks"      -> ((s, d) => TextOps.q75TextChunks(s, d)),
    "q76_bm25_topk"        -> (RetrievalOps.q76Bm25TopK _),
    "q77_bm25_indexed"     -> (RetrievalOps.q77Bm25Indexed _),
    "q78_hybrid_rrf"       -> (RetrievalOps.q78HybridRrf _),
    "q79_bigram_lm"        -> ((s, d) => TextOps.q79BigramLm(s, d)),
    // q80 and q82 are the inventory's two EAGER queries: they return
    // localCheckpoint(true)-materialized frames (bounded outputs; the
    // price of releasing their borrowed caches before returning), so
    // constructing them runs the computation — see their scaladoc.
    "q80_contrastive"      -> ((s, d) => SimilarityOps.q80ContrastivePairs(s, d)),
    "q81_patch_grid"       -> (MultimodalOps.q81PatchGrid _),
    "q82_burst_detect"     -> (AnalyticsOps.q82BurstDetect _),
    "q83_hybrid_indexed"   -> (RetrievalOps.q83HybridIndexed _),
    // q84 has NO oracle entry by design (the q33 precedent): trained
    // k-means quantizers are engine-specific float fixed points with
    // no SQL re-derivation (driver records the rows-only check; the
    // spec pins per-probe arity and recall@10 vs brute force).
    "q84_trained_ann"      -> ((s, d) => SimilarityOps.q84TrainedAnnServe(s, d)),
    "q85_passage_bm25"     -> (RetrievalOps.q85PassageBm25 _),
    "q86_bpe_pairs"        -> ((s, d) => TextOps.q86BpePairs(s, d)),
    "q87_passage_indexed"  -> (RetrievalOps.q87PassageIndexed _),
    "q88_semdedup"         -> ((s, d) => SimilarityOps.q88SemDedup(s, d)),
    "q89_bpe_encode"       -> ((s, d) => TextOps.q89BpeEncode(s, d)),
    "q90_token_budget"     -> ((s, d) => TextOps.q90TokenBudget(s, d)),
    "q91_substr_excise"    -> ((s, d) => DedupOps.q91SubstrExcise(s, d)),
    "q92_knn_label"        -> ((s, d) => SimilarityOps.q92KnnLabel(s, d)),
    "q93_code_outliers"    -> ((s, d) => SimilarityOps.q93CodeOutliers(s, d)),
    "q94_vocab_coverage"   -> ((s, d) => TextOps.q94VocabCoverage(s, d)),
    "q95_excise_indexed"   -> ((s, d) => DedupOps.q95ExciseIndexed(s, d)),
    "q96_excise_keepfirst" -> ((s, d) => DedupOps.q96ExciseKeepFirst(s, d)),
    // q97 joined the EAGER class (q80/q82's contract): constructing it
    // runs the one-pass histogram aggregate and returns the finished
    // bounded local relation — see its scaladoc.
    "q97_cell_balance"     -> ((s, d) => SimilarityOps.q97CellBalance(s, d)),
    "q98_containment"      -> ((s, d) => DedupOps.q98Containment(s, d)),
    "q99_snapshot_diff"    -> ((s, d) => PipelineOps.q99SnapshotDiff(s, d)),
    "q100_novelty_score"   -> ((s, d) => DedupOps.q100NoveltyScore(s, d)),
    "q101_patch_pool"      -> ((s, d) => MultimodalOps.q101PatchPool(s, d)),
    "q102_bpe_train"       -> ((s, d) => TextOps.q102BpeTrain(s, d)),
    // q103 is EAGER by construction (the q97 class): the yield report
    // counts each pipeline stage boundary and returns a <= 10-row
    // local relation; all audit persists are released before return.
    "q103_pipeline_yield"  -> ((s, d) =>
      CorpusPipeline.yieldReport(Tables.documents(s, d))),
    "q104_leak_split"      -> (DedupOps.q104LeakSafeSplit _),
    "q105_token_entropy"   -> ((s, d) => TextOps.q105TokenEntropy(s, d)),
    "q106_matryoshka"      -> ((s, d) => SimilarityOps.q106MatryoshkaTopK(s, d)),
    "q107_pii_audit"       -> ((s, d) => TextOps.q107PiiAudit(s, d)),
    // q108 is EAGER (the q97 class): bounded bucket-alphabet result,
    // internal pair-relation cache released before returning.
    "q108_novelty_curve"   -> ((s, d) => TextOps.q108NoveltyCurve(s, d)),
    "q109_bpe_fertility"   -> ((s, d) => TextOps.q109BpeFertility(s, d)),
    // q110 is EAGER (the q97 class): <= 11-row bin histogram, shingle
    // cache released before returning.
    "q110_threshold_hist"  -> ((s, d) => DedupOps.q110ThresholdHistogram(s, d)),
    // q111 is EAGER by construction (the q102 class): the training
    // loop runs inside, returning the epochs+1-row local trajectory.
    "q111_gate_distill"    -> ((s, d) => TextOps.q111GateDistill(s, d)),
    // q112 re-pays build+append into a temp dir per call (the q50/q62
    // convention); the bench times the serving path under a build phase.
    "q112_labels_indexed"  -> ((s, d) => DedupOps.q112LabelsIndexed(s, d)),
    "q113_gate_roc"        -> ((s, d) => TextOps.q113GateRoc(s, d)),
    // q114/q115/q116 are EAGER and re-pay train+persist into a temp
    // dir per call (the q112 convention for MODELS): train in-engine,
    // write the artifact, reload it, score/encode/calibrate with the
    // LOADED model — the oracle retrains independently in SQL, so the
    // driver verifies train = persist = load = serve end to end.
    "q114_gate_served"     -> ((s, d) => TextOps.q114GateServed(s, d)),
    "q115_bpe_served"      -> ((s, d) => TextOps.q115BpeServed(s, d)),
    "q116_roc_served"      -> ((s, d) => TextOps.q116RocServed(s, d)),
    // q117 trains TWO generations (full corpus; drifted half) into a
    // temp store and compares them through as-of reads — the rollout
    // review the artifact family exists for. EAGER, q112 convention.
    "q117_gate_drift"      -> ((s, d) => TextOps.q117GateDrift(s, d)),
    // q118 closes the LAST train-and-discard loop (q79's LM): train,
    // persist vocab+costs, reload, score with the LOADED model. EAGER,
    // q114 convention; the oracle is q79's verbatim — served scoring
    // must reproduce the in-session model bit for bit.
    "q118_lm_served"       -> ((s, d) => TextOps.q118LmServed(s, d)),
    // q119 trains the composed IVF-PQ artifact, RETRAINS its
    // quantizers into epoch generation 2, and reports the rollout
    // drift review (assignment flips + recall@k at both generations).
    // Rows-only like q84: trained k-means fixed points have no SQL
    // twin; the replay/append/recall contracts are spec-pinned.
    "q119_quantizer_drift" -> ((s, d) => SimilarityOps.q119QuantizerDrift(s, d)),
    // q120 builds the CROSS-STORE hybrid (one manifest correlating the
    // inverted + IVF-PQ legs), appends a correlated delta, serves at
    // the head — the oracle is q83's full-corpus hybrid, so the driver
    // proves append == rebuild across BOTH legs and the fusion; the
    // joint as-of serve is spec-pinned. EAGER, q112 convention.
    "q120_hybrid_served"   -> ((s, d) => RetrievalOps.q120HybridServed(s, d)),
    // q121 scores a FOREIGN corpus with the persisted LM (train on the
    // even half, score the odd half) — the backoff artifact makes
    // every bigram score; the oracle retrains in SQL with the same
    // coalesce(cost, backoff), so the driver verifies the
    // unseen-transition semantics cross-engine. EAGER, q114 convention.
    "q121_lm_foreign"      -> ((s, d) => TextOps.q121LmForeign(s, d)),
    // q122 is the TRAINED hybrid — q84's IVF-PQ leg inside the q120
    // cross-store seal, the production serve. Rows-only (q84's
    // trained-k-means waiver); the spec pins the fusion contract and
    // a rank-agreement floor vs the oracle-verified q83 hybrid.
    "q122_hybrid_trained"  -> ((s, d) => RetrievalOps.q122HybridTrained(s, d)),
    // q123 is q117's rollout review for the LM family: train gen 1 on
    // the full corpus, retrain gen 2 on the even half, score the whole
    // corpus under BOTH as-of generations (the backoff makes the
    // retrained model well-defined on docs it never saw) and reduce to
    // the keep-flip + cost-drift matrix. EAGER, q114 convention.
    "q123_lm_drift"        -> ((s, d) => TextOps.q123LmDrift(s, d)),
    // q124 completes the pre-flip rollout review across all four
    // persisted model families (gate q117, quantizer q119, LM q123,
    // tokenizer — this): retrain the merge table on the even half,
    // encode the whole corpus under both as-of generations, report
    // the token-count drift matrix. EAGER, q114 convention.
    "q124_bpe_drift"       -> ((s, d) => TextOps.q124BpeDrift(s, d)),
    // q125 persists q52's last unversioned dependency — the eval-gram
    // bank: seal half the suite, append the other half (the
    // new-benchmark-release loop), screen the corpus at the head. The
    // oracle is q52's verbatim, so hash equality proves
    // write == append == load == screen. EAGER, q114 convention.
    "q125_decontam_served" -> ((s, d) => PipelineOps.q125DecontamServed(s, d)),
    // q126 completes the hybrid store's lifecycle (the r17 weak): seal
    // the TRAINED hybrid, retrain its dense leg from the store's own
    // _floats sidecar (epoch flip in lockstep across both legs), and
    // report the pre-flip drift review — fused-set agreement and
    // per-leg rank flips between the two generations. Rows-only (q84's
    // trained-k-means waiver); the agreement floor, zero-sparse-flip
    // invariant, as-of replay, and out-of-band-retrain refusal are
    // spec-pinned. EAGER, q112 convention.
    "q126_hybrid_drift"    -> ((s, d) => RetrievalOps.q126HybridDrift(s, d)),
    // q127 hash-verifies the drift review's flip-matrix ARITHMETIC
    // (q126's reduction is rows-only only because its inputs ride
    // trained quantizers): the same driftMatrix over two deterministic
    // fused serves — q78's fusion vs the same fusion with the dense
    // leg on the q106 matryoshka prefix (a dense-only change, so the
    // oracle also hash-checks the zero-sparse-flip invariant).
    "q127_drift_matrix"    -> (RetrievalOps.q127DriftMatrix _),
    // q128: the ANN tuning instrument — recall@k + candidate volume
    // over the (nprobe, shortlist) grid vs the exact cosine top-k,
    // DuckDB-verified from the fixed quantizer constants (the q67
    // implementation-verifying pattern applied to the tuning curve);
    // q129 is the same curve under TRAINED quantizers (rows-only —
    // the q84 trained-k-means waiver; monotonicity spec-pinned)
    "q128_recall_curve"    -> ((s, d) => SimilarityOps.q128RecallCurve(s, d)),
    "q129_recall_trained"  -> ((s, d) => SimilarityOps.q129RecallTrained(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_scan_filter" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE lang IN ('en','de') ORDER BY doc_id""".stripMargin,

    "q02_track_filter" ->
      """SELECT doc_id, lang FROM documents
        |WHERE text LIKE '%spark%' OR text LIKE '%stream%' OR text LIKE '%window%'
        |ORDER BY doc_id""".stripMargin,

    "q03_tokenize_project" ->
      """SELECT doc_id,
        |       len(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q04_explode_count" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
        |WHERE len(token) > 0
        |GROUP BY token ORDER BY token""".stripMargin,

    "q05_window_count" ->
      """SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS ws,
        |       event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    "q06_sliding_topn" ->
      """WITH e AS (
        |  SELECT CAST(floor(epoch(ts) / 60) * 60 AS BIGINT) AS f, event_type
        |  FROM events
        |), w AS (
        |  SELECT unnest(generate_series(f - 240, f, 60)) AS ws, event_type FROM e
        |), c AS (
        |  SELECT ws, event_type, count(*) AS n FROM w GROUP BY 1, 2
        |), r AS (
        |  SELECT ws, event_type, n,
        |         row_number() OVER (PARTITION BY ws ORDER BY n DESC, event_type) AS rank
        |  FROM c
        |)
        |SELECT ws, event_type, n, rank FROM r WHERE rank <= 3
        |ORDER BY ws, rank""".stripMargin,

    "q07_semi_join" ->
      """SELECT event_id, event_type FROM events
        |WHERE event_type IN (
        |  SELECT event_type FROM events GROUP BY event_type
        |  ORDER BY count(*) DESC, event_type LIMIT 3)
        |ORDER BY event_id""".stripMargin,

    "q08_kv_format" ->
      """WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |r AS (SELECT event_type, n,
        |             row_number() OVER (ORDER BY n DESC, event_type) AS rank
        |      FROM c)
        |SELECT 'Top10-' || rank AS key, event_type || ', ' || n AS value
        |FROM r WHERE rank <= 10 ORDER BY key""".stripMargin,

    "q09_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, text, count(*) AS n_dups
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,

    "q10_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
        |       count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q11_join_enrich" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS sum_price_cents,
        |       count(DISTINCT c_custkey) AS n_custs
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q12_sim_topk" ->
      """WITH p AS (SELECT embedding::DOUBLE[] AS pe FROM embeddings WHERE vec_id = 0),
        |s AS (SELECT vec_id, label,
        |             round(list_dot_product(embedding::DOUBLE[], pe) /
        |                   (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
        |                    sqrt(list_dot_product(pe, pe))), 6) AS sim
        |      FROM embeddings, p)
        |SELECT vec_id, label, sim FROM s
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,

    // Exact all-pairs Jaccard — the oracle-scale ground truth for the
    // LSH-bucketed Spark implementation (recall 1 at the fixture's
    // similarity margin; output all-integer for hash stability). Built
    // from the shingle CTE the q43/q45 oracles share.
    "q13_neardup_pairs" -> DedupOps.q13OracleSql,

    // Same deterministic sign-LSH buckets (identical hyperplane
    // constants), scoring, and ranking as the Spark side — verifies the
    // bucketed implementation itself, not just recall.
    "q14_ann_topk" -> SimilarityOps.q14OracleSql(),

    // q15-q18 oracles are generated from the same Scala constants as the
    // Spark plans (hash derivation, profiles, regexes, window sizes) so
    // the two sides cannot drift.
    "q15_simhash"      -> TextOps.q15OracleSql,
    "q16_lang_id"      -> TextOps.q16OracleSql,
    "q17_text_quality" -> TextOps.q17OracleSql,
    "q18_fingerprint"  -> TextOps.q18OracleSql,

    // Multimodal plumbing: metadata/resize arithmetic and the batched
    // mapPartitions encoder both reproduce exactly in SQL over the
    // ASCII fixture payload (ord() byte arithmetic).
    "q19_media_meta"  -> MultimodalOps.q19OracleSql,
    "q20_media_embed" -> MultimodalOps.q20OracleSql,

    // Exact all-pairs hamming ground truth: the banded Spark side
    // matches it exactly because 4x8-bit bands catch hamming <= 3 by
    // pigeonhole (recall 1, deterministic).
    "q21_simhash_pairs" -> TextOps.q21OracleSql,

    // Session windows via gaps-and-islands, rollup via GROUP BY ROLLUP,
    // as-of via explicit row_number with the same deterministic
    // tie-break as the Spark max_by struct.
    "q22_session_count" -> AnalyticsOps.q22OracleSql,
    "q23_rollup"        -> AnalyticsOps.q23OracleSql,
    "q24_asof_join"     -> AnalyticsOps.q24OracleSql,
    "q25_moving_sum"    -> AnalyticsOps.q25OracleSql,
    "q26_pivot"         -> AnalyticsOps.q26OracleSql,

    // Exact all-pairs n-gram Jaccard: matched unconditionally — prefix
    // filtering has recall 1 by construction, no fixture-margin argument.
    "q27_ngram_jaccard" -> DedupOps.q27OracleSql,

    // IVF ANN with the identical centroid constants — like q14, the
    // oracle verifies the implementation (assignment, probing, ranking),
    // not just recall on a lucky fixture.
    "q28_ivf_topk" -> SimilarityOps.q28OracleSql(),

    // TPC-H Q3-shaped join aggregate, exact integer revenue units.
    "q29_top_revenue" -> RelationalOps.q29OracleSql,

    // Set ops, deterministic hash sampling, cube.
    "q30_set_ops"     -> RelationalOps.q30OracleSql,
    "q31_sample_hash" -> RelationalOps.q31OracleSql,
    "q32_cube"        -> RelationalOps.q32OracleSql,

    // Frame sampling: the batched imperative path hash-verified via
    // ord() byte arithmetic, like q20.
    "q34_frame_sample" -> MultimodalOps.q34OracleSql,

    // Percentiles over integer cents (identical interpolation inputs on
    // both engines); JSON extraction via schema'd from_json.
    "q35_percentiles"  -> RelationalOps.q35OracleSql,
    "q36_json_extract" -> RelationalOps.q36OracleSql,

    // Embedding-cosine near-dup screen: bucket-blocked pairs + exact
    // cosine, identical hyperplane constants on both sides (q14's
    // implementation-verified pattern).
    "q37_cosine_neardup" -> SimilarityOps.q37OracleSql(),

    // Full-outer reconciliation and the analytic-function family.
    "q38_outer_join"   -> RelationalOps.q38OracleSql,
    "q39_window_funcs" -> RelationalOps.q39OracleSql,

    // Time-series resample + forward fill over an hourly grid.
    "q40_resample_fill" -> RelationalOps.q40OracleSql,

    // Stratified per-language sampling (rates shared with the Spark
    // when-chain) and TF-IDF keyword extraction (scores rounded BEFORE
    // ranking on both sides).
    "q41_strat_sample"   -> RelationalOps.q41OracleSql,
    "q42_tfidf_topterms" -> TextOps.q42OracleSql,

    // Near-dup cluster assignment: q13's pair relation closed
    // transitively — large-star/small-star on the Spark side, a
    // recursive CTE on the oracle side.
    "q43_dup_clusters" -> DedupOps.q43OracleSql,

    // Bigram repetition profile (Gopher-style quality rule),
    // all-integer output.
    "q44_bigram_rep" -> TextOps.q44OracleSql,

    // Cross-modal (lexical vs embedding) near-dup agreement — q13's and
    // q37's pair CTEs reconciled with a full outer join, integer flags.
    "q45_crossmodal_dups" -> DedupOps.q45OracleSql,

    // Substring-level duplication audit: top repeated exact token
    // windows across documents, deterministic (n_occ desc, window) cut.
    "q46_repeated_windows" -> DedupOps.q46OracleSql(),

    // Duplicate-family size histogram over q43's labels (shared CTE).
    "q47_cluster_sizes" -> DedupOps.q47OracleSql,

    // Funnel analysis: single-shuffle HOF scan vs the oracle's
    // k-self-join min-chain — same greedy-earliest semantics.
    "q48_funnel" -> AnalyticsOps.q48OracleSql,

    // Cohort retention matrix, integer week arithmetic on both sides.
    "q49_cohort_retention" -> AnalyticsOps.q49OracleSql,

    // The persisted-index search must return row-for-row what the
    // in-plan q28 search returns (same centroids, probes, ranking) —
    // so its oracle IS q28's oracle. The physical difference (the
    // partition-pruned scan) is pinned in SimilarityOpsSpec.
    "q50_ivf_indexed" -> SimilarityOps.q28OracleSql(),

    // Sequence packing: per-shard prefix sums, integer-only output.
    "q51_seq_pack" -> PipelineOps.q51OracleSql(),

    // Decontamination: the oracle joins on gram STRINGS where the
    // engine joins on their xxhash64 — matching counts verify the
    // hashed join loses/invents nothing (HashedShinglesSpec pins the
    // string↔hash correspondence itself).
    "q52_decontam" -> PipelineOps.q52OracleSql,

    // Gate-yield cascade: both sides generated from the same gate
    // constants; integer-only output.
    "q53_gate_yield" -> TextOps.q53OracleSql,

    // SQ8 quantized search: the oracle re-derives the quantizer
    // (per-dim min/max, floor codes), the dequantized reconstruction,
    // and the cosine ranking.
    "q54_sq8_topk" -> SimilarityOps.q54OracleSql(),

    // Token surprisal: float work happens once per vocab TYPE (integer
    // micro-nat costs); per-doc sums are exact integers both sides.
    "q55_token_surprisal" -> TextOps.q55OracleSql,

    // Passage dedup: the oracle keeps first occurrences by passage
    // STRING where the engine keys on xxhash64(passage) — identical
    // output modulo the documented 2^-64 collision acceptance.
    "q56_passage_dedup" -> DedupOps.q56OracleSql,

    // Dup provenance: q13's exact all-pairs CTE rolled up by source
    // pair (recall-1 argument on the q13 scaladoc).
    "q57_dup_provenance" -> DedupOps.q57OracleSql,

    // Source drift: exact-integer TV distance — identical integer
    // formulation both sides, no float anywhere.
    "q58_source_drift" -> TextOps.q58OracleSql,

    // Epoch shuffle: the oracle states the semantics as ONE global-sort
    // row_number (affordable at oracle scale); the engine's sharded
    // rank + offset reconstruction must equal it row for row.
    "q59_epoch_shuffle" -> PipelineOps.q59OracleSql(),

    // Shuffled-order packing (q59 ∘ q51): the oracle is the global-sort
    // formulation — one row_number + one running token sum over the
    // hash order; the sharded reconstruction must match row for row.
    "q60_shuffled_pack" -> PipelineOps.q60OracleSql(),

    // The persisted-SQ8 search must return row-for-row what the
    // in-plan q54 returns (same quantizer through an exact byte/float
    // round-trip) — so its oracle IS q54's oracle; the physical
    // difference (1-byte codes, no float column) is pinned in the spec.
    "q61_sq8_indexed" -> SimilarityOps.q54OracleSql(),

    // Incremental dedup: the oracle computes exact delta×base Jaccard
    // over the same deterministic split — the banded screen matches it
    // at the fixture margin (q13's recall-1 argument).
    "q62_delta_dedup" -> DedupOps.q62OracleSql,

    // Range join: the oracle states the semantics as the bare theta
    // join (DuckDB IEJoin); the engine's bucketed equi-join + residual
    // must agree row for row.
    "q63_range_join" -> RelationalOps.q63OracleSql,

    // Mixture rebalance: derived per-source keep rates, exact integer
    // arithmetic both sides (hugeint/decimal intermediates, BIGINT out).
    "q64_mixture_balance" -> PipelineOps.q64OracleSql,

    // PQ/ADC: the oracle re-derives codes and distance tables from the
    // same LCG codebook constants (q14/q28's implementation-verifying
    // pattern) — bit-identical dots, first-min argmin, same-order ADC
    // sum, round 6.
    "q65_pq_adc_topk" -> SimilarityOps.q65OracleSql(),

    // Persisted packed-code serving returns row-identical results to
    // the in-plan ADC scan (same codebooks, tables, fold orders) —
    // q65's oracle verbatim, the q61-reuses-q54 pattern.
    "q66_pq_indexed" -> SimilarityOps.q65OracleSql(),

    // IVF-PQ: q28's cell/probed-cell CTEs composed with q65's
    // encode/ADC CTEs on the cell key — the constants, argmax/argmin
    // rules, and fold orders of BOTH parents, shared verbatim.
    "q67_ivfpq_topk" -> SimilarityOps.q67OracleSql(),

    // Hashed linear classifier: the oracle indexes the SAME integer
    // micro-weight array with the same md5-derived bucket hash —
    // integer sums, order-free on both engines (q55's discipline).
    "q68_linear_score" -> TextOps.q68OracleSql,

    // Semantic decontamination: the oracle's cross-join + argmax
    // window is the declarative form of the literal-inlined narrow
    // map — identical cosine arithmetic (round 6), identical
    // (sim desc, eval_id) tie-break.
    "q69_sem_decontam" -> SimilarityOps.q69OracleSql(),

    // Two-stage retrieval: q67's oracle nested as the shortlist CTE,
    // then the exact-cosine rerank — q12's arithmetic and tie-break.
    "q70_rerank_topk" -> SimilarityOps.q70OracleSql(),

    // Heavy hitters: the oracle runs the direct full-vocabulary
    // HAVING query; the Spark side must reproduce it exactly from
    // the Misra-Gries-pruned two-pass plan (superset candidates +
    // exact recount ⇒ partition-layout-independent output).
    "q71_heavy_hitters" -> TextOps.q71OracleSql(),

    // PMI collocations: q71's oracle as the vocabulary CTE, the
    // q46-style windowed bigram generate, and a single identically
    // associated ln per output row floored to micro-nats.
    "q72_collocations" -> TextOps.q72OracleSql(),

    // Overlapping chunk table: the oracle reproduces the stride series
    // and the ord() first-byte probe over the ASCII fixture payload —
    // the q20/q34 pattern for the imperative batched operator.
    "q73_audio_chunks" -> MultimodalOps.q73OracleSql,
    "q74_ivfpq_residual" -> SimilarityOps.q74OracleSql(),
    "q75_text_chunks" -> TextOps.q75OracleSql(),

    // BM25: the score expression is ONE shared SQL fragment on both
    // engines (scoreSqlFragment) — idf and saturation never drift.
    "q76_bm25_topk" -> RetrievalOps.q76OracleSql(),
    // Served from the persisted inverted index; row-identical to q76
    // by shared scoreAndRank, so the oracle is q76's verbatim.
    "q77_bm25_indexed" -> RetrievalOps.q77OracleSql(),
    // Hybrid RRF: q76's CTEs as the sparse leg, q12's cosine text as
    // the dense leg, integer `//` rank fusion.
    "q78_hybrid_rrf" -> RetrievalOps.q78OracleSql(),

    // Bigram-LM cross-entropy over the bounded q71 vocabulary + unk:
    // one ln per model entry floored at 1e5 (q72's 10-µnat
    // discipline), per-doc sums exact integers.
    "q79_bigram_lm" -> TextOps.q79OracleSql(),

    // Contrastive mining: q43's recursive-closure labels pick the
    // anchors, q12's cosine text ranks; roles and tie-breaks shared.
    "q80_contrastive" -> SimilarityOps.q80OracleSql(),

    // ViT patch grid: q19's metadata arithmetic, nested stride
    // unnests, row-major offset probe — all exact integers.
    "q81_patch_grid" -> MultimodalOps.q81OracleSql,

    // Burst detection: dense grid + trailing frame + integer
    // cross-multiplied threshold — all-integer output.
    "q82_burst_detect" -> AnalyticsOps.q82OracleSql,

    // Hybrid fusion with BOTH legs index-served: q76's CTEs as the
    // sparse leg, q70's shortlist+rerank oracle (the constants the
    // persisted IVF-PQ index serves) as the dense leg, shared integer
    // fusion tail.
    "q83_hybrid_indexed" -> RetrievalOps.q83OracleSql(),

    // Passage retrieval: q75's chunk oracle nested verbatim as the
    // passage relation, the shared BM25 fragment under chunk-level
    // stats, best-passage-per-doc then top-k-per-query windows.
    "q85_passage_bm25" -> RetrievalOps.q85OracleSql(),

    // BPE merge induction: same tokenizer, per-position character
    // pairs over the word-frequency table, (n desc, lhs, rhs) order.
    "q86_bpe_pairs" -> TextOps.q86OracleSql(),

    // Served from the persisted passage index; row-identical to q85
    // by the shared scoring core, so the oracle is q85's verbatim.
    "q87_passage_indexed" -> RetrievalOps.q87OracleSql(),

    // SemDeDup: q28's centroid constants and argmax assignment, in-cell
    // pairing with the q37 rounding, greedy keep-lowest-id rule.
    "q88_semdedup" -> SimilarityOps.q88OracleSql(),

    // BPE encode: same tokenizer, wrapper representation, literal merge
    // chain, and paren-count arithmetic (replace is leftmost
    // non-overlapping in both engines).
    "q89_bpe_encode" -> TextOps.q89OracleSql(),

    // Token budget: the shared encode CTEs (one definition with q89),
    // q09's min-doc_id keep rule by group-by-text, source rollup.
    "q90_token_budget" -> TextOps.q90OracleSql(),

    // Duplicated-phrase excision: same window/duplicate/merge/excise
    // rule on phrase STRINGS (islands over covered indices ≡ the
    // engine's merged window spans).
    "q91_substr_excise" -> DedupOps.q91OracleSql,

    // kNN label propagation: q12's cosine text, same neighbor-rank and
    // majority-vote tie-breaks over the same deterministic split.
    "q92_knn_label" -> SimilarityOps.q92OracleSql(),

    // Compressed-domain outlier screen: q54's quantizer CTE, per-label
    // integer code sums, the scaled distance Σ(n·c−S)², same rank and
    // 5% flag rule — all-integer, so the hash is exact by construction.
    "q93_code_outliers" -> SimilarityOps.q93OracleSql,

    // Vocab coverage curve: q04's tokenizer, (n desc, token) rank,
    // integer cum·100 ≥ P·total comparison, min-rank checkpoints.
    "q94_vocab_coverage" -> TextOps.q94OracleSql,

    // Index-served phrase excision: delta windows marked iff the phrase
    // occurs in the sealed base, then q91's shared excise tail.
    "q95_excise_indexed" -> DedupOps.q95OracleSql,

    // Keep-first phrase dedup: rank over (doc_id, pos) per phrase
    // string (rn > 1 ⟺ duplicated and not first), shared excise tail.
    "q96_excise_keepfirst" -> DedupOps.q96OracleSql,

    // Cluster-balanced sampling: q88's cell CTEs, q31's md5 bucket on
    // the id string, q64's integer rate arithmetic, uniform target.
    "q97_cell_balance" -> SimilarityOps.q97OracleSql,

    // Containment join: exact all-pairs over q27's gram CTE with the
    // integer C >= 3/4 predicate — recall-1 prefix argument on the
    // q98 scaladoc makes the engine match unconditional.
    "q98_containment" -> DedupOps.q98OracleSql,

    // Snapshot diff: same version-synthesis constants, content compared
    // as strings where the engine compares xxhash64 (q43's acceptance).
    "q99_snapshot_diff" -> PipelineOps.q99OracleSql,

    // Novelty score: delta windows vs distinct base phrases, integer
    // per-mille — q95's probe side without the rewrite.
    "q100_novelty_score" -> DedupOps.q100OracleSql,

    // Patch pooling: q81's oracle text as the grid CTE, the same
    // integer mean/max pool with -1 sentinels.
    "q101_patch_pool" -> MultimodalOps.q101OracleSql,

    // BPE training loop: the Spark loop unrolled into chained CTEs —
    // per-round argmax as a 1-row CTE feeding the next rewrite.
    "q102_bpe_train" -> TextOps.q102OracleSql(),

    // End-to-end pipeline yield: every default stage re-derived as a
    // CTE chain (q09 keep-min, lang set, q17 floor, q13 all-pairs
    // verified neardup with the pairwise drop rule, q41 keep) and
    // counted at its boundary — the whole composed pipeline under one
    // hash compare.
    "q103_pipeline_yield" -> CorpusPipeline.yieldOracleSql(),

    // Leakage-free split: q43's recursive-closure labels extended to
    // singletons, one md5 bucket per duplicate family.
    "q104_leak_split" -> DedupOps.q104OracleSql,

    // Unigram entropy: the same distinct-token loop over DuckDB lists,
    // 6-dp rounded (the q12 float rule).
    "q105_token_entropy" -> TextOps.q105OracleSql,

    // Matryoshka two-stage: both the prefix-dim shortlist and the
    // full-dim rerank replayed exactly on DuckDB list slices — the one
    // ANN ladder rung that is fully hash-verifiable end to end.
    "q106_matryoshka" -> SimilarityOps.q106OracleSql(),

    // PII audit: the ordered count-then-replace regex chain on both
    // engines; the fixture's zeros ARE the no-false-positive property
    // (planted positives live in the spec).
    "q107_pii_audit" -> TextOps.q107OracleSql,

    // Novelty curve: distinct textual grams vs the engine's distinct
    // 8-byte gram hashes (q09 collision-probability acceptance).
    "q108_novelty_curve" -> TextOps.q108OracleSql,

    // Tokenizer fertility: the shared q89 encode CTE with lang riding
    // through, alphabet-sized rollup, exact integer division.
    "q109_bpe_fertility" -> TextOps.q109OracleSql(),

    // Threshold sensitivity: exact all-pairs Jaccard at floor 0.5
    // under the same integer binning (recall-1 argument re-established
    // for 32x2 banding on the q110 scaladoc).
    "q110_threshold_hist" -> DedupOps.q110OracleSql,

    // Gate distillation: the batch-perceptron loop unrolled into
    // chained CTEs (the q102 pattern) — per-epoch delta sums
    // re-assembled into the next weight list, every quantity integer.
    "q111_gate_distill" -> TextOps.q111OracleSql(),
    // append == rebuild exactly: the served labels after base-build +
    // delta-append must hash-match the FULL-corpus q43 closure.
    "q112_labels_indexed" -> DedupOps.q112OracleSql,
    "q113_gate_roc" -> TextOps.q113OracleSql,
    // The model loop through the artifact: the oracle RETRAINS in SQL
    // (the shared training CTEs) and reads the same deploy point —
    // pocket-weight scoring (q114), trained-table encode via a
    // list_reduce fold (q115), served calibration (q116). Equality is
    // the train = persist = load = serve theorem.
    "q114_gate_served" -> TextOps.q114OracleSql(),
    "q115_bpe_served" -> TextOps.q115OracleSql(),
    "q116_roc_served" -> TextOps.q116OracleSql(),
    // model drift: TWO independent SQL retrains (prefixed chains) ->
    // both pocket vectors -> the same keep-flip matrix
    "q117_gate_drift" -> TextOps.q117OracleSql(),
    // the LM loop through the artifact: q79's oracle verbatim — the
    // SQL retrain IS the independent twin of train+persist+load+score
    "q118_lm_served" -> TextOps.q79OracleSql(),
    // hybrid store: q83's full-corpus oracle — equality proves
    // append == rebuild across both legs and the fusion
    "q120_hybrid_served" -> RetrievalOps.q120OracleSql(),
    // foreign-corpus LM scoring: the SQL retrains on the even half and
    // scores the odd half through the SAME coalesce(cost, backoff) —
    // equality proves the unseen-transition backoff cross-engine
    "q121_lm_foreign" -> TextOps.q121OracleSql(),
    // LM drift: TWO independent SQL retrains (full corpus; even half),
    // the full corpus scored through EACH model's coalesce(cost,
    // backoff), the same integer-division keep rule -> one matrix
    "q123_lm_drift" -> TextOps.q123OracleSql(),
    // BPE drift: TWO independent SQL merge-table retrains (full
    // corpus; even half), the full corpus folded through EACH table,
    // the same integer fertility arithmetic -> one matrix
    "q124_bpe_drift" -> TextOps.q124OracleSql(),
    // served decontamination: q52's oracle verbatim — the screen from
    // the persisted bank must equal the in-session report
    "q125_decontam_served" -> PipelineOps.q52OracleSql,
    // drift flip matrix: both fusions (q76 sparse leg; full-dim and
    // matryoshka-prefix dense legs) and the one-row matrix replayed
    "q127_drift_matrix" -> RetrievalOps.q127OracleSql(),
    // the recall curve re-derived from the same fixed quantizer
    // constants, grid axes included (q129's trained twin is rows-only)
    "q128_recall_curve" -> SimilarityOps.q128OracleSql(),
  )
}
