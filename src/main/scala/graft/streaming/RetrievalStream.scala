package graft.streaming

import graft.queries.{RetrievalOps, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING standing queries over a document stream — the reference's
  * actual shape, uplifted: its track-terms endpoint matched tweets by
  * raw substring (`TwitterFilterEndpoint.java:13-66`, the `track`
  * parameter; q02 is the batch generalization), this stage matches by
  * BM25 score against the registered query set, so "mentions 'spark'"
  * becomes "scores like a real hit for query 1" — threshold alerting,
  * the streaming twin of q76.
  *
  * Design: SCORES NEED STATISTICS, and a stream cannot know its own
  * corpus stats (df/avgdl over an unbounded prefix drift per batch —
  * the same run would score the same document differently at
  * different offsets). So the stats are FROZEN from a persisted
  * inverted index ([[RetrievalOps.indexStats]] — the q77 artifact a
  * deployment refreshes at each compact generation), collected ONCE
  * driver-side (one bounded row — the q69 literal-inlining pattern)
  * and baked into the scoring expression as literals. The stage is
  * then completely STATELESS: one narrow per-row projection (tf
  * columns → literal-stats BM25 per query → threshold), no watermark,
  * no state store, append-mode safe through any sink, and — because
  * the projection is mode-agnostic — spec-pinned identical to running
  * the same function on the same rows as a batch frame.
  *
  * The score expression is [[RetrievalOps.scoreSqlFragment]] with the
  * stats references rendered as literals instead of column names —
  * the SAME fragment q76/q77 and the oracle share, so all three
  * surfaces (batch, served, streaming) hold one BM25 definition.
  */
object RetrievalStream {

  /** Per-query alert thresholds (rounded-score units): tuned on the
    * fixture so each standing query has a non-vacuous strong-match
    * set; a deployment registers thresholds with its queries. */
  val MatchThresholds: Map[Int, Double] =
    Map(1 -> 3.0, 2 -> 1.0, 3 -> 0.8)

  /** Match the incoming `(…, doc_id, text, …)` rows against the
    * standing query set under FROZEN `stats` (one row, collected
    * eagerly — pass [[RetrievalOps.indexStats]] of the serving
    * index). Emits one row per (input row, matching query):
    * all input columns plus `(qid, score)`, `score` rounded at 1e-6
    * and ≥ the query's threshold. Works identically on a streaming or
    * a batch frame (stateless narrow projection — spec-pinned).
    */
  def standingMatches(
      docs: DataFrame,
      stats: DataFrame,
      thresholds: Map[Int, Double] = MatchThresholds): DataFrame = {
    val reserved = Seq("q", "dl", "qid", "score") ++
      RetrievalOps.AllTerms.map(t => s"tf_$t")
    val clash = docs.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"input carries reserved scoring column(s) ${clash.mkString(", ")} — " +
        "rename them before standingMatches (they would be overwritten " +
        "and dropped)")
    val statRow = stats.collect() match {
      case Array(r) => r
      case rows => throw new IllegalArgumentException(
        s"stats must be exactly one row, got ${rows.length}")
    }
    val lit64 = (name: String) =>
      s"${statRow.getLong(statRow.fieldIndex(name))}L"
    val tk = TextOps.toks(col("text"))
    val withTf = docs.withColumns(
      (("dl" -> size(tk).cast("long")) +:
        RetrievalOps.AllTerms.map(t =>
          s"tf_$t" -> size(filter(tk, x => x === lit(t))).cast("long"))).toMap)
    val branches = RetrievalOps.BmQueries.map { case (qid, terms) =>
      val thr = thresholds.getOrElse(qid,
        throw new IllegalArgumentException(s"no threshold for query $qid"))
      struct(
        lit(qid).as("qid"),
        round(expr(RetrievalOps.scoreSqlFragment(terms, lit64)), 6).as("score"),
        terms.map(t => col(s"tf_$t") > 0).reduce(_ || _).as("hit"),
        lit(thr).as("thr"))
    }
    withTf
      .withColumn("q", explode(array(branches: _*)))
      .filter(col("q.hit") && col("q.score") >= col("q.thr"))
      .withColumn("qid", col("q.qid"))
      .withColumn("score", col("q.score"))
      .drop((Seq("q", "dl") ++ RetrievalOps.AllTerms.map(t => s"tf_$t")): _*)
  }

  /** Per-query alert thresholds at CHUNK granularity — passage scores
    * run hotter than document scores (the matched terms dominate a
    * 32-token window where they dilute in a full document), so the
    * passage thresholds are tuned separately on the fixture. */
  val PassageThresholds: Map[Int, Double] =
    Map(1 -> 4.0, 2 -> 2.2, 3 -> 1.7)

  /** Passage-level standing matches — [[standingMatches]] at chunk
    * granularity: each incoming document fans out to its q75
    * token-window chunks ([[TextOps.chunkTokens]] — stateless and
    * narrow, so the composition stays a pure per-row projection with
    * no state store and no watermark requirement) and every chunk is
    * scored under stats FROZEN from a persisted PASSAGE index
    * ([[RetrievalOps.indexStats]] over a [[RetrievalOps
    * .writePassageIndex]] artifact — chunk-level n/sumdl/df, the q87
    * serving statistics). Emits one row per (chunk, matching query):
    * the input's columns plus `(chunk_idx, start_tok, n_toks, passage,
    * qid, score)` — the alert carries its evidence passage, which is
    * what a RAG-style monitor forwards.
    *
    * One BM25 definition across all passage surfaces: the scoring
    * expression is the same [[RetrievalOps.scoreSqlFragment]] q85/q87
    * and their oracle share, so a standing passage alert's score is
    * bit-identical to what q87 would serve for that (doc, chunk) —
    * spec-pinned on the shared support. */
  def standingPassageMatches(
      docs: DataFrame,
      stats: DataFrame,
      thresholds: Map[Int, Double] = PassageThresholds,
      size: Int = TextOps.ChunkToks,
      stride: Int = TextOps.ChunkTokStride): DataFrame =
    standingMatches(
      TextOps.chunkTokens(docs, size, stride)
        .withColumnRenamed("chunk_text", "text"),
      stats, thresholds)
      .withColumnRenamed("text", "passage")
}
