package graft.streaming

import graft.queries.{CorpusPipeline, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** STREAMING corpus ingest — the unbounded twin of
  * [[graft.queries.CorpusPipeline.prepare]]'s dedup + gate stages, for
  * the pipeline that must admit documents WHILE crawling rather than in
  * a nightly batch. Generalizes the reference's ingest shape (a
  * filtered firehose into a keyed store,
  * /root/reference/src/main/java/TopNHashtags.java:94-180) to the
  * corpus-preparation stages a training-data pipeline runs.
  *
  * Composition (and why it is TWO queries, not one):
  *
  *   1. GATES — language allow-list + minimum-token quality, the same
  *      narrow filters as the batch stage 2, run before anything
  *      stateful so state never holds a doc the corpus would discard.
  *   2. EXACT dedup — `dropDuplicatesWithinWatermark` keyed on
  *      `xxhash64(text)`: the q09 rule in streaming form. The state
  *      store holds 8-byte hashes (never text — the same shuffle-key
  *      discipline as the batch rekey), bounded by the watermark.
  *   3. NEAR-dup screen — [[NeardupStream.screen]]'s banded SimHash
  *      `flatMapGroupsWithState`.
  *
  * Spark's correctness checker (rightly) refuses
  * `flatMapGroupsWithState` chained with other stateful operators in
  * one query, so stages 2 and 3 cannot run in sequence. The ingest
  * therefore fans the gated source into two sibling queries sharing
  * one output root:
  *
  *   - `docs/`  — gated, exact-deduped rows, LANG-partitioned parquet
  *     (the same layout contract as [[CorpusPipeline.write]]).
  *   - `flags/` — the screen's candidate rows `(doc_id, dup_of, band,
  *     hamming)` — fixed-width TOMBSTONES, tiny next to the corpus.
  *
  * The kept corpus is the read-side reconciliation
  * ([[keptCorpus]]): `docs LEFT ANTI JOIN flags ON doc_id`. This is
  * the honest shape for append-only sinks at scale — a near-dup
  * verdict may arrive after its doc's row group is already sealed, so
  * "drop it from the file" is not an operation parquet has; landing
  * tombstones and reconciling at read (then compacting) is how
  * append-only ingest pipelines express deletion. The anti-join is
  * id-keyed and the flag side is fixed-width, so reconciliation cost
  * stays negligible against the corpus scan; a periodic batch compact
  * (rewrite `docs/` minus flags, clear flags) amortizes it to zero.
  *
  * Keep-rule divergence from the batch path, documented as the
  * contract: streaming keeps the FIRST ARRIVAL of a duplicate family
  * (the `dropDuplicates` family's semantics and the reference
  * co-flatmap's); batch `prepare` keeps the MINIMUM doc_id. The two
  * agree whenever arrival order is id order (the spec's fixture and
  * any id-monotone producer); under reordering they keep different —
  * equally valid — representatives of the same families.
  */
object CorpusStream {

  /** Schema of the `flags/` tombstone table ([[NeardupStream.screen]]
    * output) — explicit so [[keptCorpus]] reads an EMPTY flag
    * directory (a corpus with no near-dups yet) without schema
    * inference failing on zero files. */
  val FlagsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("dup_of", LongType),
    StructField("band", IntegerType),
    StructField("hamming", IntegerType)))

  /** The narrow admission gates (batch stage 2, verbatim): language
    * allow-list and minimum token count. Stateless, codegen'd, run
    * FIRST so neither state store ever holds a discarded doc. */
  def gate(
      docs: DataFrame,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config()): DataFrame =
    docs
      .filter(col("lang").isInCollection(cfg.keepLangs))
      .filter(size(TextOps.toks(col("text"))) >= cfg.minTokens)

  /** Exact streaming dedup — q09's content-hash rule on an unbounded
    * stream: state keys are `xxhash64(text)` (8 bytes), eviction is
    * watermark-driven, first arrival within the horizon wins. */
  def exactDedup(docs: DataFrame, watermarkDelay: String): DataFrame =
    docs
      .withColumn("content_hash", xxhash64(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
      .drop("content_hash")

  /** Start the ingest: `docs` must be a streaming frame with
    * `doc_id: long, lang: string, source: string, text: string,
    * ts: timestamp`. Returns the two sibling queries (docs staging,
    * near-dup flags) — callers own their lifecycle; both checkpoint
    * under `checkpointDir` and survive restart independently. */
  def ingest(
      docs: DataFrame,
      outDir: String,
      checkpointDir: String,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config(),
      watermarkDelay: String = "1 second",
      idleTtl: Option[String] = None): (StreamingQuery, StreamingQuery) = {
    val gated = gate(docs, cfg)
    val docsQuery = exactDedup(gated, watermarkDelay)
      .writeStream
      .format("parquet")
      .partitionBy("lang")
      .option("path", s"$outDir/docs")
      .option("checkpointLocation", s"$checkpointDir/docs")
      .start()
    val flagsQuery = NeardupStream
      .screen(gated, watermarkDelay, idleTtl = idleTtl)
      .writeStream
      .format("parquet")
      .option("path", s"$outDir/flags")
      .option("checkpointLocation", s"$checkpointDir/flags")
      .start()
    (docsQuery, flagsQuery)
  }

  /** Read-side reconciliation: the kept corpus = staged docs MINUS
    * flagged ids. The flag side collapses to distinct 8-byte ids
    * before the anti-join; at scale the join is id-keyed and the flag
    * relation is orders of magnitude smaller than the corpus. */
  def keptCorpus(spark: SparkSession, outDir: String): DataFrame = {
    val staged = spark.read.parquet(s"$outDir/docs")
    val flagged = spark.read.schema(FlagsSchema)
      .parquet(s"$outDir/flags")
      .select(col("doc_id")).distinct()
    staged.join(flagged, Seq("doc_id"), "left_anti")
  }
}
