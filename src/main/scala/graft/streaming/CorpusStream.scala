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
  * stays negligible against the corpus scan; the periodic batch
  * [[compact]] folds delta + tombstones into a sealed `base/` and
  * amortizes it to zero.
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

  /** The full staged corpus: the SEALED base (if a [[compact]] has
    * run) unioned with the ACTIVE streaming delta `docs/`. The
    * LSM-ish split exists because `docs/` is a `FileStreamSink`
    * output whose `_spark_metadata` log the sink owns — compacted
    * rewrites cannot be placed there (files absent from the log are
    * invisible to readers once the sink appends again), so sealed
    * data lives in its own plain directory. */
  private def exists(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir))

  /** The corpus columns a sealed generation carries. Event time (`ts`)
    * is ingest METADATA, not corpus content — it exists to drive
    * watermarks and is dropped at the seal (also what lets sealed and
    * active generations union without schema drift). */
  private val CorpusCols = Seq("doc_id", "lang", "source", "text")

  private def staged(spark: SparkSession, outDir: String): DataFrame = {
    // either side may be absent: no compact yet (no base/), or a
    // generation boundary before the next ingest starts (no docs/)
    val parts = Seq(s"$outDir/base", s"$outDir/docs")
      .filter(exists)
      .map(spark.read.parquet(_).select(CorpusCols.map(col): _*))
    require(parts.nonEmpty, s"no corpus at $outDir (neither base/ nor docs/)")
    parts.reduce(_ unionByName _)
  }

  /** Read-side reconciliation: the kept corpus = staged docs (sealed
    * base + active delta) MINUS flagged ids. The flag side collapses
    * to distinct 8-byte ids before the anti-join; at scale the join is
    * id-keyed and the flag relation is orders of magnitude smaller
    * than the corpus. A late flag against a doc already sealed into
    * the base still hides it — tombstones apply to the union. */
  def keptCorpus(spark: SparkSession, outDir: String): DataFrame = {
    val all = staged(spark, outDir)
    if (!exists(s"$outDir/flags")) all // post-compact: tombstones folded
    else {
      val flagged = spark.read.schema(FlagsSchema)
        .parquet(s"$outDir/flags")
        .select(col("doc_id")).distinct()
      all.join(flagged, Seq("doc_id"), "left_anti")
    }
  }

  /** Batch COMPACTION at a GENERATION BOUNDARY — the lambda split's
    * batch half. Folds the sealed base, the active delta, and the flag
    * tombstones into one reconciled corpus, re-runs the BATCH
    * exact + near-dup rules over it ([[CorpusPipeline.prepare]] — the
    * min-id keep rule, corpus-wide), and seals the result as the new
    * `base/` through [[CorpusPipeline.write]]'s layout contract
    * (lang-partitioned, doc_id-sorted, file-size-capped).
    *
    * Why a generation boundary and not an in-place truncate: the
    * delta's `FileStreamSink` metadata log must stay CONTIGUOUS from
    * batch 0 — a resumed query appends entry N+1 to a truncated log
    * and every reader then throws (`_spark_metadata/0 doesn't exist`).
    * So compact retires the whole generation: delta, flags, AND the
    * ingest checkpoints are deleted, and the next [[ingest]] starts a
    * fresh generation against the NEXT input epoch (re-pointing at
    * consumed input would re-ingest it — the operational contract is
    * compact-between-epochs, which is when maintenance windows exist
    * anyway). Streaming screen state dies with the generation; that is
    * WHY compact re-runs the batch dedup: duplicates spanning a
    * boundary (a doc near-dup'ing one sealed generations ago) are
    * exactly what the stream screen's bounded state cannot see, and
    * exactly what the corpus-wide batch pass catches — stream = cheap
    * within-generation filter, batch = exact cross-corpus rule.
    *
    * `packBudget`: when set, compact also writes `pack/` — the q51
    * sequence-packing manifest over the sealed base (`doc_id, shard,
    * n_tokens, seq, seq_off, crosses`), which is what a training-file
    * writer consumes to emit fixed-budget sequences. The manifest is a
    * PURE FUNCTION of base (same shard/order rules every run), so a
    * crash between the base swap and the pack swap is recovered by
    * simply re-running pack over the new base — no torn state is
    * possible, the manifest is always re-derivable.
    *
    * Returns the number of rows removed (tombstoned + batch-deduped).
    * The swap is rename-based (base → base.old → base.next → base): a
    * crash between renames leaves old or new intact under a
    * recoverable name, never a half-deleted store. */
  def compact(
      spark: SparkSession,
      outDir: String,
      checkpointDir: String,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config(),
      packBudget: Option[Int] = None): Long = {
    import java.nio.file.{Files, Paths}
    val before = staged(spark, outDir).count()
    val folded = keptCorpus(spark, outDir)
    CorpusPipeline.withPrepared(folded, cfg) { prepared =>
      CorpusPipeline.write(prepared.drop("keywords"), s"$outDir/base.next")
    }
    val after = spark.read.parquet(s"$outDir/base.next").count()
    packBudget.foreach { b =>
      CorpusPipeline.pack(spark.read.parquet(s"$outDir/base.next"), b)
        .repartition(col("shard")).sortWithinPartitions(col("shard"), col("seq"))
        .write.mode("overwrite").parquet(s"$outDir/pack.next")
    }
    def rmTree(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(rmTree(_)) finally s.close()
      }
      Files.deleteIfExists(p)
    }
    def swap(name: String): Unit = {
      val cur = Paths.get(outDir, name)
      val old = Paths.get(outDir, s"$name.old")
      if (Files.exists(cur)) Files.move(cur, old)
      Files.move(Paths.get(outDir, s"$name.next"), cur)
      rmTree(old)
    }
    swap("base")
    if (packBudget.isDefined) swap("pack")
    else {
      // a pack manifest from an EARLIER generation would silently
      // describe the old base — remove it rather than leave it stale
      rmTree(Paths.get(outDir, "pack"))
      rmTree(Paths.get(outDir, "pack.next"))
    }
    rmTree(Paths.get(outDir, "docs"))
    rmTree(Paths.get(outDir, "flags"))
    rmTree(Paths.get(checkpointDir, "docs"))
    rmTree(Paths.get(checkpointDir, "flags"))
    before - after
  }
}
