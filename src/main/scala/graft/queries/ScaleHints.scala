package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hints — the scale-safe replacement for the
  * unconditional `broadcast()` calls that rounds 7–9 sprinkled on
  * relations that GROW with the corpus (q11's customer dimension,
  * q42's document-frequency table, q55's token-cost table).
  *
  * The problem with a bare hint: `broadcast(df)` overrides BOTH the
  * static `spark.sql.autoBroadcastJoinThreshold` AND AQE's runtime
  * re-plan, so a relation that was "obviously small" at test scale is
  * force-collected to the driver and every executor at 100 TB — an
  * OOM, not a slowdown (Spark hard-caps broadcasts at 8 GB). The
  * reference hardwires the same mistake in miniature: its top-N map is
  * unconditionally hash-broadcast to all subtasks
  * (TopNHashtags.java:131) with no size escape hatch.
  *
  * The fix is to make the hint CONDITIONAL on Catalyst's own size
  * estimate for the subtree (`optimizedPlan.stats.sizeInBytes` — file
  * sizes for scans, propagated estimates for derived frames; a
  * driver-side computation, no job). Two regimes fall out:
  *
  *   - estimate ≤ `capBytes`: the relation is known-bounded (a
  *     dimension table, a probe set, a gate list) — hint it, which
  *     buys a broadcast even when the conservative 10 MB auto
  *     threshold would have declined, and saves the big side's
  *     shuffle write entirely (AQE's runtime conversion still pays
  *     the map-side write before it can measure).
  *   - estimate > `capBytes` (or inestimable — aggregates without
  *     column stats propagate their CHILD's size, so a vocab table
  *     derived from an exploded corpus scan reports corpus-sized):
  *     leave the join BARE and let AQE pick broadcast-vs-shuffle from
  *     the MEASURED stage output at runtime. At test scale AQE still
  *     broadcasts these sides (pinned in PlanShapeSpec); at web scale
  *     the same code degrades to a shuffle join — the degradation the
  *     scaladocs promise is now reachable.
  *
  * `capBytes` defaults well ABOVE the auto threshold: gating at the
  * auto threshold would make the hint a no-op (the planner already
  * broadcasts estimates under it). 256 MB is the "comfortably fits in
  * any executor, far under the 8 GB cap" band where we trust the
  * estimate over the conservative default.
  */
object ScaleHints {

  /** Default hint cap: 256 MB — see object scaladoc for the rationale. */
  val DefaultCapBytes: Long = 256L * 1024 * 1024

  /** `broadcast(df)` iff Catalyst estimates the subtree under
    * `capBytes`; otherwise `df` unchanged (AQE decides at runtime).
    */
  def broadcastIfBounded(
      df: DataFrame, capBytes: Long = DefaultCapBytes): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= BigInt(capBytes)) broadcast(df) else df
  }

  /** Per-core byte bound under which an input counts as
    * SPLIT-STARVED: Spark's own split formula caps a split at
    * `max(openCostInBytes, bytes/defaultParallelism)` with
    * `openCostInBytes = 4 MB` by default, so an input estimated under
    * `cores × 4 MB` cannot produce more splits than cores even in the
    * best case — and an unsplittable layout (one row group, gzip)
    * produces far fewer. */
  val FanOutSplitBytes: Long = 4L * 1024 * 1024

  /** Round-robin fan-out for CPU-heavy operators whose input is tiny
    * in BYTES (optimization round 20, guide §2.5 "input skew … one
    * huge unsplittable file" + §1.2 "choose a partitioning that avoids
    * [starvation]").
    *
    * Every sizing decision Spark makes — scan splits, AQE partition
    * coalescing — is BYTE-based. Operators that spend microseconds of
    * CPU per row (tokenize-and-hash HOFs, per-term filters, regex
    * chains) are CPU-bound long before they are byte-bound, so on a
    * small or unsplittable input (the fixture tables are one parquet
    * file with ONE row group — scan parallelism exactly 1) the entire
    * narrow pipeline above the scan runs on a single core while 31
    * idle. Measured on q111 (gate distill): the feature extraction and
    * all four epoch aggregates ran 1 task each — the query IS its
    * single-thread CPU time.
    *
    * The guard repartitions to the session's default parallelism ONLY
    * when Catalyst's size estimate for the subtree says the input
    * cannot fill the machine (`est ≤ cores × [[FanOutSplitBytes]]`) —
    * the same driver-side, no-job estimate [[broadcastIfBounded]]
    * trusts, read from the SAME optimized plan. At scale the estimate
    * exceeds the bound and the hint vanishes — no shuffle is added to
    * a 100 TB scan that already has thousands of splits (the
    * scale-adaptive requirement: this is a guard, not a constant).
    * When it does fire, the one round-robin exchange moves the whole
    * (tiny) input once; `repartition(n)` with an explicit n is exempt
    * from AQE coalescing, so the parallelism survives to the next
    * keyed exchange.
    */
  def fanOutIfTiny(df: DataFrame): DataFrame = {
    // streaming frames pass through untouched: a micro-batch is already
    // parallelism-bounded by its source, and batch-optimizing a
    // streaming plan (optimizedPlan below) is illegal — the shared
    // operators (assignCells et al.) serve both worlds
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= BigInt(cores.toLong * FanOutSplitBytes)) df.repartition(cores)
    else df
  }
}
