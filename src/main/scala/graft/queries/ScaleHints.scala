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
}
