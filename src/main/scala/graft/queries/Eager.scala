package graft.queries

import org.apache.spark.sql.DataFrame

/** The "eager class" lifecycle for bounded-result queries (q71/q79's
  * pattern, promoted here in round 14 so DedupOps/TextOps share one
  * implementation): a build form returns `(result, persistedHandles)`
  * where the handles are small diamonds (candidate summaries, the
  * (source, token) aggregate, q43's label relation) that the plan
  * consumes more than once. The PLAIN entry points must hand back a
  * frame whose lifetime is the caller's, yet returning the lazy plan
  * would leak the diamonds into the session cache for its lifetime —
  * the repo's cache-empty discipline (CorpusPipelineSpec,
  * TextOpsSpec's `cacheIsEmpty` asserts). Round 13 shipped exactly
  * that leak through q58's plain form; this object is the structural
  * fix.
  *
  * `localCheckpoint(eager = true)` runs the query ONCE, pins the
  * (bounded-by-construction) RESULT as block-manager RDD blocks
  * outside the cache manager, and truncates lineage so the diamonds
  * can be unpersisted immediately; the blocks free when the frame is
  * GC'd. Only results bounded by an alphabet/candidate cap belong
  * here — corpus-scale results (q43's labels, pair relations) stay on
  * the caller-owned/loan contract. Callers needing the live plan
  * (plan pins, controlled release) use the loan/build forms.
  */
private[graft] object Eager {

  /** Run a build-form (result, persisted-handles) pair to completion
    * and release the handles before returning. */
  def materializeAndRelease(built: (DataFrame, Seq[DataFrame])): DataFrame = {
    val (result, handles) = built
    try result.localCheckpoint(true) finally handles.foreach(_.unpersist())
  }
}
