package graft.streaming

import graft.queries.RetrievalOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING maintenance of the cross-store HYBRID index —
  * [[LabelIndexStream]]'s loop applied to the composed retrieval
  * store (the one persisted index family that had no streaming twin):
  * each micro-batch of arriving documents is appended to a sealed
  * [[RetrievalOps.writeHybridIndex]] store through ONE correlated
  * seal — both legs advance in lockstep, the rerank floats version
  * with the generation, the hybrid manifest flips last. After any
  * prefix of batches, [[RetrievalOps.hybridServeAt]] equals the batch
  * rebuild over every document seen (the q120 append ≡ rebuild
  * theorem applied inductively, spec-pinned).
  *
  * INPUT CONTRACT — one correlated row per document:
  * `(doc_id: long, text: string, label: string,
  * embedding: array<float>)`. The row carries the doc's text AND its
  * embedding so the two legs can never skew: a split-source design
  * (text stream here, vectors there) would reintroduce exactly the
  * decorrelation the cross-store seal exists to prevent. The sparse
  * leg ingests `(doc_id, text)`, the dense leg
  * `(vec_id = doc_id, label, embedding)` — q120's id-space
  * convention.
  *
  * Shape: `foreachBatch`, the [[LabelIndexStream]] mechanics — the
  * append is a multi-join batch mutation (two leg appends, a float
  * sidecar write, one manifest flip) that the incremental planner
  * cannot express. Delivery is at-least-once: a crash between the
  * hybrid flip and the checkpoint commit replays the batch — safe,
  * because [[RetrievalOps.appendHybridIndex]] is IDEMPOTENT per id
  * (the sealed-id watermark prunes a full replay to a no-op before
  * any leg is touched), and a crash BETWEEN leg commits is repaired
  * by the retry's head inspection (pre-flip torn states are invisible
  * to serves by the flip-last rule). Empty micro-batches are skipped
  * — an append of nothing would still seal a junk generation, growing
  * the window for no content.
  *
  * Scale: each batch pays the delta-bounded append cost (bucketed
  * posting rows + cell-keyed codes, never delta × base); state lives
  * entirely in the store's generation-windowed artifacts — the stream
  * itself is stateless, so there is no state store to bound. TRIGGER
  * SIZING: every durable append carries a fixed floor (two leg plans,
  * a float write, the manifest flip) on top of a per-doc marginal
  * cost, so the [[LabelIndexStream]] rule applies verbatim — size
  * triggers so batches carry tens of thousands of docs when the
  * source can sustain it; idempotency makes coarse batches
  * at-least-once safe, and re-batching cannot change the served
  * ranking (spec-pinned). Every batch seals one generation, so the
  * sink carries its compaction cadence in-loop (`compactPastGens` —
  * [[RetrievalOps.maybeCompactHybridIndex]] at the head of each
  * batch, self-healing across fold crashes; see [[sink]]) — the joint
  * fold is the ONLY sanctioned compaction (direct leg compaction is
  * refused as an out-of-band mutation), and its crash contract is a
  * loud brief outage rolled forward by the retry, never a
  * misserve. */
object HybridIndexStream {

  /** Start the maintenance sink. `corpus` is a STREAMING frame with
    * the correlated row contract above; the store at `indexPath` must
    * already be built ([[RetrievalOps.writeHybridIndex]] or
    * [[RetrievalOps.writeTrainedHybridIndex]] — appends encode with
    * the head epoch's quantizers either way).
    *
    * `compactPastGens` is the in-loop compaction cadence
    * ([[RetrievalOps.maybeCompactHybridIndex]] at the head of every
    * micro-batch): the check is one manifest read when under
    * threshold, and running it BEFORE the append makes the loop
    * SELF-HEALING — a crash inside a previous batch's fold leaves the
    * hybrid window un-flipped (still spanning > threshold), so the
    * next batch's check re-fires and rolls the compaction forward by
    * head inspection before the append would hit the off-sync leg
    * refusal. Compact-after-append would wedge the stream instead:
    * the replayed batch's APPEND meets the half-compacted legs first
    * and refuses forever. None disables the cadence (run the fold
    * out-of-band).
    *
    * `resumeIvfIters`/`resumePqIters`/`resumeTrainSample` parametrize
    * the head-of-batch retrain roll-forward (round 19): they matter
    * ONLY when a crashed retrain's dense epoch snapshot was itself
    * unfinished — the resume then retrains FROM SCRATCH with these
    * (after a later-stage crash the snapshot is reused verbatim and
    * they are ignored). Default them to the deployment's retrain
    * parameters; a stream left on the 5/5-full-sidecar defaults would
    * otherwise silently publish differently-trained quantizers than
    * the operator's interrupted retrainHybridDense(20, sample) asked
    * for.
    *
    * `gcRetainGens` (round 20) is the in-loop RECLAMATION cadence
    * ([[RetrievalOps.gcHybridIndex]] beside the compaction check):
    * mutations retain replaced history for in-flight readers, so
    * space is only reclaimed here (or out-of-band), and the value is
    * the READER HORIZON — any serve planned within the last
    * `retainGens` committed generations is safe to finish. None
    * (default) defers reclamation entirely. */
  def sink(
      corpus: DataFrame,
      indexPath: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      compactPastGens: Option[Long] = None,
      resumeIvfIters: Int = 5,
      resumePqIters: Int = 5,
      resumeTrainSample: Option[DataFrame] = None,
      gcRetainGens: Option[Long] = None): StreamingQuery =
    corpus.writeStream
      .queryName("graft-hybrid-index-sink")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // self-healing, part 1 (round 19): a dense-leg retrain that
        // crashed between leg flips leaves a pending `R` intent that
        // makes BOTH the compaction and the append below refuse by
        // design — without this resume the stream would wedge in a
        // refuse-crash-replay loop until an operator ran
        // retrainHybridDense by hand. One manifest read when idle.
        // Iteration counts matter only if the dense snapshot itself
        // was unfinished (see maybeResumeHybridRetrain's scaladoc).
        RetrievalOps.maybeResumeHybridRetrain(batch.sparkSession, indexPath,
          resumeIvfIters, resumePqIters, resumeTrainSample)
        compactPastGens.foreach(g =>
          RetrievalOps.maybeCompactHybridIndex(
            batch.sparkSession, indexPath, g))
        // round 20: the gc cadence lives where the compaction cadence
        // does. Mutations never reclaim replaced history (retention —
        // an in-flight reader of any recent window finishes its scan);
        // this is the operator's reclamation point, and `retainGens`
        // IS the reader horizon: a serve that planned more than
        // retainGens committed generations ago may be reclaimed under.
        // None (default) defers reclamation to an out-of-band gc.
        gcRetainGens.foreach(r =>
          RetrievalOps.gcHybridIndex(indexPath, r))
        if (!batch.isEmpty)
          RetrievalOps.appendHybridIndex(
            batch.select(col("doc_id"), col("text")),
            batch.select(col("doc_id").as("vec_id"), col("label"),
              col("embedding")),
            indexPath)
      }
      .start()
}
