package graft.streaming

import graft.queries.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING maintenance of the duplicate-family LABEL index — the
  * daily-crawl loop run LIVE: each micro-batch of arriving documents
  * is appended to a sealed [[DedupOps.writeLabelIndex]] index
  * (screen against everything sealed so far, close the batch's pairs
  * into the existing families via the remap journal, seal the batch).
  * After any prefix of batches, [[DedupOps.labelsServe]] equals the
  * batch rebuild over every document seen — the append ≡ rebuild
  * theorem applied inductively, spec-pinned.
  *
  * Shape: `foreachBatch`, the [[CorpusStream.baseScreen]] mechanics —
  * the append is a multi-join batch mutation (screen, mini-closure,
  * four artifact writes, one manifest flip) that Structured
  * Streaming's incremental planner cannot express as a standing
  * query. Delivery is at-least-once: a crash between the manifest
  * flip and the checkpoint commit replays the batch — safe, because
  * [[DedupOps.appendLabelIndex]] is IDEMPOTENT per doc_id (sealed
  * docs are dropped from a delta before anything is written).
  *
  * Scale: each batch pays the delta-bounded append cost (shared
  * buckets, never delta × base); state lives entirely in the index's
  * generation-windowed artifacts — the stream itself is stateless, so
  * there is no state store to bound. */
object LabelIndexStream {

  /** Start the maintenance sink. `docs` is a STREAMING frame with at
    * least `(doc_id: long, text: string)`; the index at `indexPath`
    * must already be built ([[DedupOps.writeLabelIndex]] — possibly
    * over an empty base). */
  def sink(
      docs: DataFrame,
      indexPath: String,
      checkpointDir: String,
      threshold: Double = 0.6,
      bands: Int = 16,
      rows: Int = 4,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .queryName("graft-label-index-sink")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        DedupOps.appendLabelIndex(batch, indexPath, threshold, bands, rows)
      }
      .start()
}
