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
  * there is no state store to bound.
  *
  * TRIGGER SIZING (round 16, measured — bench/NOTES.md): every
  * durable append carries a ~4 s fixed floor (screen plan + four
  * artifact writes + manifest flip) on top of a ~65 µs/doc marginal
  * cost, so throughput is `N / (floor + N·m)` in the batch size: the
  * measured curve at 100k fixture docs runs 2.1k docs/s at 10k-doc
  * triggers → 9.5k docs/s at one 100k-doc batch, with the SERVED
  * LABELS IDENTICAL across every sizing (append ≡ rebuild holds
  * inductively whatever the batching — re-batching is free). Rule:
  * size the trigger (`maxFilesPerTrigger` × file size, or a
  * processing-time trigger) so batches carry ≥ ~60k docs when the
  * source can sustain it — a maintenance stream is throughput-, not
  * latency-bound, and idempotency makes coarse batches at-least-once
  * safe. */
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
