package graft.streaming

import graft.queries.SimilarityOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import scala.jdk.CollectionConverters._

/** STREAMING vector-query serving — the dense sibling of
  * [[RetrievalStream]]: an unbounded stream of probe vectors answered
  * from the PERSISTED IVF-PQ index ([[SimilarityOps.ivfPqServe]] —
  * shortlist off the pruned 4-byte scan, exact rerank off the float
  * table), which is how a production vector-search service actually
  * runs: the index is a sealed artifact refreshed at compact
  * generations; queries arrive forever.
  *
  * Shape: `foreachBatch`. Each micro-batch's probes are COLLECTED
  * driver-side — bounded by the batch's arrival rate, the per-batch
  * form of the q50 probe-set pattern (the ANN plans broadcast probes
  * as literals; a request batch IS a bounded probe set) — then the
  * whole two-stage serving plan runs once per batch and the results
  * go to the caller's writer. No state store, no watermark: the
  * index is static per generation, so the stage is stateless by
  * construction and the only cross-batch artifact is the sink.
  *
  * Delivery is AT-LEAST-ONCE under crash-replay (a re-run batch
  * re-serves its probes): results are keyed by `(probe_id, rank)`,
  * so an idempotent/last-write-wins sink (the [[RedisKvSink]]
  * contract) absorbs replays exactly.
  */
object AnnStream {

  /** Driver-side probes held at once — the backlog guard: a restart
    * or source catch-up batch can span hours of queued requests, so
    * the per-batch collect must not be trusted to stay small on its
    * own. Chunks of this size serve sequentially; pair with a source
    * rate limit (e.g. `maxOffsetsPerTrigger`) to bound batch size at
    * the source too. */
  val MaxProbesPerCall = 1024

  /** Serve the probe stream `(probe_id bigint, embedding
    * array<double>)` from the index at `indexPath`, reranking against
    * the static `emb` float table; each batch's `(probe_id, vec_id,
    * label, sim, rank)` results are handed to `write`, in chunks of
    * at most [[MaxProbesPerCall]] probes per serving call. */
  def serveProbes(
      probes: DataFrame,
      indexPath: String,
      emb: DataFrame,
      checkpoint: String,
      k: Int = 10)(write: DataFrame => Unit): StreamingQuery =
    probes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // toLocalIterator keeps at most a partition on the driver;
        // grouped() then bounds what a single serving call inlines
        batch.select("probe_id", "embedding").toLocalIterator()
          .asScala
          .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
          .grouped(MaxProbesPerCall)
          .foreach { chunk =>
            write(SimilarityOps.ivfPqServe(
              batch.sparkSession, indexPath, emb, chunk.toSeq, k))
          }
      }
      .start()
}
