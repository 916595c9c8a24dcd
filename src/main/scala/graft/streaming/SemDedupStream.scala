package graft.streaming

import graft.queries.SimilarityOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING semantic-dedup screen — q88 (SemDeDup) at the unbounded
  * modality, completing the dedup matrix: text near-dups have a
  * within-stream screen ([[NeardupStream]]) and a sealed-base screen
  * ([[CorpusStream.baseScreen]]); embeddings had only the batch
  * decision table (q88). This stage screens an unbounded VECTOR stream
  * (the output of a streaming embedder) cell by cell, live.
  *
  * Shape mirrors [[NeardupStream]] with the blocking key swapped from
  * SimHash bands to the ANN stack's coarse quantizer: each arriving
  * vector is assigned its k-means cell ROW-LOCALLY
  * ([[SimilarityOps.assignCells]] — the identical codegen'd rule q88
  * and every IVF path use; pass the sealed index's trained centroids
  * for the deployment), so the only shuffle in the query is the
  * keyed-state exchange on the int cell key. Per cell a
  * `flatMapGroupsWithState` holds representative vectors and emits one
  * `(vec_id, dup_of, cell, sim)` row per (incoming, matching rep) with
  * rounded cosine ≥ `threshold` — the same HALF_UP 1e-6 rounding as
  * the batch rule, so a stream verdict is bit-comparable to a q88
  * verdict for the same pair.
  *
  * Chain semantics, explicitly: batch q88 prunes a vector if ANY
  * lower-id cell-mate clears the threshold — including cell-mates that
  * were themselves pruned (chains extend). The default stream stores
  * only ADMITTED vectors as reps (the [[NeardupStream]] keep-first
  * memory bound: state grows with content diversity, not stream
  * length), so a chain's tail can pass where batch q88 would prune it
  * — the stream's kept set is a SUPERSET of q88's on id-ordered
  * arrival. `storeFlagged = true` stores flagged vectors as anchors
  * too, which makes the stream's keep rule EXACTLY q88's "exists an
  * earlier neighbor" (spec-pinned equality on id-ordered arrival) at
  * the cost of state growing with arrivals up to `maxPerCell`.
  *
  * State boundedness ([[graft.StreamingStateSpec]] discipline):
  * `maxPerCell` hard-caps each cell's rep list (a full cell stops
  * ACCEPTING reps — overflow vectors pass unflagged-and-unstored,
  * recall traded for a hard memory bound; at 64 float dims a full
  * 4096-entry cell is ~1 MiB); `idleTtl` ages out whole cells on
  * event-time timeout ([[NeardupStream]]'s TTL rule and trade:
  * "near-dup within the TTL horizon"). nlist grows ~√n exactly as
  * q88's scaladoc argues, spreading state across cells.
  */
// executors deserialize the (stateless) enclosing object with the
// state-function closure
object SemDedupStream extends Serializable {

  /** Per-cell kept representatives, insertion-ordered. */
  type Reps = List[(Long, Array[Float])]

  /** Rounded cosine, the batch rule's arithmetic: float components
    * widened to double, left-to-right accumulation, HALF_UP at 1e-6 —
    * bit-identical to `round(PipelineOps.cosine(...), 6)` on the same
    * pair. */
  private[graft] def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Dimensions of the prescreen HEAD (see [[Screened]]): the bound
    * costs `PrescreenHead` multiplies per rep instead of the full
    * width, so the slope of the fills-up decay drops by ~dim/head. */
  private[graft] val PrescreenHead = 16

  /** Prune margin of the prescreen: a pair is skipped only when its
    * UPPER BOUND sits below `threshold − PrescreenMargin`. The margin
    * covers (a) the exact path's HALF_UP 1e-6 rounding (a raw cosine
    * up to 5·10⁻⁷ under the threshold still rounds up to it) and (b)
    * floating-point slack in the bound arithmetic — so no pair the
    * exact screen would emit can ever be pruned. */
  private[graft] val PrescreenMargin = 1e-6

  /** A vector with its prescreen structure: exact squared norm (so the
    * exact cosine never recomputes it), the NORMALIZED head prefix,
    * and the normalized tail norm. By Cauchy-Schwarz,
    * `cos(a, b) = ĥ_a·ĥ_b + t̂_a·t̂_b ≤ ĥ_a·ĥ_b + |t̂_a||t̂_b|` — a sound
    * upper bound costing [[PrescreenHead]] multiplies. Random
    * cell-mates (cosine near 0) bound at ≈ |t̂_a||t̂_b| ≈ tail/dim < any
    * real threshold and are pruned without touching the full width;
    * true near-dups bound near 1 and fall through to the EXACT cosine,
    * whose emitted value is bit-identical to [[cos]] (same dot
    * accumulation order, same norms, same rounding). Computed ONCE per
    * vector per micro-batch — state still stores plain
    * `(id, vector)` pairs, so the state schema and its encoder are
    * untouched. This is q93's compressed-domain screen idea applied to
    * the in-cell rep scan — the decay-curve fix round-13's verdict
    * named (3,240 → 2,290 rows/s as cells filled). */
  private[graft] final class Screened(
      val id: Long, val v: Array[Float]) {
    val normSq: Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      s
    }
    private val inv = if (normSq == 0.0) 0.0 else 1.0 / math.sqrt(normSq)
    val head: Array[Double] = {
      val k = math.min(PrescreenHead, v.length)
      val h = new Array[Double](k)
      var i = 0
      while (i < k) { h(i) = v(i).toDouble * inv; i += 1 }
      h
    }
    val tailNorm: Double = {
      var s = 0.0; var i = head.length
      while (i < v.length) {
        val x = v(i).toDouble * inv; s += x * x; i += 1
      }
      math.sqrt(s)
    }
  }

  /** Upper bound on `cos(a.v, b.v)` — sound up to [[PrescreenMargin]]. */
  private[graft] def cosUpperBound(a: Screened, b: Screened): Double = {
    var d = 0.0; var i = 0
    val n = math.min(a.head.length, b.head.length)
    while (i < n) { d += a.head(i) * b.head(i); i += 1 }
    d + a.tailNorm * b.tailNorm
  }

  /** Exact cosine reusing the precomputed squared norms — bit-identical
    * to [[cos]] on the same pair (the dot accumulates left to right on
    * its own, exactly as in the fused loop; the norms are the same
    * sums; the rounding is the same HALF_UP 1e-6). */
  private def cosExact(a: Screened, b: Screened): Double = {
    var dot = 0.0; var i = 0
    while (i < a.v.length) { dot += a.v(i).toDouble * b.v(i).toDouble; i += 1 }
    BigDecimal(dot / (math.sqrt(a.normSq) * math.sqrt(b.normSq)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Pure cell transition — factored out so the matching/cap/keep
    * logic unit-tests without a stream harness. Returns (emitted
    * `(vec_id, dup_of, sim)` rows, new reps). `incoming` must already
    * be deterministically ordered. */
  private[graft] def advanceCell(
      reps: Reps,
      incoming: Seq[(Long, Array[Float])],
      threshold: Double,
      maxPerCell: Int,
      storeFlagged: Boolean): (Seq[(Long, Long, Double)], Reps) = {
    val cutoff = threshold - PrescreenMargin
    var rsScreened = reps.map { case (rid, rv) => new Screened(rid, rv) }
    var appended = List.empty[Screened]
    var size = reps.size
    val out = Seq.newBuilder[(Long, Long, Double)]
    incoming.foreach { case (id, v) =>
      val q = new Screened(id, v)
      val matches = rsScreened.flatMap { r =>
        if (cosUpperBound(q, r) < cutoff) None
        else {
          val c = cosExact(q, r)
          if (c >= threshold) Some((id, r.id, c)) else None
        }
      }
      if (matches.nonEmpty) out ++= matches
      if ((matches.isEmpty || storeFlagged) && size < maxPerCell) {
        rsScreened = rsScreened :+ q
        appended = q :: appended
        size += 1
      }
    }
    val newReps =
      if (appended.isEmpty) reps
      else reps ++ appended.reverse.map(s => (s.id, s.v))
    (out.result(), newReps)
  }

  /** The screen. `vecs` is a STREAMING frame with `vec_id: long,
    * embedding: array<float>, ts: timestamp`; output is an append
    * stream of `(vec_id, dup_of, cell, sim)` candidate rows.
    * `centroids` is the sealed coarse quantizer (q88's fixed LCG
    * default, or [[SimilarityOps.readQuantizer]] of a trained index).
    *
    * `watermarkDelay` is the late-data boundary in TTL mode, exactly
    * as in [[NeardupStream.screen]]. */
  def screen(
      vecs: DataFrame,
      centroids: Seq[Seq[Double]],
      threshold: Double = SimilarityOps.NeardupCosine,
      watermarkDelay: String = "1 second",
      maxPerCell: Int = 4096,
      storeFlagged: Boolean = false,
      idleTtl: Option[String] = None): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid cell")
    require(maxPerCell > 0, s"maxPerCell must be positive, got $maxPerCell")
    idleTtl.foreach { ttl =>
      require(NeardupStream.durationMs(ttl) >
        NeardupStream.durationMs(watermarkDelay),
        s"idleTtl=$ttl must exceed watermarkDelay=$watermarkDelay: the " +
          "event-time timeout is anchored at a cell's latest arrival, so " +
          "a TTL inside the allowed-lateness window lets a cell expire " +
          "while rows it must still screen are admissible")
    }
    val spark = vecs.sparkSession
    import spark.implicits._

    val assigned = SimilarityOps.assignCells(vecs, centroids)
      .withWatermark("ts", watermarkDelay)
      .select(col("vec_id"), col("embedding"), col("ts"), col("cell"))
      .as[(Long, Array[Float], java.sql.Timestamp, Int)]

    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    def advance(
        cell: Int,
        rows: Iterator[(Long, Array[Float], java.sql.Timestamp, Int)],
        state: GroupState[Reps]): Iterator[(Long, Long, Int, Double)] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val incoming = rows.toSeq.sortBy(r => (r._3.getTime, r._1))
        val prev = state.getOption.getOrElse(Nil)
        val (emits, reps) = advanceCell(
          prev, incoming.map(r => (r._1, r._2)), threshold, maxPerCell,
          storeFlagged)
        // same-instance means nothing was admitted — skip the
        // state-store rewrite (the NeardupStream churn rule)
        if (reps.nonEmpty && !(reps eq prev)) state.update(reps)
        idleTtl.foreach { ttl =>
          val maxTs = incoming.map(_._3.getTime).max
          state.setTimeoutTimestamp(maxTs, ttl)
        }
        emits.iterator.map { case (id, dupOf, sim) => (id, dupOf, cell, sim) }
      }
    }

    assigned
      .groupByKey(_._4)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(advance)
      .toDF("vec_id", "dup_of", "cell", "sim")
  }
}
