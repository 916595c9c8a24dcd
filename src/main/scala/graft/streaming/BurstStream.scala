package graft.streaming

import graft.queries.AnalyticsOps
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING burst detection — q82 on the live stream: the trending
  * alert the reference's domain wants while ingesting, not in a
  * nightly batch. Semantics are q82's exactly (dense trailing
  * baseline, integer cross-multiplied threshold, cold-start windows
  * never flag — spec-pinned equal to the batch core on a shared
  * feed), carried by ONE `flatMapGroupsWithState` keyed on the event
  * type.
  *
  * Why one operator owns both the windowing and the baseline: Spark
  * does not allow `flatMapGroupsWithState` downstream of a streaming
  * aggregation, so the built-in window aggregate cannot feed the
  * ring state. Instead each type's state holds its OPEN window
  * counts (a map bounded by the lateness horizon over the window
  * size) plus the trailing ring of the last [[AnalyticsOps
  * .BurstTrail]] FINALIZED counts; when the watermark passes a
  * window's end the window finalizes IN ORDER, with silent slots
  * between finalized windows entering the ring as zeros — the dense
  * resample's streaming form, preserving q82's "a gap must not
  * stretch the baseline back to stale traffic" rule. Zero slots
  * update the ring but emit nothing (they cannot flag — the min
  * count is positive — and an alert stream has no use for empty
  * windows).
  *
  * State per type: ≤ horizon/windowSec open entries + a
  * [[AnalyticsOps.BurstTrail]]-long ring, over a BOUNDED type
  * alphabet — constant in stream length by construction. The ring
  * deliberately never expires: a type's baseline is its own history,
  * and the next window after a long silence sees the zero-filled gap
  * exactly as the batch grid would. An `EventTimeTimeout` finalizes
  * pending windows for types that go quiet (their rows stop arriving
  * but the global watermark keeps moving).
  */
object BurstStream {

  /** (lastFinalizedWs | Long.MinValue for "no history", newest-last
    * ring of finalized counts, open window-start → count). */
  private type BState = (Long, List[Long], Map[Long, Long])

  /** Emitted per finalized NON-EMPTY window: q82's row shape. */
  private type BurstRow = (String, Long, Long, Long, Int)

  /** `originSec`: the stream's global first-window epoch. A type
    * first seen LATER than the origin zero-fills its ring from the
    * origin slot — exactly the batch grid's global `lo`, so a
    * brand-new type's first active window can flag against its
    * all-zero baseline (the "new trending topic" case). Without an
    * origin a new type's baseline starts at its own first window and
    * its first [[AnalyticsOps.BurstTrail]] windows are cold-start —
    * a DOCUMENTED divergence from the batch grid for late-joining
    * types (the stream cannot know a global origin it was never
    * told). */
  def bursts(
      events: DataFrame,
      watermarkDelay: String = "30 seconds",
      windowSec: Long = AnalyticsOps.BurstWindowSec.toLong,
      trail: Int = AnalyticsOps.BurstTrail,
      minCount: Long = AnalyticsOps.BurstMinCount.toLong,
      originSec: Option[Long] = None): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val originWs = originSec.map(o => Math.floorDiv(o, windowSec) * windowSec)

    def advance(
        kind: String,
        rows: Iterator[(String, Timestamp)],
        state: GroupState[BState]): Iterator[BurstRow] = {
      val (lastWs0, ring0, open0) = state.getOption.getOrElse(
        // a declared origin seeds every type as if it had been silent
        // since the stream began — the batch grid's global lo.
        // Long.MinValue = "no history" (a plain -1 would collide with
        // legitimately negative pre-1970 window starts AND with an
        // origin seed of originWs - windowSec when the origin is 0)
        (originWs.map(_ - windowSec).getOrElse(Long.MinValue),
          Nil, Map.empty[Long, Long]))
      // fold the batch's rows into the open windows
      var open = open0
      rows.foreach { case (_, ts) =>
        val ws = Math.floorDiv(ts.getTime, windowSec * 1000) * windowSec
        open = open.updated(ws, open.getOrElse(ws, 0L) + 1)
      }
      // finalize, oldest first, every open window the watermark passed
      val wmSec = Math.floorDiv(state.getCurrentWatermarkMs(), 1000L)
      val ready = open.keys.filter(ws => ws + windowSec <= wmSec).toList.sorted
      var lastWs = lastWs0
      var ring = ring0
      val out = List.newBuilder[BurstRow]
      def pushSlot(ws: Long, n: Long, emit: Boolean): Unit = {
        val trailSum = ring.sum
        val burst = ring.length == trail && n * trail > trailSum * 2 && n >= minCount
        if (emit) out += ((kind, ws, n, trailSum, if (burst) 1 else 0))
        ring = (ring :+ n).takeRight(trail)
        lastWs = ws
      }
      ready.foreach { ws =>
        // a gap longer than the ring is indistinguishable from exactly
        // trail zero slots (zero slots emit nothing and the ring keeps
        // only the last `trail`), so fast-forward instead of looping —
        // a type reactivating after a long silence (or origin-seeded
        // far in the past) costs O(trail), not O(gap/windowSec)
        if (lastWs != Long.MinValue && (ws - lastWs) / windowSec > trail) {
          ring = List.fill(trail)(0L)
          lastWs = ws - windowSec
        }
        var slot = if (lastWs == Long.MinValue) ws else lastWs + windowSec
        while (slot < ws) { pushSlot(slot, 0L, emit = false); slot += windowSec }
        pushSlot(ws, open(ws), emit = true)
      }
      open = open -- ready
      state.update((lastWs, ring, open))
      // a quiet type still has to finalize its pending windows once
      // the global watermark passes them — wake at the earliest end
      if (open.nonEmpty) {
        val wake = (open.keys.min + windowSec) * 1000
        state.setTimeoutTimestamp(math.max(wake, wmSec * 1000 + 1))
      }
      out.result().iterator
    }

    events
      .select(col("event_type"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BState, BurstRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (kind: String, rows: Iterator[(String, Timestamp)],
            state: GroupState[BState]) =>
          advance(kind, if (state.hasTimedOut) Iterator.empty else rows, state)
      }
      .toDF("event_type", "ws", "n", "trail_sum", "is_burst")
  }
}
