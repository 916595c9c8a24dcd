package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Beyond-reference analytics operators rounding out the engine's query
  * surface: session windows (q22), rollup aggregates (q23), and an
  * as-of join (q24). The reference has none of these (SURVEY §2.2 lists
  * them as absent); a user migrating real workloads expects them, and
  * each one demonstrates a composition rule from the build plan —
  * built-ins first, deterministic semantics always.
  */
object AnalyticsOps {

  /** q22 — session windows: per-user event sessions that close after a
    * 300 s silence gap (`session_window`, the dynamic-length sibling of
    * the reference's fixed sliding window, TopNHashtags.java:126).
    * Output bounds are exact epoch MICROSECONDS (BIGINT): session start
    * = first event, session end = last event + gap — DuckDB reproduces
    * them with a classic gaps-and-islands window (lag + running sum).
    *
    * Plan shape: one shuffle on user_id for the session aggregation
    * (Spark merges adjacent sessions in the agg) — the same shape the
    * streaming variant uses with a state store. Determinism: session
    * membership depends only on event times, never on arrival order.
    */
  def q22SessionCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(session_window($"ts", "300 seconds"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select(
        $"user_id",
        unix_micros($"session_window.start").as("start_us"),
        unix_micros($"session_window.end").as("end_us"),
        $"n_events")
      .orderBy($"user_id", $"start_us")
  }

  def q22OracleSql: String =
    """WITH o AS (
      |  SELECT user_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w > INTERVAL 300 SECOND
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), s AS (
      |  SELECT user_id, ts,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |                                ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o
      |)
      |SELECT user_id,
      |       epoch_us(min(ts)) AS start_us,
      |       epoch_us(max(ts)) + 300000000 AS end_us,
      |       count(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, start_us""".stripMargin

  /** q23 — rollup aggregate: event counts and an exact integer checksum
    * over (event_type, user_bucket) with subtotal and grand-total rows
    * (`ROLLUP` — the multi-level aggregate the reference's single
    * hard-coded count could never express). All measures are integers
    * (count + id-sum), so the rollup levels hash exactly; NULL ordering
    * is pinned explicitly on both sides.
    */
  def q23Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("user_bucket", ($"user_id" % 10).cast("int"))
      .rollup($"event_type", $"user_bucket")
      .agg(count(lit(1)).as("n"), sum($"event_id").as("id_sum"))
      .orderBy($"event_type".asc_nulls_first, $"user_bucket".asc_nulls_first)
  }

  def q23OracleSql: String =
    """SELECT event_type, (user_id % 10)::INT AS user_bucket,
      |       count(*) AS n, CAST(sum(event_id) AS BIGINT) AS id_sum
      |FROM events
      |GROUP BY ROLLUP(event_type, (user_id % 10)::INT)
      |ORDER BY event_type NULLS FIRST, user_bucket NULLS FIRST""".stripMargin

  /** q24 — as-of join: for every event, the latest order at-or-before
    * the event time for that user. Spark has no native ASOF JOIN;
    * composed per the build plan's preference (a) — existing operators:
    * a range-conditioned equi-join on the key, then ONE aggregation
    * with `max_by` over the lexicographic (o_orderdate, o_orderkey)
    * struct. The struct tie-break makes the picked order deterministic
    * when a customer has several orders on the same date (DuckDB's
    * native ASOF leaves ties unspecified, so the oracle uses an
    * explicit row_number with the same tie-break).
    *
    * Scale: the join shuffles on the equi key (user/customer) — the
    * standard distributed as-of shape; per-key order lists are the
    * bounded dimension side. `max_by` folds map-side, so the aggregate
    * never materializes the per-event candidate lists. Skew caveat
    * (spec-pinned in PlanShapeSpec): because the aggregate's keys
    * include the join key, the aggregate REUSES the join's
    * partitioning, and AQE will NOT split a skewed partition by
    * default — the split would break the downstream requirement.
    * Relief for a pathological key (one user, millions of events) is
    * `spark.sql.adaptive.forceOptimizeSkewedJoin=true`, which splits
    * the join and re-inserts the aggregate's exchange — one extra
    * shuffle as the price — or [[RelationalOps.saltedEquiJoin]] when
    * the skew is known ahead of time.
    */
  def q24AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"ts")
    val orders = Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        ($"o_totalprice".cast("decimal(12,2)") * 100).cast("long").as("price_cents"))
    events
      .join(orders, $"user_id" === $"o_custkey" && $"o_orderdate" <= $"ts")
      .groupBy($"event_id", $"user_id", $"ts")
      .agg(
        max_by(struct($"o_orderkey", $"price_cents"),
          struct($"o_orderdate", $"o_orderkey")).as("best"))
      .select(
        $"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        $"best.o_orderkey".as("o_orderkey"),
        $"best.price_cents".as("price_cents"))
      .orderBy($"event_id")
  }

  /** q25 — moving window frame: per-user running 3-row sum and count
    * over event time (`ROWS BETWEEN 2 PRECEDING AND CURRENT ROW`) —
    * the frame-clause surface none of the rank-based queries touch.
    * Measures are integer-only (event_id checksum) so every row hashes
    * exactly; (ts, event_id) ordering makes the frame deterministic
    * even under timestamp ties.
    *
    * Plan: one shuffle on user_id, one sort per partition — the
    * standard distributed window; 150 users × bounded events keeps
    * partitions tiny here, and at 100 TB the partition key is the
    * natural entity key.
    */
  def q25MovingSum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"event_id")
      .rowsBetween(-2, Window.currentRow)
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        sum($"event_id").over(w).as("moving_id_sum"),
        count(lit(1)).over(w).as("n_in_frame"))
      .orderBy($"event_id")
  }

  def q25OracleSql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |       CAST(sum(event_id) OVER w AS BIGINT) AS moving_id_sum,
      |       count(*) OVER w AS n_in_frame
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** q26 — pivot: events long→wide, one integer count column per event
    * type per user bucket. Spark's `pivot` with an EXPLICIT value list
    * — the open-ended form needs a driver-side distinct pass to
    * discover columns, which is the wrong default at 100 TB; pinning
    * the list keeps the plan a single aggregate. The oracle builds the
    * same wide shape with FILTER counts.
    */
  val PivotTypes = Seq("click", "error", "purchase", "signup", "view")

  def q26Pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("user_bucket", ($"user_id" % 10).cast("int"))
      .groupBy($"user_bucket")
      .pivot($"event_type", PivotTypes)
      .agg(count(lit(1)))
      .na.fill(0L, PivotTypes)
      .orderBy($"user_bucket")
  }

  def q26OracleSql: String = {
    val cols = PivotTypes.map(t =>
      s"""count(*) FILTER (event_type = '$t') AS "$t"""").mkString(",\n       ")
    s"""SELECT (user_id % 10)::INT AS user_bucket,
       |       $cols
       |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin
  }

  def q24OracleSql: String =
    """WITH ranked AS (
      |  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
      |         o.o_orderkey,
      |         CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_cents,
      |         row_number() OVER (PARTITION BY e.event_id
      |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e
      |  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      |)
      |SELECT event_id, user_id, ts_us, o_orderkey, price_cents
      |FROM ranked WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q48

  /** Funnel step sequence for [[q48Funnel]] — shared with the oracle. */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** q48 — FUNNEL analysis: for each user, the earliest strictly-ordered
    * traversal of the step sequence view → click → purchase (`t1` =
    * first view; `t2` = first click AFTER t1; `t3` = first purchase
    * AFTER t2) plus the reached depth — the sequential-pattern query
    * (SQL:2016 `MATCH_RECOGNIZE`'s bread-and-butter case) that plain
    * relational operators cannot express without k self-joins.
    *
    * Plan: ONE shuffle — events filtered to funnel types, grouped by
    * user, each user's (ts, type) pairs sorted and scanned with a
    * higher-order `aggregate` whose accumulator is the k-slot timestamp
    * array; slot j fills with the first event of step j that follows a
    * filled slot j-1 (strict `>`, so simultaneous events never satisfy
    * an ordering the oracle's `min(ts) WHERE ts > prev` chain would
    * reject, and sort-order ties are semantically irrelevant). The
    * k-self-join formulation the oracle uses — the only way to say it
    * in portable SQL — shuffles the events table k times; the scan
    * shuffles it once and holds one user's funnel events in memory
    * (per-user activity-bounded; a pathological single-user firehose
    * would call for the window-function formulation instead). Output
    * times are epoch MICROSECONDS (the q22/q24 convention); users with
    * no step-1 event are excluded on both sides. */
  def q48Funnel(
      spark: SparkSession, dir: String,
      steps: Seq[String] = FunnelSteps): DataFrame = {
    val k = steps.length
    val stepsArr = array(steps.map(lit): _*)
    val perUser = Tables.events(spark, dir)
      .filter(col("event_type").isInCollection(steps))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_type")))).as("evs"))
    val initial = array((0 until k).map(_ => lit(null).cast("timestamp")): _*)
    val scanned = aggregate(col("evs"), initial, (acc, e) =>
      transform(acc, (t, j) =>
        when(t.isNotNull, t).otherwise(
          when(e("event_type") === element_at(stepsArr, j + 1) &&
              (j === 0 || (element_at(acc, j).isNotNull &&
                e("ts") > element_at(acc, j))),
            e("ts")).otherwise(lit(null).cast("timestamp")))))
    val depth = (1 until k)
      .map(i => when(element_at(col("ts_arr"), i + 1).isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    perUser
      .select(col("user_id"), scanned.as("ts_arr"))
      .select(col("user_id") +:
        (0 until k).map(i =>
          unix_micros(element_at(col("ts_arr"), i + 1)).as(s"t${i + 1}_us")) :+
        depth.as("depth"): _*)
      .filter(col("t1_us").isNotNull)
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q49

  /** Seconds per retention bucket (one week), shared with the oracle. */
  val CohortWeekUs: Long = 604800L * 1000000L

  /** FLOOR-division week id for an epoch-microsecond column — matches
    * DuckDB's `//` on the whole long domain. `micros div CohortWeekUs`
    * truncates toward zero, so -1 µs would land in week 0 on the Spark
    * side and week -1 in the oracle; subtracting `pmod` (always
    * non-negative) makes the numerator an exact multiple of the
    * divisor, after which `div` IS floor division. Spec-pinned on
    * negative epochs in AnalyticsOpsSpec. (ANSI caveat: the
    * realignment would overflow within one week of Long.MinValue —
    * 290,000 years before 1970, not a representable timestamp.) */
  private[graft] def weekId(micros: Column): Column =
    call_function("div",
      micros - pmod(micros, lit(CohortWeekUs)), lit(CohortWeekUs))

  /** q49 — COHORT RETENTION: users bucketed by the week of their first
    * event (the cohort), counted in every later week they were active —
    * the `(cohort, week_offset) → n_users` matrix behind every
    * retention curve, and the second canonical product-analytics query
    * next to q48's funnel.
    *
    * Plan: the user-week activity relation is ONE distinct (map-side
    * partial) on fixed-width `(user, wk)`; the cohort attaches as a
    * `min` WINDOW over the user partition — one pass, where the
    * equivalent aggregate-then-self-join formulation reads the events
    * table twice (the executed-plan audit showed the diamond scanning
    * twice; the window form scans once and is what the 100 TB run
    * wants); the matrix is one final aggregate on `(cohort, offset)`.
    * Week ids are integer epoch-microsecond FLOOR division — Spark's
    * `div` truncates toward zero while the oracle's DuckDB `//`
    * floors, which diverges on negative epochs (pre-1970 event times),
    * so the week id realigns to floor via `pmod` (exact: the numerator
    * is made a multiple of the divisor first). Identical on both
    * engines over the whole long domain, not just the fixture's
    * post-1970 rows; no timezone or calendar arithmetic to drift. */
  def q49CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ua = Tables.events(spark, dir)
      .select(col("user_id"), weekId(expr("unix_micros(ts)")).as("wk"))
      .distinct()
    ua.withColumn("cohort_wk",
        min(col("wk")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_wk"), col("week_offset"))
  }

  /** Ground truth for [[q49CohortRetention]] — identical integer week
    * arithmetic. */
  def q49OracleSql: String =
    s"""WITH ua AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $CohortWeekUs AS wk
       |  FROM events
       |), c AS (
       |  SELECT user_id, min(wk) AS cohort_wk FROM ua GROUP BY user_id
       |)
       |SELECT c.cohort_wk, ua.wk - c.cohort_wk AS week_offset,
       |       count(*) AS n_users
       |FROM ua JOIN c USING (user_id)
       |GROUP BY c.cohort_wk, week_offset
       |ORDER BY cohort_wk, week_offset""".stripMargin

  /** Ground truth for [[q48Funnel]] — the k-self-join min-chain, the
    * portable-SQL statement of the same greedy-earliest semantics. */
  def q48OracleSql: String = {
    val Seq(s1, s2, s3) = FunnelSteps
    s"""WITH s1 AS (
       |  SELECT user_id, min(ts) AS t1 FROM events
       |  WHERE event_type = '$s1' GROUP BY user_id
       |), s2 AS (
       |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
       |  WHERE e.event_type = '$s2' AND e.ts > s1.t1 GROUP BY e.user_id
       |), s3 AS (
       |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
       |  WHERE e.event_type = '$s3' AND e.ts > s2.t2 GROUP BY e.user_id
       |)
       |SELECT s1.user_id, epoch_us(t1) AS t1_us, epoch_us(t2) AS t2_us,
       |       epoch_us(t3) AS t3_us,
       |       1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
       |         + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS depth
       |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
       |ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------- q82

  /** Burst geometry: 4-hour tumbling windows, a 3-window trailing
    * baseline, and the "more than 2× the trailing mean, at least
    * [[BurstMinCount]] events" rule — `n·TRAIL > 2·trail_sum` keeps
    * the compare in exact integer cross-multiplication (no mean
    * division anywhere). */
  val BurstWindowSec = 14400
  val BurstTrail = 3
  val BurstMinCount = 4

  /** q82 — BURST detection per event type: flag windows whose count
    * exceeds twice the trailing-3-window mean — the trending-topic
    * primitive the reference's domain actually wants (its top-N ranks
    * by absolute count, so a permanently-large type always wins;
    * bursts rank by DEVIATION from each type's own baseline, which is
    * what "trending" means). The q05 window aggregate composed with a
    * q40-style dense resample and a q25-style trailing frame.
    *
    * The grid must be DENSE before the frame runs: `ROWS BETWEEN`
    * frames count physical rows, so a silent-period gap would make
    * the baseline reach back to stale traffic and mask the burst at
    * reactivation. Empty slots therefore materialize as zeros first
    * (bounds are a broadcast 1-row aggregate; the slot series is
    * time-span-sized, not corpus-sized, and the type alphabet is
    * bounded — the grid stays tiny at any corpus scale while the
    * heavy count aggregate combines map-side). Cold-start windows
    * (fewer than [[BurstTrail]] predecessors) never flag.
    * All-integer output.
    *
    * QUERY CONTRACT — EAGER, not lazy: the returned DataFrame is
    * already materialized (`localCheckpoint(true)` — the price of
    * running the events scan + count aggregate exactly once across
    * the plan's three consumers while still releasing the cache
    * before returning). Unlike every other inventory query, calling
    * this RUNS the computation; the result is a bounded
    * time-span × type-alphabet grid held on the session's executors,
    * re-read (not recomputed) by every downstream action, and
    * released with the session (or an explicit `.unpersist()`).
    * q80 shares the pattern for the same reason; see `SparkEntry`.
    */
  def q82BurstDetect(spark: SparkSession, dir: String): DataFrame =
    burstDetect(Tables.events(spark, dir))

  /** Frame-level core of [[q82BurstDetect]] over any `(ts,
    * event_type, …)` frame — the streaming twin's equivalence spec
    * runs it on a shared synthetic feed. */
  private[graft] def burstDetect(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = events.sparkSession
    import spark.implicits._
    // the count aggregate feeds THREE consumers (bounds, type set,
    // the grid join) — persist it so the events scan + group-by run
    // once, and hand back an eagerly-materialized result so the
    // cache can be released before returning (the q71/q79 pattern)
    val c = events
      .groupBy(window($"ts", s"$BurstWindowSec seconds"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".cast("long").as("ws"), $"event_type", $"n")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bounds = c.agg(min($"ws").as("lo"), max($"ws").as("hi"))
      val grid = c.select($"event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select($"event_type",
          explode(sequence($"lo", $"hi", lit(BurstWindowSec.toLong))).as("ws"))
      val frame = Window.partitionBy($"event_type").orderBy($"ws")
        .rowsBetween(-BurstTrail, -1)
      grid.join(c, Seq("event_type", "ws"), "left")
        .select($"event_type", $"ws", coalesce($"n", lit(0L)).as("n"))
        .withColumn("trail_sum", coalesce(sum($"n").over(frame), lit(0L)))
        .withColumn("trail_n", count(lit(1)).over(frame))
        .withColumn("is_burst",
          ($"trail_n" === BurstTrail &&
            $"n" * BurstTrail > $"trail_sum" * 2 &&
            $"n" >= BurstMinCount).cast("int"))
        .select($"event_type", $"ws", $"n", $"trail_sum", $"is_burst")
        .orderBy($"event_type", $"ws")
        .localCheckpoint(true)
    } finally c.unpersist()
  }

  /** Ground truth for [[q82BurstDetect]] — the same dense grid,
    * trailing frame, and integer cross-multiplied rule. */
  def q82OracleSql: String =
    s"""WITH c AS (
       |  SELECT CAST(floor(epoch(ts) / $BurstWindowSec) * $BurstWindowSec AS BIGINT) AS ws,
       |         event_type, count(*) AS n
       |  FROM events GROUP BY 1, 2
       |), b AS (SELECT min(ws) AS lo, max(ws) AS hi FROM c),
       |grid AS (
       |  SELECT t.event_type, g.ws
       |  FROM (SELECT DISTINCT event_type FROM c) t,
       |       (SELECT unnest(generate_series(lo, hi, $BurstWindowSec)) AS ws FROM b) g
       |), dense AS (
       |  SELECT grid.event_type, grid.ws, coalesce(c.n, 0)::BIGINT AS n
       |  FROM grid LEFT JOIN c ON c.event_type = grid.event_type AND c.ws = grid.ws
       |), t AS (
       |  SELECT event_type, ws, n,
       |         coalesce(sum(n) OVER (PARTITION BY event_type ORDER BY ws
       |           ROWS BETWEEN $BurstTrail PRECEDING AND 1 PRECEDING), 0)::BIGINT AS trail_sum,
       |         count(*) OVER (PARTITION BY event_type ORDER BY ws
       |           ROWS BETWEEN $BurstTrail PRECEDING AND 1 PRECEDING) AS trail_n
       |  FROM dense
       |)
       |SELECT event_type, ws, n, trail_sum,
       |       (CASE WHEN trail_n = $BurstTrail AND n * $BurstTrail > trail_sum * 2
       |                  AND n >= $BurstMinCount
       |             THEN 1 ELSE 0 END)::INT AS is_burst
       |FROM t ORDER BY event_type, ws""".stripMargin
}
