package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational surface beyond the reference and beyond [[AnalyticsOps]]:
  * a fact-to-fact TPC-H-style join aggregate (q29), set operations
  * (q30), deterministic hash sampling (q31), and cube aggregates (q32).
  * SURVEY §2.2 lists set ops as absent from the reference and its only
  * join as a broadcast semi-join; these queries complete the relational
  * algebra a migrating user expects, each with the deterministic-output
  * discipline the oracle gate demands.
  */
object RelationalOps {

  /** Date splitting "old orders" from "still-shipping lineitems" —
    * mid-range of the fixture's 1995-2001 span (TPC-H Q3's shape). */
  val RevenueCutoff = "1998-01-01"

  /** q29 — shipping-priority revenue top-10 (the classic TPC-H Q3
    * shape): lineitem ⋈ orders ⋈ customer with selective filters on all
    * three inputs, revenue aggregate per order, top 10 by revenue.
    *
    * This is the engine's one genuinely BIG join — fact-to-fact
    * (lineitem ⋈ orders), both sides filtered BEFORE the join (the
    * filters push to the parquet scans), shuffled on the join key with
    * map-side partial aggregation after. The filtered customer
    * dimension GROWS with the corpus (one mktsegment ≈ 1/5 of the
    * table — billions of rows at TPC-H 100 TB), so its broadcast is
    * size-gated via [[ScaleHints.broadcastIfBounded]]: at test scale
    * Catalyst's estimate is tiny and the hint fires (the fact stream
    * never shuffles for it — pinned in PlanShapeSpec); past the cap
    * the join goes bare and AQE picks shuffle-vs-broadcast from the
    * measured post-filter size. AQE sizes the fact shuffle, and the
    * top-10 is `TakeOrderedAndProject` (per-partition top-k, k rows
    * to the driver — never a global sort).
    *
    * Revenue is EXACT integer "cent-percent" units:
    * `price_cents × (100 − discount_pct)` — double arithmetic would
    * make the sum partitioning-order-dependent; integers commute.
    */
  def q29TopRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cutoff = lit(RevenueCutoff).cast("timestamp")
    val cust = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" < cutoff)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" > cutoff)
      .select($"l_orderkey",
        (round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long"))).as("rev_cp"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(ScaleHints.broadcastIfBounded(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum($"rev_cp").as("revenue_cp"), count(lit(1)).as("n_items"))
      // parquet timestamps load as TIMESTAMP_NTZ; session tz is UTC, so
      // the cast is a pure type change and epoch_us matches DuckDB
      .select($"o_orderkey",
        unix_micros($"o_orderdate".cast("timestamp")).as("odate_us"),
        $"o_orderpriority", $"revenue_cp", $"n_items")
      .orderBy($"revenue_cp".desc, $"o_orderkey")
      .limit(10)
  }

  def q29OracleSql: String =
    s"""SELECT o_orderkey, epoch_us(o_orderdate) AS odate_us, o_orderpriority,
       |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
       |                (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_cp,
       |       count(*) AS n_items
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '$RevenueCutoff'
       |  AND l_shipdate  > TIMESTAMP '$RevenueCutoff'
       |GROUP BY o_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue_cp DESC, o_orderkey
       |LIMIT 10""".stripMargin

  /** The q30 operand sets: A = long documents, B = low-numbered
    * sources. Chosen to overlap partially so all three ops have
    * non-trivial results. */
  val LongDocChars = 300
  val SetOpSources: Seq[String] = (0 until 5).map(i => s"src$i")

  /** q30 — set operations: INTERSECT / UNION / EXCEPT of two id sets,
    * tagged and stacked into one deterministic relation. Spark compiles
    * each to an aggregate or left-anti join over the shared shuffle key
    * — no sort, no driver involvement; at scale each op is one shuffle
    * on `doc_id` (and AQE merges the reused exchange of the shared
    * scan). The reference has NO set operations (SURVEY §2.2). */
  def q30SetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val a = docs.filter($"n_chars" >= LongDocChars).select($"doc_id")
    val b = docs.filter($"source".isin(SetOpSources: _*)).select($"doc_id")
    a.intersect(b).select(lit("intersect").as("op"), $"doc_id")
      .unionAll(a.union(b).distinct()
        .select(lit("union").as("op"), $"doc_id"))
      .unionAll(a.except(b).select(lit("except").as("op"), $"doc_id"))
      .orderBy($"op", $"doc_id")
  }

  def q30OracleSql: String = {
    val srcs = SetOpSources.map(s => s"'$s'").mkString(", ")
    val a = s"SELECT doc_id FROM documents WHERE n_chars >= $LongDocChars"
    val b = s"SELECT doc_id FROM documents WHERE source IN ($srcs)"
    s"""SELECT 'intersect' AS op, doc_id FROM ($a INTERSECT $b)
       |UNION ALL
       |SELECT 'union' AS op, doc_id FROM ($a UNION $b)
       |UNION ALL
       |SELECT 'except' AS op, doc_id FROM ($a EXCEPT $b)
       |ORDER BY op, doc_id""".stripMargin
  }

  /** Modulus for the 1-in-16 content-hash sample. */
  val SampleMod = 16

  /** q31 — deterministic content-hash sampling: keep documents whose
    * md5(text) ≡ 0 (mod 16). The sampling primitive a training
    * pipeline needs is NOT `rand()`-based `sample()` — a rerun, a
    * retry, or another engine must select the SAME rows (reproducible
    * experiments, resumable jobs), and content-keyed hashing also
    * samples consistently across duplicated/re-crawled rows. A narrow
    * codegen'd filter; pushes nothing to the scan but reads only the
    * needed columns, and composes with any downstream op. */
  def q31SampleHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(contentHashMod(SampleMod) === 0)
      .select($"doc_id", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  def q31OracleSql: String =
    s"""SELECT doc_id, source, n_chars
       |FROM documents
       |WHERE ${contentHashModSql(SampleMod)} = 0
       |ORDER BY doc_id""".stripMargin

  /** Per-language sampling rates in PER MILLE for [[q41StratifiedSample]]
    * — integers so the Spark filter and the DuckDB oracle are generated
    * from the very same constants with no float representation in
    * between. The shape models corpus REBALANCING: the dominant language
    * is downsampled hard, mid-size ones moderately, scarce ones kept
    * whole. Languages not listed keep everything (`DefaultKeepPerMille`). */
  val StratRates: Seq[(String, Int)] =
    Seq("en" -> 250, "es" -> 500, "zh" -> 750)
  val DefaultKeepPerMille = 1000

  /** q41 — deterministic STRATIFIED sampling: per-language keep rates
    * applied via the same content-keyed md5 filter as [[q31SampleHash]]
    * (`hash(text) mod 1000 < rate(lang)`), the corpus-rebalancing
    * primitive a training pipeline runs before mixing languages.
    * `sampleBy`/`rand()` cannot do this job: a rerun, a retry, or a
    * second engine must select the SAME rows, and content-keyed hashing
    * also samples duplicated/re-crawled rows consistently. The rate
    * lookup is a constant `when`-chain — the whole operator is ONE
    * narrow codegen'd filter, no join, no shuffle, no driver round-trip;
    * at 100 TB it runs at scan speed on any partitioning. */
  def q41StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(stratifiedKeep(StratRates, DefaultKeepPerMille))
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
  }

  /** The content-keyed sampling hash shared by q31 and q41 — ONE
    * definition per engine, so a future change to the key (prefix
    * width, digest) cannot silently split the two queries or drift
    * from the oracle. Value in `[0, mod)`. */
  def contentHashMod(mod: Int): Column =
    conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long") % mod

  /** Oracle-side twin of [[contentHashMod]] — same bits in DuckDB. */
  def contentHashModSql(mod: Int): String =
    s"('0x' || substr(md5(text), 1, 4))::BIGINT % $mod"

  /** Per-mille denominator of the stratified rates. */
  val PerMille = 1000

  /** The q41 keep-predicate as a reusable Column over `(lang, text)` —
    * [[CorpusPipeline]]'s rebalance stage uses it directly. FIRST
    * matching entry wins for a duplicated language, matching the
    * generated oracle CASE's evaluation order (the reversed fold puts
    * earlier entries OUTERMOST in the when-chain). */
  def stratifiedKeep(
      rates: Seq[(String, Int)],
      defaultPerMille: Int = DefaultKeepPerMille): Column = {
    val rate = rates.reverse.foldLeft(lit(defaultPerMille)) {
      case (acc, (lang, r)) => when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    contentHashMod(PerMille) < rate
  }

  def q41OracleSql: String = {
    val cases = StratRates
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")
    s"""SELECT doc_id, lang, source
       |FROM documents
       |WHERE ${contentHashModSql(PerMille)} <
       |      (CASE $cases ELSE $DefaultKeepPerMille END)
       |ORDER BY doc_id""".stripMargin
  }

  /** q32 — cube aggregate: counts and an exact integer checksum over
    * ALL grouping combinations of (event_type, user_bucket) — the
    * 2^d-combination sibling of q23's rollup (which emits only the d+1
    * hierarchical levels). One Expand + one hash aggregate: each input
    * row fans out to 4 grouping-set rows BEFORE the shuffle and
    * partial aggregation compacts them map-side, so the shuffle
    * carries at most 4× the distinct-group count, not 4× the data. */
  def q32Cube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("user_bucket", ($"user_id" % 10).cast("int"))
      .cube($"event_type", $"user_bucket")
      .agg(count(lit(1)).as("n"), sum($"event_id").as("id_sum"))
      .orderBy($"event_type".asc_nulls_first, $"user_bucket".asc_nulls_first)
  }

  def q32OracleSql: String =
    """SELECT event_type, (user_id % 10)::INT AS user_bucket,
      |       count(*) AS n, CAST(sum(event_id) AS BIGINT) AS id_sum
      |FROM events
      |GROUP BY CUBE(event_type, (user_id % 10)::INT)
      |ORDER BY event_type NULLS FIRST, user_bucket NULLS FIRST""".stripMargin

  /** Salted equi-join for SKEWED keys: the fact side gets a uniform
    * salt derived from its row identity; the dim side is replicated
    * once per salt value; the join key becomes `(key, salt)`, so one
    * hot key's rows spread over `saltFactor` shuffle partitions instead
    * of melting a single task. Result is EXACTLY the plain
    * `fact ⋈ dim on key` (spec-asserted) — salting is a plan-shape
    * technique, not a semantic change.
    *
    * When to reach for it at 100 TB: the dim is too big to broadcast
    * AND the fact key is Zipf-skewed (the web-corpus norm). AQE's
    * skew-join split handles sort-merge cases automatically; explicit
    * salting remains the tool when AQE can't help — aggregation-
    * before-join shapes, or storage-partitioned joins where the
    * runtime can't re-split a partition.
    *
    * @param saltFactor dim replication count = per-key spread; size it
    *        to ~(hot-key rows / target partition rows), typically 8-64.
    */
  def saltedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      factId: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = fact.withColumn("salt",
      pmod(xxhash64(col(factId)), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn("salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "salt")).drop("salt")
  }

  /** Percentile points for [[q35Percentiles]]. */
  val Percentiles = Seq(0.5, 0.9, 0.99)

  /** q35 — exact percentiles (p50/p90/p99) of the event value per
    * event_type — the length/score distribution summaries every corpus
    * report leads with. The value is first fixed to integer CENTS so
    * both engines interpolate over identical integers (the 2-dp fixture
    * values would otherwise enter as doubles that already differ in
    * representation); the interpolation `lo + (hi-lo)·frac` is then the
    * same IEEE arithmetic on both sides, rounded to 6 dp.
    *
    * Scale note: exact percentiles need the full sorted distribution
    * per group (Spark buffers per-partition and merges). At 100 TB the
    * drop-in is `percentile_approx` (t-digest sketch, mergeable,
    * bounded memory) — same call shape, documented trade; kept exact
    * here because exactness is what the oracle can verify.
    */
  def q35Percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = round($"value" * 100).cast("long")
    val aggs = Percentiles.map(p =>
      round(percentile($"cents", lit(p)), 6).as(s"p${(p * 100).toInt}_cents"))
    Tables.events(spark, dir)
      .select($"event_type", cents.as("cents"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), aggs: _*)
      .orderBy($"event_type")
  }

  def q35OracleSql: String = {
    val cols = Percentiles.map(p =>
      s"round(quantile_cont(cents, $p), 6) AS p${(p * 100).toInt}_cents")
      .mkString(",\n       ")
    s"""SELECT event_type, count(*) AS n,
       |       $cols
       |FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
       |      FROM events)
       |GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** q36 — JSON column extraction + aggregate: `events.props` carries a
    * JSON object per row (the universal semi-structured attachment);
    * `from_json` with an explicit schema parses it ONCE into a typed
    * struct (codegen'd, vectorizable) and the integer field aggregates
    * per event_type. The explicit-schema parse is the 100 TB discipline:
    * `get_json_object` per field re-parses the document per extraction,
    * and schema inference needs a driver-side pre-pass — both wrong at
    * scale. PERMISSIVE nulls on malformed documents keep the
    * drop-bad-records semantics of the tweet parser (#3).
    */
  def q36JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type",
        from_json($"props",
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .filter($"k".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").cast("long").as("k_sum"),
        min($"k").as("k_min"), max($"k").as("k_max"))
      .orderBy($"event_type")
  }

  /** The `json_valid` guard + `TRY_CAST` mirror the Spark side's
    * PERMISSIVE null-on-malformed semantics at BOTH levels: DuckDB's
    * `->>` RAISES on malformed JSON where `from_json` yields null
    * (document level), and a strict CAST raises on a valid-JSON field
    * whose value isn't an INT (`{"k":"abc"}`, `{"k":1.5}`, overflow)
    * where `from_json('k INT')` yields null (field level). The two
    * engines must share the drop-bad-records behavior, not merely
    * agree on clean data. */
  def q36OracleSql: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(k) AS BIGINT) AS k_sum,
      |       min(k) AS k_min, max(k) AS k_max
      |FROM (SELECT event_type,
      |             TRY_CAST(CASE WHEN json_valid(props) THEN props->>'$.k' END AS INT) AS k
      |      FROM events)
      |WHERE k IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q38 — full-outer reconciliation join: per-user event activity
    * FULL OUTER JOIN per-customer order activity on the shared id,
    * `coalesce`d to zero — the join type the inventory lacked (inner,
    * semi, anti, as-of, and interval all exist). The outer sides are
    * aggregates BEFORE the join, so the join input is one row per key
    * on each side — the shape that keeps a full-outer join cheap at
    * 100 TB (aggregating after a full-outer would carry every fact row
    * through null-padding instead). AQE picks the join strategy; both
    * sides shuffle on the id.
    */
  def q38OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .groupBy($"user_id").agg(count(lit(1)).as("n_events"))
    val ord = Tables.orders(spark, dir)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
    ev.join(ord, $"user_id" === $"o_custkey", "full_outer")
      .select(
        coalesce($"user_id", $"o_custkey").as("id"),
        coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce($"n_orders", lit(0L)).as("n_orders"))
      .orderBy($"id")
  }

  def q38OracleSql: String =
    """SELECT coalesce(e.user_id, o.o_custkey) AS id,
      |       coalesce(e.n_events, 0) AS n_events,
      |       coalesce(o.n_orders, 0) AS n_orders
      |FROM (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1) e
      |FULL OUTER JOIN
      |     (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1) o
      |ON e.user_id = o.o_custkey
      |ORDER BY id""".stripMargin

  /** q39 — the analytic-function family beyond `row_number`: per-user
    * event sequences with `lag` deltas, gapped `rank`, `dense_rank`,
    * and `ntile` quartiles, all over one (partition, sort) pair so the
    * physical plan is a SINGLE window operator after one shuffle —
    * check `.explain`: stacking functions over the same WINDOW spec is
    * free; a second spec would mean a second sort. Tie-breaks pin
    * every ordering ((ts, event_id) for sequence order; (cents,
    * event_id) for rank order), keeping ranks deterministic under
    * equal timestamps/values.
    */
  def q39WindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val bySeq = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val byVal = Window.partitionBy($"user_id")
      .orderBy($"cents".desc, $"event_id")
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"ts",
        round($"value" * 100).cast("long").as("cents"))
      .select(
        $"event_id", $"user_id",
        unix_micros($"ts").as("ts_us"),
        // exact integer microseconds — a seconds cast would floor on
        // one engine and round on the other for fractional timestamps
        (unix_micros($"ts") - unix_micros(lag($"ts", 1).over(bySeq)))
          .as("gap_us"),
        rank().over(byVal).as("val_rank"),
        dense_rank().over(byVal).as("val_dense_rank"),
        ntile(4).over(bySeq).as("seq_quartile"))
      .orderBy($"event_id")
  }

  def q39OracleSql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |       epoch_us(ts) - epoch_us(lag(ts, 1) OVER seq) AS gap_us,
      |       rank() OVER val AS val_rank,
      |       dense_rank() OVER val AS val_dense_rank,
      |       ntile(4) OVER seq AS seq_quartile
      |FROM (SELECT event_id, user_id, ts,
      |             CAST(round(value * 100) AS BIGINT) AS cents FROM events)
      |WINDOW seq AS (PARTITION BY user_id ORDER BY ts, event_id),
      |       val AS (PARTITION BY user_id ORDER BY cents DESC, event_id)
      |ORDER BY event_id""".stripMargin

  /** Resample bucket width for [[q40ResampleFill]] (seconds). */
  val ResampleBucket = 3600

  /** q40 — time-series resample + forward fill (gap filling): per user,
    * bucket events to an hourly grid, keep the LAST observation per
    * bucket (deterministic (ts, event_id) tie-break), densify the grid
    * between the user's first and last active hour (`sequence` +
    * `explode` — generated distributed, per user, never on the driver),
    * and forward-fill empty hours with `last(..., ignoreNulls)` over
    * the ordered window. The standard shape for turning an event log
    * into an aligned series a model can consume.
    *
    * All bucket arithmetic is exact integer micros→seconds floor
    * division on BOTH engines (a timestamp→seconds cast floors in
    * Spark and rounds in DuckDB — the q39 lesson). One shuffle on
    * user_id serves the grid generation, the join, and the fill
    * window.
    */
  def q40ResampleFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val obs = Tables.events(spark, dir)
      .withColumn("b",
        expr(s"((unix_micros(ts) div 1000000) div $ResampleBucket) * $ResampleBucket"))
      .withColumn("cents", round($"value" * 100).cast("long"))
      .groupBy($"user_id", $"b")
      .agg(count(lit(1)).as("n_obs"),
        max_by($"cents", struct($"ts", $"event_id")).as("last_cents"))
    val grid = obs.groupBy($"user_id")
      .agg(min($"b").as("b0"), max($"b").as("b1"))
      .select($"user_id",
        explode(sequence($"b0", $"b1", lit(ResampleBucket.toLong))).as("b"))
    val fill = Window.partitionBy($"user_id").orderBy($"b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "b"), "left_outer")
      .select($"user_id", $"b".as("bucket_ts"),
        coalesce($"n_obs", lit(0L)).as("n_obs"),
        last($"last_cents", ignoreNulls = true).over(fill).as("filled_cents"))
      .orderBy($"user_id", $"bucket_ts")
  }

  def q40OracleSql: String =
    s"""WITH base AS (
       |  SELECT user_id,
       |         ((epoch_us(ts) // 1000000) // $ResampleBucket) * $ResampleBucket AS b,
       |         CAST(round(value * 100) AS BIGINT) AS cents, ts, event_id
       |  FROM events
       |), obs AS (
       |  SELECT user_id, b, n_obs, cents AS last_cents FROM (
       |    SELECT user_id, b, cents,
       |           row_number() OVER (PARTITION BY user_id, b
       |                              ORDER BY ts DESC, event_id DESC) AS rn,
       |           count(*) OVER (PARTITION BY user_id, b) AS n_obs
       |    FROM base)
       |  WHERE rn = 1
       |), grid AS (
       |  SELECT user_id, unnest(generate_series(min(b), max(b), $ResampleBucket)) AS b
       |  FROM obs GROUP BY user_id
       |)
       |SELECT g.user_id, g.b AS bucket_ts,
       |       coalesce(o.n_obs, 0) AS n_obs,
       |       last_value(o.last_cents IGNORE NULLS)
       |         OVER (PARTITION BY g.user_id ORDER BY g.b
       |               ROWS UNBOUNDED PRECEDING) AS filled_cents
       |FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b
       |ORDER BY g.user_id, bucket_ts""".stripMargin

  /** q33 — approximate distinct counting (HyperLogLog++): per
    * event_type, the approximate and exact distinct user counts side
    * by side. At 100 TB, exact `count(DISTINCT …)` on a high-
    * cardinality key is a full shuffle of every distinct value;
    * the HLL sketch is a few KB per group, merges map-side, and is the
    * only sane default for cardinality monitoring. Spark's HLL++ is
    * deterministic for a given dataset (hash-based, merge-commutative)
    * but its exact estimate is engine-specific — so NO DuckDB oracle
    * (the driver records the weaker rows-only check); the spec pins
    * the relative error against the exact count instead. */
  def q33ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id").as("approx_users"),
        countDistinct($"user_id").as("exact_users"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------- q63

  /** Generic BUCKETED point-in-interval range join — the join family
    * §2.2 still listed as absent in batch (the streaming twin is
    * TweetStream's interval join). Spark plans a bare
    * `p >= s AND p < e` join as BroadcastNestedLoopJoin (or a
    * cartesian product when neither side fits) — O(|points|·|intervals|)
    * comparisons, the classic non-equi-join trap. The standard fix is
    * overlap bucketing: quantize the range axis into `bucketWidth`-sized
    * buckets, explode each interval into every bucket it overlaps, map
    * each point to its single bucket, EQUI-join on the bucket id, and
    * re-check the exact predicate as a residual filter. The join
    * becomes hash-partitionable: work is bounded by
    * (points + interval-replicas) per bucket, never the cross product.
    *
    * `bucketWidth` is the caller's knob and should sit near the MEDIAN
    * interval span: too small replicates every interval into many
    * buckets (span/width copies), too large piles unrelated points into
    * shared buckets and pushes work into the residual filter. Both
    * failure modes degrade gracefully (more rows through one equi
    * join), and AQE re-sizes or skew-splits the bucket exchange either
    * way — a hot bucket (every interval overlapping one busy day) is an
    * AQE skew split, not a planning failure.
    *
    * Bucket ids come from `floor(x / width)` — FLOOR division, so
    * negative axis values land in the right bucket (a truncating `div`
    * would fold buckets −1 and 0 together). Exact for |x| < 2^53.
    *
    * Columns must be disjoint across the two inputs (checked) — the
    * result carries all of both, exact-predicate-filtered.
    */
  def rangeJoin(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"inputs share columns: $overlap")
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val iv = intervals.withColumn("_rj_bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol) - 1))))
    val pt = points.withColumn("_rj_bucket", bucketOf(col(pointCol)))
    iv.join(pt, "_rj_bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_rj_bucket")
  }

  /** Day-number anchor for q63 — the fixture's order-date minimum. */
  val RangeEpoch = "1995-01-01"

  /** Fulfillment-window length in days per order priority — the
    * interval derivation q63 shares with its oracle. Priorities not
    * listed take no window (filtered out). */
  val FulfilWindows: Seq[(String, Int)] = Seq("1-URGENT" -> 3, "2-HIGH" -> 7)

  /** q63's bucket width: one more than the longest window, so every
    * interval overlaps at most two buckets. */
  val RangeBucketDays: Long = FulfilWindows.map(_._2).max + 1L

  /** q63 — how many lineitems (any order) shipped inside each urgent/
    * high-priority order's fulfillment window `[o_orderdate,
    * o_orderdate + window(priority))` — a point-in-interval range join
    * on the day axis via [[rangeJoin]].
    *
    * The scale move is AGGREGATE PUSHDOWN BELOW THE JOIN: the predicate
    * is day-granular, so lineitems collapse to per-day counts BEFORE
    * the join — the point side shrinks from |lineitem| (corpus-sized)
    * to |distinct days| (calendar-sized, ~2.5k here), and the join
    * output is |orders| × window-days rows of integers instead of
    * |orders| × matching-lineitems. The per-order sum of day counts
    * equals the per-order lineitem count exactly. Neither side carries
    * a broadcast hint: the day relation grows with the time horizon,
    * not the corpus, and AQE broadcasts it from its measured size (at
    * the fixture) or shuffles both sides on the bucket id (if the
    * horizon ever made it big) — the q42/q58 discipline.
    */
  def q63RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def dayNo(c: Column): Column = datediff(to_date(c), to_date(lit(RangeEpoch)))
    val perDay = Tables.lineitem(spark, dir)
      .select(dayNo($"l_shipdate").as("ship_day"))
      .groupBy($"ship_day")
      .agg(count(lit(1)).as("n_day"))
    val win = FulfilWindows.tail.foldLeft(
      when($"o_orderpriority" === FulfilWindows.head._1, lit(FulfilWindows.head._2))) {
      case (acc, (p, d)) => acc.when($"o_orderpriority" === p, lit(d))
    }
    val intervals = Tables.orders(spark, dir)
      .filter($"o_orderpriority".isin(FulfilWindows.map(_._1): _*))
      .select($"o_orderkey", dayNo($"o_orderdate").as("ws"),
        (dayNo($"o_orderdate") + win).as("we"))
    rangeJoin(perDay, "ship_day", intervals, "ws", "we", RangeBucketDays)
      .groupBy($"o_orderkey")
      .agg(sum($"n_day").as("n_shipped"))
      .orderBy($"o_orderkey")
  }

  /** Oracle: the bare theta join DuckDB plans natively (IEJoin) —
    * generated from the same window constants, counted per order. */
  def q63OracleSql: String = {
    val cases = FulfilWindows
      .map { case (p, d) => s"WHEN o_orderpriority = '$p' THEN $d" }.mkString(" ")
    val prios = FulfilWindows.map(p => s"'${p._1}'").mkString(", ")
    s"""WITH w AS (
       |  SELECT o_orderkey,
       |         (o_orderdate::DATE - DATE '$RangeEpoch') AS ws,
       |         (o_orderdate::DATE - DATE '$RangeEpoch')
       |           + (CASE $cases END) AS we
       |  FROM orders WHERE o_orderpriority IN ($prios)
       |)
       |SELECT o_orderkey, count(*) AS n_shipped
       |FROM w JOIN lineitem
       |  ON (l_shipdate::DATE - DATE '$RangeEpoch') >= ws
       | AND (l_shipdate::DATE - DATE '$RangeEpoch') < we
       |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin
  }
}
