package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch generalizations of every operator in the reference dataflow
  * (SURVEY.md §2.1 #1–#14), re-expressed Spark-first over the fixture
  * tables. Each query is a pure `(SparkSession, sfDir) => DataFrame` and is
  * paired with a DuckDB oracle in [[graft.SparkEntry.oracleSql]].
  *
  * Scale notes apply to a 1000-executor / 100 TB deployment; the driver
  * verifies correctness at sf0.01 and benches sf0.1 on `local[*]`.
  */
object ReferenceOps {

  /** q01 — scan + language predicate (reference `TwitterFilterEndpoint`
    * language filter, TwitterFilterEndpoint.java:30-32,49-52).
    *
    * The filter and the two-column projection both reach the parquet reader
    * (`PushedFilters: [In(lang, ...)]`, pruned `ReadSchema`) — at 100 TB this
    * is the difference between scanning 2 columns of matching row groups and
    * scanning everything; the reference achieved the same effect only by
    * having the Twitter API pre-filter server-side.
    */
  def q01ScanFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"lang".isin("en", "de"))
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
  }

  /** q02 — track-term text filter (reference `TwitterFilterEndpoint` track
    * terms, TwitterFilterEndpoint.java:34-36,61-64). Substring match keeps
    * the predicate codegen'd (`Contains`), which also pushes to parquet as
    * a StringContains filter.
    */
  def q02TrackFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val terms = Seq("spark", "stream", "window")
    Tables.documents(spark, dir)
      .filter(terms.map($"text".contains(_)).reduce(_ || _))
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  /** q03 — tokenize + project (reference `MapStatuses` lowercase/flatten,
    * TopNHashtags.java:188-209). Narrow, whole-stage-codegen'd map: no
    * shuffle; token array never materialized past the projection.
    */
  def q03TokenizeProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        size(filter(split(lower($"text"), " "), t => length(t) > 0))
          .as("n_tokens"))
      .orderBy($"doc_id")
  }

  /** q04 — explode tokens + count per token (reference `FlatMapTags` +
    * window count, TopNHashtags.java:232-242,258-280). `explode` is Spark's
    * `Generate` (the reference's flatMap); the groupBy count gets map-side
    * partial aggregation automatically — at scale the shuffle carries one
    * row per (partition, distinct token), not one per token occurrence,
    * which is exactly the partial-agg the reference lacked (SURVEY.md §4).
    */
  def q04ExplodeCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(split(lower($"text"), " ")).as("token"))
      .filter(length($"token") > 0)
      .groupBy($"token")
      .agg(count(lit(1)).as("n"))
      .orderBy($"token")
  }

  /** q05 — tumbling event-time window count (degenerate slide of reference
    * #6+#7, TopNHashtags.java:126,258-280). `window()` is a scalar bucket
    * computation here (narrow), so the only shuffle is the hash aggregate on
    * (bucket, event_type). Window start is emitted as epoch seconds to keep
    * the oracle comparison timezone-proof.
    */
  def q05WindowCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "300 seconds"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".cast("long").as("ws"), $"event_type", $"n")
      .orderBy($"ws", $"event_type")
  }

  /** q06 — sliding-window top-N (the reference's flagship: #6 sliding window
    * + #7 count + #8 rank/truncate, TopNHashtags.java:126,253-291).
    *
    * Differences from the reference, by design (SURVEY.md §7):
    *   - the window+topN is fully parallel (hash-partitioned on the window),
    *     where the reference forced parallelism 1 (`forceNonParallel`,
    *     TopNHashtags.java:129) — its structural throughput ceiling;
    *   - ties rank deterministically by key (the reference's tie order was
    *     first-seen, TopNHashtags.java:282);
    *   - the first-element double-count bug (TopNHashtags.java:262,271-272)
    *     is not replicated.
    *
    * Plan shape at scale: sliding `window()` compiles to an `Expand` that
    * replicates each row into its size/slide (=5) window buckets *before*
    * the partial aggregation — but both run fused in the same stage, so
    * the shuffle still carries only the partially-aggregated
    * (window, key) rows, not x5 events. `row_number` then re-partitions by
    * window only, and Spark's rank-limit pushdown (`WindowGroupLimit`)
    * keeps a partial top-k on the map side before that exchange. Both
    * exchanges are on low-cardinality keys; with AQE the second one
    * coalesces to a handful of partitions.
    */
  def q06SlidingTopN(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    import spark.implicits._
    val counts = Tables.events(spark, dir)
      .groupBy(window($"ts", "300 seconds", "60 seconds"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".cast("long").as("ws"), $"event_type", $"n")
    val byWindow = Window.partitionBy($"ws").orderBy($"n".desc, $"event_type")
    counts
      .withColumn("rank", row_number().over(byWindow))
      .filter($"rank" <= n)
      .orderBy($"ws", $"rank")
  }

  /** q07 — broadcast semi join of the stream against the current top-N
    * (reference `FilterTopNCoFlatMap`, TopNHashtags.java:298-335). The tiny
    * ranked side is broadcast — `BroadcastExchange` + `BroadcastHashJoin
    * (LeftSemi)`, no shuffle of the big side — which is precisely the
    * reference's manual `.broadcast()` (TopNHashtags.java:131) done by the
    * planner. At 100 TB the big side streams through unchanged.
    */
  def q07SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val top3 = events
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"event_type")
      .limit(3)
      .select($"event_type")
    events
      .join(broadcast(top3), Seq("event_type"), "left_semi")
      .select($"event_id", $"event_type")
      .orderBy($"event_id")
  }

  /** q08 — KV sink formatting (reference `RedisMapper`: key `"Top10-"+rank`,
    * value `"tag, count"`, TopNHashtags.java:157-167). The global rank runs
    * over the *aggregated* relation (≤ distinct event types rows), so the
    * single-partition window is deliberate and scale-safe: the heavy input
    * was already reduced by a parallel hash aggregate.
    */
  def q08KvFormat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranked = Tables.events(spark, dir)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .withColumn("rank",
        row_number().over(Window.orderBy($"n".desc, $"event_type")))
      .filter($"rank" <= 10)
    ranked
      .select(
        concat(lit("Top10-"), $"rank").as("key"),
        concat($"event_type", lit(", "), $"n").as("value"))
      .orderBy($"key")
  }
}
