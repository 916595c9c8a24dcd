package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Loaders for the driver-generated parquet fixture tables (TESTDATA.md).
  *
  * All queries take `(spark, sfDir)` and read through these helpers so the
  * scan is a plain parquet V1/V2 relation Catalyst can push filters and
  * column pruning into. At cluster scale the same call sites would point at
  * a partitioned table root (e.g. `.../events/date=*`) and partition pruning
  * would compose with the pushed predicates for free — nothing in the query
  * code would change.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view (events through its
    * timestamp-normalizing loader) so the whole engine surface is
    * reachable from plain `spark.sql(...)` — the SQL layer the
    * reference never had. Views are lazy: no data moves until a query
    * runs, and Catalyst sees straight through them (pushdown/pruning
    * behave exactly as with the DataFrame API). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  /** Normalize `events.ts` to a session-zoned `TimestampType` regardless of
    * how the fixture generation wrote it. Older fixtures stored parquet
    * `INT64 TIMESTAMP(NANOS)`, which Spark 4.x rejects outright
    * (`PARQUET_TYPE_ILLEGAL`) unless the legacy nanos-as-long read path is
    * enabled — that surfaces as a `LongType` column we convert with integer
    * arithmetic (`ts div 1000` avoids the double-precision loss a float
    * division of an ~1.7e18 nanos value would introduce). Current fixtures
    * store `TIMESTAMP(MICROS)` without UTC adjustment, which Spark infers
    * as `TimestampNTZType`; every entry point pins
    * `spark.sql.session.timeZone=UTC`, so the cast to `TimestampType`
    * preserves the instant exactly (DuckDB reads the same column as a
    * naive timestamp either way, so the oracles are type-agnostic).
    * Runtime-settable conf, so every entry point (Verify/Bench/entry/tests)
    * gets it on first access.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          expr("ts").cast(org.apache.spark.sql.types.TimestampType))
      case other =>
        // Strict by design: a catch-all cast would turn an unexpected
        // fixture encoding (string dates, double seconds) into silent
        // nulls or wrong instants. Fail loudly instead.
        throw new IllegalArgumentException(
          s"events.ts has unsupported type $other — expected LongType " +
            "(legacy nanos), TimestampType, or TimestampNTZType; update " +
            "Tables.events for any new fixture encoding")
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
