package graft

import org.apache.spark.sql.functions._

/** Storage-layout behavior the 100 TB deployment depends on: hive-style
  * partitioned parquet writes with partition pruning on read (composing
  * with predicate pushdown), and schema'd json-lines ingestion with
  * PERMISSIVE malformed-record handling — the batch counterpart of the
  * streaming source boundary.
  */
class StorageLayoutSpec extends SparkSuite {

  test("partitionBy write -> partition pruning composes with pushed filters") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("events-part").toString
    Tables.events(spark, sf)
      .withColumn("day", to_date($"ts"))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    // layout: one dir per day (hive-style)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("day="))
    assert(dirs.length > 1, s"expected multiple day partitions, got ${dirs.toSeq}")

    val read = spark.read.parquet(out)
      .filter($"day" === "2024-01-05" && $"event_type" === "click")
      .select($"event_id")
    val plan = read.queryExecution.executedPlan.toString
    // the day predicate prunes partitions (never reaches row filtering);
    // the event_type predicate pushes into the parquet scan
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"partition pruning missing:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)"),
      s"predicate pushdown missing:\n$plan")
    // correctness of the pruned read
    val expected = Tables.events(spark, sf)
      .filter(to_date($"ts") === "2024-01-05" && $"event_type" === "click")
      .count()
    assert(read.count() == expected && expected > 0)
  }

  test("bucketed tables: co-located equi-join plans with no shuffle exchange") {
    import spark.implicits._
    val p1 = java.nio.file.Files.createTempDirectory("ev-bucketed").toString
    val p2 = java.nio.file.Files.createTempDirectory("usr-bucketed").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // both sides bucketed (and sorted) on the join key with the SAME
      // bucket count — the disk layout IS the partitioning, so the join
      // needs no exchange at all. At 100 TB this is the difference
      // between re-shuffling the fact table on every join and never
      // shuffling it again after ingest.
      Tables.events(spark, sf)
        .select($"event_id", $"user_id", $"event_type")
        .write.mode("overwrite").option("path", p1)
        .bucketBy(8, "user_id").sortBy("user_id").saveAsTable("ev_bucketed")
      Tables.events(spark, sf)
        .groupBy($"user_id").agg(count(lit(1)).as("n_total"))
        .write.mode("overwrite").option("path", p2)
        .bucketBy(8, "user_id").sortBy("user_id").saveAsTable("usr_bucketed")
      // forbid broadcast so the co-location is what's being tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ev_bucketed")
        .join(spark.table("usr_bucketed"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it computes the same thing as the shuffling equivalent
      val expected = Tables.events(spark, sf).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS usr_bucketed")
    }
  }

  test("schema evolution: mergeSchema unions columns, old files null-fill") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docs-evolve").toString
    // generation 1: (doc_id, text); generation 2 adds a quality column
    Tables.documents(spark, sf).select($"doc_id", $"text")
      .filter($"doc_id" < 100)
      .write.parquet(s"$dir/gen=1")
    Tables.documents(spark, sf)
      .select($"doc_id", $"text", ($"n_chars" % 100).cast("int").as("quality"))
      .filter($"doc_id" >= 100)
      .write.parquet(s"$dir/gen=2")
    // a 100 TB corpus is written over months by evolving pipelines —
    // readers must union schemas and null-fill the files that predate
    // a column, without rewriting anything
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "text", "quality", "gen"))
    assert(merged.count() == 500)
    val old = merged.filter($"gen" === 1)
    assert(old.filter($"quality".isNull).count() == old.count())
    val newer = merged.filter($"gen" === 2)
    assert(newer.filter($"quality".isNotNull).count() == newer.count())
    // filters on the evolved column still push down to the scan
    val q = merged.filter($"quality" > 50)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(quality), GreaterThan(quality,50)"),
      s"evolved-column filter not pushed:\n$plan")
  }

  test("json-lines round trip with explicit schema drops malformed records") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docs-json").toString
    Tables.documents(spark, sf)
      .write.mode("overwrite").json(dir)
    // corrupt line injected alongside the good files
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-zz-corrupt.json"),
      "{not json\n{\"doc_id\": \"not-a-long\"}\n".getBytes("UTF-8"))
    val schema = Tables.documents(spark, sf).schema
    val back = spark.read.schema(schema).json(dir)
      .filter($"doc_id".isNotNull) // PERMISSIVE: bad records -> nulls
    assert(back.count() == 500)
    // values survive the round trip exactly (same q09 dedup result)
    val viaJson = back.groupBy($"text")
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_dups"))
      .agg(sum($"doc_id"), sum($"n_dups")).collect().head
    val viaParquet = graft.queries.PipelineOps.q09DedupExact(spark, sf)
      .agg(sum($"doc_id"), sum($"n_dups")).collect().head
    assert(viaJson == viaParquet)
  }
}
