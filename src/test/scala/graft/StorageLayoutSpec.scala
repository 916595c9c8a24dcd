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
