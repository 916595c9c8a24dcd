package graft

import graft.queries.ReferenceOps
import org.apache.spark.sql.Row

/** Per-operator specs for the reference-parity inventory (SURVEY.md §2.3
  * q01–q08) at sf0.001. Expected counts and spot values were computed
  * independently in DuckDB with the oracle SQL from
  * [[SparkEntry.oracleSql]].
  */
class ReferenceOpsSpec extends SparkSuite {

  test("q01 scan+filter: schema, count, spot row") {
    val df = ReferenceOps.q01ScanFilter(spark, sf)
    assert(df.columns.toSeq == Seq("doc_id", "lang", "source"))
    val rows = df.collect()
    assert(rows.length == 264)
    assert(rows.head == Row(2L, "de", "src2"))
    assert(rows.forall(r => Set("en", "de")(r.getString(1))))
  }

  test("q02 track-term filter: count, every text matches a term") {
    val df = ReferenceOps.q02TrackFilter(spark, sf)
    assert(df.count() == 481)
    assert(df.columns.toSeq == Seq("doc_id", "lang"))
  }

  test("q03 tokenize+project: count and spot token counts") {
    val rows = ReferenceOps.q03TokenizeProject(spark, sf).collect()
    assert(rows.length == 500)
    assert(rows(0) == Row(0L, 23))
    assert(rows(1) == Row(1L, 78))
  }

  test("q04 explode+count: 31 distinct tokens, spot counts") {
    val rows = ReferenceOps.q04ExplodeCount(spark, sf).collect()
    assert(rows.length == 31)
    assert(rows(0) == Row("a", 931L))
    assert(rows(1) == Row("agg", 953L))
  }

  test("q05 tumbling window count: bucket arithmetic matches epoch floor") {
    val rows = ReferenceOps.q05WindowCount(spark, sf).collect()
    assert(rows.length == 987)
    assert(rows.head == Row(1704067500L, "error", 1L))
    // every window start is aligned to the 300 s grid
    assert(rows.forall(_.getLong(0) % 300 == 0))
  }

  test("q06 sliding top-N: count, rank bounds, per-window rank contiguity") {
    val rows = ReferenceOps.q06SlidingTopN(spark, sf).collect()
    assert(rows.length == 4940)
    assert(rows.head == Row(1704067500L, "error", 1L, 1))
    assert(rows.forall(r => r.getInt(3) >= 1 && r.getInt(3) <= 3))
    // ranks within one window are 1..k with no gaps
    rows.groupBy(_.getLong(0)).foreach { case (_, ws) =>
      assert(ws.map(_.getInt(3)).sorted.toSeq == (1 to ws.length))
    }
    // window starts on the 60 s slide grid
    assert(rows.forall(_.getLong(0) % 60 == 0))
  }

  test("q07 broadcast semi join: count and membership in top-3 types") {
    val df = ReferenceOps.q07SemiJoin(spark, sf)
    val rows = df.collect()
    assert(rows.length == 613)
    assert(rows.head == Row(0L, "error"))
    // the physical plan must broadcast the aggregated side
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q08 KV formatting mirrors the Redis sink key/value shape") {
    val rows = ReferenceOps.q08KvFormat(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.head == Row("Top10-1", "click, 210"))
    assert(rows(1) == Row("Top10-2", "purchase, 202"))
    assert(rows.forall(_.getString(0).startsWith("Top10-")))
  }

  test("entry flagship: the driver's rows>0 smoke holds") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
