package graft

import graft.queries.AnalyticsOps
import org.apache.spark.sql.functions._

/** Session/rollup/as-of specs: exact driver-side recomputation of each
  * semantic on the sf0.001 fixture.
  */
class AnalyticsOpsSpec extends SparkSuite {

  test("q22 sessions == driver-side gaps-and-islands recomputation") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val gapUs = 300L * 1000000
    val expected = events.groupBy(_._1).flatMap { case (uid, rows) =>
      val ts = rows.map(_._2).sorted
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var start = ts.head; var last = ts.head; var n = 1L
      ts.tail.foreach { t =>
        if (t - last > gapUs) { sessions += ((start, last + gapUs, n)); start = t; n = 0 }
        last = t; n += 1
      }
      sessions += ((start, last + gapUs, n))
      sessions.map(s => (uid, s._1, s._2, s._3))
    }.toSet
    val got = AnalyticsOps.q22SessionCount(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      s"sessions diverge; missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // some sessions must be multi-event or the gap choice is vacuous
    assert(got.exists(_._4 > 1))
  }

  test("q82 == exact driver-side burst recomputation; bursts non-vacuous") {
    val w = AnalyticsOps.BurstWindowSec.toLong
    val events = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 1000000 / w * w))
    val counts = events.groupBy(identity).map { case (k, o) => k -> o.length.toLong }
    val lo = events.map(_._2).min; val hi = events.map(_._2).max
    val slots = lo to hi by w
    val expected = events.map(_._1).distinct.sorted.toSeq.flatMap { t =>
      val dense = slots.map(ws => (ws, counts.getOrElse((t, ws), 0L)))
      dense.zipWithIndex.map { case ((ws, n), i) =>
        val trail = dense.slice(math.max(0, i - AnalyticsOps.BurstTrail), i)
        val trailSum = trail.map(_._2).sum
        val burst = trail.length == AnalyticsOps.BurstTrail &&
          n * AnalyticsOps.BurstTrail > trailSum * 2 &&
          n >= AnalyticsOps.BurstMinCount
        (t, ws, n, trailSum, if (burst) 1 else 0)
      }
    }
    val got = AnalyticsOps.q82BurstDetect(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSeq
    val firstDiff = got.zip(expected).zipWithIndex.find { case ((g, e), _) => g != e }
    assert(got == expected,
      s"burst detection diverges; sizes=${got.size}/${expected.size} " +
        s"firstDiff=$firstDiff")
    assert(got.exists(_._5 == 1), "no burst fired — thresholds vacuous")
    assert(got.count(_._5 == 1) < got.size / 10,
      "bursts not selective — thresholds degenerate")
  }

  test("q23 rollup: subtotals and grand total are consistent") {
    val rows = AnalyticsOps.q23Rollup(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val leaves = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    val subtotals = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(grand.head.getLong(2) == leaves.map(_.getLong(2)).sum)
    assert(grand.head.getLong(3) == leaves.map(_.getLong(3)).sum)
    subtotals.foreach { st =>
      val mine = leaves.filter(_.getString(0) == st.getString(0))
      assert(st.getLong(2) == mine.map(_.getLong(2)).sum)
      assert(st.getLong(3) == mine.map(_.getLong(3)).sum)
    }
    assert(grand.head.getLong(2) == 1000L) // sf0.001 events row count
  }

  test("q25 moving frame == driver-side 3-row window recomputation") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = events.groupBy(_._2).flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._1))
      sorted.indices.map { i =>
        val frame = sorted.slice(math.max(0, i - 2), i + 1)
        (sorted(i)._1, frame.map(_._1).sum, frame.length.toLong)
      }
    }.map { case (id, s, n) => id -> ((s, n)) }.toMap
    val got = AnalyticsOps.q25MovingSum(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
    assert(got.values.exists(_._2 == 3L)) // frames do fill up
  }

  test("q26 pivot: wide counts match long counts") {
    val long = Tables.events(spark, sf)
      .groupBy((col("user_id") % 10).cast("int").as("b"), col("event_type"))
      .count().collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val rows = AnalyticsOps.q26Pivot(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val b = r.getInt(0)
      AnalyticsOps.PivotTypes.zipWithIndex.foreach { case (t, i) =>
        assert(r.getLong(1 + i) == long.getOrElse((b, t), 0L),
          s"bucket $b type $t")
      }
    }
  }

  test("q24 as-of picks the latest at-or-before order with deterministic ties") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCust = orders.groupBy(_._1)
    val got = AnalyticsOps.q24AsofJoin(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (uid, tsUs, pickedKey, pickedCents) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val eligible = byCust(uid).filter(_._3 <= tsUs)
      // max over (orderdate, orderkey) — the documented tie-break
      val best = eligible.maxBy(o => (o._3, o._2))
      assert(pickedKey == best._2 && pickedCents == best._4,
        s"event ${r.getLong(0)}: picked $pickedKey, expected ${best._2}")
    }
    // every event with an eligible order appears exactly once
    val nEligible = Tables.events(spark, sf).select(col("event_id")).count()
    assert(got.length == nEligible)
  }

  test("q48 funnel: strict ordering, skipped-step and tie semantics") {
    import spark.implicits._
    // Tables.events reads ts as raw parquet NANOS (the fixture
    // convention) — write the same shape
    def at(sec: Long): Long = sec * 1000000000L
    val ev = Seq(
      // user 1: clean traversal
      (1L, "view", at(10)), (1L, "click", at(20)), (1L, "purchase", at(30)),
      // user 2: pre-view click ignored; purchase before the matched
      // click is skipped in favor of a later one
      (2L, "click", at(5)), (2L, "view", at(10)), (2L, "purchase", at(12)),
      (2L, "click", at(15)), (2L, "purchase", at(20)),
      // user 3: purchase precedes view -> depth 1
      (3L, "view", at(10)), (3L, "purchase", at(5)),
      // user 4: never views -> excluded
      (4L, "click", at(10)), (4L, "purchase", at(20)),
      // user 5: click at the SAME instant as the view -> strict > rejects
      (5L, "view", at(10)), (5L, "click", at(10)), (5L, "purchase", at(30)),
      // noise type everywhere
      (1L, "error", at(1)), (5L, "error", at(50))
    ).toDF("user_id", "event_type", "ts")
      .withColumn("event_id", col("user_id")) // schema compat
    val tmp = java.nio.file.Files.createTempDirectory("funnel-ev").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = AnalyticsOps.q48Funnel(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4))))
      .toMap
    def us(sec: Long) = Some(sec * 1000000L)
    assert(got == Map(
      1L -> ((us(10), us(20), us(30), 3)),
      2L -> ((us(10), us(15), us(20), 3)),
      3L -> ((us(10), None, None, 1)),
      5L -> ((us(10), None, None, 1))))
  }

  test("q48 on the fixture matches a driver-side scan") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val steps = AnalyticsOps.FunnelSteps
    val expected = events.groupBy(_._1).flatMap { case (uid, rows) =>
      val t1 = rows.filter(_._2 == steps(0)).map(_._3).minOption
      val t2 = t1.flatMap(a =>
        rows.filter(r => r._2 == steps(1) && r._3 > a).map(_._3).minOption)
      val t3 = t2.flatMap(b =>
        rows.filter(r => r._2 == steps(2) && r._3 > b).map(_._3).minOption)
      t1.map(_ => uid -> ((t1, t2, t3, 1 + t2.size + t3.size)))
    }
    val got = AnalyticsOps.q48Funnel(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4))))
      .toMap
    assert(got == expected)
    assert(got.nonEmpty && got.values.exists(_._4 == 3), "vacuous fixture")
  }

  test("q49 cohort retention == driver-side recount; matrix invariants hold") {
    val wkUs = AnalyticsOps.CohortWeekUs
    val ua = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / wkUs))
      .distinct
    val cohorts = ua.groupBy(_._1).map { case (u, rows) =>
      u -> rows.map(_._2).min
    }
    val expected = ua.groupBy { case (u, wk) => (cohorts(u), wk - cohorts(u)) }
      .map { case (k, rows) => k -> rows.size.toLong }
    val got = AnalyticsOps.q49CohortRetention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    assert(got.nonEmpty)
    // invariants: offset 0 counts the whole cohort; no later offset
    // exceeds it (a user can't be retained without having joined)
    val cohortSizes = cohorts.groupBy(_._2).map { case (c, xs) => c -> xs.size.toLong }
    got.foreach { case ((c, off), n) =>
      assert(off >= 0 && n <= cohortSizes(c))
      if (off == 0L) assert(n == cohortSizes(c))
    }
  }

  test("q49 week id FLOOR-divides negative epochs (DuckDB // alignment)") {
    import spark.implicits._
    val w = AnalyticsOps.CohortWeekUs
    // micros values straddling zero and the week boundaries; the
    // truncating `div` would map (-1, -w+1) to 0 and (-w-1) to -1 —
    // floor must give -1 and -2
    val cases = Seq(-w - 1, -w, -w + 1, -1L, 0L, 1L, w - 1, w, w + 1)
    val got = cases.toDF("us")
      .select(AnalyticsOps.weekId($"us").as("wk"))
      .collect().map(_.getLong(0)).toSeq
    val expected = cases.map(us => Math.floorDiv(us, w))
    assert(got == expected, s"weekId drifted from floor division: " +
      s"${cases.zip(got).zip(expected)}")
  }
}
