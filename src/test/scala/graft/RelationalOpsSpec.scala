package graft

import graft.queries.RelationalOps
import org.apache.spark.sql.functions._

/** Relational-surface specs: TPC-H-style join aggregate (q29), set-op
  * algebra invariants (q30), hash-sample determinism (q31), and cube
  * grouping-set structure vs the rollup (q32).
  */
class RelationalOpsSpec extends SparkSuite {

  test("q29: top-10 by exact integer revenue, recomputed independently") {
    import spark.implicits._
    val rows = RelationalOps.q29TopRevenue(spark, sf).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getLong(3)).toSeq
    assert(revs == revs.sorted.reverse) // ordered desc
    assert(revs.forall(_ > 0))
    // recompute the winner's revenue from the base tables directly
    val top = rows.head
    val cutoff = lit(RelationalOps.RevenueCutoff).cast("timestamp")
    val expected = Tables.lineitem(spark, sf)
      .filter($"l_orderkey" === top.getLong(0) && $"l_shipdate" > cutoff)
      .select((round($"l_extendedprice" * 100).cast("long") *
        (lit(100L) - round($"l_discount" * 100).cast("long"))).as("rc"))
      .agg(sum($"rc")).collect().head.getLong(0)
    assert(top.getLong(3) == expected)
    // the customer dimension must come in as a broadcast, not a shuffle
    val plan = RelationalOps.q29TopRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("q30: set-operation algebra holds (|A∩B|+|A∖B|=|A|, inclusion-exclusion)") {
    import spark.implicits._
    val byOp = RelationalOps.q30SetOps(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val docs = Tables.documents(spark, sf)
    val a = docs.filter($"n_chars" >= RelationalOps.LongDocChars)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val b = docs.filter($"source".isin(RelationalOps.SetOpSources: _*))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(byOp("intersect") == (a & b))
    assert(byOp("union") == (a | b))
    assert(byOp("except") == (a -- b))
    assert(byOp("intersect").size + byOp("except").size == a.size)
    assert(byOp("union").size == a.size + b.size - byOp("intersect").size)
    assert(byOp("intersect").nonEmpty && byOp("except").nonEmpty) // non-vacuous
  }

  test("q31: hash sample is deterministic, plausible rate, true subset") {
    val s1 = RelationalOps.q31SampleHash(spark, sf).collect()
      .map(_.getLong(0)).toSeq
    val s2 = RelationalOps.q31SampleHash(spark, sf).collect()
      .map(_.getLong(0)).toSeq
    assert(s1 == s2) // rerun selects the same rows — the whole point
    val total = Tables.documents(spark, sf).count()
    val rate = s1.size.toDouble / total
    assert(rate > 1.0 / 64 && rate < 1.0 / 4,
      f"1-in-${RelationalOps.SampleMod} sample rate implausible: $rate%.4f")
    val all = Tables.documents(spark, sf).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(s1.forall(all.contains))
  }

  test("saltedEquiJoin == plain join, and the join key carries the salt") {
    import spark.implicits._
    val fact = Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"user_id")
    val dim = Tables.events(spark, sf)
      .groupBy($"event_type").agg(count(lit(1)).as("type_total"))
    val salted = RelationalOps
      .saltedEquiJoin(fact, dim, "event_type", "event_id")
    val plain = fact.join(dim, "event_type")
    // exact semantic equivalence (multiset equality via sorted rows)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id", $"event_type", $"user_id", $"type_total")
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(canon(salted) == canon(plain))
    assert(salted.count() == fact.count()) // inner join loses nothing
    // plan: the shuffle key must include the salt (both sides), which
    // is the whole point — one hot event_type spreads over saltFactor
    // partitions instead of one task
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("salt"), s"salt not in the physical join keys:\n$plan")
  }

  test("q33: HLL approx distinct within 10% of exact per group") {
    val rows = RelationalOps.q33ApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(exact > 0)
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 0.10,
        s"${r.getString(0)}: approx=$approx exact=$exact relErr=$relErr")
    }
    // deterministic: HLL++ is hash-based and merge-commutative
    val again = RelationalOps.q33ApproxDistinct(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("q35: percentiles ordered, exact p50 matches a hand-sorted group") {
    import spark.implicits._
    val rows = RelationalOps.q35Percentiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 <= p90 && p90 <= p99, s"percentiles out of order: $r")
    }
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, sf).count())
    // independent p50 for one group: sort the cents, interpolate by hand
    val etype = rows.head.getString(0)
    val cents = Tables.events(spark, sf)
      .filter($"event_type" === etype)
      .select(round($"value" * 100).cast("long")).collect()
      .map(_.getLong(0)).sorted
    val idx = (cents.length - 1) * 0.5
    val (lo, hi) = (cents(idx.toInt), cents(math.ceil(idx).toInt))
    val expected = math.rint((lo + (hi - lo) * (idx - idx.toInt)) * 1e6) / 1e6
    assert(rows.head.getDouble(2) == expected)
  }

  test("q36: schema'd JSON parse agrees with per-field extraction") {
    import spark.implicits._
    val rows = RelationalOps.q36JsonExtract(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, sf).count())
    // independent extraction path: get_json_object string-walks each doc
    val indep = Tables.events(spark, sf)
      .select($"event_type",
        get_json_object($"props", "$.k").cast("int").as("k"))
      .filter($"k".isNotNull)
      .groupBy($"event_type")
      .agg(sum($"k").cast("long").as("k_sum"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(2) == indep(r.getString(0)), s"row $r"))
  }

  test("q38: full outer covers both key sets, zero-fills the missing side") {
    import spark.implicits._
    val rows = RelationalOps.q38OuterJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val users = Tables.events(spark, sf).select($"user_id")
      .distinct().collect().map(_.getLong(0)).toSet
    val custs = Tables.orders(spark, sf).select($"o_custkey")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == (users | custs))
    rows.foreach { case (id, ne, no) =>
      assert(ne > 0 || no > 0)
      if (!users.contains(id)) assert(ne == 0)
      if (!custs.contains(id)) assert(no == 0)
    }
    // the fixture's event users are a subset of customers, so the
    // customer-only side is the live outer branch — it must be
    // non-empty or the outer join degenerates to inner
    assert((custs -- users).nonEmpty)
  }

  test("q39: analytic functions consistent; one shuffle feeds both window specs") {
    val df = RelationalOps.q39WindowFuncs(spark, sf)
    val rows = df.collect()
    assert(rows.length == Tables.events(spark, sf).count())
    val byUser = rows.groupBy(_.getLong(1))
    byUser.foreach { case (_, rs) =>
      // q39's own sequence order: (ts, event_id) — sorting by ts alone
      // would make the head-row assertions flaky under timestamp ties
      val seq = rs.sortBy(r => (r.getLong(2), r.getLong(0)))
      assert(seq.head.isNullAt(3)) // first event has no lag gap
      seq.tail.foreach(r => assert(!r.isNullAt(3) && r.getLong(3) >= 0))
      val ranks = rs.map(_.getInt(4)).sorted
      val dense = rs.map(_.getInt(5)).toSet
      assert(ranks.head == 1 && ranks.last <= rs.length)
      assert(dense == (1 to dense.size).toSet) // dense_rank has no gaps
      assert(rs.map(_.getInt(6)).forall(q => q >= 1 && q <= 4))
    }
    // both specs share the user_id partitioning: one exchange, two
    // sorts (AQE's toString repeats the initial plan — count only the
    // final-plan section)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected one window shuffle, got $exchanges:\n$plan")
  }

  test("q40: dense hourly grid, forward-filled gaps, observed hours exact") {
    import spark.implicits._
    val rows = RelationalOps.q40ResampleFill(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val seq = rs.sortBy(_.getLong(1))
      // dense grid: consecutive buckets differ by exactly one step
      seq.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(1) - a.getLong(1) == RelationalOps.ResampleBucket)
        case _ =>
      }
      // first bucket is always observed; fill is never null after it
      assert(seq.head.getLong(2) > 0)
      seq.foreach(r => assert(!r.isNullAt(3)))
      // empty hours exist (the data is sparse) and carry the last value
      val gaps = seq.zipWithIndex.filter(_._1.getLong(2) == 0)
      assert(gaps.nonEmpty)
      gaps.foreach { case (r, i) =>
        assert(r.getLong(3) == seq(i - 1).getLong(3),
          s"gap not forward-filled at ${r.getLong(1)}")
      }
    }
    // total observations preserved
    assert(rows.map(_.getLong(2)).sum == Tables.events(spark, sf).count())
  }

  test("q32: cube ⊇ rollup, plus the per-bucket slice rollup lacks") {
    val cube = RelationalOps.q32Cube(spark, sf).collect()
      .map(r => (Option(r.getString(0)), if (r.isNullAt(1)) None else Some(r.getInt(1)),
        r.getLong(2), r.getLong(3))).toSet
    val rollup = graft.queries.AnalyticsOps.q23Rollup(spark, sf).collect()
      .map(r => (Option(r.getString(0)), if (r.isNullAt(1)) None else Some(r.getInt(1)),
        r.getLong(2), r.getLong(3))).toSet
    assert(rollup.subsetOf(cube))
    // the extra grouping set: (NULL, bucket) — per-bucket across types
    val bucketOnly = cube.filter(t => t._1.isEmpty && t._2.isDefined)
    assert(bucketOnly.nonEmpty)
    assert((cube -- rollup) == bucketOnly)
    // grand total row counts every event
    val total = Tables.events(spark, sf).count()
    val grand = cube.find(t => t._1.isEmpty && t._2.isEmpty).get
    assert(grand._3 == total)
    // every grouping set sums to the same total
    val fullGroups = cube.filter(t => t._1.isDefined && t._2.isDefined)
    assert(fullGroups.toSeq.map(_._3).sum == total)
  }

  test("q41: stratified rates downsample listed languages, keep the rest whole, deterministically") {
    import spark.implicits._
    val full = Tables.documents(spark, sf)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = RelationalOps.q41StratifiedSample(spark, sf)
    val byLang = sampled.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // unlisted languages keep 1000 per mille — every row survives
    val listed = RelationalOps.StratRates.map(_._1).toSet
    full.keys.filterNot(listed).foreach { l =>
      assert(byLang.getOrElse(l, 0L) == full(l), s"$l must be kept whole")
    }
    // listed languages are strictly downsampled but not emptied, and
    // the realized fraction sits near the configured per-mille rate
    RelationalOps.StratRates.foreach { case (l, r) =>
      val (n, f) = (byLang.getOrElse(l, 0L), full(l))
      assert(n > 0 && n < f, s"$l: got $n of $f at $r per mille")
      assert(math.abs(n.toDouble / f - r / 1000.0) < 0.2,
        s"$l fraction ${n.toDouble / f} far from ${r / 1000.0}")
    }
    // content-keyed: a rerun selects the SAME rows, not a fresh draw
    val ids = sampled.collect().map(_.getLong(0)).toSeq
    val again = RelationalOps.q41StratifiedSample(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(ids == again)
    // one narrow filter: no join, no aggregate anywhere in the plan
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Aggregate"),
      s"q41 must stay a pure filter:\n$plan")
  }

  test("rangeJoin == brute-force interval membership, incl. negative axis values") {
    import spark.implicits._
    // points straddle zero so floor-vs-truncate bucketing is exercised:
    // a truncating div folds buckets -1 and 0 together and misassigns -1
    val pts = Seq(-7L, -5L, -1L, 0L, 1L, 3L, 7L, 12L)
    val ivs = Seq((1L, -10L, 0L), (2L, -2L, 4L), (3L, 3L, 8L), (4L, 20L, 25L))
    val expected = (for {
      p <- pts; (id, s, e) <- ivs; if p >= s && p < e
    } yield (id, p)).toSet
    for (width <- Seq(1L, 3L, 100L)) { // width >> spans and << spans both legal
      val got = RelationalOps.rangeJoin(
          pts.toDF("p"), "p", ivs.toDF("iv_id", "s", "e"), "s", "e", width)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(got == expected, s"width=$width drifted: $got")
    }
    intercept[IllegalArgumentException] {
      RelationalOps.rangeJoin(
        pts.toDF("p"), "p", ivs.toDF("iv_id", "s", "e"), "s", "e", 0L)
    }
    intercept[IllegalArgumentException] { // shared column names rejected
      RelationalOps.rangeJoin(
        pts.toDF("s"), "s", ivs.toDF("iv_id", "s", "e"), "s", "e", 3L)
    }
  }

  test("q63 == driver-side theta-join recount; plan never nested-loops") {
    import spark.implicits._
    val df = RelationalOps.q63RangeJoin(spark, sf)
    val cutoffs = RelationalOps.FulfilWindows.toMap
    def day(c: org.apache.spark.sql.Column) =
      datediff(to_date(c), to_date(lit(RelationalOps.RangeEpoch)))
    val shipDays = Tables.lineitem(spark, sf)
      .select(day($"l_shipdate").cast("long")).collect().map(_.getLong(0))
    val expected = Tables.orders(spark, sf)
      .select($"o_orderkey", day($"o_orderdate").cast("long"), $"o_orderpriority")
      .collect()
      .flatMap { r =>
        cutoffs.get(r.getString(2)).map { w =>
          val od = r.getLong(1)
          r.getLong(0) -> shipDays.count(d => d >= od && d < od + w).toLong
        }
      }
      .filter(_._2 > 0).sortBy(_._1).toSeq
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join fell back to an all-pairs plan:\n$plan")
  }
}
