package graft

import graft.queries.PipelineOps
import org.apache.spark.sql.Row

/** Specs for the LLM-pipeline operators q09–q12 at sf0.001; expected
  * values computed independently in DuckDB.
  */
class PipelineOpsSpec extends SparkSuite {

  test("q09 exact dedup: unique texts keep min doc_id") {
    val rows = PipelineOps.q09DedupExact(spark, sf).collect()
    assert(rows.length == 500) // sf0.001 documents have no exact dups
    assert(rows.forall(_.getLong(2) >= 1L))
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).sorted.toSeq)
  }

  test("q09 dedup collapses injected duplicates deterministically") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // inject: same text under three doc_ids — survivor must be min id
    val dup = Seq((7L, "dup text"), (3L, "dup text"), (9L, "dup text"),
      (1L, "solo")).toDF("doc_id", "text")
    val out = dup.groupBy($"text")
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_dups"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("dup text", 3L, 3L), ("solo", 1L, 1L)))
  }

  test("q10 text stats: per-lang aggregates") {
    val rows = PipelineOps.q10TextStats(spark, sf).collect()
    assert(rows.length == 5)
    val de = rows.head
    assert(de.getString(0) == "de")
    assert(de.getLong(1) == 71L)
    assert(de.getLong(2) == 22200L)
    assert(math.abs(de.getDouble(3) - 312.67605633802816) < 1e-12)
    assert(de.getLong(4) == 20L)
  }

  test("q11 join enrich: 25 nations, exact decimal sums, broadcast plan") {
    val df = PipelineOps.q11JoinEnrich(spark, sf)
    val rows = df.collect()
    assert(rows.length == 25)
    val first = rows.head
    assert(first.getString(0) == "AFRICA" && first.getString(1) == "NATION_0")
    assert(first.getLong(2) == 34L)
    assert(first.getLong(3) == 863353694L) // 8633536.94 in exact cents
    assert(first.getLong(4) == 4L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    // the fact table must not be exchanged before the joins: the only
    // shuffle is the final aggregate on (r_name, n_name)
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }

  test("q12 cosine top-k: probe ranks itself first, spot similarity") {
    val rows = PipelineOps.q12SimTopK(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.head.getLong(0) == 0L)          // probe vs itself
    assert(rows.head.getDouble(2) == 1.0)
    assert(rows(1).getLong(0) == 17L)
    assert(math.abs(rows(1).getDouble(2) - 0.334456) < 1e-9)
    // descending similarity
    val sims = rows.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("DotProduct expression == zip_with/aggregate chain, bit for bit") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // float × float over every fixture pair against the vec-0 probe
    val emb = Tables.embeddings(spark, sf)
    val probe = emb.filter($"vec_id" === 0).select($"embedding".as("p"))
    val both = emb.crossJoin(broadcast(probe))
      .select($"vec_id",
        PipelineOps.dot($"embedding", $"p").as("fast"),
        PipelineOps.dotViaLambdas($"embedding", $"p").as("ref"))
      .collect()
    assert(both.length == 500)
    both.foreach { r =>
      // bit equality, not epsilon: same fold order, same widening
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)), s"row $r")
    }
    // float × double-literal (the hyperplane/centroid shape)
    val plane = typedlit((0 until 64).map(i =>
      graft.queries.SimilarityOps.planeComponent(0, i)))
    val mixed = emb.select(
      PipelineOps.dot($"embedding", plane).as("fast"),
      PipelineOps.dotViaLambdas($"embedding", plane).as("ref")).collect()
    mixed.foreach(r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
    // nulls and length mismatch: null out, like the padded zip_with sum
    val edge = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0, 4.0))),
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0))), // length mismatch
      (None, Some(Seq(1.0)))                   // null array
    ).toDF("a", "b")
      .select(PipelineOps.dot($"a", $"b").as("d")).collect()
    assert(edge(0).getDouble(0) == 11.0)
    assert(edge(1).isNullAt(0) && edge(2).isNullAt(0))
  }

  /** The tokenizer both new specs reimplement: TextOps.toks semantics
    * (lowercase, split on single spaces, drop empties). */
  private def tokens(text: String): Vector[String] =
    text.toLowerCase.split(" ", -1).filter(_.nonEmpty).toVector

  test("q51 sequence packing == in-memory prefix-sum reference") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tokens(r.getString(1)).length.toLong).toMap
    val budget = 512
    // reference: per shard, docs in doc_id order, running token offset
    val expected = docs.keys.toSeq.sorted.groupBy(_ % 8).flatMap {
      case (shard, ids) =>
        var cum = 0L
        ids.sorted.map { id =>
          val n = docs(id)
          val startOff = cum
          cum += n
          id -> ((shard, n, startOff / budget, startOff % budget,
            if (startOff % budget + n > budget) 1 else 0))
        }
    }
    val got = PipelineOps.q51SeqPack(spark, sf).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val (shard, n, seq, off, crosses) = expected(r.getLong(0))
      assert(r.getLong(1) == shard && r.getLong(2) == n &&
        r.getLong(3) == seq && r.getLong(4) == off && r.getInt(5) == crosses,
        s"row $r expected ($shard,$n,$seq,$off,$crosses)")
    }
    // output ordered by doc_id; offsets always inside the sequence
    assert(got.map(_.getLong(0)).toSeq == got.map(_.getLong(0)).sorted.toSeq)
    assert(got.forall(r => r.getLong(4) >= 0 && r.getLong(4) < budget))
  }

  test("q52 decontamination == in-memory gram-overlap reference") {
    val k = graft.queries.DedupOps.NgramTokens
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tokens(r.getString(1))
        .sliding(k).filter(_.length == k).map(_.mkString(" ")).toSet).toMap
    val evalIds = docs.keySet.filter(_ % 97 == 0)
    val evalGrams = evalIds.flatMap(docs)
    val expected = (docs.keySet -- evalIds).flatMap { id =>
      val shared = docs(id) & evalGrams
      if (shared.isEmpty) None
      else Some(id -> ((shared.size.toLong,
        evalIds.count(e => (docs(e) & docs(id)).nonEmpty).toLong)))
    }.toMap
    val got = PipelineOps.q52Decontam(spark, sf).collect()
    assert(got.length == expected.size && got.nonEmpty,
      s"${got.length} rows, expected ${expected.size}")
    got.foreach { r =>
      val (nShared, nEval) = expected(r.getLong(0))
      assert(r.getLong(1) == nShared && r.getLong(2) == nEval, s"row $r")
    }
    // eval members never flag themselves
    assert(got.forall(_.getLong(0) % 97 != 0))
  }

  test("q51/q52 edges: degenerate knobs rejected; empty eval frame flags nothing") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    intercept[IllegalArgumentException](PipelineOps.seqPack(docs, 0, 8))
    intercept[IllegalArgumentException](PipelineOps.seqPack(docs, 512, 0))
    // a doc longer than the whole budget still gets exactly one slot,
    // at its running offset, flagged as crossing
    val tiny = PipelineOps.seqPack(docs, budget = 8, shards = 1).collect()
    assert(tiny.length == 500 && tiny.count(_.getInt(5) == 1) > 400,
      "nearly every ~50-token doc must cross an 8-token boundary")
    // decontamination against an EMPTY benchmark frame flags nothing
    val noEval = PipelineOps.decontamReport(
      docs, docs.filter($"doc_id" < 0).select($"doc_id", $"text"))
    assert(noEval.count() == 0)
  }

  test("q59 epoch shuffle == driver-side global hash sort; epochs independent") {
    import spark.implicits._
    def md5h(id: Long, epoch: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$epoch".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    val ids = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val epoch = PipelineOps.ShuffleEpoch
    val expected = ids.map(id => (id, md5h(id, epoch)))
      .sortBy { case (id, h) => (h, id) }
      .zipWithIndex
      .map { case ((id, h), pos) => id -> ((h >> 55, pos.toLong)) }
      .toMap
    val got = PipelineOps.q59EpochShuffle(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // positions are a permutation of [0, n)
    assert(got.values.map(_._2).toSeq.sorted == (0L until ids.length).toSeq)
    // a different epoch yields a genuinely different permutation
    val e2 = PipelineOps.epochShuffle(
      Tables.documents(spark, sf), epoch + 1, PipelineOps.ShuffleShards)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(e2.values.toSeq.sorted == (0L until ids.length).toSeq)
    assert(ids.exists(id => e2(id) != got(id)._2), "epoch salt had no effect")
  }

  test("q60 shuffled packing == in-memory concat-in-hash-order reference") {
    def md5h(id: Long, epoch: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$epoch".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    val budget = 512
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tokens(r.getString(1)).length.toLong)
    // the semantics, stated imperatively: sort by (h, id), concatenate,
    // cut every `budget` tokens
    var off = 0L
    val expected = docs
      .map { case (id, n) => (id, md5h(id, PipelineOps.ShuffleEpoch), n) }
      .sortBy { case (id, h, _) => (h, id) }
      .zipWithIndex
      .map { case ((id, h, n), pos) =>
        val start = off; off += n
        id -> ((h >> 55, pos.toLong, n, start / budget, start % budget,
          if (start % budget + n > budget) 1 else 0))
      }.toMap
    val got = PipelineOps.q60ShuffledPack(spark, sf).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val (shard, pos, n, seq, seqOff, crosses) = expected(r.getLong(0))
      assert(r.getLong(1) == shard && r.getLong(2) == pos &&
        r.getLong(3) == n && r.getLong(4) == seq &&
        r.getLong(5) == seqOff && r.getInt(6) == crosses,
        s"mismatch for doc ${r.getLong(0)}: got $r expected " +
          s"($shard, $pos, $n, $seq, $seqOff, $crosses)")
    }
    // every doc's slot is consistent with a gap-free global token stream:
    // positions are a permutation and offsets are the running sum
    assert(got.map(_.getLong(2)).sorted.toSeq == (0L until docs.length).toSeq)
  }

  test("q64 mixture balance == driver-side integer reimplementation") {
    import spark.implicits._
    // independent reimplementation: JVM MessageDigest for the content
    // hash, plain Long arithmetic for W/T/rates — nothing shared with
    // the Spark expressions beyond the constants
    def hashPm(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(text.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(4), 16) % 1000
    }
    val docs = Tables.documents(spark, sf)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val weights = PipelineOps.MixWeights.toMap
    val nBySrc = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val wBySrc = nBySrc.keys.map(s =>
      s -> weights.getOrElse(s, PipelineOps.DefaultMixWeight).toLong).toMap
    val wSum = wBySrc.values.sum
    val tMax = nBySrc.map { case (s, n) => n * wSum / wBySrc(s) }.min
    val rate = nBySrc.map { case (s, n) =>
      s -> math.min(1000L, tMax * wBySrc(s) * 1000L / (wSum * n)) }
    val kept = docs.groupBy(_._1).view.mapValues(ds =>
      ds.count(d => hashPm(d._2) < rate(d._1)).toLong).toMap
    val expected = nBySrc.keys.toSeq.sorted.map(s =>
      (s, nBySrc(s), rate(s), kept(s)))
    val got = PipelineOps.q64MixtureBalance(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the binding source (largest w/n) keeps near-everything — the
    // floor in T = ⌊n·W/w⌋ costs at most ⌈1000·w/(n·W)⌉ per-mille of
    // its rate; rates are valid per-mille and something downsamples
    val slack = 1000L * wBySrc.values.max / (nBySrc.values.min * wSum) + 1
    assert(got.map(_._3).max >= 1000L - slack,
      s"binding source lost more than the truncation slack: $got")
    assert(got.exists(_._3 < 1000L), s"nothing downsampled: $got")
    assert(got.forall(r => r._3 >= 0L && r._3 <= 1000L))
    assert(got.forall(r => r._4 <= r._2))
  }

  test("q99 on the fixture == exact driver-side snapshot diff") {
    val rows = Tables.documents(spark, sf)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val v1 = rows.filter(_._1 % PipelineOps.V1Mod != 0)
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val v2 = rows.filter(_._1 % PipelineOps.V2Mod != 0)
      .map(r => r._1 -> ((if (r._1 % PipelineOps.RevMod == 0) r._2 + " rev2"
        else r._2, r._3))).toMap
    val expected = (v1.keySet ++ v2.keySet).toSeq.map { id =>
      val status = (v1.get(id), v2.get(id)) match {
        case (Some(_), None) => "removed"
        case (None, Some(_)) => "added"
        case (Some((t1, _)), Some((t2, _))) =>
          if (t1 != t2) "changed" else "unchanged"
        case _ => sys.error("unreachable")
      }
      val src = v1.get(id).orElse(v2.get(id)).get._2
      (src, status)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = PipelineOps.q99SnapshotDiff(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // all four statuses are exercised on the fixture
    assert(got.keySet.map(_._2) ==
      Set("added", "removed", "changed", "unchanged"))
  }
}
