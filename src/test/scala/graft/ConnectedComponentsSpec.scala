package graft

import graft.queries.DedupOps
import org.apache.spark.sql.functions._

/** Specs for the large-star/small-star connected components behind q43.
  * Ground truth in every test is an independent driver-side union-find
  * over the same edge list — a different algorithm, so a shared bug
  * can't self-confirm.
  */
class ConnectedComponentsSpec extends SparkSuite {

  /** Reference union-find (path-compressed) over an edge list. Returns
    * node -> min id of its component, for nodes with >= 1 non-loop edge
    * (mirroring connectedComponents' contract). */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      if (a != b) {
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val labels = DedupOps.connectedComponents(edges.toDF("doc_a", "doc_b"))
    try labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    finally labels.unpersist() // caller-owned persist (neardupPairs contract)
  }

  test("a long path closes to one cluster rooted at its minimum") {
    // diameter 19 — naive min-propagation would need ~19 rounds; the
    // alternating algorithm must get there well inside maxRounds
    val path = (1L until 20L).map(i => (i + 1, i)) // reversed order on purpose
    val labels = run(path)
    assert(labels == (1L to 20L).map(_ -> 1L).toMap)
  }

  test("disjoint components keep separate minima; loops and dups ignored") {
    val edges = Seq(
      (3L, 2L), (2L, 1L),            // chain -> 1
      (10L, 11L), (11L, 10L),        // duplicate/reversed pair -> 10
      (20L, 21L), (21L, 22L), (22L, 20L), // triangle -> 20
      (30L, 30L))                    // self-loop: contributes nothing
    val labels = run(edges)
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
    assert(!labels.contains(30L))
  }

  test("empty pair relation yields empty labels without error") {
    // the sf where no near-dups exist must flow through q43 cleanly:
    // fixpoint on round one, empty labels, nothing cached afterwards
    assert(run(Seq.empty[(Long, Long)]) == Map.empty)
    // a relation of only self-loops is equivalent to empty
    assert(run(Seq((4L, 4L))) == Map.empty)
  }

  test("random graphs match the driver-side union-find") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      assert(run(edges) == unionFind(edges), s"trial $trial, edges $edges")
    }
  }

  test("q43 labels are the transitive closure of q13's pairs") {
    val pairs = DedupOps.q13NeardupPairs(spark, sf)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    spark.catalog.clearCache() // q13 persist above is test-owned
    val labels = DedupOps.withQ43DupClusters(spark, sf) { df =>
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(labels == unionFind(pairs))
    assert(labels.nonEmpty) // fixture plants near-dups; vacuous pass is a bug
    // cluster id is a member of its own cluster (the representative rule
    // "keep cluster_id, drop the rest" needs the root to exist)
    labels.values.foreach(root => assert(labels(root) == root))
  }

  test("q47 histogram matches a recount of the q43 labels") {
    val labels = DedupOps.withQ43DupClusters(spark, sf) { df =>
      df.collect().map(r => r.getLong(0) -> r.getLong(1))
    }
    val expected = labels.groupBy(_._2).map(_._2.size.toLong)
      .groupBy(identity).map { case (size, xs) => size -> xs.size.toLong }
    val got = DedupOps.withQ47ClusterSizes(spark, sf) { df =>
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(got == expected)
    assert(got.nonEmpty)
    // every family has >= 2 members (singletons never enter the label
    // relation), and the histogram accounts for every labeled doc
    assert(got.keys.forall(_ >= 2))
    assert(got.map { case (s, n) => s * n }.sum == labels.length)
  }

  test("q43 loan releases every cached frame") {
    import org.apache.spark.sql.graftShims
    spark.catalog.clearCache()
    assert(graftShims.cacheIsEmpty(spark))
    val n = DedupOps.withQ43DupClusters(spark, sf)(_.count())
    assert(n > 0)
    assert(graftShims.cacheIsEmpty(spark), "q43 loan left cached frames")
  }
}
