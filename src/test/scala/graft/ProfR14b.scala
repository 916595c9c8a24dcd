package graft

import graft.queries.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 scale probe #2: the label index's APPEND cost must be
  * bounded by the DELTA's candidate set, not the sealed base — the
  * claim in `appendLabelIndex`'s scaladoc and the property that makes
  * the daily-crawl contract viable at 100 TB (re-closing a sealed
  * petabyte corpus per crawl is the thing the index exists to avoid).
  *
  * Method: seal bases of growing size (suffixed-replica corpora, the
  * ProfScale recipe — replicas share no shingles, so base growth adds
  * real index volume without adding shared buckets), append the SAME
  * fixed delta to each, and record the append wall. Flat-ish walls
  * across a 4× base growth = the bound holds; linear growth = the
  * screen degenerated to delta × base. Findings land in
  * bench/NOTES.md.
  */
object ProfR14b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "8000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = sys.env.getOrElse("PROF_BASE", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val off = 10000000L

    // fixed delta: the corpus's q62 delta split, UNsuffixed — it
    // near-dups only replica 0, so its true candidate volume is the
    // same no matter how many disjoint replicas the base holds
    val delta = docs.filter($"doc_id" % DedupOps.DeltaMod === DedupOps.DeltaRem)
    val base0 = docs.filter($"doc_id" % DedupOps.DeltaMod =!= DedupOps.DeltaRem)

    def replica(i: Int) = base0.select(
      ($"doc_id" + lit(i * off)).as("doc_id"),
      when(lit(i) === 0, $"text")
        .otherwise(concat($"text", lit(s" rep$i"))).as("text"))
    // NOTE: suffixing changes every 3-shingle that touches the last two
    // tokens only at the doc tail; to make replicas FULLY disjoint in
    // shingle space, suffix every token instead
    def disjointReplica(i: Int) =
      if (i == 0) replica(0)
      else base0.select(
        ($"doc_id" + lit(i * off)).as("doc_id"),
        concat_ws(" ", transform(split($"text", " "),
          t => concat(t, lit(s"_r$i")))).as("text"))

    Seq(1, 2, 4).foreach { reps =>
      val base = (0 until reps).map(disjointReplica).reduce(_ unionByName _)
      val path = java.nio.file.Files
        .createTempDirectory(s"graft-prof-labels-$reps").toString
      val t0 = System.nanoTime()
      DedupOps.writeLabelIndex(base, path)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      DedupOps.appendLabelIndex(delta, path)
      val tAppend = (System.nanoTime() - t1) / 1e9
      val served = DedupOps.labelsServe(spark, path).count()
      println(f"[prof-r14b] base=${reps}x build=$tBuild%.1fs append=$tAppend%.1fs served_labels=$served")
    }
    spark.stop()
  }
}
