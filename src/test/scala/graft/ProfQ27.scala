package graft

import graft.queries.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-decade scale probe for q27's prefix-filter join (VERDICT r9 #7):
  * q27 is the dedup chain's only data-proportional stage at 10×
  * (2.4–2.7×, sub-linear), so this pushes ONE more decade — base
  * (sf0.1, 5k docs) → 10× (50k) → 100× (500k) — to see whether the
  * candidate join stays sub-quadratic. Corpus synthesis is ProfScale's
  * replica scheme (replica r suffixes every token with `~r`, so
  * replicas share no shingles and pair structure scales exactly with
  * replicas): result rows must scale linearly BY CONSTRUCTION, and the
  * question is whether wall time does too — a quadratic candidate
  * stage would show a ~100× jump on the second decade.
  *
  * Run: `Test/runMain graft.ProfQ27` on a quiet host.
  */
object ProfQ27 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val baseDir = sys.env.getOrElse("PROF_BASE", "/root/testdata/sf0.1")
    val base = Tables.documents(spark, baseDir)

    def synth(replicas: Int): String = {
      val dir = s"/tmp/scale_q27_$replicas"
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$dir/documents.parquet"))) {
        (0 until replicas).map { r =>
          if (r == 0) base
          else base.select(
            ($"doc_id" + lit(r.toLong * 10000000L)).as("doc_id"),
            $"lang", $"source",
            concat_ws(" ",
              transform(split($"text", " "), t => concat(t, lit(s"~$r"))))
              .as("text"),
            $"n_chars")
        }.reduce(_ unionByName _)
          .repartition(32).write.mode("overwrite")
          .parquet(s"$dir/documents.parquet")
      }
      dir
    }

    def run(tag: String, dir: String): Unit = {
      val nDocs = Tables.documents(spark, dir).count()
      val t0 = System.nanoTime()
      val rows = DedupOps.withQ27NgramJaccard(spark, dir)(_.count())
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[q27] $tag: $nDocs docs, $rows pairs, $s%.1f s")
    }

    run("base", baseDir)
    run("10x", synth(10))
    run("100x", synth(100))
    spark.stop()
  }
}
