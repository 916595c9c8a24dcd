package graft

import graft.queries.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 100×-decade probe for the encode/budget block (the
  * retrieval block got its 100× decade in `PROF_RETRIEVAL_ONLY`): q89
  * is map-only and must scale with input bytes; q90 adds one
  * content-hash exchange and a source-alphabet aggregate — the probe
  * checks neither grows super-linearly across the second decade, plus
  * the q89 copies-consistent invariant at 500k docs. Plain replicas
  * (texts unchanged, ids shifted) under `PROF_BASE` × `PROF_REPLICAS`.
  */
object ProfR12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val baseDir = sys.env.getOrElse("PROF_BASE", "/root/testdata/sf0.1")
    val scaleDir = sys.env.getOrElse("PROF_SCALE_DIR", "/tmp/scale100_plain")
    val replicas = sys.env.getOrElse("PROF_REPLICAS", "100").toInt

    val base = Tables.documents(spark, baseDir)
    (0 until replicas).map { r =>
      if (r == 0) base
      else base.select(
        ($"doc_id" + lit(r.toLong * 10000000L)).as("doc_id"),
        $"lang", $"source", $"text", $"n_chars")
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$scaleDir/documents.parquet")
    println(s"[r12] corpus: ${Tables.documents(spark, scaleDir).count()} docs")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[r12] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    Seq("base" -> baseDir, s"plain${replicas}x" -> scaleDir).foreach {
      case (tag, dir) =>
        time(s"q89 $tag") {
          // fold, not count: count() would prune the encode away
          TextOps.q89BpeEncode(spark, dir)
            .agg(sum($"n_tokens"), bit_xor($"n_chars")).collect(); 1L
        }
        time(s"q90 $tag") {
          TextOps.q90TokenBudget(spark, dir).collect().length.toLong
        }
    }
    // copies-consistent at the full decade: every replica copy encodes
    // identically to its base doc (spot-checked on a hash of the
    // triple to keep the driver-side set bounded)
    time(s"q89 plain${replicas}x copies-consistent") {
      val mismatches = TextOps.q89BpeEncode(spark, scaleDir)
        .withColumn("base_id", $"doc_id" % 10000000L)
        .groupBy($"base_id")
        .agg(countDistinct(struct($"n_words", $"n_chars", $"n_tokens"))
          .as("variants"))
        .filter($"variants" =!= 1).count()
      require(mismatches == 0, s"$mismatches base docs encode inconsistently")
      mismatches
    }
    println("[r12] q89 invariant held at the 100x decade")
    spark.stop()
  }
}
