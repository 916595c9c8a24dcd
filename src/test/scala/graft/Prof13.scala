package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.DedupOps
import graft.Tables

object Prof13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("PROF_DIR", "/root/testdata/sf0.001")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s, $n rows")
    }
    val docs = Tables.documents(spark, dir)
    time("warmup count") { docs.count() }
    time("shingles only") {
      docs.select(col("doc_id"), DedupOps.shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0).count()
    }
    time("candidates") { DedupOps.candidatePairs(docs).count() }
    time("full q13") { DedupOps.q13NeardupPairs(spark, dir).count() }
    time("full q13 again") { DedupOps.q13NeardupPairs(spark, dir).count() }
    spark.stop()
  }
}
