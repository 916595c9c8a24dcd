package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** Throughput probe for the two SimHash forms: the q15 aggregate
  * (explode + flat bit columns, codegen'd) vs the narrow per-row
  * higher-order form the streaming screen uses. Run via test:runMain. */
object Prof15 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("PROF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val rows = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name: $dt%.2f s, $rows rows, ${rows / dt}%.0f docs/s")
    }
    for (_ <- 1 to 3) {
      time("aggregate form (q15)") { TextOps.simhashFrame(spark, dir).count() }
      time("narrow per-row form ") {
        docs.withColumn("hs", TextOps.hsCol(col("text")))
          .select(col("doc_id"), TextOps.simhashFromHashes(col("hs")).as("fp"))
          .count()
      }
    }
    spark.stop()
  }
}
