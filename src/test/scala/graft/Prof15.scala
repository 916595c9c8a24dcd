package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** Throughput probe for the three SimHash forms: the q15 aggregate
  * (explode + flat bit columns), the per-row codegen'd
  * [[graft.functions.SimHash32]] expression the streaming screen uses,
  * and the original 32-pass higher-order form it replaced. Each timed
  * query FOLDS the fingerprints with `bit_xor` — a bare `count()`
  * would let column pruning drop the fingerprint computation from the
  * per-row plans and time nothing but the scan. Run via test:runMain. */
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
    // forces every fingerprint: the fold consumes the column
    def fold(df: DataFrame, c: String): Unit =
      df.agg(bit_xor(col(c))).collect()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name: $dt%.2f s, $n docs, ${n / dt}%.0f docs/s")
    }
    for (_ <- 1 to 3) {
      time("aggregate form (q15)") {
        fold(TextOps.simhashFrame(spark, dir), "simhash")
      }
      time("per-row codegen expr ") {
        fold(docs.select(
          TextOps.simhashFromHashes(TextOps.hsCol(col("text"))).as("fp")), "fp")
      }
      time("per-row 32-pass HOF  ") {
        fold(docs.select(
          TextOps.simhashFromHashesHof(TextOps.hsCol(col("text"))).as("fp")), "fp")
      }
    }
    spark.stop()
  }
}
