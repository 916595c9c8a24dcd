package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** Stage split for the per-row fingerprint chain: tokenizer cost vs
  * token-HASH cost (the interpreted transform+md5-hex lambda) vs the
  * full chain with the codegen'd fold. Run via test:runMain. */
object ProfHs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("PROF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (_ <- 1 to 3) {
      time("toks only  ")(
        docs.select(sum(size(TextOps.toks(col("text")))).as("n")).collect())
      time("hsCol only ")(
        docs.select(sum(size(TextOps.hsCol(col("text")))).as("n")).collect())
      time("full chain ")(
        docs.select(bit_xor(
          TextOps.simhashFromHashes(TextOps.hsCol(col("text")))).as("x")).collect())
    }
    spark.stop()
  }
}
