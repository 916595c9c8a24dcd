package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.{DedupOps, RetrievalOps, SimilarityOps}

/** Opt-round-20 phase split: where the heavy BUILD phases spend their
  * wall (q77's inverted index, q112's label index) — parquet-write
  * committer overhead vs aggregate vs closure. Run via test:runMain. */
object ProfR20 {
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
    for (i <- 1 to 3) {
      println(s"-- pass $i")
      val p1 = SimilarityOps.tempIndexDir("prof-r20-inv")
      time("q77 writeInvertedIndex total")(
        RetrievalOps.writeInvertedIndex(docs, p1))
      val p2 = SimilarityOps.tempIndexDir("prof-r20-labels")
      time("q112 writeLabelIndex  total")(
        DedupOps.writeLabelIndex(
          docs.filter(col("doc_id") % DedupOps.DeltaMod =!= DedupOps.DeltaRem),
          p2))
      time("q112 appendLabelIndex total")(
        DedupOps.appendLabelIndex(
          docs.filter(col("doc_id") % DedupOps.DeltaMod === DedupOps.DeltaRem),
          p2))
      // strawman: the postings aggregate alone (no write), to split
      // compute from commit overhead
      time("postings agg only (noop-ish)") {
        import org.apache.spark.sql.functions.{explode, size => fsize}
        val tk = graft.queries.TextOps.toks(col("text"))
        graft.queries.ScaleHints.fanOutIfTiny(docs)
          .select(col("doc_id"), fsize(tk).cast("long").as("dl"),
            explode(tk).as("token"))
          .groupBy(col("token"), col("doc_id"), col("dl"))
          .agg(count(lit(1)).as("tf"))
          .withColumn("bucket", pmod(xxhash64(col("token")), lit(64)))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
