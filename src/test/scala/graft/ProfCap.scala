package graft

import graft.streaming.NeardupStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Recall probe for the streaming near-dup screen's `maxPerBucket`
  * state cap (VERDICT r9 #6): a full band bucket stops ADMITTING
  * representatives, so later duplicates of never-admitted docs pass
  * unflagged — false negatives by design, bounded memory in exchange.
  * This measures the trade on the StreamBench near-dup corpus (same
  * seeded generator: 40-token docs over a 5k vocab, ~10% one-token
  * mutations of an earlier doc, ids of the planted mutations tracked):
  * for each cap, stream the corpus through the screen and report
  * flagged/planted recall, extra (non-planted) flags, final state
  * rows, and wall. Run: `Test/runMain graft.ProfCap`; `PROF_N` sizes
  * the corpus (default 40k → ~156 band entries per bucket mean load,
  * well past the default cap of 64).
  */
object ProfCap {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val nDocs = sys.env.getOrElse("PROF_N", "40000").trim.toInt
    val rnd = new scala.util.Random(42)
    val vocab = Array.tabulate(5000)(i => s"v$i")
    val recent = new scala.collection.mutable.ArrayBuffer[Array[String]]
    val docs = new scala.collection.mutable.ArrayBuffer[Doc]
    val planted = new scala.collection.mutable.HashSet[Long]
    var id = 0L
    while (docs.size < nDocs) {
      id += 1
      val toks =
        if (recent.nonEmpty && rnd.nextInt(10) == 0) {
          planted += id
          val base = recent(rnd.nextInt(recent.size)).clone()
          base(rnd.nextInt(base.length)) = vocab(rnd.nextInt(vocab.length))
          base
        } else {
          val t = Array.fill(40)(vocab(rnd.nextInt(vocab.length)))
          if (recent.size < 4096) recent += t
          t
        }
      docs += Doc(id, toks.mkString(" "), new Timestamp(id / 500 * 1000))
    }
    println(s"corpus: $nDocs docs, ${planted.size} planted near-dups, " +
      s"${nDocs * 4 / 1024} mean band entries per bucket")

    var i = 0
    for (cap <- Seq(4, 8, 16, 32, 64, 128, 256, Int.MaxValue)) {
      i += 1
      val in = MemoryStream[Doc]
      val sink = s"cap_probe_$i"
      val q = NeardupStream.screen(in.toDF(), maxPerBucket = cap)
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("cap-ck").toString)
        .start()
      val t0 = System.nanoTime()
      docs.grouped(2000).foreach { chunk =>
        in.addData(chunk); q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val stateRows = q.recentProgress.reverseIterator.collectFirst {
        case p if p.stateOperators.nonEmpty =>
          p.stateOperators.map(_.numRowsTotal).sum
      }.getOrElse(0L)
      val flagged = spark.table(sink).select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet
      q.stop()
      val hit = (flagged & planted.toSet).size
      val extra = (flagged -- planted).size
      val capStr = if (cap == Int.MaxValue) "unbounded" else cap.toString
      println(f"cap=$capStr%9s recall=${hit.toDouble / planted.size}%.3f " +
        f"flagged_planted=$hit%5d extra=$extra%5d " +
        f"state_rows=$stateRows%7d wall=$wall%6.1f s")
    }
    spark.stop()
  }
}
