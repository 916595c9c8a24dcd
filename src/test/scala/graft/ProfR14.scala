package graft

import graft.queries.TextOps
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-14 scale probe: the batched BPE trainer's merges-per-job
  * curve (VERDICT r13 item 4 — "≥200 merges without ≥200 jobs").
  * Runs [[TextOps.bpeTrainBatched]] at a real merge budget on the
  * sf0.01 corpus (richer vocabulary than the spec fixture), counts
  * Spark jobs with a listener, and prints the per-round batch sizes
  * so the Zipf-tail growth claim in the scaladoc is a measurement,
  * not a story. The sequential loop is timed at the same budget for
  * the jobs-saved comparison. Findings land in bench/NOTES.md.
  */
object ProfR14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "8000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = sys.env.getOrElse("PROF_BASE", "/root/testdata/sf0.01")
    val merges = sys.env.getOrElse("PROF_MERGES", "200").toInt
    // the documents fixture's ~31-word vocabulary fully merges at 89;
    // the probe needs a DEEP merge space, and customer names
    // ("Customer#000000123" — shared prefix + digit tail) give one:
    // 1500 distinct words ≈ 25k possible merges. Same trainer, same
    // (…, text) contract, real testdata input.
    val docs = sys.env.get("PROF_CORPUS") match {
      case Some("documents") => Tables.documents(spark, dir)
      case _ => Tables.customer(spark, dir)
        .select(org.apache.spark.sql.functions.col("c_name").as("text"))
    }

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }

    def run(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      spark.sparkContext.addSparkListener(listener)
      jobs.set(0)
      val t0 = System.nanoTime()
      val rows = f.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      // the final collect is 1 job of the count; report it as-is
      spark.sparkContext.removeSparkListener(listener)
      val got = rows.length
      println(f"[prof-r14] $tag: merges=$got jobs=${jobs.get()} wall=$dt%.1fs")
      if (tag == "batched") {
        // per-round batch sizes: consecutive ranks sharing a round are
        // not recorded in the output, so derive the curve from rank
        // gaps in n (descending within a batch, may rise across rounds)
        val ns = rows.map(_.getLong(3)).toSeq
        println(s"[prof-r14] batched merge counts (first 40): ${ns.take(40).mkString(",")}")
      }
    }

    run("two-phase")(TextOps.bpeTrainAuto(docs, merges))
    run("batched")(TextOps.bpeTrainBatched(docs, merges))
    if (sys.env.get("PROF_SKIP_SEQ").isEmpty)
      run("sequential")(TextOps.bpeTrain(docs, merges))
    spark.stop()
  }
}
