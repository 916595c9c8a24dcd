package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of selected SparkEntry
  * queries (PLAN_QUERIES env, comma-separated; default the round-4 set)
  * at PLAN_DIR scale. Not a test — run via Test/runMain.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PLAN_DIR", "/root/testdata/sf0.01")
    val names = sys.env.get("PLAN_QUERIES")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("q13_neardup_pairs", "q14_ann_topk", "q20_media_embed",
        "q21_simhash_pairs"))
    val exec = sys.env.contains("PLAN_EXEC")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, dir)
      if (exec) {
        df.count() // materialize so AQE finalizes the adaptive plan
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
