package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}
import graft.queries.TextOps

/** The codegen'd [[graft.functions.SimHash32]] kernel against its
  * executable specification, the 32-pass higher-order form
  * ([[TextOps.simhashFromHashesHof]]): bit identity on real documents
  * AND on adversarial arrays exercising every contract corner the
  * lambda form defines (null array → 0, null element → −1 per bit,
  * negative element → −1 per bit).
  */
class SimHash32Spec extends SparkSuite {

  test("expression == higher-order form on fixture documents; plan is codegen'd") {
    import spark.implicits._
    val df = Tables.documents(spark, sf)
      .withColumn("hs", TextOps.hsCol($"text"))
      .select($"doc_id",
        TextOps.simhashFromHashes($"hs").as("fast"),
        TextOps.simhashFromHashesHof($"hs").as("ref"))
    val rows = df.collect()
    assert(rows.length == 500)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"row $r"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("simhash32"), s"kernel not the custom expression:\n$plan")
  }

  test("contract corners: null array, null/negative elements, empty, full-range longs") {
    val rnd = new scala.util.Random(42)
    def randArray(): Seq[Any] = Seq.fill(rnd.nextInt(60)) {
      rnd.nextInt(10) match {
        case 0 => null                                   // null element
        case 1 => rnd.nextLong()                         // full range, often negative
        case 2 => -1L - rnd.nextInt(1000)                // small negative
        case _ => rnd.nextLong() & 0xFFFFFFFFL           // well-formed 32-bit hash
      }
    }
    val cases: Seq[Seq[Any]] =
      Seq(null, Seq.empty[Any], Seq(null), Seq(-1L), Seq(Long.MinValue, Long.MaxValue)) ++
        Seq.fill(200)(randArray())
    val schema = StructType(Seq(StructField("hs", ArrayType(LongType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map(Row(_)), 4), schema)
      .select(
        TextOps.simhashFromHashes(col("hs")).as("fast"),
        TextOps.simhashFromHashesHof(col("hs")).as("ref"))
    df.collect().zip(cases).foreach { case (r, in) =>
      assert(!r.isNullAt(0), s"expression nulled out on $in")
      assert(r.getLong(0) == r.getLong(1), s"mismatch on input $in: $r")
    }
    // the documented identity: a null array folds to fingerprint 0
    val nullRow = df.collect().head
    assert(nullRow.getLong(0) == 0L && nullRow.getLong(1) == 0L)
  }

  test("per-row expression agrees with the q15 aggregate form per document") {
    import spark.implicits._
    val perRow = Tables.documents(spark, sf)
      .select($"doc_id", TextOps.simhashFromHashes(TextOps.hsCol($"text")).as("fp"))
    val agg = TextOps.q15Simhash(spark, sf).withColumnRenamed("simhash", "fp_agg")
    val joined = perRow.join(agg, "doc_id").collect()
    // every doc the aggregate emits (has ≥1 token) must match bit-for-bit
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(1) == r.getLong(2), s"row $r"))
  }
}
