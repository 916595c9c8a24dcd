package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs. `getOrCreate` means the JVM
  * (sbt forks one test JVM) pays session startup once across suites.
  * local[4]/4 shuffle partitions keep 1000-row fixtures fast while still
  * exercising multi-partition exchanges.
  */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override protected def beforeAll(): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    super.beforeAll()
  }

  /** Smallest fixture scale — expected values in the specs were computed
    * independently with DuckDB over the same parquet. */
  val sf = "/root/testdata/sf0.001"
}
