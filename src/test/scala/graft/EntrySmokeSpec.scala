package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: the flagship `SparkEntry.entry` must return rows
  * on sf0.001 (the driver checks rows > 0 before anything else runs).
  */
class EntrySmokeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("entry-smoke")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("flagship entry returns rows on sf0.001") {
    assert(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val n = SparkEntry.entry(spark).count()
    assert(n > 0, s"entry() returned $n rows")
  }
}
