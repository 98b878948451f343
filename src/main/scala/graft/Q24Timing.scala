package graft
import org.apache.spark.sql.SparkSession
object Q24Timing {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("parquet.enable.summary-metadata", "false")
      .appName("q24timing").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val df = SparkEntry.queries("q24_crawl_bsp")(spark, "/root/testdata/sf0.1")
    val n = df.count()
    println(f"q24 rows=$n total=${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
