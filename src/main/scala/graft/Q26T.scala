package graft
import org.apache.spark.sql.SparkSession
object Q26T {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    SparkEntry.queries("q13_token_counts")(spark, "/root/testdata/sf0.1").count()
    val t0=System.nanoTime()
    val n = SparkEntry.queries("q26_langid")(spark, "/root/testdata/sf0.1").collect().length
    println(f"q26 rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
