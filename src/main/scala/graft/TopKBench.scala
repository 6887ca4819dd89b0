package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
/** One-off: custom bounded-heap top-k vs window row_number at sf0.1. */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .withColumn("price", col("l_extendedprice").cast("decimal(18,2)"))
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("window row_number top-3 per partkey") {
      li.withColumn("rn", row_number().over(
        Window.partitionBy("l_partkey").orderBy(col("price").desc)))
        .filter(col("rn") <= 3).count()
    }
    time("custom TopKPerKey top-3 per partkey") {
      graft.ops.TopK.perKey(li, Seq("l_partkey"), col("price"), 3).count()
    }
    spark.stop()
  }
}
