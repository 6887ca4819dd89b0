package graft
import org.apache.spark.sql.SparkSession

/** Dev-only timing probe: run named queries N times each against a warmed
  * session (same config as [[Bench]]) without paying the full bench sweep.
  * Usage: runMain graft.PerfProbe <query> [query...]  (SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS as in Bench). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Catalog.sharedFrames(spark, sfDir).zipWithIndex.foreach { case (df, i) =>
      val t0 = System.nanoTime()
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      println(f"PROBE warm-frame$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    args.foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"PROBE $name pass$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
