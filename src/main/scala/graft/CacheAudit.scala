package graft
import org.apache.spark.sql.SparkSession

/** Dev-only session persist-budget audit (the round-8 verdict's #6): warm
  * the shared frames, run EVERY declared query once — accumulating every
  * `CacheScope.Session` persist the library takes along the way — then
  * print each cached RDD's memory/disk footprint and the session totals.
  * Usage: runMain graft.CacheAudit  (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS
  * as in Bench). */
object CacheAudit {
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
    Catalog.sharedFrames(spark, sfDir).foreach(
      _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count())
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        println(s"AUDIT $name FAILED ${e.getMessage}") }
    }
    val infos = spark.sparkContext.getRDDStorageInfo
    infos.sortBy(-_.memSize).foreach { i =>
      println(f"AUDIT rdd=${i.id}%5d mem=${i.memSize / 1e6}%9.2f MB " +
        f"disk=${i.diskSize / 1e6}%8.2f MB parts=${i.numCachedPartitions}%3d " +
        s"name=${Option(i.name).getOrElse("?").take(120)}")
    }
    println(f"AUDIT TOTAL cached=${infos.length} " +
      f"mem=${infos.map(_.memSize).sum / 1e6}%.1f MB " +
      f"disk=${infos.map(_.diskSize).sum / 1e6}%.1f MB")
    spark.stop()
  }
}
