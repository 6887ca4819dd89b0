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
    // SPARK_GRAFT_PROBE_NOWARM skips the shared-lineage persist: probing
    // a non-tax query at ×100 with 60 M persisted lineitem rows crowding
    // the heap measures GC pressure, not the query (round-18 finding —
    // MemoryStore spill warnings all over an embeddings-only probe)
    if (!sys.env.contains("SPARK_GRAFT_PROBE_NOWARM"))
      Catalog.sharedFrames(spark, sfDir).zipWithIndex.foreach { case (df, i) =>
        val t0 = System.nanoTime()
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
        println(f"PROBE warm-frame$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    // Default = the round-17 Bench convention: execute the query's OWN
    // physical plan via toRdd (Dataset.count() re-optimizes and can prune
    // expensive subtrees whose row count is statically derivable — the
    // op_mrr finding). SPARK_GRAFT_PROBE_EXEC=count restores the legacy
    // count() timing for comparisons against pre-r17 probe rows.
    val viaRdd = !sys.env.get("SPARK_GRAFT_PROBE_EXEC").contains("count")
    val dumpPlan = sys.env.contains("SPARK_GRAFT_PROBE_PLAN")
    // SPARK_GRAFT_PROBE_PLANONLY: time ONLY DataFrame construction +
    // analysis/optimization/physical planning (queryExecution.toRdd built,
    // nothing executed) — isolates the driver-side Catalyst share of a
    // query's bench seconds from its execution share.
    val planOnly = sys.env.contains("SPARK_GRAFT_PROBE_PLANONLY")
    // SPARK_GRAFT_PROBE_RULES: after all probes, dump cumulative Catalyst
    // rule timings (RuleExecutor metering) — names the optimizer rules a
    // slow-planning query actually pays for.
    val dumpRules = sys.env.contains("SPARK_GRAFT_PROBE_RULES")
    if (dumpRules)
      org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    args.foreach { name =>
      if (dumpPlan)
        println(s"PLAN $name\n" +
          SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val tCons = (System.nanoTime() - t0) / 1e9
        val n = if (planOnly) { df.queryExecution.toRdd; -1L }
          else if (viaRdd) df.queryExecution.toRdd.count() else df.count()
        val cons = if (planOnly) f" cons=$tCons%.3f" else ""
        println(f"PROBE $name pass$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)$cons")
      }
    }
    if (dumpRules)
      println("RULES\n" +
        org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    spark.stop()
  }
}
