package graft
import org.apache.spark.sql.SparkSession

/** Dev-only audit of the Bench/PerfProbe `.count()` convention (round-17
  * finding): Catalyst can fold `count()` over a plan it KNOWS yields
  * exactly one row (a global aggregate behind a row-preserving Project)
  * into a constant — the child never executes, and the bench "timing"
  * for such a query measures session overhead, not the query. This main
  * builds each catalog query's `groupBy().count()` plan (what
  * Dataset.count() compiles to), optimizes it, and reports queries whose
  * OPTIMIZED count plan no longer references any input relation — the
  * collapsed ones. Plan-only: nothing executes. */
object CountAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val fullLeaves = df.queryExecution.optimizedPlan.collectLeaves()
        val counted = df.groupBy().count()
        val opt = counted.queryExecution.optimizedPlan
        val leaves = opt.collectLeaves()
        val hasRelation = leaves.exists { l =>
          val s = l.nodeName
          !(s.contains("OneRowRelation") ||
            (s.contains("LocalRelation") && l.maxRows.contains(1L)))
        }
        // full collapse: the count plan references NO relation at all;
        // partial pruning: the count plan dropped some of the full
        // plan's leaf relations (e.g. a row-preserving unique-key left
        // join eliminated — the op_mrr case), so .count() times less
        // work than the declared query does
        if (!hasRelation)
          println(s"COLLAPSED $n :: leaves=${leaves.map(_.nodeName).mkString(",")}")
        else if (leaves.size < fullLeaves.size)
          println(s"PRUNED $n :: count=${leaves.size} full=${fullLeaves.size}")
      } catch {
        case e: Throwable => println(s"ERROR $n ${e.getClass.getSimpleName}")
      }
    }
    println("COUNT-AUDIT DONE")
    spark.stop()
  }
}
