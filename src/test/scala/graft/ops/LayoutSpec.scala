package graft.ops

import graft.SparkSpec
import graft.tax.{SyntheticTxns, TaxCalc}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Layout specs: partition pruning visible in the plan, bucketed join
  * without exchange. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("state-partitioned transactions: predicate becomes partition pruning") {
    val dir = Files.createTempDirectory("graft_layout").toString
    val txns = TaxCalc.normalize(SyntheticTxns.txns(spark, "/root/testdata/sf0.001"))
    Layout.writePartitioned(txns, s"$dir/txns", Seq("state"))
    val df = spark.read.parquet(s"$dir/txns").filter($"state" === "TX")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(state"), plan.take(1200))
    // the pushed partition filter must eliminate non-TX directories
    assert(df.count() > 0)
    assert(df.select("state").distinct().collect().map(_.getString(0)).toSeq == Seq("TX"))
    // data filters list must NOT contain the state predicate (it's pruned,
    // not scanned-and-filtered)
    assert(plan.contains("(state#") === false ||
      !plan.split("DataFilters").last.split("]").head.contains("state"))
  }

  test("year/month derived partitioning") {
    val txns = Layout.withDateParts(
      TaxCalc.normalize(SyntheticTxns.txns(spark, "/root/testdata/sf0.001")))
    val r = txns.select("txn_year", "txn_month").distinct().count()
    assert(r > 12) // shipdates span multiple years
  }

  test("identically bucketed tables join without an exchange") {
    // default warehouse dir (./spark-warehouse, gitignored); clean any
    // leftover managed locations from previous JVMs (the fresh derby
    // metastore doesn't know about them and refuses the create)
    for (t <- Seq("li_b", "o_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    try {
      // force the join to sort-merge so the test proves bucketing, not
      // broadcasting
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      Layout.writeBucketed(li, "li_b", "l_orderkey", 8)
      Layout.writeBucketed(o, "o_b", "o_orderkey", 8)
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      val shuffles = "(?<!Broadcast)Exchange ".r.findAllIn(plan).size
      assert(shuffles == 0, s"expected shuffle-free bucketed join, got $shuffles")
      assert(joined.count() > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
