package graft.ops

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join preserves plain-join semantics under skew") {
    // 90% of fact rows hit one key
    val fact = (1 to 1000).map(i => (if (i <= 900) "HOT" else s"k${i % 7}", i.toLong))
      .toDF("key", "v")
    val dim = Seq(("HOT", "hot-dim"), ("k1", "d1"), ("k3", "d3"))
      .toDF("key", "label")
    val plain = fact.join(dim, Seq("key")).groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Salting.saltedJoin(fact, dim, "key", buckets = 8)
      .groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(plain == salted)
  }

  test("salted left join keeps unmatched fact rows exactly once") {
    val fact = Seq(("A", 1L), ("B", 2L), ("B", 3L)).toDF("key", "v")
    val dim = Seq(("A", "x")).toDF("key", "label")
    val rows = Salting.saltedJoin(fact, dim, "key", buckets = 4, joinType = "left")
      .orderBy("v").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("label") == "x")
    assert(rows(1).isNullAt(rows(1).fieldIndex("label")))
  }

  test("salted two-phase sum equals plain sum") {
    val df = (1 to 500).map(i => (if (i % 2 == 0) "HOT" else "COLD", i.toLong))
      .toDF("key", "v")
    val plain = df.groupBy("key").agg(sum("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedSum(df, "key", "v", buckets = 8).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }

  test("SQL registration: minhash_sig and cosine_sim callable from spark.sql") {
    GraftFunctions.register(spark)
    val sig = spark.sql(
      "SELECT minhash_sig(array('a b c', 'b c d')) AS s").head().getSeq[Long](0)
    assert(sig.length == 64)
    val cos = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head().getDouble(0)
    assert(cos == 1.0)
  }

  test("SQL registration: lsh_sig, p_minhash_sig, p_simhash, kmv_sketch") {
    GraftFunctions.register(spark)
    val lsh = spark.sql(
      "SELECT lsh_sig(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)), 2, 4) AS s")
      .head().getSeq[Long](0)
    assert(lsh.length == 2 && lsh.forall(s => s >= 0 && s < 16))
    val pm = spark.sql(
      "SELECT p_minhash_sig(array('a b c', 'b c d'), 32) AS s")
      .head().getSeq[Long](0)
    assert(pm.length == 32)
    val ps = spark.sql("SELECT p_simhash(array('a b c')) AS s").head().getLong(0)
    assert(ps >= 0L)
    val kmv = spark.sql(
      "SELECT kmv_sketch(h, 3) AS m FROM (SELECT CAST(id * 37 % 11 AS BIGINT) AS h " +
        "FROM range(100))").head().getSeq[Long](0)
    assert(kmv == Seq(0L, 1L, 2L)) // 3 smallest distinct residues
  }

  test("skewStats: heavy hitters, exact shares, bounded top-k plan") {
    import spark.implicits._
    // key 'hot' 6 rows, 'warm' 3, 'a'..'c' 1 each -> 12 rows, 5 keys
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("a", "b", "c"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("key", "v")
    val out = graft.ops.Salting.skewStats(df, "key", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.length == 2)
    val m = out.map(t => t._1 -> t).toMap
    assert(m("hot")._2 == 6L && m("warm")._2 == 3L)
    assert(m("hot")._3 == 6.0 / 12.0 && m("hot")._4 == 5L)
    // global top-k is the bounded TakeOrderedAndProject, never a full sort
    val plan = graft.ops.Salting.skewStats(df, "key", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1000))
  }
}
