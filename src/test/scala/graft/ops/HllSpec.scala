package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HyperLogLog sketch pins: register-pipeline recompute, both estimate
  * branches, the ±1.6 % design error at scale, and the two invariances
  * that make the sketch mergeable (duplicates and partitioning). */
class HllSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side recompute of the whole sketch for one key: md5-60 hash,
    * 4096 registers, max-rank, exact-scaled harmonic sum, both branches. */
  private def recompute(values: Seq[String]): (Long, Double) = {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val regs = scala.collection.mutable.Map.empty[Long, Int]
    values.foreach { v =>
      val h = h60(v)
      val idx = h % 4096
      val w = h / 4096
      val rank = if (w == 0) 49 else 49 - java.lang.Long.toBinaryString(w).length
      regs(idx) = math.max(regs.getOrElse(idx, 0), rank)
    }
    val vZero = 4096L - regs.size
    val s = regs.values.map(m => 1L << (49 - m)).sum + vZero * (1L << 49)
    val alpha = 0.7213 / (1.0 + 1.079 / 4096.0)
    val raw = alpha * 16777216.0 * 562949953421312.0 / s.toDouble
    val est = if (raw <= 10240.0 && vZero > 0)
      4096.0 * (12.0 * Sampling.RaceLn2 - math.log(vZero.toDouble))
    else raw
    (vZero, est)
  }

  test("small-range branch matches a driver-side recompute exactly-ish") {
    val values = (1 to 200).map(i => s"tok$i")
    val df = values.map(v => ("k", v)).toDF("k", "v")
    val r = Hll.distinctPerKey(df, Seq("k"), col("v")).head()
    val (vz, est) = recompute(values)
    assert(r.getLong(1) == 200L, "exact")
    assert(r.getLong(2) == vz, s"v_zero ${r.getLong(2)} vs $vz")
    // portableLn vs Math.log agree to ~1e-12 relative; nothing else differs
    assert(math.abs(r.getDouble(3) - est) < 1e-6, s"${r.getDouble(3)} vs $est")
    // linear counting at n ≪ m is very tight: within 2 %
    assert(math.abs(r.getDouble(3) - 200.0) < 4.0, r.getDouble(3))
  }

  test("raw branch engages at 50k distinct and lands within 5%") {
    val df = spark.range(50000).select(lit("k").as("k"),
      concat(lit("value-"), col("id")).as("v"))
    val r = Hll.distinctPerKey(df, Seq("k"), col("v")).head()
    assert(r.getLong(1) == 50000L)
    val est = r.getDouble(3)
    // 50k ≫ 2.5m = 10240 -> the α-corrected raw branch (1.6 % std err)
    assert(est > 47500 && est < 52500, est.toString)
  }

  test("duplicates and partitioning never move the estimate; keys independent") {
    val base = (1 to 300).map(i => s"w$i")
    val once = base.map(v => ("a", v)) ++ (1 to 50).map(i => ("b", s"x$i"))
    val dups = once ++ once ++ once
    val e1 = Hll.distinctPerKey(once.toDF("k", "v"), Seq("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val e3 = Hll.distinctPerKey(dups.toDF("k", "v").repartition(13),
      Seq("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(e1 == e3, s"$e1 vs $e3")
    assert(e1.keySet == Set("a", "b"))
  }

  test("registers + max-merge + finisher compose to distinctPerKey's estimate") {
    // the decomposition the STREAMING path uses: the map stage and the
    // register MAX can run anywhere (order-insensitive), the finisher
    // must then produce the identical estimate
    val df = (1 to 500).map(i => ("k", s"u$i")).toDF("k", "v")
    val whole = Hll.distinctPerKey(df, Seq("k"), col("v")).head().getDouble(3)
    val regs = Hll.registers(df, Seq("k"), col("v"))
      .groupBy("k", "_idx").agg(max("_rank").as("_M"))
    val composed = Hll.estimateFromRegisters(regs, Seq("k"))
      .head().getDouble(2)
    assert(whole == composed, s"$whole vs $composed")
  }

  test("reserved output names are rejected") {
    val df = Seq(("k", "v", 1.0)).toDF("k", "hll_est", "x")
    intercept[IllegalArgumentException] {
      Hll.distinctPerKey(df, Seq("k", "hll_est"), col("x"))
    }
  }
}
