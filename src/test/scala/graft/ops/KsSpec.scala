package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact two-sample KS pins: hand-computed gap/argmax, identical-sample
  * zero, rejection on disjoint samples, empty-side NULLs. */
class KsSpec extends SparkSpec {
  import spark.implicits._

  test("gap argmax matches the hand computation") {
    // a = {1,1,2,3}, b = {3,4}: per value |ca*nb - cb*na| = 4, 6, 4, 0 ->
    // max 6 at v=2; D = 6/8 = .75; crit = 1.358*sqrt(6/8) > .75 -> keep
    val a = Seq(1L, 1L, 2L, 3L).toDF("v")
    val b = Seq(3L, 4L).toDF("v")
    val r = Ks.twoSample(a, col("v"), b, col("v")).collect().head
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("ks_num") == 6L && r.getAs[Long]("ks_den") == 8L)
    assert(r.getAs[Double]("ks_stat") == 0.75)
    assert(r.getAs[Long]("at_value") == 2L)
    assert(r.getAs[Double]("crit_05") == 1.358 * math.sqrt(6.0 / 8.0))
    assert(!r.getAs[Boolean]("reject_05"))
  }

  test("identical samples give zero distance at the smallest value") {
    val a = Seq(5L, 7L, 7L, 9L).toDF("v")
    val r = Ks.twoSample(a, col("v"), a, col("v")).collect().head
    assert(r.getAs[Long]("ks_num") == 0L)
    assert(r.getAs[Double]("ks_stat") == 0.0)
    assert(r.getAs[Long]("at_value") == 5L) // tie -> smallest value
    assert(!r.getAs[Boolean]("reject_05"))
  }

  test("disjoint samples reject at alpha=.05") {
    val a = Seq.fill(10)(1L).toDF("v")
    val b = Seq.fill(10)(2L).toDF("v")
    val r = Ks.twoSample(a, col("v"), b, col("v")).collect().head
    assert(r.getAs[Double]("ks_stat") == 1.0)
    // crit = 1.358*sqrt(20/100) ~= .607 < 1
    assert(r.getAs[Boolean]("reject_05"))
  }

  test("an empty side yields NULL stat/crit/reject") {
    val a = Seq(1L, 2L).toDF("v")
    val b = Seq.empty[Long].toDF("v")
    val r = Ks.twoSample(a, col("v"), b, col("v")).collect().head
    assert(r.getAs[Long]("n_b") == 0L)
    assert(r.isNullAt(r.fieldIndex("ks_stat")))
    assert(r.isNullAt(r.fieldIndex("reject_05")))
  }
}
