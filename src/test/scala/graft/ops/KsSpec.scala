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

  test("NULL observations are excluded, not counted as clamp-ceiling mass") {
    // without the explicit filter, Spark's null-skipping greatest/least
    // turn each NULL into a value at maxValue, inflating the upper tail
    val a = Seq(Option(1L), Option(2L), None, None).toDF("v")
    val b = Seq(Option(1L), Option(2L)).toDF("v")
    val r = Ks.twoSample(a, col("v"), b, col("v")).collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("ks_num") == 0L) // identical after exclusion
    // an all-NULL side behaves exactly like an empty side (NULL stats)
    val nulls = Seq(Option.empty[Long], Option.empty[Long]).toDF("v")
    val r2 = Ks.twoSample(b, col("v"), nulls, col("v")).collect().head
    assert(r2.getAs[Long]("n_b") == 0L)
    assert(r2.isNullAt(r2.fieldIndex("ks_stat")))
  }

  test("two empty inputs yield zero rows, the oracle's degenerate shape") {
    val e = Seq.empty[Long].toDF("v")
    assert(Ks.twoSample(e, col("v"), e, col("v")).count() == 0L)
  }

  test("cumulative result is invariant to the bucket count (two-phase pin)") {
    // the two-phase cumsum (per-bucket windows + broadcast offsets) must
    // be exact regardless of where the bucket boundaries fall — sweep
    // cumBuckets from degenerate (1 = the old single-partition shape) to
    // more buckets than distinct values, over a sample whose mass
    // straddles every boundary choice
    val a = Seq(1L, 1L, 2L, 3L, 40L, 41L, 999L, 1000L, 100000L).toDF("v")
    val b = Seq(2L, 3L, 3L, 500L, 70000L, 100001L).toDF("v")
    val expect = Ks.twoSample(a, col("v"), b, col("v"), cumBuckets = 1)
      .collect().head
    for (k <- Seq(2, 3, 7, 32, 4096)) {
      val r = Ks.twoSample(a, col("v"), b, col("v"), cumBuckets = k)
        .collect().head
      assert(r.getAs[Long]("ks_num") == expect.getAs[Long]("ks_num") &&
        r.getAs[Long]("ks_den") == expect.getAs[Long]("ks_den") &&
        r.getAs[Long]("at_value") == expect.getAs[Long]("at_value") &&
        r.getAs[Double]("ks_stat") == expect.getAs[Double]("ks_stat"),
        s"cumBuckets=$k diverged from the single-bucket baseline")
    }
    intercept[IllegalArgumentException] {
      Ks.twoSample(a, col("v"), b, col("v"), cumBuckets = 0)
    }
  }

  test("no single-partition WindowExec in the physical plan") {
    // the round-18 contract: every window in the KS plan is partitioned
    // (the old global Window.orderBy(_v) put the whole histogram — up to
    // 2^20 rows — through ONE task and sprayed `No Partition Defined`
    // warnings across every bench log)
    val a = Seq(1L, 2L, 3L).toDF("v")
    val wins = Ks.twoSample(a, col("v"), a, col("v"))
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    assert(wins.nonEmpty, "expected the per-bucket cumulative WindowExec")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "every WindowExec must declare a partition spec")
  }

  test("wide-domain values clamp to the declared range, bounding the histogram") {
    // a has mass far past the default clamp ceiling; with an explicit
    // narrow range [0, 10] all of it collapses onto v=10, so the test
    // compares the CLAMPED distributions: a = {1, 10, 10}, b = {1}
    val a = Seq(1L, 5000000L, 9000000L).toDF("v")
    val b = Seq(1L).toDF("v")
    val r = Ks.twoSample(a, col("v"), b, col("v"),
      minValue = 0L, maxValue = 10L).collect().head
    // per value v=1: |1*1 - 1*3| = 2; v=10: |3*1 - 1*3| = 0 -> max 2 at 1
    assert(r.getAs[Long]("ks_num") == 2L && r.getAs[Long]("ks_den") == 3L)
    assert(r.getAs[Long]("at_value") == 1L)
    // the histogram the window runs over is bounded by the clamp range:
    // 9e6 distinct raw values cannot produce more than 11 histogram rows
    val hist = Seq.range(0L, 9000000L, 7L).toDF("v")
    val wide = Ks.twoSample(hist, col("v"), b, col("v"),
      minValue = 0L, maxValue = 10L).collect().head
    assert(wide.getAs[Long]("n_a") == hist.count())
    intercept[IllegalArgumentException] {
      Ks.twoSample(a, col("v"), b, col("v"), minValue = 5L, maxValue = 5L)
    }
  }
}
