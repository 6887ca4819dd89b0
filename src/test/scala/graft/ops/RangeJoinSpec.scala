package graft.ops

import graft.SparkSpec

/** Range (interval) join goldens: inclusive bounds, bucket-boundary
  * crossings, key isolation, and the no-cross-product plan. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 10L, 100L), (2L, 10L, 150L), (3L, 10L, 200L), (4L, 10L, 201L),
    (5L, 20L, 150L) // other key — never matches user 10's intervals
  ).toDF("event_id", "user_id", "ts")

  private lazy val intervals = Seq(
    (7L, 10L, 100L, 200L), // inclusive both ends
    (8L, 10L, 199L, 205L)  // crosses a bucket boundary at width 100
  ).toDF("iv_id", "user_id", "lo", "hi")

  private def run(width: Long) = RangeJoin.pointInInterval(
    points, intervals, Seq("user_id"), "ts", "lo", "hi", width)
    .select("event_id", "iv_id").collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("column names needing backtick quoting resolve correctly") {
    val pts = points.withColumnRenamed("ts", "event.ts")
    val ivs = intervals.withColumnRenamed("lo", "from ts")
      .withColumnRenamed("hi", "to-ts")
    val got = RangeJoin.pointInInterval(pts, ivs, Seq("user_id"),
      "event.ts", "from ts", "to-ts", 100L)
      .select("event_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 7L), (2L, 7L), (3L, 7L), (3L, 8L), (4L, 8L)))
  }

  test("reserved _bkt column is rejected") {
    val bad = points.withColumn("_bkt", org.apache.spark.sql.functions.lit(0L))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(bad, intervals, Seq("user_id"),
        "ts", "lo", "hi", 100L)
    }
    assert(e.getMessage.contains("_bkt"))
  }

  test("inclusive bounds, boundary crossings, key isolation") {
    val expected = Set((1L, 7L), (2L, 7L), (3L, 7L), (3L, 8L), (4L, 8L))
    assert(run(100L) == expected)
    // result is bucket-width invariant (no dup when interval spans buckets)
    assert(run(7L) == expected)
    assert(run(1000L) == expected)
  }

  test("plan is an equi-join on (key, bucket), not a cross product") {
    val df = RangeJoin.pointInInterval(points, intervals, Seq("user_id"),
      "ts", "lo", "hi", 100L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
