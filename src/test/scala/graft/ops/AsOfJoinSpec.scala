package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** As-of join goldens: backward inclusive semantics, per-key isolation,
  * tie-breaks, and the no-prior-match null case. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 10L, 100L), // before any right row -> nulls
    (2L, 10L, 200L), // equal ts to right row -> inclusive match
    (3L, 10L, 250L), // between right rows -> 200 match
    (4L, 10L, 300L), // after both -> 300 match
    (5L, 20L, 300L)  // other key, no right rows -> nulls
  ).toDF("event_id", "user_id", "ts")

  private lazy val right = Seq(
    (10L, 200L, 7L, 1.5),
    (10L, 300L, 8L, 2.5)
  ).toDF("user_id", "ts", "purchase_id", "purchase_value")

  private def run() = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts",
    Seq("purchase_id", "purchase_value"), rightIdCol = Some("purchase_id"))
    .select("event_id", "purchase_id", "purchase_value")
    .collect().map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)))).toMap

  test("backward inclusive as-of with per-key isolation") {
    val m = run()
    assert(m(1L) == (None, None))            // no prior right row
    assert(m(2L) == (Some(7L), Some(1.5)))   // equal ts matches (inclusive)
    assert(m(3L) == (Some(7L), Some(1.5)))
    assert(m(4L) == (Some(8L), Some(2.5)))
    assert(m(5L) == (None, None))            // key with no right rows
  }

  test("ties on (key, ts) resolve to the highest right id") {
    val dupRight = Seq((10L, 200L, 7L, 1.5), (10L, 200L, 9L, 9.9))
      .toDF("user_id", "ts", "purchase_id", "purchase_value")
    val r = AsOfJoin.asOf(left.filter($"event_id" === 3L), dupRight,
      Seq("user_id"), "ts", "ts", Seq("purchase_id", "purchase_value"),
      rightIdCol = Some("purchase_id")).head()
    assert(r.getAs[Long]("purchase_id") == 9L)
    assert(r.getAs[Double]("purchase_value") == 9.9)
  }

  test("whole-row semantics: a NULL value column in the latest right row " +
      "is NOT backfilled from an older row") {
    // right row at ts=300 has purchase_value NULL; an event after it must
    // carry (8, NULL) — per-column last(ignoreNulls) would wrongly mix
    // purchase_id=8 with the ts=200 row's value 1.5.
    val r = Seq((10L, 200L, Some(7L), Some(1.5)),
      (10L, 300L, Some(8L), Option.empty[Double]))
      .toDF("user_id", "ts", "purchase_id", "purchase_value")
    val out = AsOfJoin.asOf(left.filter($"event_id" === 4L), r,
      Seq("user_id"), "ts", "ts", Seq("purchase_id", "purchase_value"),
      rightIdCol = Some("purchase_id")).head()
    assert(out.getAs[Long]("purchase_id") == 8L)
    assert(out.isNullAt(out.fieldIndex("purchase_value")))
  }

  test("reserved internal column names are rejected") {
    val bad = left.withColumn("_side", org.apache.spark.sql.functions.lit(1))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(bad, right, Seq("user_id"), "ts", "ts",
        Seq("purchase_id", "purchase_value"))
    }
    assert(e.getMessage.contains("_side"))
  }

  test("exactly one shuffle: hash exchange on the key, then sort") {
    val df = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts",
      Seq("purchase_id", "purchase_value"))
    val plan = df.queryExecution.executedPlan.toString
    assert("(?<!Broadcast)Exchange ".r.findAllIn(plan).size == 1, plan)
  }

  test("maxStaleness nulls the whole match when the latest right row is too old") {
    // one right row at ts=200, tolerance 60: the event at 250 (age 50)
    // keeps its match; the event at 290 (age 90) nulls BOTH value columns
    val r = Seq((10L, 200L, 7L, 1.5))
      .toDF("user_id", "ts", "purchase_id", "purchase_value")
    val l = Seq((1L, 10L, 250L), (2L, 10L, 290L))
      .toDF("event_id", "user_id", "ts")
    val m = AsOfJoin.asOf(l, r, Seq("user_id"), "ts", "ts",
      Seq("purchase_id", "purchase_value"), rightIdCol = Some("purchase_id"),
      maxStaleness = Some(60L))
      .collect().map(x => x.getLong(0) ->
        (Option(x.get(x.fieldIndex("purchase_id"))),
          Option(x.get(x.fieldIndex("purchase_value"))))).toMap
    assert(m(1L) == (Some(7L), Some(1.5)))  // age 50 <= 60
    assert(m(2L) == (None, None))           // age 90 > 60: WHOLE row null
  }

  test("maxStaleness on a non-numeric ts is rejected loudly") {
    val lTs = left.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros($"ts"))
    val rTs = right.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros($"ts"))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(lTs, rTs, Seq("user_id"), "ts", "ts",
        Seq("purchase_id", "purchase_value"), maxStaleness = Some(60L))
    }
    assert(e.getMessage.contains("NUMERIC"))
  }
}
