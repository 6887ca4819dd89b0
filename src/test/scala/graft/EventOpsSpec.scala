package graft

import org.apache.spark.sql.functions._
import graft.ops.EventOps

class EventOpsSpec extends SparkSpec {

  test("funnel: stages must be strictly time-ordered per user") {
    import spark.implicits._
    // user 1: view(10) -> click(20) -> purchase(30)   = full funnel
    // user 2: purchase(5) BEFORE view(10), click(20)  = stops at click
    // user 3: click only, never views                 = not in output
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 5L, "purchase"), (2L, 10L, "view"), (2L, 20L, "click"),
      (3L, 10L, "click"))
      .toDF("user_id", "ts", "event_type")
    val out = EventOps.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getInt(4)))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((Some(10L), Some(20L), Some(30L), 3)))
    // user 2's early purchase must not complete the funnel
    assert(out(2L) == ((Some(10L), Some(20L), None, 2)))
  }

  test("funnel: stage event at exactly the prior ts does not count (strict after)") {
    import spark.implicits._
    val ev = Seq((1L, 10L, "view"), (1L, 10L, "click"), (1L, 11L, "click"))
      .toDF("user_id", "ts", "event_type")
    val r = EventOps.funnel(ev, Seq("view", "click")).collect().head
    assert(r.getLong(2) == 11L) // the ts=10 click is simultaneous, skipped
  }

  test("retention: integer epoch-day cohorts and offsets") {
    import spark.implicits._
    val d = 86400L * 1000L * 1000L * 1000L
    // user 1 first active day 0, returns day 2; user 2 first active day 2
    val ev = Seq(
      (1L, 0L), (1L, d / 2), (1L, 2 * d + 5), // two events day 0, one day 2
      (2L, 2 * d))
      .toDF("user_id", "ts")
    val out = EventOps.retention(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 1L, (0L, 2L) -> 1L, (2L, 0L) -> 1L))
  }

  test("compactLatest: max_by picks latest by (ts, id) with deterministic tie-break") {
    import spark.implicits._
    val ev = Seq(
      (1L, "a", 10L, 1L, 1.0), (1L, "a", 20L, 2L, 2.0),
      (1L, "a", 20L, 3L, 3.0), // ts tie -> higher event_id wins
      (2L, "a", 5L, 4L, 4.0))
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val out = EventOps.compactLatest(ev, Seq("user_id", "event_type"),
      Seq("ts", "event_id"), Seq("value"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out == Map((1L, "a") -> ((20L, 3L, 3.0)),
      (2L, "a") -> ((5L, 4L, 4.0))))
  }

  test("gapFillDaily: missing days zero-filled, cumulative exact") {
    import spark.implicits._
    val rows = Seq(
      ("A", "2024-01-01", 100L), ("A", "2024-01-01", 50L),
      ("A", "2024-01-03", 10L), // A skips Jan 2
      ("B", "2024-01-02", 7L))  // B missing the endpoints
      .toDF("k", "d", "cents")
    val out = EventOps.gapFillDaily(rows, "k", to_date(col("d")), col("cents"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == 6) // 2 keys x 3-day global grid
    assert(out(("A", "2024-01-01")) == ((150L, 150L)))
    assert(out(("A", "2024-01-02")) == ((0L, 150L)))
    assert(out(("A", "2024-01-03")) == ((10L, 160L)))
    assert(out(("B", "2024-01-01")) == ((0L, 0L)))
    assert(out(("B", "2024-01-02")) == ((7L, 7L)))
    assert(out(("B", "2024-01-03")) == ((0L, 7L)))
  }
}
