package graft

import org.apache.spark.sql.functions._
import graft.ops.EventOps

class EventOpsSpec extends SparkSpec {

  test("tsAsNanos: plausible long nanos pass through; a micros-scale long fails loudly") {
    import spark.implicits._
    val nanos = Seq((1L, 1700000000L * 1000000000L)).toDF("event_id", "ts")
    assert(Catalog.tsAsNanos(nanos).collect().head.getLong(1) ==
      1700000000L * 1000000000L)
    // the round-7 failure mode inverted: if the fixture ever ships
    // epoch-MICROS as a bare BIGINT, the magnitude guard must throw, not
    // silently leave every downstream op off by 1000x
    val micros = Seq((1L, 1700000000L * 1000000L)).toDF("event_id", "ts")
    val e = intercept[Exception] {
      Catalog.tsAsNanos(micros).collect()
    }
    assert(e.getMessage.contains("too small for epoch-nanos") ||
      Option(e.getCause).exists(_.getMessage.contains("too small for epoch-nanos")))
    // null ts rows must not trip the guard
    val withNull = Seq((1L, Some(1700000000L * 1000000000L)), (2L, None))
      .toDF("event_id", "ts")
    assert(Catalog.tsAsNanos(withNull).collect().length == 2)
  }

  test("pitJoin: keepUnmatched surfaces records before an independent dimension's history") {
    import spark.implicits._
    // user 1's dimension history starts at t=20; a record at t=10 has NO
    // as-of state — the reuse case where the default drop-semantics bite
    val ev = Seq((1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"))
      .toDF("user_id", "tus", "event_id", "event_type")
    val dimSrc = Some(ev.filter(col("tus") >= 20L))
    // default: inner-join-like — the pre-history record is dropped
    assert(EventOps.pitJoin(ev, dimEvents = dimSrc).count() == 1)
    // keepUnmatched: the record surfaces with null dim state
    val kept = EventOps.pitJoin(ev, dimEvents = dimSrc,
        keepUnmatched = true)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(kept == Map(100L -> None, 101L -> Some("b")))
    // self-dimension (the declared-query shape): the filter is a no-op
    assert(EventOps.pitJoin(ev).count() == 2)
  }

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

  test("scd2: no-change rows collapse; half-open intervals; version order") {
    import spark.implicits._
    // user 1: gold -> gold (no change, drops) -> silver -> gold
    // user 2: single record, current from the start
    val ch = Seq(
      (1L, 1L, 100L, "gold"), (1L, 2L, 200L, "gold"),
      (1L, 3L, 300L, "silver"), (1L, 4L, 400L, "gold"),
      (2L, 5L, 150L, "basic"))
      .toDF("user_id", "rec_id", "ts", "tier")
    val out = EventOps.scd2(ch, "user_id", col("ts"), col("rec_id"),
        Seq("tier"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version")) ->
        ((r.getAs[String]("tier"), r.getAs[Long]("valid_from"),
          Option(r.getAs[Any]("valid_to")), r.getAs[Boolean]("is_current"))))
      .toMap
    assert(out.size == 4) // the ts=200 no-change record produced no version
    assert(out((1L, 1)) == (("gold", 100L, Some(300L), false)))
    assert(out((1L, 2)) == (("silver", 300L, Some(400L), false)))
    assert(out((1L, 3)) == (("gold", 400L, None, true)))
    assert(out((2L, 1)) == (("basic", 150L, None, true)))
  }

  test("scd2: equal timestamps break ties on the id column") {
    import spark.implicits._
    val ch = Seq((1L, 1L, 100L, "a"), (1L, 2L, 100L, "b"))
      .toDF("user_id", "rec_id", "ts", "attr")
    val out = EventOps.scd2(ch, "user_id", col("ts"), col("rec_id"),
        Seq("attr"))
      .collect().map(r => r.getAs[Int]("version") -> r.getAs[String]("attr"))
      .toMap
    assert(out == Map(1 -> "a", 2 -> "b"))
  }

  test("rollingDaily: RANGE frame shrinks over missing days (not ROWS)") {
    import spark.implicits._
    // days 0,1,2 then a gap to day 10: the day-10 window must NOT reach
    // back to the older rows the way a ROWS frame would
    val rows = Seq(("A", 0L, 10L), ("A", 1L, 20L), ("A", 2L, 30L),
      ("A", 10L, 40L), ("B", 0L, 5L))
      .toDF("k", "day", "cents")
    val out = EventOps.rollingDaily(rows, "k", col("day"), col("cents"),
        windowDays = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(("A", 0L)) == ((10L, 1L, 10.0)))
    assert(out(("A", 1L)) == ((30L, 2L, 15.0)))
    assert(out(("A", 2L)) == ((60L, 3L, 20.0)))
    assert(out(("A", 10L)) == ((40L, 1L, 40.0))) // gap: frame is just day 10
    assert(out(("B", 0L)) == ((5L, 1L, 5.0)))
  }

  test("rollingDaily: same-day rows pre-aggregate before the window") {
    import spark.implicits._
    val rows = Seq(("A", 0L, 1L), ("A", 0L, 2L), ("A", 1L, 4L))
      .toDF("k", "day", "cents")
    val out = EventOps.rollingDaily(rows, "k", col("day"), col("cents"),
        windowDays = 7)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map(0L -> ((3L, 3L)), 1L -> ((4L, 7L))))
  }

  test("rollingActives: rolling distinct is a true distinct, not a sum of DAUs") {
    import spark.implicits._
    val d = 86400L * 1000L * 1000L * 1000L
    // user 1 active days 0 and 2 (counts ONCE in any window covering both);
    // user 2 active day 2 only; last active day = 2 clips the cover
    val ev = Seq((1L, 0L), (1L, 10L), (1L, 2 * d), (2L, 2 * d + 5))
      .toDF("user_id", "ts")
    val out = EventOps.rollingActives(ev, windowDays = 7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // day 0: dau 1 (u1), wau 1; day 1: dau 0, wau 1 (u1 carried);
    // day 2: dau 2, wau 2 (u1 counted once despite two active days)
    assert(out == Map(0L -> ((1L, 1L)), 1L -> ((0L, 1L)), 2L -> ((2L, 2L))))
  }

  test("rollingActives: window shorter than the gap drops carried users") {
    import spark.implicits._
    val d = 86400L * 1000L * 1000L * 1000L
    val ev = Seq((1L, 0L), (1L, 3 * d)).toDF("user_id", "ts")
    val out = EventOps.rollingActives(ev, windowDays = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // u1's day-0 activity covers window-ends 0,1 only; day-3 covers 3,4→3
    assert(out == Map(0L -> 1L, 1L -> 1L, 3L -> 1L))
  }

  test("pitJoin: each event sees the dimension state current at its time") {
    import spark.implicits._
    // user 1: a@10 (v1), a@20 no-change, b@30 (v2), b@35 reads v2
    // user 2: two change records share t=10 (ids 5,6 — last wins: y),
    //         y@15 no-change reads v1
    val ev = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "b"),
      (1L, 35L, 4L, "b"),
      (2L, 10L, 5L, "x"), (2L, 10L, 6L, "y"), (2L, 15L, 7L, "y"))
      .toDF("user_id", "tus", "event_id", "event_type")
    val out = EventOps.pitJoin(ev)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getInt(3))))
      .toMap
    assert(out == Map(
      1L -> (("a", 1)), 2L -> (("a", 1)), 3L -> (("b", 2)), 4L -> (("b", 2)),
      5L -> (("y", 1)), 6L -> (("y", 1)), 7L -> (("y", 1))))
  }

  test("transitions: per-user ordered pairs, row-normalized probabilities") {
    import spark.implicits._
    // user 1: a->b->a ; user 2: a->c — transitions from 'a': b once,
    // c once (p = 0.5 each); from 'b': a once (p = 1.0)
    val ev = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
      (2L, 10L, 4L, "a"), (2L, 20L, 5L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = EventOps.transitions(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "c") -> ((1L, 0.5)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("transitions: ties at the same ts break on the event id") {
    import spark.implicits._
    val ev = Seq((1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"), (1L, 20L, 3L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = EventOps.transitions(ev)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "b"), ("b", "c")))
  }
}
