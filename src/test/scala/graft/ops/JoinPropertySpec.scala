package graft.ops

import graft.SparkSpec

/** Property cross-checks: AsOfJoin and RangeJoin against naive Scala-side
  * reference implementations on seeded data dense with ties (few keys,
  * coarse timestamps) — the cases where window/bucket logic goes wrong. */
class JoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  // coarse ts in [0, 50) over 5 keys -> many exact ties
  private val leftRows = (1L to 200L).map(i =>
    (i, rng.nextInt(5).toLong, rng.nextInt(50).toLong))
  private val rightRows = (1L to 60L).map(j =>
    (rng.nextInt(5).toLong, rng.nextInt(50).toLong, j, j * 1.5))

  test("AsOfJoin matches the naive per-row maximum over eligible right rows") {
    val left = leftRows.toDF("event_id", "user_id", "ts")
    val right = rightRows.toDF("user_id", "ts", "purchase_id", "purchase_value")
    val got = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts",
      Seq("purchase_id", "purchase_value"), rightIdCol = Some("purchase_id"))
      .select("event_id", "purchase_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val expected = leftRows.map { case (id, k, t) =>
      val eligible = rightRows.filter(r => r._1 == k && r._2 <= t)
      // latest ts wins; ties on ts break to the highest right id
      id -> eligible.sortBy(r => (r._2, r._3)).lastOption.map(_._3)
    }.toMap
    assert(got == expected)
  }

  test("RangeJoin matches the naive theta join at several bucket widths") {
    val points = leftRows.toDF("event_id", "user_id", "ts")
    val intervals = rightRows.map { case (k, lo, j, _) => (j, k, lo, lo + 7L) }
      .toDF("iv_id", "user_id", "lo", "hi")
    val expected = (for {
      (id, k, t) <- leftRows
      (j, k2, lo, hi) <- rightRows.map { case (rk, rlo, rj, _) => (rj, rk, rlo, rlo + 7L) }
      if k == k2 && t >= lo && t <= hi
    } yield (id, j)).toSet
    for (width <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.pointInInterval(points, intervals, Seq("user_id"),
        "ts", "lo", "hi", width)
        .select("event_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"width=$width")
    }
  }
}
