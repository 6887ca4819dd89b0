package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-10 bench-headroom decision: the stdout metric line is the
  * DRIVER contract (fits the 2000-char tail, degrades via slim levels then
  * drop-cheapest), while `BENCH_FULL_LOCAL.json` — produced by
  * [[Bench.sidecarJson]] — is the full-fidelity TREND ledger (unaliased
  * names, seconds, both passes). Degrading the line must never lose
  * per-query trend data, so the sidecar format is spec-pinned. */
class BenchSidecarSpec extends AnyFunSuite {

  private val side = Bench.sidecarJson(
    total = 12.345, agg = "min_of_2", warmSec = 3.5, p1Total = 14.0,
    failed = Seq("op_bad"), sfDir = "/root/testdata/sf0.1",
    results = Map("op_tax_calc" -> 1.234, "op_ann_topk" -> 0.5),
    p1 = Map("op_tax_calc" -> 1.5, "op_ann_topk" -> 0.75))

  test("sidecar uses FULL query names (no aliases) and 3-decimal seconds") {
    assert(side.contains("\"op_tax_calc\":1.234"))
    assert(side.contains("\"op_ann_topk\":0.500"))
    assert(!side.contains("\"atk\""), "aliased key leaked into the sidecar")
  }

  test("sidecar carries both min-of-2 and pass-1 maps plus failures") {
    assert(side.contains("\"queries\":{"))
    assert(side.contains("\"pass1\":{\"op_ann_topk\":0.750"))
    assert(side.contains("\"failed\":[\"op_bad\"]"))
    assert(side.contains("\"warm_sec\":3.500"))
    // round-17 execution-convention marker: timings run each query's own
    // physical plan (toRdd), not the re-optimized (prunable) count() plan
    assert(side.contains("\"exec\":\"plan\""))
  }

  test("sidecar is valid JSON-shaped (balanced braces, sorted keys)") {
    assert(side.count(_ == '{') == side.count(_ == '}'))
    assert(side.startsWith("{\"metric\":\"total\""))
    // sorted: op_ann_topk before op_tax_calc in both maps
    val qi = side.indexOf("\"queries\":")
    assert(side.indexOf("op_ann_topk", qi) < side.indexOf("op_tax_calc", qi))
  }

  test("a full min_of_2 run never emits p2_covered (the default)") {
    assert(!side.contains("p2_covered"), side.take(200))
  }

  test("budgeted partial pass 2: sidecar and metric line both mark coverage") {
    // the round-14 degraded mode: a contended box that can't afford a full
    // second pass still carries warm min-of-2 data for the cheapest
    // p2_covered queries — and says so on BOTH artifacts, at every level
    val partial = Bench.sidecarJson(
      total = 12.345, agg = "min_of_2_partial", warmSec = 3.5, p1Total = 14.0,
      failed = Nil, sfDir = "/root/testdata/sf0.1",
      results = Map("op_tax_calc" -> 1.234, "op_ann_topk" -> 0.5),
      p1 = Map("op_tax_calc" -> 1.5, "op_ann_topk" -> 0.75), p2Covered = 1)
    assert(partial.contains("\"agg\":\"min_of_2_partial\""))
    assert(partial.contains("\"p2_covered\":1"), partial.take(250))
    val line = Bench.metricLine(
      Seq("op_tax_calc" -> 1.234, "op_ann_topk" -> 0.5), 1.734,
      "min_of_2_partial", 3.5, 14.0, Nil, "/root/testdata/sf0.1",
      p2Covered = 1)
    assert(line.contains("\"agg\":\"min_of_2_partial\",\"p2_covered\":1"),
      line.take(250))
    // coverage survives the coarse values-only rung too (2000 long-named
    // queries force the qv array)
    val many = (0 until 2000).map(i => f"op_very_long_query_name_$i%04d" -> 0.05)
    val coarse = Bench.metricLine(many, 100.0, "min_of_2_partial",
      3.5, 14.0, Nil, "/root/testdata/sf0.1", p2Covered = 1500)
    assert(coarse.contains("\"p2_covered\":1500"), coarse.take(250))
    assert(coarse.length <= 1960)
  }

  test("pass2Order visits queries SLOWEST-pass-1-first, name tiebreak") {
    // the r16 inversion: a contended partial budget must re-measure the
    // pass-1 OUTLIERS (where all the headline distortion lives), not the
    // already-fast cheap tail — each warm hit on a slow reading removes
    // the most min-of-2 error per budget-second
    val order = Bench.pass2Order(Map(
      "op_c" -> 2.0, "op_a" -> 0.5, "op_b" -> 0.5, "op_d" -> 9.0))
    assert(order == Seq("op_d", "op_c", "op_a", "op_b"))
  }

  test("contention flag: warm_sec over threshold marks BOTH artifacts") {
    // idle run: sidecar says contended:false, metric line stays clean
    assert(side.contains("\"contended\":false"), side.take(250))
    val idleLine = Bench.metricLine(
      Seq("op_tax_calc" -> 1.234), 1.234, "min_of_2", 3.5, 14.0, Nil,
      "/root/testdata/sf0.1")
    assert(!idleLine.contains("contended"), idleLine.take(250))
    // contended run (warm_sec above the pinned 28 s threshold — the r16
    // driver box read 31.9 s where builder boxes read 8-24 s): both artifacts
    // flag it, so headline readers adjudicate without judge forensics
    val busy = Bench.sidecarJson(
      total = 12.345, agg = "min_of_2_partial", warmSec = 31.9,
      p1Total = 14.0, failed = Nil, sfDir = "/root/testdata/sf0.1",
      results = Map("op_tax_calc" -> 1.234),
      p1 = Map("op_tax_calc" -> 1.5), p2Covered = 1)
    assert(busy.contains("\"contended\":true"), busy.take(250))
    val busyLine = Bench.metricLine(
      Seq("op_tax_calc" -> 1.234), 1.234, "min_of_2_partial", 31.9, 14.0,
      Nil, "/root/testdata/sf0.1", p2Covered = 1)
    assert(busyLine.contains("\"contended\":true"), busyLine.take(250))
    // the flag survives the coarse values-only rung (it rides next to agg
    // at every slim level, like p2_covered)
    val many = (0 until 2000).map(i => f"op_very_long_query_name_$i%04d" -> 0.05)
    val coarse = Bench.metricLine(many, 100.0, "min_of_2_partial",
      31.9, 14.0, Nil, "/root/testdata/sf0.1", p2Covered = 1500)
    assert(coarse.contains("\"contended\":true"), coarse.take(250))
    assert(coarse.length <= 1960)
  }

  test("p2BudgetFor: default guard, numeric override, and `full` = unbounded") {
    // default: 420 s wall minus elapsed, floored at 120 s
    assert(Bench.p2BudgetFor(100.0, None) == 320.0)
    assert(Bench.p2BudgetFor(380.0, None) == 120.0)
    // numeric override in seconds
    assert(Bench.p2BudgetFor(100.0, Some("900")) == 900.0)
    // `full` (or anything non-numeric) = run pass 2 to completion — the
    // idle-box mode whose sidecar stays round-comparable (agg min_of_2)
    assert(Bench.p2BudgetFor(100.0, Some("full")).isPosInfinity)
    assert(Bench.p2BudgetFor(100.0, Some("unbounded")).isPosInfinity)
    // "NaN" parses numerically but would make `elapsed < budget` always
    // FALSE — it must map to unbounded like any other non-numeric string
    assert(Bench.p2BudgetFor(100.0, Some("NaN")).isPosInfinity)
    // negatives clamp to an explicit zero budget (deliberate pass-2 skip)
    assert(Bench.p2BudgetFor(100.0, Some("-1")) == 0.0)
    assert(Bench.p2BudgetFor(100.0, Some("0")) == 0.0)
  }
}
