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
  }

  test("sidecar is valid JSON-shaped (balanced braces, sorted keys)") {
    assert(side.count(_ == '{') == side.count(_ == '}'))
    assert(side.startsWith("{\"metric\":\"total\""))
    // sorted: op_ann_topk before op_tax_calc in both maps
    val qi = side.indexOf("\"queries\":")
    assert(side.indexOf("op_ann_topk", qi) < side.indexOf("op_tax_calc", qi))
  }
}
