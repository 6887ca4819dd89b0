package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench metric-line key encoding: aliases stay unique (two
  * queries must never trend under one key), every alias source is a real
  * declared query (no stale entries after a rename), and the full slim-3
  * metric line fits the driver's 2000-char stdout tail with headroom. */
class BenchAliasSpec extends AnyFunSuite {

  private val declared = SparkEntry.queries.keySet

  test("metric keys are unique across the whole catalog") {
    val keys = declared.toSeq.map(Bench.metricKey)
    val dups = keys.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"colliding metric keys: ${dups.mkString(", ")}")
  }

  test("every alias source is a declared query (no stale aliases)") {
    val stripped = declared.map(_.stripPrefix("op_"))
    val stale = Bench.alias.keySet.diff(stripped)
    assert(stale.isEmpty, s"aliases without a declared query: ${stale.mkString(", ")}")
  }

  test("aliasRenames maps dead keys to live ones (historical rekey stays valid)") {
    val live = declared.map(Bench.metricKey)
    val badTargets = Bench.aliasRenames.values.toSet.diff(live)
    assert(badTargets.isEmpty,
      s"rename targets that are not current metric keys: ${badTargets.mkString(", ")}")
    val liveOld = Bench.aliasRenames.keySet.intersect(live)
    assert(liveOld.isEmpty,
      s"rename sources that still ARE current metric keys: ${liveOld.mkString(", ")}")
  }

  test("worst-case slim-3 metric line fits the 1960-char guard with headroom") {
    // 4-digit centiseconds for every query (99.99 s each — far beyond any
    // healthy run) still has to fit, so a merely slow round cannot push
    // the line into the truncation failure mode
    val qjson = declared.toSeq.sorted
      .map(k => "\"" + Bench.metricKey(k) + "\":9999").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":9999.999,"unit":"sec",""" +
      s""""agg":"min_of_2","queries":$qjson,"sf":"sf0.1"}"""
    assert(line.length <= 1960 - 60,
      s"metric line ${line.length} chars leaves <60 headroom — extend Bench.alias")
  }
}
