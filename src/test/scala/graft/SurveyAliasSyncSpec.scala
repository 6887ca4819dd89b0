package graft

import org.scalatest.funsuite.AnyFunSuite

/** The alias-table generator (SurveyAliasSync) mirrors ReadmeSyncSpec's
  * contract: the rewrite regenerates exactly the table the detector
  * (BenchAliasSpec's doc==code pin) checks, and is idempotent. */
class SurveyAliasSyncSpec extends AnyFunSuite {

  private val doc =
    "prose before\n\n" + SurveyAliasSync.Header + "\n|---|---|---|---|\n" +
      "| zz | op_stale_entry | yy | op_gone |\n\nprose after"

  test("sync replaces the table with one generated from the alias map") {
    val out = SurveyAliasSync.sync(doc, Map("alpha_query" -> "aq",
      "beta_query" -> "bq", "gamma_query" -> "gq"))
    assert(out.contains("| aq | op_alpha_query | bq | op_beta_query |"))
    assert(out.contains("| gq | op_gamma_query | | |")) // odd row padded
    assert(!out.contains("op_stale_entry"))
    assert(out.startsWith("prose before") && out.endsWith("prose after"))
  }

  test("sync is idempotent") {
    val m = Map("alpha_query" -> "aq", "beta_query" -> "bq")
    val once = SurveyAliasSync.sync(doc, m)
    assert(SurveyAliasSync.sync(once, m) == once)
  }
}
