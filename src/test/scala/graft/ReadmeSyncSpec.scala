package graft

import org.scalatest.funsuite.AnyFunSuite

/** The generator (ReadmeSync) and the detector (ReadmeCountSpec) must
  * agree on what a "count figure" is, or a figure the spec checks could
  * escape the rewrite and drift anyway. Pins (a) pattern-list identity by
  * source text, (b) the rewrite actually neutralizes every pattern the
  * detector matches, (c) idempotence. */
class ReadmeSyncSpec extends AnyFunSuite {

  test("sync rewrites every detector pattern to the target count") {
    val doc = "a 5-query suite, all 7 oracle-checked, expect 9 strict-pass, " +
      "across 11 queries, all 13 declared queries"
    val out = ReadmeSync.sync(doc, 153)
    val nums = ReadmeSync.patterns.flatMap(
      _.findAllMatchIn(out).map(_.group(1).toInt))
    assert(nums.size == 5 && nums.forall(_ == 153), s"got: $out")
  }

  test("sync is idempotent") {
    val doc = "a 5-query suite across 11 queries"
    val once = ReadmeSync.sync(doc, 42)
    assert(ReadmeSync.sync(once, 42) == once)
  }

  test("generator patterns cover the README's live figures (end-to-end)") {
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    // After running the generator, the detector's assertion must hold.
    val synced = ReadmeSync.sync(readme, SparkEntry.queries.size)
    val stale = ReadmeSync.patterns
      .flatMap(_.findAllMatchIn(synced).map(_.group(1).toInt))
      .filter(_ != SparkEntry.queries.size)
    assert(stale.isEmpty, s"figures the generator missed: $stale")
  }
}
