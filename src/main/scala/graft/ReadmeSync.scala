package graft

/** Rewrites every query-count figure in README.md to the live
  * `SparkEntry.queries.size`, so the doc number is GENERATED, not
  * hand-edited (round-9 lesson: op_line_dups landed after the README was
  * hand-fixed to 152, turning `sbt test` red — drift was detected but not
  * prevented). The patterns here are exactly the ones `ReadmeCountSpec`
  * checks; run `sbt "runMain graft.ReadmeSync"` after adding a query and
  * the spec can no longer fail on count drift. Idempotent; prints whether
  * the file changed.
  */
object ReadmeSync {
  /** The count-bearing phrases. Each regex has one capture group around
    * the digits; the surrounding text is preserved verbatim. Kept in sync
    * with ReadmeCountSpec's pattern list by `ReadmeSyncSpec`. */
  val patterns: Seq[scala.util.matching.Regex] = Seq(
    "(\\d+)-query".r,
    "all (\\d+) oracle-checked".r,
    "expect (\\d+) strict-pass".r,
    "across (\\d+) queries".r,
    "all (\\d+) declared queries".r)

  /** Pure rewrite used by both main() and the spec. */
  def sync(readme: String, n: Int): String =
    patterns.foldLeft(readme) { (acc, re) =>
      re.replaceAllIn(acc, m => {
        val full = m.matched
        val s = m.start(1) - m.start
        val e = m.end(1) - m.start
        scala.util.matching.Regex.quoteReplacement(
          full.substring(0, s) + n.toString + full.substring(e))
      })
    }

  def main(args: Array[String]): Unit = {
    val path = java.nio.file.Paths.get("README.md")
    val before = new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
    val after = sync(before, SparkEntry.queries.size)
    if (after != before) {
      java.nio.file.Files.write(path,
        after.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"README.md: query counts rewritten to ${SparkEntry.queries.size}")
    } else println(s"README.md: already at ${SparkEntry.queries.size}")
  }
}
