package graft

/** Regenerates the SURVEY.md §9.2 alias table from [[Bench.alias]] — the
  * [[ReadmeSync]] pattern applied to the alias ledger's doc view: the
  * table is GENERATED, never hand-edited, and BenchAliasSpec asserts
  * doc == code, so a birth alias lands by running
  * `sbt "runMain graft.SurveyAliasSync"` (the spec fails until you do).
  */
object SurveyAliasSync {
  val Header = "| alias | query | alias | query |"

  /** Pure rewrite used by main(): replace the table at `Header` with one
    * generated from `alias`. */
  def sync(survey: String, alias: Map[String, String]): String = {
    val start = survey.indexOf(Header)
    require(start >= 0, "SURVEY.md: alias table header not found")
    val end = start + survey.substring(start).split("\n", -1)
      .iterator.takeWhile(_.startsWith("|")).map(_.length + 1).sum
    val rows = alias.toSeq.map { case (q, a) => (a, "op_" + q) }.sorted
    val lines = rows.grouped(2).map {
      case Seq((a1, q1), (a2, q2)) => s"| $a1 | $q1 | $a2 | $q2 |"
      case Seq((a1, q1)) => s"| $a1 | $q1 | | |"
      case _ => ""
    }.mkString("\n")
    survey.substring(0, start) + Header + "\n|---|---|---|---|\n" +
      lines + "\n" + survey.substring(end)
  }

  def main(args: Array[String]): Unit = {
    val path = java.nio.file.Paths.get("SURVEY.md")
    val before = new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
    val after = sync(before, Bench.alias)
    if (after != before) {
      java.nio.file.Files.write(path,
        after.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"SURVEY.md: alias table regenerated (${Bench.alias.size} entries)")
    } else println("SURVEY.md: alias table already current")
  }
}
