package graft

/** CLI surface pins: the fixed-date single-transaction path (no hidden
  * now() — `--as-of` threads the date through) and the `rates --category`
  * exemption listing (reference rates.py:856-862). */
class CliSpec extends SparkSpec {
  private def runCapture(args: String*): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
      Cli.run(spark, args.toArray)
    }
    bos.toString("UTF-8")
  }

  test("single-transaction calculate with --as-of is fully pinned") {
    val out = runCapture("calculate", "--amount", "100", "--state", "TX",
      "--city", "Houston", "--as-of", "2024-06-01")
    // TX base 6.25% + Houston city 2.00%
    assert(out.contains("Taxable:  $100.00"))
    assert(out.contains("State tax: $6.25"))
    assert(out.contains("Local tax: $2.00"))
    assert(out.contains("Total tax: $8.25"))
    assert(out.contains("Rate: 8.25%"))
  }

  test("rates --category resolves synonyms and lists exempting states") {
    val out = runCapture("rates", "--category", " Groceries ")
    assert(out.startsWith("States exempting 'grocery':"))
    // grocery exemptions exist in the dims and arrive sorted by code
    val states = out.trim.stripPrefix("States exempting 'grocery':").trim
      .split(", ").toSeq
    assert(states.nonEmpty && states == states.sorted)
    assert(states.forall(_.matches("[A-Z]{2}")))
  }

  test("rates --category with an unknown category reports none") {
    val out = runCapture("rates", "--category", "antigravity")
    assert(out.trim == "States exempting 'antigravity': (none)")
  }
}
