package graft

import org.apache.spark.sql.functions._

/** Contract guards for the op_sql_* front-end family (round 16): each
  * declared SQL-surface query is ONE verbatim ANSI text that BOTH engines
  * run (Catalog.sqlQuery feeds the OracleSql string to spark.sql; the
  * driver feeds the same string to DuckDB), so the guards here are
  * (a) the wiring — every op_sql_* key resolves to an oracle text and the
  * Spark side actually executes that text, (b) a LEXICAL fence — the text
  * must stay inside the common dialect subset, so a DuckDB-only or
  * Spark-only function creeping in fails the build before the driver's
  * oracle compare can, and (c) liveness — every text returns rows on the
  * smallest fixture (an empty result would pass hash-compare trivially
  * and prove nothing). */
class SqlSurfaceSpec extends SparkSpec {

  private val sqlKeys =
    Catalog.queries.keys.filter(_.startsWith("op_sql_")).toSeq.sorted

  test("family size and oracle wiring: every op_sql_* key has a verbatim oracle text") {
    // surface + 10 (round 16) + survivors + median (round 17)
    assert(sqlKeys.size == 13, sqlKeys.mkString(", "))
    sqlKeys.foreach { k =>
      assert(OracleSql.all.contains(k), s"$k has no oracle text")
    }
  }

  test("lexical fence: the texts avoid every known single-engine construct") {
    // DuckDB-only (would fail Spark analysis) and Spark-only (would fail
    // DuckDB) constructs that earlier oracle work leaned on — the exact
    // functions the mirrored-oracle queries are ALLOWED to use and the
    // verbatim family is not.
    val forbidden = Seq(
      // DuckDB-only
      "string_split", "list_", "len(", "unnest", "generate_series",
      "MATERIALIZED", "regexp_matches", "str_split", "//", "md5_number",
      "chr(", "string_agg",
      // Spark-only
      "posexplode", "lateral", "named_struct", "xxhash64", " div ",
      "aggregate(", "zip_with", "shiftrightunsigned")
    sqlKeys.foreach { k =>
      val text = OracleSql.all(k).toLowerCase
      forbidden.foreach { f =>
        assert(!text.contains(f.toLowerCase),
          s"$k uses single-engine construct '$f'")
      }
    }
  }

  test("liveness: every text runs through spark.sql and returns rows at sf0.001") {
    sqlKeys.foreach { k =>
      val n = Catalog.queries(k)(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$k returned no rows — the oracle compare would be vacuous")
    }
  }

  test("the Spark side executes the oracle string itself, not a mirror") {
    // the whole point of the family: one string, two engines — pin that
    // running the oracle text directly produces the identical result to
    // the declared query (same plan, same rows)
    Catalog.registerViews(spark, "/root/testdata/sf0.001")
    val direct = spark.sql(OracleSql.all("op_sql_exact_dedup"))
    val declared = Catalog.queries("op_sql_exact_dedup")(
      spark, "/root/testdata/sf0.001")
    assert(direct.collect().toSet == declared.collect().toSet)
  }
}
