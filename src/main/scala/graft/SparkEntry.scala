package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query — the full multi-jurisdiction tax-calc pipeline (EP1 of
    * SURVEY.md §3) over synthetic transactions at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Catalog.queries("op_tax_calc")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2 — see [[Catalog]]. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.queries
  /** DuckDB-oracle SQL per query — see [[OracleSql]]. Keys absent here get a
    * weaker rows-only check. */
  def oracleSql: Map[String, String] = OracleSql.all
}
