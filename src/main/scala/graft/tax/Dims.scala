package graft.tax

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The five jurisdiction dimension tables as small DataFrames, built from
  * [[TaxDims]] literals. All are broadcast-sized (≤ ~100 rows) by design —
  * the reference embeds them as in-process literals
  * (/root/reference/tax_engine/rates.py:63-764, compliance.py:98-164,
  * refund_analyzer.py:71-92); at cluster scale they ride along as broadcast
  * variables, never shuffled.
  *
  * Rates are `DecimalType` built from exact decimal strings — mirroring the
  * reference's `Decimal(str(rate))` (calculator.py:212) so money math is
  * exact, not float-drifted.
  */
object Dims {
  val Rate: DecimalType = DecimalType(10, 6)
  val Money: DecimalType = DecimalType(18, 2)

  private def dec(s: String, t: DecimalType) =
    lit(new java.math.BigDecimal(s)).cast(t)

  /** state_idx, state_code, state_name, base_rate, has_local_taxes,
    * max_local_rate, avg_combined_rate, notes */
  def stateRates(spark: SparkSession): DataFrame = {
    import spark.implicits._
    TaxDims.stateRates
      .toDF("state_idx", "state_code", "state_name", "base_rate_s",
        "has_local_taxes", "max_local_rate_s", "avg_combined_rate_s", "notes")
      .withColumn("base_rate", col("base_rate_s").cast(Rate))
      .withColumn("max_local_rate", col("max_local_rate_s").cast(Rate))
      .withColumn("avg_combined_rate", col("avg_combined_rate_s").cast(Rate))
      .drop("base_rate_s", "max_local_rate_s", "avg_combined_rate_s")
  }

  /** state_code, city_lc, jurisdiction, county, rate, jurisdiction_type */
  def localRates(spark: SparkSession): DataFrame = {
    import spark.implicits._
    TaxDims.localRates
      .toDF("state_code", "city_lc", "jurisdiction", "county", "rate_s",
        "jurisdiction_type")
      .withColumn("rate", col("rate_s").cast(Rate))
      .drop("rate_s")
  }

  /** (state_code, category) pairs: category is exempt in that state. */
  def stateExemptions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    TaxDims.stateExemptions.toDF("state_code", "category")
  }

  /** free-text synonym -> canonical exemption category (calculator.py:96-113). */
  def categorySynonyms(spark: SparkSession): DataFrame = {
    import spark.implicits._
    TaxDims.categorySynonyms.toDF("synonym", "category")
  }

  /** Pre-joined (state_code, synonym, category) triples for which the synonym
    * resolves to a category exempt in that state — the single broadcast lookup
    * used by the exemption CASE branch (c). */
  def exemptSynonyms(spark: SparkSession): DataFrame =
    stateExemptions(spark)
      // explicit hint: without it this dim-dim join silently degrades to a
      // sort-merge join (with exchanges) when auto-broadcast is disabled
      .join(broadcast(categorySynonyms(spark)), "category")
      .select(col("state_code").as("ex_state"), col("synonym").as("ex_synonym"),
        col("category").as("ex_category"))

  /** state_code, revenue_threshold, transaction_threshold, measurement_period */
  def nexusThresholds(spark: SparkSession): DataFrame = {
    import spark.implicits._
    TaxDims.nexusThresholds
      .toDF("state_code", "revenue_threshold_s", "transaction_threshold",
        "measurement_period")
      .withColumn("revenue_threshold", col("revenue_threshold_s").cast(Money))
      .drop("revenue_threshold_s")
  }

  def noNexusStates: Seq[String] = TaxDims.noNexusStates

  /** state_code, due_day (defaults handled with coalesce at the join). */
  def filingDueDays(spark: SparkSession): DataFrame = {
    import spark.implicits._
    TaxDims.filingDueDays.toDF("state_code", "due_day")
  }
  val DefaultDueDay: Int = TaxDims.defaultDueDay

  /** state_code, sol_years. */
  def solYears(spark: SparkSession): DataFrame = {
    import spark.implicits._
    TaxDims.solYears.toDF("state_code", "sol_years")
  }
  val DefaultSolYears: Int = TaxDims.defaultSolYears
}
