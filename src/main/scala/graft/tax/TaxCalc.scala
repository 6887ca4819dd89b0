package graft.tax

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The per-transaction tax computation, re-expressed as one reusable lazy
  * column-expression block over a transactions DataFrame.
  *
  * Semantics mirror the reference's `TaxCalculator.calculate`
  * (/root/reference/tax_engine/calculator.py:157-256) exactly, including the
  * observable branch precedence (unknown-state → no-tax-state → customer-type
  * → certificate → category exemption), the average-local-rate fallback
  * (calculator.py:214-224), tax-inclusive back-out (calculator.py:229-232),
  * and HALF_UP cents rounding applied per component before summing
  * (calculator.py:236-238). Architecture is Spark-first: the reference's
  * dict lookups become broadcast hash joins, its if/elif chains become a
  * single CASE expression tree, and the whole thing stays inside
  * whole-stage codegen — no UDFs.
  */
object TaxCalc {
  import Dims.{Money, Rate}

  /** Input contract (CSV columns per /root/reference/cli.py:50-62 +
    * README.md:149-161); programmatic-only extras default here the same way
    * `Transaction` defaults them (calculator.py:36-40). */
  val requiredCols: Seq[String] = Seq("transaction_id", "transaction_date",
    "amount", "state", "city", "item_category")

  /** Adds any missing optional columns with their reference defaults and
    * normalizes: state upper-cased, empty strings → NULL (cli.py:57-59). */
  def normalize(txns: DataFrame): DataFrame = {
    var df = txns
    if (!df.columns.contains("city")) df = df.withColumn("city", lit(null).cast(StringType))
    if (!df.columns.contains("item_category")) df = df.withColumn("item_category", lit(null).cast(StringType))
    if (!df.columns.contains("exemption_certificate")) df = df.withColumn("exemption_certificate", lit(null).cast(StringType))
    if (!df.columns.contains("customer_type")) df = df.withColumn("customer_type", lit("retail"))
    if (!df.columns.contains("pricing_model")) df = df.withColumn("pricing_model", lit("exclusive"))
    if (!df.columns.contains("tax_paid")) df = df.withColumn("tax_paid", lit(null).cast(Money))
    df.withColumn("state", upper(trim(col("state"))))
      .withColumn("city", nullif(trim(col("city")), lit("")))
      .withColumn("item_category", nullif(trim(col("item_category")), lit("")))
      .withColumn("amount", col("amount").cast(Money))
  }

  /** HALF_UP cents rounding — Spark's `round` on DecimalType is HALF_UP,
    * matching the reference's quantize(0.01, ROUND_HALF_UP)
    * (calculator.py:116-118). Cast back to Money to keep a stable scale. */
  private def roundMoney(c: Column): Column = round(c, 2).cast(Money)

  /** CSV loader with the reference's permissive bad-row behavior
    * (cli.py:63-66): malformed rows are dropped, not failed. */
  def readCsv(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("transaction_id", StringType),
      StructField("transaction_date", DateType),
      StructField("amount", Money),
      StructField("state", StringType),
      StructField("city", StringType),
      StructField("item_category", StringType),
      StructField("tax_paid", Money),
      StructField("_corrupt", StringType)))
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema)
      .csv(path)
      .filter(col("_corrupt").isNull && col("amount").isNotNull &&
        col("state").isNotNull && col("transaction_date").isNotNull)
      .drop("_corrupt")
  }

  /** The tax expression block. Input: normalized transactions (see
    * [[normalize]]). Output: input columns + `taxable_amount, state_tax,
    * local_tax, tax_amount, effective_rate, is_exempt, exemption_reason,
    * warnings, total_with_tax` — the `TaxResult` fields (calculator.py:60-78).
    *
    * All three dimension joins are broadcast (≤ 100-row dims): at 100 TB of
    * facts this plan has zero shuffles — scan → 3×BroadcastHashJoin →
    * projection, one codegen stage.
    */
  def withTax(txns: DataFrame): DataFrame = {
    val spark = txns.sparkSession
    val states = Dims.stateRates(spark)
      .select(col("state_code").as("st_code"), col("state_name").as("st_name"),
        col("base_rate").as("st_base"), col("has_local_taxes").as("st_has_local"),
        col("avg_combined_rate").as("st_avg"))
    val locals = Dims.localRates(spark)
      .select(col("state_code").as("lr_state"), col("city_lc").as("lr_city"),
        col("rate").as("lr_rate"))
    val exempt = Dims.exemptSynonyms(spark)

    val joined = txns
      .join(broadcast(states), txns("state") === states("st_code"), "left")
      .join(broadcast(locals),
        col("state") === col("lr_state") && lower(col("city")) === col("lr_city"),
        "left")
      .join(broadcast(exempt),
        col("state") === col("ex_state") &&
          lower(col("item_category")) === col("ex_synonym"),
        "left")

    val unknownState = col("st_code").isNull
    val noTaxState = col("st_base") === lit(BigDecimal(0)).cast(Rate) && !col("st_has_local")

    // Exemption resolution, first-match-wins (calculator.py:132-155).
    val custExempt = col("customer_type").isin("wholesale", "exempt")
    val certExempt = col("exemption_certificate").isNotNull &&
      col("exemption_certificate") =!= ""
    val catExempt = col("ex_category").isNotNull
    val exemptReason =
      when(unknownState, lit(""))  // unknown state wins over all (calculator.py:164-178)
        .when(noTaxState, concat(col("st_name"), lit(" has no sales tax")))
        .when(custExempt, concat(lit("Customer type: "), col("customer_type")))
        .when(certExempt, concat(lit("Exemption cert: "), col("exemption_certificate")))
        .when(catExempt, concat(col("state"), lit(" exempts "), col("ex_category")))
        .otherwise(lit(""))
    val isExempt = !unknownState && (noTaxState || custExempt || certExempt || catExempt)

    // Rate resolution with the average-local-portion fallback
    // (calculator.py:211-224): matched city rate, else avg_combined − base
    // floored at 0 when the state has local taxes, else 0.
    val zeroRate = lit(BigDecimal(0)).cast(Rate)
    val avgLocal = greatest(col("st_avg") - col("st_base"), zeroRate)
    val localRate =
      when(col("lr_rate").isNotNull, col("lr_rate"))
        .when(col("st_has_local"), avgLocal)
        .otherwise(zeroRate)
    val stateRate = col("st_base")
    val combinedRate = (stateRate + localRate).cast(Rate)

    val taxed = !unknownState && !isExempt

    // Tax-inclusive back-out: taxable = round(amount / (1 + rate), 2)
    // (calculator.py:229-232); otherwise taxable = amount.
    val backout = roundMoney(col("amount").cast(DecimalType(28, 10)) /
      (lit(BigDecimal(1)).cast(Rate) + combinedRate))
    val zeroMoney = lit(BigDecimal(0)).cast(Money)

    val warnings =
      when(unknownState, array(concat(lit("Unknown state code: "), col("state"))))
        .when(col("_taxed") && col("city").isNull && col("st_has_local"),
          array(concat(lit("No city specified for "), col("state"),
            lit("; used average local rate"))))
        .otherwise(array().cast(ArrayType(StringType, containsNull = false)))

    // STAGED projections (round 18): each expensive decimal subtree is
    // materialized ONCE behind an alias, and every later stage references
    // the ATTRIBUTE, never a copy of the tree. The one-big-projection
    // form evaluated the back-out division + the per-component HALF_UP
    // roundings up to ~8x per row (taxable appears in state_tax,
    // local_tax, tax_amount = their sum, and total_with_tax re-inlines
    // all three) — codegen's subexpression elimination can NOT rescue it
    // because the shared subtrees sit under CASE WHEN branches, which CSE
    // skips (conditional evaluation). CollapseProject keeps these
    // boundaries: each aliased stage output is referenced by 2+ non-cheap
    // consumers downstream, exactly the guard that blocks inlining.
    // Measured on op_incl_backout (600 k rows, every row inclusive):
    // 7.5 s -> 1.4 s warm. Still one codegen stage, still zero shuffles.
    val staged = joined
      .withColumn("is_exempt", isExempt)
      .withColumn("exemption_reason", exemptReason)
      .withColumn("_taxed", taxed)
      .withColumn("_srate", stateRate)
      .withColumn("_lrate", localRate)
      .withColumn("_crate", combinedRate)
      .withColumn("taxable_amount",
        when(col("_taxed") && col("pricing_model") === "inclusive", backout)
          .otherwise(col("amount")).cast(Money))
      // components rounded separately, then summed (calculator.py:236-238)
      // — round-of-sum would differ on .005 splits and is observable
      .withColumn("state_tax", when(col("_taxed"),
        roundMoney(col("taxable_amount") * col("_srate"))).otherwise(zeroMoney))
      .withColumn("local_tax", when(col("_taxed"),
        roundMoney(col("taxable_amount") * col("_lrate"))).otherwise(zeroMoney))
      .withColumn("tax_amount",
        (col("state_tax") + col("local_tax")).cast(Money))
      .withColumn("state_rate",
        when(col("_taxed"), col("_srate")).otherwise(zeroRate))
      .withColumn("local_rate",
        when(col("_taxed"), col("_lrate")).otherwise(zeroRate))
      .withColumn("effective_rate",
        when(col("_taxed"), col("_crate").cast(DoubleType)).otherwise(lit(0.0)))
      .withColumn("warnings", warnings)
      .withColumn("total_with_tax",
        (col("taxable_amount") + col("tax_amount")).cast(Money))

    // restore the published column order (inputs, then the TaxResult
    // fields in their historical positions) and drop dims + internals
    val resultCols = Seq("is_exempt", "exemption_reason", "state_rate",
      "local_rate", "taxable_amount", "state_tax", "local_tax",
      "tax_amount", "effective_rate", "warnings", "total_with_tax")
    staged.select((txns.columns.toSeq ++ resultCols).map(col): _*)
  }

  /** Batch aggregation (calculator.py:258-303): global totals + exempt
    * conditionals. One hash-aggregate pass, map-side partials at scale. */
  def batchAgg(taxed: DataFrame): DataFrame =
    taxed.agg(
      sum("taxable_amount").cast(Money).as("total_taxable"),
      sum("tax_amount").cast(Money).as("total_tax"),
      coalesce(sum(when(col("is_exempt"), col("taxable_amount"))), lit(BigDecimal(0)))
        .cast(Money).as("total_exempt"),
      count(lit(1)).as("transaction_count"),
      count(when(col("is_exempt"), 1)).as("exempt_count"))

  /** Per-state tax breakdown (calculator.py:285-288). */
  def stateBreakdown(taxed: DataFrame): DataFrame =
    taxed.groupBy("state")
      .agg(sum("tax_amount").cast(Money).as("state_total_tax"))

  /** Per-state summary rollup (report_generator.py:83-130): counts, taxable,
    * tax, exempt amount, effective rate with zero-guard. */
  def summaryByState(taxed: DataFrame): DataFrame =
    taxed.groupBy("state").agg(
      count(lit(1)).as("transaction_count"),
      sum("taxable_amount").cast(Money).as("taxable_amount"),
      sum("tax_amount").cast(Money).as("tax_amount"),
      coalesce(sum(when(col("is_exempt"), col("taxable_amount"))), lit(BigDecimal(0)))
        .cast(Money).as("exempt_amount"),
      count(when(col("is_exempt"), 1)).as("exempt_count"))
    .withColumn("effective_rate",
      when(col("taxable_amount") > 0,
        (col("tax_amount").cast(DoubleType) / col("taxable_amount").cast(DoubleType)))
        .otherwise(lit(0.0)))

  /** Use tax on out-of-state purchases (calculator.py:305-345): destination
    * tax minus credit for tax already paid, floored at zero, re-rounded.
    * Input: purchases(amount, state, city, tax_already_paid). `asOf` stamps
    * the synthetic transaction date — an explicit parameter (never
    * current_date()) per the repo's pinned-as-of determinism rule. */
  def useTax(purchases: DataFrame,
      asOf: java.time.LocalDate = java.time.LocalDate.of(2024, 1, 1)): DataFrame = {
    val base = withTax(normalize(
      purchases.withColumn("transaction_id", lit("use-tax-calc"))
        .withColumn("transaction_date", lit(java.sql.Date.valueOf(asOf)))
        .withColumn("item_category", lit(null).cast(StringType))))
    val credit = least(col("tax_already_paid").cast(Money), col("tax_amount"))
    base
      .withColumn("credit", credit)
      .withColumn("use_tax", roundMoney(col("tax_amount") - credit))
      .withColumn("warnings",
        when(col("credit") > 0,
          array(concat(lit("Credit applied for $"),
            format_number(col("credit"), 2), lit(" tax already paid"))))
          .otherwise(array().cast(ArrayType(StringType, containsNull = false))))
  }
}
