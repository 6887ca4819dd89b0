package graft.tax

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic scale-parameterized transactions fact table derived from
  * the TPC-H-ish `lineitem` testdata — the bridge between the reference's
  * 57-row CSV world and the driver's sf0.001..0.1 parquet world. Every
  * derivation is integer/decimal arithmetic (no float, no division) so the
  * DuckDB oracle reproduces values bit-for-bit; see
  * [[graft.TaxOracle.txnsCte]] for the mirrored SQL.
  *
  * At 100 TB this is a single narrow projection over the fact scan plus one
  * broadcast join (51-row state dim) — no shuffle.
  */
object SyntheticTxns {

  /** Transactions derived from `sfDir`/lineitem.parquet. Columns match the
    * reference CSV contract (cli.py:50-62) + programmatic extras. */
  def txns(spark: SparkSession, sfDir: String): DataFrame = {
    val li = graft.Catalog.fixture(spark, s"$sfDir/lineitem.parquet")
    val states = Dims.stateRates(spark).select(col("state_idx"), col("state_code"))

    val cents = (col("l_orderkey") * 97 + col("l_partkey") * 31 +
      col("l_linenumber") * 13) % 500000
    val cityPick = (col("l_partkey") + col("l_linenumber")) % 7
    val paidBp = (col("l_suppkey") + col("l_linenumber")) % 5

    li
      .withColumn("state_idx",
        ((col("l_suppkey") + col("l_partkey")) % 51).cast(IntegerType))
      .join(broadcast(states), Seq("state_idx"))
      .select(
        (col("l_orderkey") * 10 + col("l_linenumber")).cast(StringType)
          .as("transaction_id"),
        col("l_shipdate").cast(DateType).as("transaction_date"),
        (cents.cast(DecimalType(18, 0)) *
          lit(new java.math.BigDecimal("0.01"))).cast(Dims.Money).as("amount"),
        col("state_code").as("state"),
        when(col("l_linenumber") % 3 === 0, lit(null).cast(StringType))
          .otherwise(
            when(cityPick === 0, "Houston")
              .when(cityPick === 1, "Los Angeles")
              .when(cityPick === 2, "New York City")
              .when(cityPick === 3, "Springfield")
              .when(cityPick === 4, "CHICAGO")
              .when(cityPick === 5, "denver")
              .otherwise(lit(null).cast(StringType))).as("city"),
        when(col("l_partkey") % 8 === 0, "electronics")
          .when(col("l_partkey") % 8 === 1, "grocery")
          .when(col("l_partkey") % 8 === 2, " Groceries ")
          .when(col("l_partkey") % 8 === 3, "clothing")
          .when(col("l_partkey") % 8 === 4, "prescription")
          .when(col("l_partkey") % 8 === 5, "software")
          .when(col("l_partkey") % 8 === 6, "medical")
          .otherwise(lit(null).cast(StringType)).as("item_category"),
        when(col("l_orderkey") % 23 === 5,
          concat(lit("CERT-"), col("l_orderkey").cast(StringType)))
          .otherwise(lit(null).cast(StringType)).as("exemption_certificate"),
        when(col("l_orderkey") % 17 === 0, "wholesale")
          .when(col("l_orderkey") % 17 === 1, "exempt")
          .otherwise("retail").as("customer_type"),
        lit("exclusive").as("pricing_model"),
        // seeded tax_paid: a basis-point rate by row bucket — some exact,
        // some over, some under, some zero → exercises every refund branch
        round((cents.cast(DecimalType(18, 0)) *
          lit(new java.math.BigDecimal("0.01"))).cast(Dims.Money) *
          when(paidBp === 0, lit(new java.math.BigDecimal("0.0850")))
            .when(paidBp === 1, lit(new java.math.BigDecimal("0.0000")))
            .when(paidBp === 2, lit(new java.math.BigDecimal("0.0600")))
            .when(paidBp === 3, lit(new java.math.BigDecimal("0.0825")))
            .otherwise(lit(new java.math.BigDecimal("0.1000"))), 2)
          .cast(Dims.Money).as("tax_paid"))
  }
}
