package graft.tax

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Date

/** ScalaCheck property tests for the algebraic invariants (SURVEY.md §5.3):
  * generated random transactions through the real pipeline, invariants
  * checked as Spark filters (so they hold row-wise at any scale). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val states = graft.tax.TaxDims.stateRates.map(_._2) ++ Seq("ZZ", "XX")
  private val cities = Seq(null, "Houston", "Los Angeles", "Springfield",
    "new york city", "DENVER")
  private val cats = Seq(null, "grocery", "Groceries", "electronics", "rx",
    "clothing", "medical")

  private val txnGen = for {
    cents <- Gen.chooseNum(0L, 10000000L)
    st <- Gen.oneOf(states)
    city <- Gen.oneOf(cities)
    cat <- Gen.oneOf(cats)
    ct <- Gen.oneOf("retail", "retail", "retail", "wholesale", "exempt")
    pm <- Gen.oneOf("exclusive", "exclusive", "inclusive")
    paidBp <- Gen.chooseNum(0, 1500)
    day <- Gen.chooseNum(0, 3650)
  } yield (cents, st, Option(city), Option(cat), ct, pm, paidBp, day)

  test("invariants: total=taxable+tax, tax=state+local, components, exempt⇒0") {
    // scalatestplus isn't on the offline classpath; drive ScalaCheck
    // directly with fixed seeds for deterministic property batches
    for (seedVal <- Seq(42L, 7L, 2026L)) {
      val rows = Gen.listOfN(200, txnGen)
        .pureApply(Gen.Parameters.default, Seed(seedVal))
      val df = TaxCalc.normalize(rows.zipWithIndex.map { case (r, i) =>
        (s"P$i", Date.valueOf(java.time.LocalDate.of(2018, 1, 1).plusDays(r._8)),
          new java.math.BigDecimal(r._1).movePointLeft(2), r._2, r._3, r._4,
          r._5, r._6, new java.math.BigDecimal(r._1 * r._7 / 10000).movePointLeft(2))
      }.toDF("transaction_id", "transaction_date", "amount", "state", "city",
        "item_category", "customer_type", "pricing_model", "tax_paid"))
      val taxed = TaxCalc.withTax(df).cache()
      try {
        assert(taxed.filter(
          col("total_with_tax") =!= col("taxable_amount") + col("tax_amount"))
          .count() == 0, "total_with_tax = taxable + tax")
        assert(taxed.filter(
          col("tax_amount") =!= col("state_tax") + col("local_tax"))
          .count() == 0, "tax = state + local")
        assert(taxed.filter(col("is_exempt") && col("tax_amount") =!= lit(0))
          .count() == 0, "exempt rows owe zero")
        assert(taxed.filter(col("tax_amount") < 0 || col("state_tax") < 0 ||
          col("local_tax") < 0).count() == 0, "taxes non-negative")
        // overpayment emitted iff round(paid - owed) > 0
        val over = Refunds.overpayments(df, java.time.LocalDate.of(2026, 1, 1))
        val expected = taxed.filter(
          round(coalesce(col("tax_paid"), lit(0)) - col("tax_amount"), 2) > 0)
          .count()
        assert(over.count() == expected, "overpayment>0 ⇔ record emitted")
      } finally taxed.unpersist()
    }
  }
}

