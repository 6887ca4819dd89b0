package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tax._

/** Thin CLI mirroring the reference's subcommands (cli.py:466-529):
  *
  *   runMain graft.Cli calculate --file txns.csv
  *   runMain graft.Cli calculate --amount 500 --state TX --city Houston [--as-of 2024-06-01]
  *   runMain graft.Cli rates [--state TX | --category groceries]
  *   runMain graft.Cli compliance --file txns.csv --registered TX,CA
  *   runMain graft.Cli refund --file txns.csv [--as-of 2026-01-01] [--quick]
  *   runMain graft.Cli report --file txns.csv [--period P] [--export-json f]
  *
  * Rendering collects only aggregate/summary/display rows to the driver —
  * all computation (including display truncation) stays in Spark.
  */
object Cli {
  import tax.TextReport.{money, pct}
  private def arg(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(s"--$name")
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-tax-cli")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: SparkSession, args: Array[String]): Unit = {
    import spark.implicits._
    args.headOption match {
      case Some("calculate") => arg(args, "file") match {
        case Some(f) =>
          val taxed = TaxCalc.withTax(TaxCalc.normalize(TaxCalc.readCsv(spark, f)))
          println("Tax Calculation Results")
          println(f"${"ID"}%-14s ${"State"}%-5s ${"City"}%-16s ${"Amount"}%12s ${"Tax"}%10s ${"Rate"}%8s Exempt")
          Reports.displayResults(taxed).collect().foreach { r =>
            println(f"${r.getAs[String]("id")}%-14s ${r.getAs[String]("state")}%-5s " +
              f"${r.getAs[String]("city")}%-16s ${money(r.getAs[Double]("amount"))}%12s " +
              f"${money(r.getAs[Double]("tax"))}%10s ${pct(r.getAs[Double]("effective_rate"))}%8s " +
              (if (r.getAs[Boolean]("is_exempt")) "Y" else ""))
          }
          println()
          val b = TaxCalc.batchAgg(taxed).head()
          println(f"Transactions: ${b.getAs[Long]("transaction_count")}")
          println(f"Total taxable: $$${b.getAs[java.math.BigDecimal]("total_taxable")}")
          println(f"Total tax:     $$${b.getAs[java.math.BigDecimal]("total_tax")}")
          println(f"Exempt:        ${b.getAs[Long]("exempt_count")} ($$${b.getAs[java.math.BigDecimal]("total_exempt")})")
          println("\nPer-state breakdown:")
          TaxCalc.summaryByState(taxed).orderBy("state").collect().foreach { r =>
            println(f"  ${r.getAs[String]("state")}  n=${r.getAs[Long]("transaction_count")}%-6d tax=$$${r.getAs[java.math.BigDecimal]("tax_amount")}")
          }
          arg(args, "export-json").foreach { name =>
            Reports.writeJson(Reports.taxSummaryReport(taxed,
              periodLabel = arg(args, "period").getOrElse("")),
              s"${arg(args, "output-dir").getOrElse("reports")}/$name")
            println(s"JSON exported to $name")
          }
        case None =>
          val amount = arg(args, "amount").getOrElse(sys.error("--amount or --file required"))
          // --as-of pins the transaction date (defaults to today, mirroring
          // the reference CLI's implicit date.today()) — the only other
          // now() in the repo; everything else takes explicit as-of dates
          val asOf = arg(args, "as-of").map(java.time.LocalDate.parse)
            .getOrElse(java.time.LocalDate.now())
          val txn = Seq((
            "cli", java.sql.Date.valueOf(asOf),
            new java.math.BigDecimal(amount),
            arg(args, "state").getOrElse(sys.error("--state required")),
            arg(args, "city").orNull, arg(args, "category").orNull))
            .toDF("transaction_id", "transaction_date", "amount", "state",
              "city", "item_category")
          val r = TaxCalc.withTax(TaxCalc.normalize(txn)).head()
          println(f"Taxable:  $$${r.getAs[java.math.BigDecimal]("taxable_amount")}")
          println(f"State tax: $$${r.getAs[java.math.BigDecimal]("state_tax")}")
          println(f"Local tax: $$${r.getAs[java.math.BigDecimal]("local_tax")}")
          println(f"Total tax: $$${r.getAs[java.math.BigDecimal]("tax_amount")}")
          println(f"Rate: ${r.getAs[Double]("effective_rate") * 100}%.2f%%")
          if (r.getAs[Boolean]("is_exempt"))
            println(s"EXEMPT: ${r.getAs[String]("exemption_reason")}")
      }

      case Some("rates") =>
        val st = Dims.stateRates(spark)
        (arg(args, "category"), arg(args, "state")) match {
          case (Some(catRaw), _) =>
            // states exempting a category (rates.py:856-862); free-text
            // input resolves through the synonym map like the calculator
            val catLc = catRaw.trim.toLowerCase
            val resolved = Dims.categorySynonyms(spark)
              .filter(col("synonym") === catLc).select("category")
              .collect().headOption.map(_.getString(0)).getOrElse(catLc)
            val states = Dims.stateExemptions(spark)
              .filter(col("category") === resolved)
              .select("state_code").orderBy("state_code")
              .collect().map(_.getString(0))
            println(s"States exempting '$resolved': " +
              (if (states.isEmpty) "(none)" else states.mkString(", ")))
          case (None, Some(s)) =>
            val r = st.filter(upper(col("state_code")) === s.toUpperCase).head()
            println(s"${r.getAs[String]("state_name")} (${r.getAs[String]("state_code")})")
            println(s"  base rate:     ${r.getAs[java.math.BigDecimal]("base_rate")}")
            println(s"  avg combined:  ${r.getAs[java.math.BigDecimal]("avg_combined_rate")}")
            println(s"  local taxes:   ${r.getAs[Boolean]("has_local_taxes")}")
            Dims.localRates(spark).filter(col("state_code") === s.toUpperCase)
              .orderBy("jurisdiction").collect().foreach { lr =>
                println(s"    ${lr.getAs[String]("jurisdiction")} (${lr.getAs[String]("county")}): ${lr.getAs[java.math.BigDecimal]("rate")}")
              }
          case (None, None) =>
            // All-states summary sorted by code (rates.py:864-866 all_states;
            // cli.py:208-231): base "None" when zero, avg "-" when zero.
            println("US Sales Tax Rates - All States")
            println(f"${"State"}%-6s ${"Name"}%-22s ${"Base Rate"}%10s ${"Avg Combined"}%13s Local")
            st.orderBy("state_code").collect().foreach { r =>
              val base = r.getAs[java.math.BigDecimal]("base_rate").doubleValue
              val avg = r.getAs[java.math.BigDecimal]("avg_combined_rate").doubleValue
              println(f"${r.getAs[String]("state_code")}%-6s ${r.getAs[String]("state_name")}%-22s " +
                f"${if (base > 0) pct(base, 3) else "None"}%10s " +
                f"${if (avg > 0) pct(avg, 3) else "-"}%13s " +
                (if (r.getAs[Boolean]("has_local_taxes")) "Y" else ""))
            }
        }

      case Some("compliance") =>
        val f = arg(args, "file").getOrElse(sys.error("--file required"))
        val registered = arg(args, "registered")
          .map(_.split(",").toSeq).getOrElse(Seq.empty)
          .toDF("state_code")
        val txns = TaxCalc.normalize(TaxCalc.readCsv(spark, f))
        val nexus = Compliance.checkNexus(Compliance.stateActivity(txns))
        println("Nexus status (top by revenue pct):")
        nexus.limit(15).collect().foreach { r =>
          val flag = if (r.getAs[Boolean]("has_nexus")) "NEXUS"
            else if (r.getAs[Boolean]("approaching_threshold")) "approaching" else ""
          println(f"  ${r.getAs[String]("state")}  rev=$$${r.getAs[java.math.BigDecimal]("revenue")}  $flag")
        }
        val asOf = arg(args, "as-of").map(java.time.LocalDate.parse)
          .getOrElse(java.time.LocalDate.now())
        println("\nAlerts:")
        Compliance.alerts(Compliance.stateActivity(txns), registered, asOf)
          .collect().foreach { a =>
            println(s"  [${a.getAs[String]("severity")}] ${a.getAs[String]("message")}")
          }
        arg(args, "export-json").foreach { name =>
          Reports.writeJson(Reports.nexusReport(nexus, asOf.toString),
            s"${arg(args, "output-dir").getOrElse("reports")}/$name")
          println(s"Report exported to $name")
        }

      case Some("refund") =>
        val f = arg(args, "file").getOrElse(sys.error("--file required"))
        val asOf = arg(args, "as-of").map(java.time.LocalDate.parse)
          .getOrElse(java.time.LocalDate.now())
        val txns = TaxCalc.normalize(TaxCalc.readCsv(spark, f))
        if (args.contains("--quick")) {
          // Quick scan (cmd_refund --quick, cli.py:340-377): overpayments at
          // or above --minimum (default 0.50), id/reason truncated in-plan.
          val minimum = BigDecimal(arg(args, "minimum").getOrElse("0.50"))
          val hits = Reports.displayQuickScan(
            Refunds.quickScan(txns, asOf, minimum)).collect()
          if (hits.isEmpty) { println("No significant overpayments found."); return }
          println("Quick Scan: Overpayments Found")
          println(f"${"Transaction"}%-14s ${"State"}%-5s ${"Amount"}%10s ${"Tax Paid"}%10s ${"Tax Owed"}%10s ${"Overpayment"}%12s Reason")
          hits.foreach { r =>
            println(f"${r.getAs[String]("id")}%-14s ${r.getAs[String]("state")}%-5s " +
              f"${money(r.getAs[Double]("sale_amount"))}%10s ${money(r.getAs[Double]("tax_paid"))}%10s " +
              f"${money(r.getAs[Double]("tax_owed"))}%10s ${money(r.getAs[Double]("overpayment"))}%12s " +
              r.getAs[String]("reason"))
          }
          println(f"%nTotal overpayments: $$${money(hits.map(_.getAs[Double]("overpayment")).sum)}")
        } else {
          val over = Refunds.overpayments(txns, asOf)
          val s = Refunds.summary(over, txns.count()).head()
          println(s"Reviewed:      ${s.getAs[Long]("total_transactions_reviewed")}")
          println(s"Overpayments:  ${s.getAs[Long]("overpayment_count")}")
          println(s"Total:         $$${s.getAs[java.math.BigDecimal]("total_overpayment")}")
          println(s"Est. recovery: $$${s.getAs[java.math.BigDecimal]("estimated_recovery")} (85%)")
          println("\nClaims by state:")
          Refunds.claims(over).collect().foreach { c =>
            println(f"  ${c.getAs[String]("state_code")}  $$${c.getAs[java.math.BigDecimal]("total_refund_requested")}  (${c.getAs[Long]("transaction_count")} txns)")
          }
        }

      // Full compliance report (cmd_report, cli.py:421-463): tax summary +
      // refund analysis rendered via format_text, optional JSON/CSV export.
      case Some("report") =>
        val f = arg(args, "file").getOrElse(sys.error("--file required"))
        val asOf = arg(args, "as-of").map(java.time.LocalDate.parse)
          .getOrElse(java.time.LocalDate.now())
        val outDir = arg(args, "output-dir").getOrElse("reports")
        val txns = TaxCalc.normalize(TaxCalc.readCsv(spark, f))
        val taxed = TaxCalc.withTax(txns)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val taxReport = Reports.taxSummaryReport(taxed,
          periodLabel = arg(args, "period").getOrElse(""),
          generatedDate = asOf.toString)
        println(TextReport.formatText(taxReport))
        val over = Refunds.overpayments(txns, asOf)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val reviewed = txns.count()
        val refundRpt = Reports.refundReport(over, reviewed,
          generatedDate = asOf.toString)
        val anyOverpayment = !over.isEmpty
        if (anyOverpayment) println(TextReport.formatText(refundRpt))
        arg(args, "export-json").foreach { name =>
          Reports.writeJson(taxReport, s"$outDir/tax_$name")
          if (anyOverpayment) Reports.writeJson(refundRpt, s"$outDir/refund_$name")
          println("Reports exported.")
        }
        arg(args, "export-csv").foreach { name =>
          Reports.writeCsv(Reports.taxSummaryFlat(taxed)
            .filter(col("section") === "state").drop("section"),
            s"$outDir/tax_$name")
          Reports.exportTransactionDetails(taxed, s"$outDir/details_$name")
          println("CSV exported.")
        }
        taxed.unpersist(blocking = false)
        over.unpersist(blocking = false)

      case other =>
        System.err.println(s"unknown command: ${other.getOrElse("<none>")}")
        System.err.println("usage: calculate|rates|compliance|refund|report [options]")
    }
  }
}
