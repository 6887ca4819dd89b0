package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Exact two-sample Kolmogorov–Smirnov test over an integer-valued
  * column — the DISTRIBUTIONAL drift test beside the composition reads
  * (op_corpus_drift's segment shares, op_embed_drift's centroid shift):
  * D = max_v |F_a(v) − F_b(v)| detects any shape change (location,
  * spread, tails) in one number with a distribution-free critical value.
  *
  * Exactness: the statistic's argmax runs on INTEGERS — at each distinct
  * value, |cum_a·n_b − cum_b·n_a| over the common denominator n_a·n_b —
  * so the maximizing value and the numerator are engine-exact; the
  * reported statistic is one int/int IEEE division, and the α = 0.05
  * large-sample critical value c·√((n_a+n_b)/(n_a·n_b)) with c = 1.358
  * (Smirnov's asymptotic constant) uses only correctly-rounded IEEE ops
  * (÷, √, ×, textually pinned order), so even the reject BOOLEAN —
  * a comparison of two bit-identical doubles — is oracle-checkable.
  * Overflow bound: cum·n products stay ≤ n_a·n_b, exact to ~3·10⁹ rows
  * per side.
  *
  * Output (1 row): n_a, n_b, ks_num, ks_den, ks_stat, at_value (the
  * smallest value attaining the max gap), crit_05, reject_05 (NULL
  * stat/crit/reject when either side is empty). Two EMPTY inputs yield
  * ZERO rows (not an all-NULL row) — the degenerate shape both engines
  * agree on.
  *
  * NULL observations are EXCLUDED from both samples (n_a/n_b count
  * non-null values only — a NULL has no position on the line, and
  * without the explicit filter Spark's null-skipping greatest/least
  * would silently turn NULLs into clamp-ceiling mass).
  *
  * Values are CLAMPED into [minValue, maxValue] before counting (the
  * [[graft.text.TextOps.scoreAuc]] bucket-clamp trade): the clamp
  * BOUNDS the distinct-value histogram by construction — (max−min+1)
  * rows worst case, independent of corpus size — instead of trusting
  * the caller's column to be narrow. Out-of-range mass collapses onto
  * the boundary values, i.e. the statistic computed is the exact KS of
  * the clamped distributions (tails beyond the range are compared only
  * in aggregate). The default range covers token counts / log buckets /
  * byte-KB sizes; widen deliberately.
  *
  * Scale: two value-keyed count aggregates with map-side partials, one
  * full-outer merge on the value, then a TWO-PHASE cumulative sum over
  * the clamped histogram (round 18 — the previous global
  * `Window.orderBy(_v)` put the whole ≤2^20-row histogram in ONE
  * WindowExec partition, the exact `No Partition Defined` hazard this
  * codebase avoids everywhere else): rows bucket by exact integer
  * value-range arithmetic (`(_v − min) div width` — deterministic, no
  * RangePartitioner sampling), each bucket cumulates in parallel under
  * `Window.partitionBy(_pid)`, and the cross-bucket offsets + grand
  * totals come from ONE broadcast cross-join over the ≤`cumBuckets`-row
  * per-bucket totals (k² ≤ 1024 cells — driver-free prefix sums). The
  * bucket totals re-derive the histogram subtree; its aggregate
  * exchanges are identical so ReuseExchange runs the corpus scans once.
  * A 1-row finish. */
object Ks {

  def twoSample(a: DataFrame, aVal: Column,
      b: DataFrame, bVal: Column,
      minValue: Long = 0L, maxValue: Long = (1L << 20) - 1,
      cumBuckets: Int = 32): DataFrame = {
    require(minValue < maxValue,
      "Ks.twoSample: minValue must be below maxValue")
    require(cumBuckets >= 1 && cumBuckets <= 4096,
      "Ks.twoSample: cumBuckets must be in [1, 4096] (the k² offset " +
        "cross-join must stay broadcast-tiny)")
    def clamped(c: Column): Column =
      greatest(lit(minValue), least(c.cast(LongType), lit(maxValue)))
    // NULL (or non-castable) observations are EXCLUDED from both samples
    // — they have no position on the line, and Spark's greatest/least
    // SKIP nulls, so an unfiltered NULL would silently masquerade as
    // clamp-ceiling mass; n_a/n_b count non-null observations only
    val av = a.select(aVal.cast(LongType).as("_raw"))
      .filter(col("_raw").isNotNull)
      .select(clamped(col("_raw")).as("_v"))
      .groupBy("_v").agg(count(lit(1)).as("_na"))
    val bv = b.select(bVal.cast(LongType).as("_raw"))
      .filter(col("_raw").isNotNull)
      .select(clamped(col("_raw")).as("_v"))
      .groupBy("_v").agg(count(lit(1)).as("_nb"))
    // bucket id from exact integer arithmetic on the CLAMPED value —
    // deterministic (no RangePartitioner sample), range-ordered by
    // construction: bucket p holds strictly smaller values than p+1,
    // so per-bucket cumsums + an offset of all earlier buckets' mass
    // compose to the exact global cumulative
    val width = (maxValue - minValue) / cumBuckets + 1
    val merged = av.join(bv, Seq("_v"), "full_outer")
      .select(col("_v"), coalesce(col("_na"), lit(0L)).as("_na"),
        coalesce(col("_nb"), lit(0L)).as("_nb"))
      .withColumn("_pid", expr(s"(_v - (${minValue}L)) div ${width}L"))
    // phase 1: each bucket cumulates independently — a PARTITIONED
    // window, parallel across cumBuckets tasks, never a global order
    val wLoc = Window.partitionBy("_pid").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = merged
      .withColumn("_la", sum("_na").over(wLoc))
      .withColumn("_lb", sum("_nb").over(wLoc))
    // phase 2: per-bucket totals (≤ cumBuckets rows), then every
    // bucket's exclusive-prefix offset AND the grand totals from one
    // broadcast cross-join over the k² grid — prefix sums without a
    // window and without a driver collect (stays fully lazy)
    val ptot = merged.groupBy("_pid")
      .agg(sum("_na").as("_pa"), sum("_nb").as("_pb"))
    val off = ptot.select(col("_pid").as("_opid"))
      .crossJoin(broadcast(ptot.select(col("_pid").as("_q"),
        col("_pa").as("_qa"), col("_pb").as("_qb"))))
      .groupBy("_opid").agg(
        sum(when(col("_q") < col("_opid"), col("_qa")).otherwise(0L)).as("_oa"),
        sum(when(col("_q") < col("_opid"), col("_qb")).otherwise(0L)).as("_ob"),
        sum("_qa").as("_ta"), sum("_qb").as("_tb"))
    val done = local
      .join(broadcast(off), col("_pid") === col("_opid"))
      .withColumn("_ca", col("_la") + col("_oa"))
      .withColumn("_cb", col("_lb") + col("_ob"))
      .withColumn("_num", abs(col("_ca") * col("_tb") - col("_cb") * col("_ta")))
      .agg(max(struct(col("_num").as("num"), (-col("_v")).as("nv"))).as("_m"),
        max("_ta").as("n_a"), max("_tb").as("n_b"))
    val den = col("n_a") * col("n_b")
    val stat = col("ks_num").cast(DoubleType) / col("ks_den").cast(DoubleType)
    val crit = lit(1.358) * sqrt(
      (col("n_a") + col("n_b")).cast(DoubleType) / den.cast(DoubleType))
    done
      // two empty inputs: the global agg yields one all-NULL row in
      // Spark but zero histogram rows in a plain-SQL mirror — drop it so
      // both engines return the same (empty) shape
      .filter(col("n_a").isNotNull)
      .select(col("n_a"), col("n_b"), col("_m.num").as("ks_num"),
        den.as("ks_den"), (-col("_m.nv")).as("at_value"))
      .select(col("n_a"), col("n_b"), col("ks_num"), col("ks_den"),
        when(col("ks_den") > 0, stat).as("ks_stat"), col("at_value"),
        when(col("ks_den") > 0, crit).as("crit_05"),
        when(col("ks_den") > 0, stat > crit).as("reject_05"))
  }
}
