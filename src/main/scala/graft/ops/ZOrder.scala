package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) interleaving: map two keys onto one space-filling
  * curve value so that range-sorting by it clusters the data in BOTH
  * dimensions at once.
  *
  * Why this matters at 100 TB: parquet readers skip files (and row
  * groups) whose column min/max stats exclude the filter. A layout sorted
  * by one key gives tight stats for that key only — a filter on the other
  * key scans everything. Sorting by the interleaved z-value gives
  * every file a bounding BOX in (x, y) space, so 2-D selective filters
  * skip most files on either (or both) predicates. This is the layout
  * trick behind Delta/Iceberg `ZORDER BY`, expressed as plain Spark:
  * a pure-integer column expression + `repartitionByRange` + sorted write.
  *
  * The curve operates on a 16-bit × 16-bit grid (wider keys are masked;
  * quantize real domains into the grid first — the curve needs RELATIVE
  * position only, not exact values). All math is int64 bit ops: exact,
  * engine-portable (mirrored textually in the DuckDB oracle), and
  * codegen-friendly.
  */
object ZOrder {

  private val Masks = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Spread the low 16 bits of `c` to the even bit positions of a long:
    * the classic shift-or-mask ladder (4 steps, no loops). */
  def spread16(c: Column): Column =
    Masks.foldLeft(c.cast(LongType).bitwiseAND(lit(0xFFFFL))) {
      case (acc, (sh, mask)) =>
        acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(mask))
    }

  /** The Morton z-value of (x, y): x's bits on even positions, y's on
    * odd — a 32-bit value on the 16-bit grid. */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Scale a key with domain [0, maxVal] onto the full 16-bit grid.
    * Interleaving only works when both dimensions weigh their bits
    * equally — a raw 4-bit key interleaved against a raw 16-bit key
    * sorts effectively by the wide key alone (its high bits dominate
    * every z comparison). Integer math: exact and oracle-portable. */
  def quantize16(c: Column, maxVal: Long): Column =
    // double division then truncate: exact for any key ≤ 2^37 (product
    // stays under 2^53, IEEE division is correctly rounded to ~1e-16
    // relative, and the fractional part is either 0 or ≥ 1/maxVal — five
    // orders of magnitude above the rounding error, so the floor can
    // never land on the wrong integer
    (c.cast(LongType) * lit(65535L)).divide(lit(maxVal)).cast(LongType)

  /** Write `df` z-ordered on (x, y) — pass [[quantize16]]d expressions
    * when the domains are unbalanced: range-partition then sort by the
    * z-value so each output file covers a compact curve segment — a
    * bounding box in (x, y), which is what parquet min/max file skipping
    * prunes on for BOTH columns. The helper column is dropped before the
    * write; `files` bounds output file count (range partitioner ≈ one
    * file per partition). */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
      files: Int): Unit =
    df.withColumn("__z", zValue(x, y))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
