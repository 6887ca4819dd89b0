package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked approximate string join — entity resolution's core operator:
  * match dirty strings to a clean reference within a bounded edit
  * distance, without the quadratic all-pairs comparison.
  *
  * Blocking is by LENGTH BAND: `levenshtein(a, b) ≥ |len(a) − len(b)|`,
  * so any pair within distance `maxDist` has `len div (maxDist+1)` bucket
  * ids differing by at most one — the left side fans out to its three
  * adjacent buckets and the join is a plain equi-join on the bucket id.
  * The blocking is LOSSLESS (no candidate within the distance bound is
  * ever skipped), unlike prefix/phonetic blocking schemes.
  *
  * Scale: candidate volume is Σ over buckets of |left|×|right| per
  * bucket — bounded by the length distribution, not n². For heavy hubs
  * (many same-length strings) compose with a second residual block key
  * (e.g. first token) before the verify; the verify itself uses the
  * 3-arg bounded `levenshtein(l, r, maxDist)`, which abandons a row's
  * DP early once the bound is exceeded (O(maxDist·len) per pair, not
  * O(len²)).
  */
object FuzzyJoin {

  /** All (left, right, dist ≤ maxDist) matches. Input frames must carry
    * the named string columns; output carries both plus `dist`. */
  def matches(left: DataFrame, right: DataFrame, leftCol: String,
      rightCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0)
    val w = maxDist + 1
    val lb = left.withColumn("_lb", expr(s"length(`$leftCol`) div $w"))
      .withColumn("_b", explode(array(col("_lb") - 1, col("_lb"),
        col("_lb") + 1)))
      .drop("_lb")
    val rb = right.withColumn("_b", expr(s"length(`$rightCol`) div $w"))
    val d = levenshtein(col(leftCol), col(rightCol), maxDist)
    lb.join(rb, "_b")
      .select(col(leftCol), col(rightCol), d.as("dist"))
      .filter(col("dist") >= 0) // bounded levenshtein returns -1 past the cap
  }

  /** Best match per left string: minimum distance, ties broken by the
    * lexically smallest right string — a min(struct) aggregate (partial
    * aggregation keeps one candidate per key per partition; the window
    * row_number formulation the oracle uses would sort every group). */
  def bestMatch(left: DataFrame, right: DataFrame, leftCol: String,
      rightCol: String, maxDist: Int): DataFrame =
    matches(left, right, leftCol, rightCol, maxDist)
      .groupBy(col(leftCol))
      .agg(min(struct(col("dist"), col(rightCol))).as("_best"))
      .select(col(leftCol), col(s"_best.$rightCol").as("match_name"),
        col("_best.dist").as("dist"))
}
