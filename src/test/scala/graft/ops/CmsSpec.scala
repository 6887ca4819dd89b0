package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min calibration pins: driver-side sketch recompute, the
  * never-undercounts invariant, and the width-1 degenerate bound. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("estimates match a driver-side sketch recompute and never undercount") {
    val occurrences =
      Seq.fill(10)("alpha") ++ Seq.fill(7)("beta") ++ Seq.fill(3)("gamma") ++
        Seq("delta", "epsilon", "zeta")
    val df = occurrences.toDF("tok")
    val depth = 3; val width = 4 // tiny: collisions guaranteed
    val exact = occurrences.groupBy(identity).view.mapValues(_.size.toLong)
    // driver-side counters
    val counters = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for ((v, n) <- exact; j <- 0 until depth) {
      val b = md5_60(s"$v:cms$j") % width
      counters((j, b)) = counters.getOrElse((j, b), 0L) + n
    }
    def est(v: String): Long =
      (0 until depth).map(j => counters((j, md5_60(s"$v:cms$j") % width))).min
    val out = Cms.errorTopK(df, col("tok"), depth, width, topK = 10)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == exact.keySet.toSet)
    for ((v, (n, e, over)) <- out) {
      assert(n == exact(v))
      assert(e == est(v), s"$v: $e vs ${est(v)}")
      assert(over == e - n && over >= 0, s"$v undercounts: $e < $n")
    }
  }

  test("width 1 degenerates to the total-occurrence upper bound") {
    val df = (Seq.fill(5)("x") ++ Seq.fill(2)("y") ++ Seq("z")).toDF("tok")
    val out = Cms.errorTopK(df, col("tok"), depth = 4, width = 1, topK = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out.values.toSet == Set(8L), out.toString) // every est = N = 8
  }

  test("topK picks by count desc then value, and guards hold") {
    val df = (Seq.fill(3)("b") ++ Seq.fill(3)("a") ++ Seq("c")).toDF("tok")
    val out = Cms.errorTopK(df, col("tok"), topK = 2)
      .collect().map(_.getString(0)).toSet
    assert(out == Set("a", "b")) // the count-3 pair; c excluded
    intercept[IllegalArgumentException] {
      Cms.errorTopK(df, col("tok"), depth = 0)
    }
    intercept[IllegalArgumentException] {
      Cms.errorTopK(df, col("tok"), width = 0)
    }
    intercept[IllegalArgumentException] {
      Cms.errorTopK(df, col("tok"), topK = 0)
    }
  }

  test("decomposition: cellRows+count == the batch counters, and the composed estimate == errorTopK") {
    // the stream == batch argument for op_stream_cms: summing the narrow
    // per-row cell map reproduces errorTopK's counter table exactly
    // (sum-merge is order-insensitive), so the finisher over it must give
    // the identical calibration rows
    val occurrences =
      Seq.fill(9)("u1") ++ Seq.fill(6)("u2") ++ Seq.fill(2)("u3") ++
        Seq("u4", "u5")
    val df = occurrences.toDF("u")
    val depth = 3; val width = 4
    val counters = Cms.cellRows(df, col("u"), depth, width)
      .groupBy("_j", "_b").agg(count(lit(1)).as("_c"))
    val counts = df.groupBy(col("u").as("_v")).agg(count(lit(1)).as("_n"))
    val composed = Cms.estimateTopK(counters, counts, depth, width,
      topK = 10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val direct = Cms.errorTopK(df, col("u"), depth, width, topK = 10)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(composed == direct, s"$composed vs $direct")
    // shuffled arrival order changes nothing (order-insensitivity)
    val shuffled = new scala.util.Random(7).shuffle(occurrences).toDF("u")
    val counters2 = Cms.cellRows(shuffled, col("u"), depth, width)
      .groupBy("_j", "_b").agg(count(lit(1)).as("_c"))
    val composed2 = Cms.estimateTopK(counters2, counts, depth, width,
      topK = 10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(composed2 == direct)
  }
}
