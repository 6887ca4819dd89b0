package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Profile.gini]]'s exact integer form against hand values. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("gini matches hand values on even, skewed, and single-holder mixtures") {
    // perfectly even: 4 groups x 10 -> G = 0
    val even = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L))
      .toDF("g", "m")
    val e = Profile.gini(even, col("g"), col("m")).collect().head
    assert(e.getAs[Long]("n_groups") == 4L)
    assert(e.getAs[Long]("total_mass") == 40L)
    assert(e.getAs[Long]("gini_num") == 0L)
    assert(e.getAs[Double]("gini") == 0.0)
    // one holder of everything: n groups, G = (n-1)/n = .75 at n = 4
    val solo = Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 40L))
      .toDF("g", "m")
    assert(Profile.gini(solo, col("g"), col("m")).collect().head
      .getAs[Double]("gini") == 0.75)
    // hand case: masses 1,2,3,4 ascending -> 2*(1+4+9+16)=60; num =
    // 60 - 5*10 = 10; den = 40 -> G = .25
    val mid = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)).toDF("g", "m")
    val r = Profile.gini(mid, col("g"), col("m")).collect().head
    assert(r.getAs[Long]("gini_num") == 10L && r.getAs[Long]("gini_den") == 40L)
    assert(r.getAs[Double]("gini") == 0.25)
    // rows aggregate into group mass first (two rows of b sum)
    val dup = Seq(("a", 1L), ("b", 1L), ("b", 1L)).toDF("g", "m")
    val d = Profile.gini(dup, col("g"), col("m")).collect().head
    assert(d.getAs[Long]("n_groups") == 2L && d.getAs[Long]("total_mass") == 3L)
    // zero total mass -> NULL gini, exact zeros elsewhere
    val z = Profile.gini(Seq(("a", 0L)).toDF("g", "m"), col("g"), col("m"))
      .collect().head
    assert(z.isNullAt(z.fieldIndex("gini")))
  }
}
