package graft.functions

import graft.SparkSpec
import graft.text.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Sample-sketch specs: the kept values are exactly the k min-hash rows,
  * partitioning cannot change the sample (mergeability), hash collisions
  * keep the smallest value, and the rank extraction's integer index math
  * is exact. */
class SampleSketchSpec extends SparkSpec {
  import spark.implicits._

  test("sample is exactly the k smallest-hash rows' values") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong * 10)).toDF("id", "v")
      .select(Dedup.portableHash($"id".cast(StringType)).as("h"), $"v")
    val got = df.agg(SampleSketch($"h", $"v", 8).as("s"))
      .head().getSeq[Long](0)
    // recompute the expected sample on the driver
    def md560(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val expect = (1 to 100).map(i => md560(i.toString) -> i.toLong * 10)
      .sortBy(_._1).take(8).map(_._2)
    assert(got == expect)
  }

  test("sample is partitioning-invariant (map-side partials merge exactly)") {
    val base = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(Dedup.portableHash(concat_ws(":",
        $"l_orderkey".cast(StringType), $"l_linenumber".cast(StringType),
        $"l_partkey".cast(StringType))).as("h"),
        $"l_partkey".as("v"))
    def sample(parts: Int): Seq[Long] = base.repartition(parts)
      .agg(SampleSketch($"h", $"v", 64).as("s")).head().getSeq[Long](0)
    val one = sample(1)
    assert(one == sample(7) && one == sample(32))
    assert(one.size == 64)
  }

  test("hash collisions keep the smallest value, deterministically") {
    val df = Seq((5L, 30L), (5L, 10L), (5L, 20L), (1L, 99L), (9L, 7L))
      .toDF("h", "v")
    val got = df.agg(SampleSketch($"h", $"v", 10).as("s"))
      .head().getSeq[Long](0)
    // hash order 1, 5, 9; the three h=5 rows collapse to min value 10
    assert(got == Seq(99L, 10L, 7L))
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val agg = SampleSketch(
      org.apache.spark.sql.catalyst.expressions.Literal(0L),
      org.apache.spark.sql.catalyst.expressions.Literal(0L), 4)
    val b = agg.createAggregationBuffer()
    Seq((9L, 90L), (1L, 10L), (5L, 50L), (3L, 30L), (7L, 70L))
      .foreach { case (h, v) => b.put(h, v) }
    while (b.size > 4) b.pollLastEntry() // what trim would keep: h 1,3,5,7
    val back = agg.deserialize(agg.serialize(b))
    assert(back == b)
    import scala.jdk.CollectionConverters._
    assert(back.keySet().asScala.toSeq == Seq(1L, 3L, 5L, 7L))
  }

  test("quantile: nearest-rank integer index math on the sorted sample") {
    val df = Seq(Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L, 100L))
      .toDF("s")
    val r = df.select(
      SampleSketch.quantile($"s", 0).as("p0"),
      SampleSketch.quantile($"s", 50).as("p50"),
      SampleSketch.quantile($"s", 90).as("p90"),
      SampleSketch.quantile($"s", 100).as("p100")).head()
    // 0-based index = (10-1)*q/100: p0 -> 10, p50 -> idx 4 = 50,
    // p90 -> idx 8 = 90, p100 -> idx 9 = 100
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 50L, 90L, 100L)))
  }

  test("quantile: empty sample yields NULL, not an invalid element_at index") {
    // a group whose inputs were all NULL produces an empty sample array
    val df = Seq((Option.empty[Long], Option.empty[Long])).toDF("h", "v")
    val r = df.agg(SampleSketch($"h", $"v", 8).as("s"))
      .select(SampleSketch.quantile(array_sort($"s"), 50).as("p50")).head()
    assert(r.isNullAt(0))
  }

  test("misuse fails at analysis time: non-Long children are rejected") {
    val df = Seq((1, 2)).toDF("h", "v") // IntegerType, not LongType
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(SampleSketch($"h", $"v", 8)).collect()
    }
    assert(e.getMessage.contains("SampleSketch requires"), e.getMessage)
  }
}
