package graft.functions

import graft.SparkSpec
import graft.text.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** KMV sketch specs: exactness below k, partitioning-invariance (the
  * mergeability property), and estimator accuracy vs true distinct. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("below k distinct values the sketch is exact") {
    val df = (1 to 50).map(i => i % 10).toDF("v")
      .select(Dedup.portableHash($"v".cast(StringType)).as("h"))
    val r = df.agg(KmvSketch($"h", 256).as("m"))
      .select(size($"m").as("n"), KmvSketch.estimate($"m", 256).as("est"))
      .head()
    assert(r.getAs[Int]("n") == 10)
    assert(r.getAs[Double]("est") == 10.0)
  }

  test("minima are partitioning-invariant (map-side partials merge exactly)") {
    val base = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(Dedup.portableHash($"l_partkey".cast(StringType)).as("h"))
    def minima(parts: Int): Seq[Long] = base.repartition(parts)
      .agg(KmvSketch($"h", 64).as("m")).head().getSeq[Long](0)
    val one = minima(1)
    assert(one == minima(7) && one == minima(32))
    assert(one == one.sorted && one.distinct == one)
  }

  test("works as a streaming aggregate (state merges across micro-batches)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    val q = in.toDF().select($"value".as("h"))
      .agg(KmvSketch($"h", 4).as("m"))
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      in.addData(30L, 10L, 20L, 10L)
      q.processAllAvailable()
      assert(spark.table("kmv_stream").head().getSeq[Long](0) ==
        Seq(10L, 20L, 30L))
      in.addData(5L, 40L, 1L)
      q.processAllAvailable()
      // merged across batches: 4 smallest distinct of {1,5,10,20,30,40}
      assert(spark.table("kmv_stream").head().getSeq[Long](0) ==
        Seq(1L, 5L, 10L, 20L))
    } finally q.stop()
  }

  test("estimate lands near the true distinct count") {
    val base = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val truth = base.select(countDistinct($"l_partkey")).head().getLong(0)
    val est = base
      .select(Dedup.portableHash($"l_partkey".cast(StringType)).as("h"))
      .agg(KmvSketch($"h", 256).as("m"))
      .select(KmvSketch.estimate($"m", 256)).head().getDouble(0)
    // KMV relative error ~ 1/sqrt(k-1) ≈ 6.3%; allow 4 sigma
    assert(math.abs(est - truth) / truth < 0.25, s"est=$est truth=$truth")
  }

  test("grouped sketches equal the per-group recompute (groupBy mergeability)") {
    val base = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_returnflag",
        Dedup.portableHash($"l_partkey".cast(StringType)).as("h"))
    val grouped = base.repartition(13).groupBy("l_returnflag")
      .agg(KmvSketch($"h", 64).as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val flags = grouped.keySet
    assert(flags.size > 1, "fixture should have several return flags")
    flags.foreach { f =>
      val alone = base.filter($"l_returnflag" === f)
        .agg(KmvSketch($"h", 64).as("m")).head().getSeq[Long](0)
      assert(grouped(f) == alone, s"flag $f")
    }
  }
}
