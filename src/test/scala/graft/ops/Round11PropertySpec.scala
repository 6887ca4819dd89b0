package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the round-11 operators, fixed seeds (the
  * CurationPropertySpec convention): incremental semantic dedup must
  * equal from-scratch on ARBITRARY vector corpora and splits, winsorize
  * aggregates must respect their own bounds, and skew shares must sum
  * to at most 1. */
class Round11PropertySpec extends SparkSpec {
  import spark.implicits._

  private val vecGen = Gen.listOfN(4, Gen.chooseNum(-5, 5))
    .map(_.map(_.toFloat))
    // zero vectors have no cosine; the fixture generator avoids them
    .suchThat(v => v.exists(_ != 0f))

  test("incr sem dedup == from-scratch semDedup on random corpora and splits") {
    val model = graft.text.Ivf.Model(Array(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f)))
    for (seedVal <- Seq(7L, 23L)) {
      val vecs = Gen.listOfN(40, vecGen)
        .pureApply(Gen.Parameters.default, Seed(seedVal))
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      // id-monotone split: history = first 25, batch = the rest
      val (histRows, newRows) = vecs.splitAt(25)
      val hist = histRows.toDF("vec_id", "embedding")
      val batch = newRows.toDF("vec_id", "embedding")
      val path = java.nio.file.Files
        .createTempDirectory(s"graft_isd_prop_$seedVal").toString
      graft.text.IncrSemDedup.writeIndex(hist, model, path)
      val inc = graft.text.IncrSemDedup
        .dedupAgainst(spark, batch, path, model, minCos = 0.8)
        .decisions.select("vec_id", "keep")
        .as[(Long, Boolean)].collect().toMap
      val scratch = graft.text.Similarity
        .semDedup(hist.unionByName(batch), model, minCos = 0.8)
        .select("vec_id", "keep")
        .as[(Long, Boolean)].collect().toMap.filter(_._1 >= 25L)
      assert(inc == scratch, s"seed $seedVal: incremental diverged")
      assert(inc.size == 15)
    }
  }

  test("winsorized aggregates respect their own bounds on random data") {
    for (seedVal <- Seq(3L, 17L)) {
      val rows = Gen.listOfN(300,
        Gen.zip(Gen.oneOf("a", "b"), Gen.chooseNum(-1000L, 1000L)))
        .pureApply(Gen.Parameters.default, Seed(seedVal))
        .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
        .toDF("id", "grp", "v")
      val h = graft.text.Dedup.portableHash(col("id").cast("string"))
      val bounds = rows.groupBy("grp")
        .agg(graft.functions.SampleSketch(h, col("v"), 64).as("_s"))
        .select(col("grp"),
          graft.functions.SampleSketch.quantile(array_sort(col("_s")), 5).as("lo"),
          graft.functions.SampleSketch.quantile(array_sort(col("_s")), 95).as("hi"))
      val out = rows.join(broadcast(bounds), "grp")
        .groupBy("grp")
        .agg(count(lit(1)).as("n"),
          sum(greatest(col("lo"), least(col("hi"), col("v")))).as("s"),
          first("lo").as("lo"), first("hi").as("hi"))
        .collect()
      out.foreach { r =>
        val (n, s, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))
        assert(lo <= hi, s"seed $seedVal: inverted bounds")
        assert(s >= n * lo && s <= n * hi,
          s"seed $seedVal: clipped sum $s outside [${n * lo}, ${n * hi}]")
      }
    }
  }

  test("skewStats shares are positive and sum to at most 1") {
    val rows = (0 until 500).map(i => (i % 13, i.toLong)).toDF("key", "v")
    val out = Salting.skewStats(rows, "key", k = 13).collect()
    val shares = out.map(_.getDouble(2))
    assert(shares.forall(s => s > 0.0 && s <= 1.0))
    assert(math.abs(shares.sum - 1.0) < 1e-9) // k covers every key here
    assert(out.map(_.getLong(3)).distinct.toSeq == Seq(13L))
  }
}
