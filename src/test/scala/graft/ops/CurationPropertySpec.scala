package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the round-4 curation/skew operators: salted
  * plans must equal their unsalted counterparts on arbitrary data, split
  * assignment must cover and never leak, resize must sample only real
  * pixels. Seeds are fixed (scalatestplus is not on the offline
  * classpath), so batches are deterministic. */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private val factGen = for {
    key <- Gen.chooseNum(0, 6) // few keys -> heavy collisions = skew
    v <- Gen.chooseNum(-100000L, 100000L)
  } yield (key, v)

  test("saltedJoin / saltedSum equal the plain join / group-by on random skewed data") {
    for (seedVal <- Seq(11L, 99L)) {
      val rows = Gen.listOfN(500, factGen)
        .pureApply(Gen.Parameters.default, Seed(seedVal))
      val fact = rows.zipWithIndex
        .map { case ((k, v), i) => (i.toLong, k, BigDecimal(v, 2)) }
        .toDF("row_id", "key", "amt")
      val dim = (0 to 4).map(k => (k, s"dim_$k")).toDF("key", "label")

      val salted = Salting.saltedJoin(fact, dim, "key", buckets = 7)
        .groupBy("label").agg(count(lit(1)).as("n"), sum("amt").as("s"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
      val plain = fact.join(dim, Seq("key"))
        .groupBy("label").agg(count(lit(1)).as("n"), sum("amt").as("s"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
      assert(salted == plain, s"seed $seedVal: salted join diverged")

      val ssum = Salting.saltedSum(fact, "key", "amt", buckets = 5)
        .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
      val psum = fact.groupBy("key").agg(sum("amt").as("sum_amt"))
        .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
      assert(ssum == psum, s"seed $seedVal: salted sum diverged")
    }
  }

  test("saltedJoin left_anti matches the plain anti join") {
    val fact = (0 to 20).map(i => (i % 9, i.toLong)).toDF("key", "v")
    val dim = Seq(0, 1, 2, 3).map(k => (k, k.toString)).toDF("key", "label")
    val salted = Salting.saltedJoin(fact, dim, "key", 4, "left_anti")
      .select("key", "v").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val plain = fact.join(dim, Seq("key"), "left_anti")
      .select("key", "v").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("assignSplit covers every row exactly once with the configured labels") {
    val df = (0 until 997).map(i => i.toLong).toDF("id")
    val hash = graft.text.Dedup.portableHash(col("id").cast("string"))
    val out = Sampling.assignSplit(df, hash,
      cuts = Seq(500 -> "a", 750 -> "b"), defaultLabel = "c")
    assert(out.count() == 997) // pure projection: no row gained or lost
    val labels = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(labels.keySet.subsetOf(Set("a", "b", "c")))
    assert(labels.values.sum == 997)
    // monotone cuts: label is a deterministic function of the hash bucket
    val leaked = out
      .withColumn("bucket", pmod(hash, lit(1000)))
      .filter(
        (col("bucket") < 500 && col("split") =!= "a") ||
        (col("bucket") >= 500 && col("bucket") < 750 && col("split") =!= "b") ||
        (col("bucket") >= 750 && col("split") =!= "c"))
      .count()
    assert(leaked == 0)
  }

  test("resizeNearest emits only pixels present in the source") {
    val gen = Gen.listOfN(48, Gen.chooseNum(0, 255))
    for (seedVal <- Seq(3L, 17L)) {
      val px = gen.pureApply(Gen.Parameters.default, Seed(seedVal)).toArray
      val src = px.toSet
      for ((ow, oh) <- Seq((1, 1), (3, 2), (8, 6), (12, 10))) {
        val r = graft.multimodal.Multimodal.resizeNearest(px, 8, 6, ow, oh)
        assert(r.length == ow * oh)
        assert(r.forall(src.contains), s"resize $ow x $oh invented a pixel")
      }
    }
  }
}
