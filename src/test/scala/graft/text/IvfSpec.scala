package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("training is deterministic and produces unit-norm centroids") {
    val m1 = Ivf.train(emb, c = 8, iters = 5)
    val m2 = Ivf.train(emb, c = 8, iters = 5)
    assert(m1.centroids.map(_.toSeq) sameElements m2.centroids.map(_.toSeq))
    m1.centroids.foreach { cv =>
      val n = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x))
      assert(math.abs(n - 1.0) < 1e-3)
    }
  }

  test("every vector lands in a valid cell; cells are populated") {
    val model = Ivf.train(emb, c = 8, iters = 5)
    val cells = Ivf.assign(emb, model)
      .groupBy("ivf_cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cells.keySet.forall(c => c >= 0 && c < 8))
    assert(cells.values.sum == emb.count())
    assert(cells.size >= 4, s"degenerate clustering: $cells")
  }

  test("recall@5 vs brute force is high at nprobe=3/8 and exact at nprobe=8") {
    val model = Ivf.train(emb, c = 8, iters = 5)
    val queries = emb.filter($"vec_id" < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, 5)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf3 = Ivf.searchTopK(emb, queries, model, k = 5, nprobe = 3)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = ivf3.intersect(brute).size.toDouble / brute.size
    assert(recall > 0.5, s"recall@5 with nprobe=3: $recall")
    // probing every cell must reproduce brute force exactly
    val ivfAll = Ivf.searchTopK(emb, queries, model, k = 5, nprobe = 8)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivfAll == brute)
  }

  test("recall floors: the declared op_ann_recall values stay above their fixture baselines") {
    // explicit floors on the DECLARED recall query (fixed model, nprobe=4,
    // 12-plane LSH): a parameter change that tanks approximate-ANN recall
    // must fail here, not just shift a pinned oracle hash
    val rows = graft.SparkEntry.queries("op_ann_recall")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r =>
        r.getAs[String]("method") -> r.getAs[Double]("recall_at_5")).toMap
    assert(rows("ivf") >= 0.30,
      s"IVF recall@5 ${rows("ivf")} fell below the 0.30 floor")
    assert(rows("lsh") >= 0.10,
      s"LSH recall@5 ${rows("lsh")} fell below the 0.10 floor")
  }

  test("op_kmeans_step: sufficient statistics reproduce a driver-side Lloyd update") {
    val rows = graft.SparkEntry.queries("op_kmeans_step")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Int]("ivf_cell"), r.getAs[Int]("dim")) ->
        ((r.getAs[Long]("sum_milli"), r.getAs[Long]("n")))).toMap
    // n is the cell size: constant across every dim of a cell, and the
    // per-cell sizes sum to the corpus
    val cellN = rows.groupBy(_._1._1).map { case (c, g) =>
      val ns = g.values.map(_._2).toSet
      assert(ns.size == 1, s"cell $c has inconsistent n $ns")
      c -> ns.head
    }
    assert(cellN.values.sum == emb.count())
    // recompute one cell's dim-0 statistic directly from the raw vectors
    val model = Ivf.fixedModel(c = 16, dim = 64)
    val direct = emb.collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding").toArray
      val sims = model.centroids.map(cv =>
        cv.zip(v).foldLeft(0.0)((a, p) => a + p._1.toDouble * p._2.toDouble) /
          (math.sqrt(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x)) *
            math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))))
      val cell = sims.indexOf(sims.max)
      (cell, math.floor(v(0).toDouble * 1000).toLong)
    }
    val byCell = direct.groupBy(_._1)
    byCell.foreach { case (c, vs) =>
      assert(rows((c, 0)) == ((vs.map(_._2).sum, vs.size.toLong)),
        s"cell $c dim 0")
    }
  }

  test("lloydNext: centroid = sum/(n·1000) float-rounded; empty cells keep theirs") {
    // 2 centroids, dim 2: axis-aligned; vectors cluster on centroid 0 only
    // (cosine to (1,0) beats (0,1) for x>y>0), so centroid 1 stays put
    val init = Ivf.Model(Array(Array(1f, 0f), Array(0f, 1f)))
    val vecs = Seq(
      (0L, Array(0.9f, 0.1f)), (1L, Array(0.8f, 0.2f)))
      .toDF("vec_id", "embedding")
    val next = Ivf.lloydNext(vecs, init)
    // stats: dim0 sum = floor(900)+floor(800)... floats: 0.9f*1000 etc.
    val s0 = math.floor(0.9f.toDouble * 1000).toLong +
      math.floor(0.8f.toDouble * 1000).toLong
    val s1 = math.floor(0.1f.toDouble * 1000).toLong +
      math.floor(0.2f.toDouble * 1000).toLong
    assert(next.centroids(0)(0) == (s0.toDouble / 2000.0).toFloat)
    assert(next.centroids(0)(1) == (s1.toDouble / 2000.0).toFloat)
    assert(next.centroids(1).toSeq == Seq(0f, 1f), "empty cell must keep its centroid")
  }

  test("kmeansIterStats: iters=1 is exactly lloydStats; iters=2 re-assigns on updated centroids") {
    val model = Ivf.fixedModel(c = 16, dim = 64)
    val one = Ivf.kmeansIterStats(emb, model, iters = 1).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val base = Ivf.lloydStats(emb, model).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(one == base)
    // iteration 2 = one distributed stats pass over lloydNext's model
    val two = Ivf.kmeansIterStats(emb, model, iters = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val manual = Ivf.lloydStats(emb, Ivf.lloydNext(emb, model)).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(two == manual)
    // total mass conserved: per-cell n sums to the corpus at every iteration
    def corpusN(m: Map[(Int, Int), (Long, Long)]): Long =
      m.collect { case ((_, 0), (_, n)) => n }.sum
    assert(corpusN(two) == emb.count() && corpusN(one) == emb.count())
  }

  test("probeSweep: recall and scan volume are nondecreasing in nprobe; full probe recalls 1.0") {
    val model = Ivf.train(emb, c = 8, iters = 5)
    val queries = emb.filter($"vec_id" < 20)
    val rows = Ivf.probeSweep(emb, queries, model, k = 5,
        rungs = Seq(1, 3, 8))
      .orderBy("nprobe").collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("n_relevant"),
        r.getAs[Long]("n_hits"), r.getAs[Double]("recall"),
        r.getAs[Long]("n_scanned")))
    assert(rows.map(_._1).toSeq == Seq(1L, 3L, 8L))
    // one shared baseline across rungs
    assert(rows.map(_._2).distinct.length == 1 && rows.head._2 > 0)
    // recall and scan volume can only grow with more probed cells
    assert(rows.sliding(2).forall { case Array(a, b) =>
      b._4 >= a._4 && b._5 >= a._5 })
    // probing every cell scans the whole corpus per query and is exact
    val full = rows.last
    assert(full._4 == 1.0, s"full-probe recall: ${full._4}")
    assert(full._5 == 20L * emb.count(), s"full-probe scan: ${full._5}")
    // ratio pinned: recall = hits / relevant, one IEEE division
    rows.foreach { r =>
      assert(r._4 == r._3.toDouble / r._2.toDouble)
    }
    intercept[IllegalArgumentException] {
      Ivf.probeSweep(emb, queries, model, k = 5, rungs = Seq(0))
    }
  }
}
