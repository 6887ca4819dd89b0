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
}
