package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup correctness: the engine's cell-scoped drop decisions must equal
  * a driver-side brute-force mirror (same fused-loop accumulation order, so
  * the cosine threshold compare is bit-exact), and the pair work must be
  * scoped to cells — a cross-cell near-identical pair never drops. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val model = Ivf.fixedModel(c = 16, dim = 64)
  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
      s + x.toDouble * y.toDouble }
    val na = a.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble)
    val nb = b.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble)
    dot / math.sqrt(na * nb)
  }

  test("semDedup == driver-side brute-force mirror on the fixture") {
    val got = Similarity.semDedup(emb, model, minCos = 0.3)
      .select("vec_id", "ivf_cell", "keep")
      .as[(Long, Int, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    val vecs = Ivf.assign(emb, model)
      .select("vec_id", "ivf_cell", "embedding")
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("ivf_cell"),
        r.getSeq[Float](r.fieldIndex("embedding"))))
    val byCell = vecs.groupBy(_._2)
    val expect = vecs.map { case (id, cell, v) =>
      val dropped = byCell(cell).exists { case (id2, _, v2) =>
        id2 < id && cos(v2, v) >= 0.3 }
      id -> (cell, !dropped)
    }.toMap

    assert(got.size == expect.size)
    val diff = got.collect { case (k, v) if expect(k) != v => (k, v, expect(k)) }
    assert(diff.isEmpty, s"first mismatches: ${diff.take(5).toSeq}")
    assert(got.values.exists(!_._2) && got.values.exists(_._2),
      "fixture should produce both keeps and drops")
  }

  test("pair work is cell-scoped: identical vectors in different cells both survive") {
    // two hand-built corpora rows whose embeddings are IDENTICAL but whose
    // ids we place via vectors near different fixed centroids
    val c0 = (0 until 64).map(d => Ivf.fixedComponent(0, d).toFloat)
    val c1 = (0 until 64).map(d => Ivf.fixedComponent(5, d).toFloat)
    val df = Seq(
      (1L, c0), (2L, c0), // same cell, identical -> 2 drops
      (3L, c1), (4L, c1)  // same cell, identical -> 4 drops
    ).toDF("vec_id", "embedding")
    val r = Similarity.semDedup(df, model, minCos = 0.9)
      .as[(Long, Int, Boolean)].collect().map(x => x._1 -> x._3).toMap
    assert(r == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
    // and the two clusters landed in different cells (the scoping premise)
    val cells = Similarity.semDedup(df, model, minCos = 0.9)
      .as[(Long, Int, Boolean)].collect().map(x => x._1 -> x._2).toMap
    assert(cells(1L) != cells(3L),
      s"fixture vectors should land in different cells, got $cells")
  }

  test("knnGraph == driver-side within-cell mirror on the fixture") {
    val got = Similarity.knnGraph(emb, model, k = 5)
      .select("vec_id", "rank", "neighbor_id", "cos")
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)
        .map(t => (t._3, t._4)).toSeq).toMap

    val vecs = Ivf.assign(emb, model)
      .select("vec_id", "ivf_cell", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("ivf_cell"),
        r.getSeq[Float](r.fieldIndex("embedding"))))
    val byCell = vecs.groupBy(_._2)
    vecs.foreach { case (id, cell, v) =>
      val mates = byCell(cell).filter(_._1 != id)
        .map { case (id2, _, v2) => (id2, cos(v2, v)) }
        .sortBy { case (id2, c) => (-c, id2) }.take(5).toSeq
      if (mates.isEmpty) assert(!got.contains(id), s"lone vec $id")
      else {
        // the mirror's cosine accumulates in a different order than the
        // fused expression only when floats differ; compare neighbor ids
        // exactly and cosines to 1e-12
        val g = got(id)
        assert(g.map(_._1) == mates.map(_._1), s"neighbors of $id")
        g.zip(mates).foreach { case ((_, gc), (_, mc)) =>
          assert(math.abs(gc - mc) < 1e-12) }
      }
    }
    assert(got.values.forall(_.size <= 5))
    assert(got.nonEmpty)
  }
}
