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

  test("semDedupSweep: each threshold row matches an independent semDedup run") {
    import org.apache.spark.sql.functions.col
    val ths = Seq(0.2, 0.3, 0.4)
    val out = Similarity.semDedupSweep(emb, model, ths)
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val n = emb.count()
    ths.foreach { t =>
      val kept = Similarity.semDedup(emb, model, minCos = t)
        .filter(col("keep")).count()
      assert(out(t)._3 == kept, s"threshold $t kept")
      assert(out(t)._2 == n - kept, s"threshold $t dropped")
    }
    // raising the bar can only shed pairs
    assert(out(0.2)._1 >= out(0.3)._1 && out(0.3)._1 >= out(0.4)._1)
  }

  test("knnClassify: prediction is the top-5 neighbor label mode (ties -> votes desc, label asc)") {
    import org.apache.spark.sql.functions.col
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val neigh = Similarity.knnGraph(emb.select("vec_id", "embedding"),
      model, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(p => labels(p._2)).toSeq).toMap
    val got = Similarity.knnClassify(emb, model, k = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.keySet == neigh.keySet)
    neigh.foreach { case (id, ls) =>
      val (pred, votes) = ls.groupBy(identity).view.mapValues(_.size)
        .toSeq.sortBy { case (l, n) => (-n, l) }.head
      assert(got(id)._1 == pred && got(id)._2 == votes.toLong, s"vec $id")
      assert(got(id)._3 == labels(id) && got(id)._4 == (pred == labels(id)))
    }
  }

  test("embedDrift: shares and means recompute; cells sum to ~1e6 per side") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // batch = history shifted ids + a reversed slice (the ingest shape)
    val batch = emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 1000L).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
    val out = Similarity.embedDrift(emb, batch, model)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(7)))).toMap
    val nh = emb.count()
    val hc = graft.text.Ivf.assign(emb, model)
      .groupBy("ivf_cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    hc.foreach { case (cell, n) =>
      assert(out(cell)._1 == n)
      assert(out(cell)._3 == math.floor(n * 1000000.0 / nh).toLong)
      assert(out(cell)._5 == out(cell)._4 - out(cell)._3) // drift delta
    }
    // every batch/history vector lands in exactly one cell
    assert(out.values.map(_._1).sum == nh)
    assert(out.values.map(_._2).sum == batch.count())
  }
}
