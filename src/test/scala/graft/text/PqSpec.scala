package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product-quantization specs: encode parity with a direct Scala recompute,
  * ADC score = exact dot against the RECONSTRUCTED vector, and rank-quality
  * sanity on the test embeddings. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val model = Pq.fixedModel()

  private def scalaEncode(emb: Array[Float]): Array[Int] =
    (0 until model.m).map { b =>
      val sub = emb.slice(b * model.dsub, (b + 1) * model.dsub)
      val dots = model.codebook(b).map(cw =>
        sub.zip(cw).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y })
      dots.indexOf(dots.max) // first max
    }.toArray

  test("encode matches a direct per-block argmax recompute") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val raw = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    val codes = Pq.encode(emb, model)
      .select(col("vec_id") +: (0 until 8).map(b => col(s"pq_$b")): _*)
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(r.getInt).toArray).toMap
    assert(codes.nonEmpty)
    codes.keys.take(25).foreach { id =>
      assert(codes(id).sameElements(scalaEncode(raw(id))), s"vec $id")
      assert(codes(id).forall(c => c >= 0 && c < model.ksub))
    }
  }

  test("ADC score equals the dot against the reconstructed vector") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val raw = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    val top = Pq.searchTopK(emb, emb.filter($"vec_id" === 0), model, 5)
      .select("neighbor_id", "score").as[(Long, Double)].collect()
    assert(top.length == 5)
    val q = raw(0L)
    top.foreach { case (nid, score) =>
      val codes = scalaEncode(raw(nid))
      // same accumulation order as the engine: per block left-to-right dot,
      // blocks summed left-to-right
      val expect = (0 until model.m).map { b =>
        q.slice(b * model.dsub, (b + 1) * model.dsub)
          .zip(model.codebook(b)(codes(b)))
          .foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y }
      }.reduce(_ + _)
      assert(score == expect, s"neighbor $nid")
    }
  }

  test("IVF-PQ: scores match reconstruction; candidates restricted to probed cells") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val raw = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    val ivf = Ivf.fixedModel(c = 16, dim = 64)
    val top = Pq.searchTopKIvf(emb, emb.filter($"vec_id" === 0), ivf, model,
      k = 5, nprobe = 4)
      .select("rank", "neighbor_id", "score").as[(Int, Long, Double)].collect()
    assert(top.map(_._1).sorted.sameElements(1 to 5))
    val q = raw(0L)
    top.foreach { case (_, nid, score) =>
      val codes = scalaEncode(raw(nid))
      val expect = (0 until model.m).map { b =>
        q.slice(b * model.dsub, (b + 1) * model.dsub)
          .zip(model.codebook(b)(codes(b)))
          .foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y }
      }.reduce(_ + _)
      assert(score == expect, s"neighbor $nid")
    }
    // cell pruning is real: IVF-PQ answers are a subset of full-PQ scoring
    // only when the neighbor's cell is probed — check against the plain
    // ADC ranking restricted to the probed cells
    val assignedCells = Ivf.assign(emb, ivf)
      .select("vec_id", "ivf_cell").as[(Long, Int)].collect().toMap
    val probed = Ivf.probeCells(emb.filter($"vec_id" === 0), ivf, 4)
      .select("ivf_cell").as[Int].collect().toSet
    top.foreach { case (_, nid, _) =>
      assert(probed.contains(assignedCells(nid)), s"neighbor $nid cell")
    }
  }

  test("encode rejects inputs carrying reserved pq_* columns") {
    val clash = Seq((1L, Array(1.0f), 3)).toDF("vec_id", "embedding", "pq_3")
    val e = intercept[IllegalArgumentException](Pq.encode(clash, model))
    assert(e.getMessage.contains("pq_3"))
  }
}
