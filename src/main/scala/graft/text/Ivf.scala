package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.CosineSim

/** IVF (inverted-file) approximate nearest neighbor — the third similarity
  * tier beside brute force (exact baseline) and sign-LSH (hash buckets):
  * spherical k-means centroids partition the corpus; a query probes only
  * the `nprobe` nearest cells.
  *
  * Scale: training samples a bounded slice to the driver (centroids are
  * C × dim floats — kilobytes); assignment and search are narrow map
  * stages over broadcast centroid literals; the only shuffle is the
  * candidate equi-join on cell id, so scanned volume drops by ~C/nprobe
  * versus brute force.
  */
object Ivf {

  case class Model(centroids: Array[Array[Float]]) {
    def c: Int = centroids.length
  }

  /** Deterministic spherical k-means: init = first `c` sampled vectors,
    * fixed Lloyd iterations, cosine assignment on normalized vectors. */
  def train(corpus: DataFrame, c: Int, iters: Int = 8,
      sampleN: Int = 2048): Model = {
    val sample = corpus.orderBy("vec_id").limit(sampleN)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.length >= c, s"need >= $c sample vectors")
    def norm(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
      if (n == 0f) v else v.map(_ / n)
    }
    val data = sample.map(norm)
    var centroids = data.take(c).map(_.clone)
    for (_ <- 0 until iters) {
      val sums = Array.fill(c)(new Array[Double](data.head.length))
      val counts = new Array[Int](c)
      data.foreach { v =>
        var best = 0; var bestDot = Double.MinValue
        var j = 0
        while (j < c) {
          var d = 0.0; var i = 0
          while (i < v.length) { d += v(i).toDouble * centroids(j)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = j }
          j += 1
        }
        counts(best) += 1
        var i = 0
        while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { j =>
        if (counts(j) == 0) centroids(j)
        else norm(sums(j).map(_.toFloat))
      }.toArray
    }
    Model(centroids)
  }

  /** Per-centroid cosine similarities as an array column. */
  private def simArray(emb: Column, model: Model): Column =
    array(model.centroids.map(cv => CosineSim(emb, typedLit(cv.toSeq))): _*)

  /** Nearest-cell id (0-based) for each vector. */
  def cellId(emb: Column, model: Model): Column =
    (array_position(simArray(emb, model), array_max(simArray(emb, model))) - 1)
      .cast("int")

  /** Corpus with its IVF cell assignment. */
  def assign(corpus: DataFrame, model: Model): DataFrame =
    corpus.withColumn("ivf_cell", cellId(col("embedding"), model))

  /** ANN top-k with `nprobe` probed cells per query: queries explode into
    * their nprobe best cells, candidates come from the cell equi-join,
    * scoring is exact cosine within candidates. */
  def searchTopK(corpus: DataFrame, queries: DataFrame, model: Model,
      k: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= model.c)
    val assigned = assign(corpus, model)
      .select(col("ivf_cell"), col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb"))
    // top-nprobe cells per query: sort (sim, idx) structs descending
    val probes = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("probe_cells",
        slice(reverse(array_sort(zip_with(
          simArray(col("q_emb"), model),
          typedLit((0 until model.c).toList),
          (s, i) => struct(s.as("sim"), i.as("cell"))))), 1, nprobe))
      .withColumn("probe", explode(col("probe_cells")))
      .select(col("q_id"), col("q_emb"), col("probe.cell").as("ivf_cell"))
    probes.join(assigned, "ivf_cell")
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("cos", CosineSim(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "neighbor_id", "cos")
  }
}
