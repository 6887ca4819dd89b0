package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an `Array[Float]` embedding
  * column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    O(corpus × queries) but embarrassingly parallel: queries are broadcast,
  *    the corpus is scanned once, all math in one codegen stage, and the
  *    top-k shuffle only carries k rows per query partition.
  *  - [[lshTopK]]: random-hyperplane LSH — the 100 TB path. Sign-bit
  *    signatures bucket the corpus; candidates come from a bucket equi-join
  *    (shuffle keyed on signature), so work scales with collisions, not n².
  *
  * Dot products accumulate left-to-right in double — bit-identical to a
  * sequential C loop (and to DuckDB's list_sum(list_transform(...))), which
  * makes even floating-point outputs oracle-checkable.
  */
object Similarity {

  /** Left-to-right double dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine via the native codegen expression [[graft.functions.CosineSim]]
    * — one fused loop; accumulation order identical to [[cosineHof]]. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim(a, b)

  /** Pure-HOF cosine (three interpreted array passes) — kept for
    * cross-validation of the native expression. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Exact cosine top-k: for each query vector (subset of the corpus or a
    * separate frame), the k nearest corpus vectors. Queries are broadcast;
    * ties broken by vec_id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos"))
  }

  /** Deterministic pseudo-random ±1 hyperplane component for (plane, dim):
    * parity of a splitmix-style integer mix — data-independent, seedable. */
  private def planeSign(plane: Int, dim: Column): Column = {
    val mixed = (dim + lit(plane.toLong * 1000003L)) * lit(2654435761L) % lit(2147483647L)
    when(pmod(mixed, lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))
  }

  /** Sign-bit LSH signature: nPlanes random-hyperplane dots → packed long. */
  def lshSignature(emb: Column, nPlanes: Int = 16): Column = {
    val sigBits = (0 until nPlanes).map { p =>
      val s = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, i) => x.cast(DoubleType) * planeSign(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(s >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    sigBits.reduce(_ + _)
  }

  /** LSH ANN: bucket by signature, exact cosine within buckets, top-k per
    * query. Recall < 1 by construction; `nPlanes` trades recall for
    * bucket size. */
  def lshTopK(corpus: DataFrame, k: Int, nPlanes: Int = 8): DataFrame = {
    val sig = corpus.withColumn("sig", lshSignature(col("embedding"), nPlanes))
    val l = sig.select(col("sig"), col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val r = sig.select(col("sig"), col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"))
    l.join(r, "sig")
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "neighbor_id", "cos")
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * via the LSH buckets (each unordered pair once). */
  def nearDupPairs(corpus: DataFrame, minCos: Double, nPlanes: Int = 8): DataFrame = {
    val sig = corpus.withColumn("sig", lshSignature(col("embedding"), nPlanes))
    val l = sig.select(col("sig"), col("vec_id").as("a"), col("embedding").as("a_emb"))
    val r = sig.select(col("sig"), col("vec_id").as("b"), col("embedding").as("b_emb"))
    l.join(r, "sig").filter(col("a") < col("b"))
      .withColumn("cos", cosine(col("a_emb"), col("b_emb")))
      .filter(col("cos") >= minCos)
      .select("a", "b", "cos")
  }
}
