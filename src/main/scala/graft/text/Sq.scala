package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Scalar quantization (SQ8) — the SIMPLEST compressed-vector tier, beside
  * PQ's codebook compression: each dimension independently maps to an
  * unsigned byte by the corpus's per-dimension [min, max] range, so a
  * 64-dim float vector stores as 64 small ints (×4 raw, and the candidate
  * scan becomes pure INTEGER arithmetic — the practical win: a
  * quantized-domain dot product is 64 int multiplies with an exact long
  * accumulator, no float math, no rounding-order sensitivity, trivially
  * SIMD-able and, here, trivially oracle-exact). The standard engineering
  * trade every production vector store ships (FAISS's SQ8 tier): ~0.4 %
  * per-dim resolution, near-lossless top-k for real embeddings.
  *
  * Search follows the published semantics (FAISS SQ): candidates are
  * RECONSTRUCTED from their codes — x̂ᵢ = mnᵢ + qᵢ·(mxᵢ−mnᵢ)/255 — and the
  * metric (cosine here, matching the exact baseline) runs on the
  * reconstructions. A dot product taken directly on the codes does NOT
  * work: the per-dimension min offset makes the code dot an affine-shifted
  * quantity whose candidate-dependent cross terms wreck the ranking
  * (measured recall@5 ≈ 0.06 on this corpus vs ≈ 1 for reconstructions —
  * op_sq_recall is the regression pin for exactly this).
  *
  * Everything is engine-portable by construction: the trained model is
  * per-dim float min/max (exact — no arithmetic), encode and decode are
  * short trees of correctly-rounded IEEE double ops on exactly-cast
  * floats, and the cosine is the native [[graft.functions.CosineSim]]
  * loop, whose left-to-right accumulation the oracle's list_sum mirror
  * already cross-validates — so the DuckDB oracle reproduces every row.
  *
  * Scale: training is one narrow posexplode + a 64-row aggregate; the
  * 1-row model broadcasts; encode/decode are in-row map stages. Search is
  * the [[Similarity.bruteForceTopK]] shape — queries broadcast,
  * bounded-heap per-query top-k — but the corpus side STORES byte codes
  * (the ×4 win is storage and scan width; reconstruction is per-candidate
  * register math, no extra data motion). */
object Sq {

  /** Per-dimension [min, max] over the corpus as ONE broadcastable row
    * (`_mins`, `_maxs` arrays in dimension order) — trained in-plan, no
    * driver collect. */
  def trainModel(corpus: DataFrame, embCol: String = "embedding"): DataFrame =
    corpus.select(posexplode(col(embCol)).as(Seq("_d", "_x")))
      .groupBy("_d")
      .agg(min(col("_x").cast(DoubleType)).as("_mn"),
        max(col("_x").cast(DoubleType)).as("_mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("_d"), col("_mn")))),
          s => s("_mn")).as("_mins"),
        transform(array_sort(collect_list(struct(col("_d"), col("_mx")))),
          s => s("_mx")).as("_maxs"))

  /** Encode every vector against the (1-row) model: `_q` = the SQ8 code
    * array (longs 0..255; a constant dimension, mx = mn, codes to 0). */
  def encode(df: DataFrame, model: DataFrame,
      embCol: String = "embedding"): DataFrame =
    df.crossJoin(broadcast(model))
      .withColumn("_q", zip_with(col(embCol),
        zip_with(col("_mins"), col("_maxs"), (a, b) =>
          struct(a.as("mn"), b.as("mx"))),
        (x, s) => when(s("mx") === s("mn"), lit(0L))
          .otherwise(floor((x.cast(DoubleType) - s("mn")) /
            (s("mx") - s("mn")) * lit(255.0) + lit(0.5)).cast(LongType))))
      .drop("_mins", "_maxs")

  /** Reconstruct `_xr` (array<double>) from the `_q` codes and the (1-row)
    * model: x̂ᵢ = mnᵢ + qᵢ·(mxᵢ−mnᵢ)/255 (a constant dimension, mx = mn,
    * reconstructs to mn exactly — its code is 0 and its delta 0). */
  def decode(encoded: DataFrame, model: DataFrame): DataFrame =
    encoded.crossJoin(broadcast(model))
      .withColumn("_xr", zip_with(col("_q"),
        zip_with(col("_mins"), col("_maxs"), (a, b) =>
          struct(a.as("mn"), b.as("mx"))),
        (qi, s) => s("mn") + qi.cast(DoubleType) *
          ((s("mx") - s("mn")) / lit(255.0))))
      .drop("_mins", "_maxs")

  /** SQ8 top-k: per query, the k candidates whose RECONSTRUCTED vectors
    * score the highest cosine against the reconstructed query (ties by
    * neighbor id — fully deterministic). Trains on `corpus`, encodes and
    * decodes both sides with the same model. Output:
    * (q_id, rank, neighbor_id, cos). */
  def searchTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      embCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val model = trainModel(corpus, embCol)
    val enc = decode(encode(corpus, model, embCol), model)
      .select(col(idCol).as("vec_id"), col("_xr"))
    val q = decode(encode(queries, model, embCol), model)
      .select(col(idCol).as("q_id"), col("_xr").as("_qr"))
    // native codegen cosine (double-array rung): the interpreted HOF form
    // was the measured 1,922 s term in the ×100 brute scan; accumulation
    // order is identical, so every cos is bit-unchanged (SqSpec pins the
    // HOF cross-validation)
    val scored = enc.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosine(col("_xr"), col("_qr")).as("cos"))
    graft.ops.TopK.perKey(scored, Seq("q_id"),
      struct(col("cos"), -col("neighbor_id")), k)
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc,
          col("neighbor_id"))))
      .select("q_id", "rank", "neighbor_id", "cos")
  }

  /** IVF-routed SQ8 top-k — [[searchTopK]]'s SCALE PATH (the FAISS IVF-SQ
    * index): the brute quantized scan is QUADRATIC by construction, and
    * the round-16 ×100 probe priced it — 1,922 s for 8 k queries × 200 k
    * vectors where the cell-routed searches cost ~90 s — so past the
    * single-shard tier the SQ store needs the same cell routing PQ gets
    * from [[Pq.searchTopKIvf]]. Routing runs on RAW vectors (cell
    * assignment and query probing — the coarse index is built before
    * compression, FAISS's convention); candidates score as their SQ8
    * RECONSTRUCTIONS against the reconstructed query ([[searchTopK]]'s
    * published semantics, so the op_sq_recall reconstruction lesson —
    * code-domain dots wreck the ranking — carries over unchanged). With
    * nprobe = C every cell probes and the result EQUALS [[searchTopK]]'s
    * exactly (same candidate set, same (cos, id) tie-break) — SqSpec pins
    * that identity.
    *
    * Scale: the reconstructed code table is the stored index (persisted:
    * id + cell + 64 codes per vector — the ×4 width win); per query only
    * the nprobe probed cells' candidates score (the [[Ivf.searchTopK]]
    * join shape, unhinted for the same measured AQE reasons); bounded-
    * heap top-k, never a corpus sort. */
  def searchTopKIvf(corpus: DataFrame, queries: DataFrame,
      ivf: Ivf.Model, k: Int, nprobe: Int,
      embCol: String = "embedding", idCol: String = "vec_id",
      scope: graft.ops.CacheScope = graft.ops.CacheScope.Session): DataFrame = {
    val model = trainModel(corpus, embCol)
    // the cell-tagged reconstruction table IS the stored index — persist
    // (the Pq.searchTopKIvf contract: unpersisted, its encode expressions
    // re-plan into the join output path)
    val cand = scope.persist(
      decode(encode(Ivf.assign(corpus, ivf), model, embCol), model)
        .select(col("ivf_cell"), col(idCol).as("neighbor_id"),
          col("_xr").as("_nxr")))
    val qRec = decode(encode(queries, model, embCol), model)
      .select(col(idCol).as("q_id"), col("_xr").as("_qxr"))
    // probe cells from the raw query embedding; the reconstructed query
    // vector joins back on the (small, broadcast) query side
    val probes = Ivf.probeCells(queries, ivf, nprobe)
      .select("q_id", "ivf_cell")
      .join(broadcast(qRec), "q_id")
    // (cell, salt) join — the Ivf.saltedCellJoin skew fix; C keys alone
    // cap the scored stream's parallelism at C tasks
    val scored = Ivf.saltedCellJoin(probes, cand)
      .filter(col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        Similarity.cosine(col("_nxr"), col("_qxr")).as("cos"))
    graft.ops.TopK.perKey(scored, Seq("q_id"),
      struct(col("cos"), -col("neighbor_id")), k)
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc,
          col("neighbor_id"))))
      .select("q_id", "rank", "neighbor_id", "cos")
  }
}
