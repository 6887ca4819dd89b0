package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for incremental SEMANTIC dedup: the headline property is
  * INCREMENTAL == FROM-SCRATCH — deduping a new vector batch against the
  * persisted IVF cell store yields exactly the keep flags
  * [[Similarity.semDedup]] over (history ∪ batch) would give the batch. */
class IncrSemDedupSpec extends SparkSpec {
  import spark.implicits._

  // axis-aligned centroids: cell assignment is transparent (each vector
  // goes to the axis it leans toward), so the planted cosine geometry
  // below controls exactly which pairs meet in a cell
  private val model = Ivf.Model(Array(
    Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
    Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f)))
  private val minCos = 0.9

  private val hist = Seq(
    (1L, Seq(1f, 0f, 0f, 0f)),
    (2L, Seq(0f, 1f, 0f, 0f)),
    // near-dup of 1 (cos ≈ 0.995 — dropped historically, still stored)
    (3L, Seq(0.99f, 0.1f, 0f, 0f)))
    .toDF("vec_id", "embedding")
  private val newBatch = Seq(
    (10L, Seq(1f, 0.05f, 0f, 0f)),       // near-dup of history -> drop
    (11L, Seq(0f, 0f, 1f, 0f)),          // fresh direction -> keep
    // in-batch near-dup of 11 at 15° (cos ≈ 0.966) -> drop
    (12L, Seq(0f, 0f, 0.966f, 0.259f)),
    (13L, Seq(0f, 0f, 0f, 1f)))          // fresh direction -> keep
    .toDF("vec_id", "embedding")

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_isd_spec").toString

  test("empty store (first ingest): no NPE — fresh vectors keep, in-batch dups still drop") {
    val path = tmp()
    // a zero-row store with the standard column layout (a first ingest's
    // standing table before any delta lands)
    Ivf.assign(hist.filter(col("vec_id") < 0L), model)
      .select(col("ivf_cell"), col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(path)
    val out = IncrSemDedup.dedupAgainst(spark, newBatch, path, model, minCos)
      .decisions.select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    // no history: 10 keeps now; 12 still drops against its in-batch
    // near-dup 11
    assert(out == Map(10L -> true, 11L -> true, 12L -> false, 13L -> true))
  }

  test("incremental keep flags == from-scratch semDedup of the union, restricted to the batch") {
    val path = tmp()
    IncrSemDedup.writeIndex(hist, model, path)
    val inc = IncrSemDedup.dedupAgainst(spark, newBatch, path, model, minCos)
      .decisions.select("vec_id", "keep").as[(Long, Boolean)].collect().toMap

    val scratch = Similarity.semDedup(hist.unionByName(newBatch), model, minCos)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
      .filter(_._1 >= 10L)

    assert(inc == scratch, s"incremental $inc != from-scratch $scratch")
    assert(inc == Map(10L -> false, 11L -> true, 12L -> false, 13L -> true))
  }

  test("store delta covers EVERY batch vector (dropped vectors still witness neighborhoods)") {
    val path = tmp()
    IncrSemDedup.writeIndex(hist, model, path)
    val r = IncrSemDedup.dedupAgainst(spark, newBatch, path, model, minCos)
    assert(r.delta.select("vec_id").as[Long].collect().toSet ==
      Set(10L, 11L, 12L, 13L))
    // appending the delta then deduping a FURTHER batch against the grown
    // store still equals from-scratch: vector 20 sits 30° from the kept 11
    // (cos 0.866 < minCos) but 15° from the DROPPED 12 (cos ≈ 0.966) —
    // it must still drop, which only works because 12's embedding entered
    // the store despite being dropped
    r.delta.write.mode("append").partitionBy("ivf_cell").parquet(path)
    val batch2 = Seq((20L, Seq(0f, 0f, 0.866f, 0.5f)))
      .toDF("vec_id", "embedding")
    val d2 = IncrSemDedup.dedupAgainst(spark, batch2, path, model, minCos)
      .decisions.select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(d2 == Map(20L -> false))
  }

  test("TRAINED cells (train on batch 1, freeze): incremental == from-scratch over the trained model") {
    // the pinned retrain policy: the HISTORICAL corpus (batch 1) trains
    // the cells with one distributed Lloyd update of a fixed init, then
    // the model FREEZES — cell ids stay stable, so the standing store
    // written under the trained model is never invalidated by an ingest
    val init = Ivf.fixedModel(c = 4, dim = 4)
    val trained = Ivf.lloydNext(hist, init)
    // the update must actually move centroids off the fixed formula
    // (otherwise this test degenerates to the fixed-model one)
    assert(trained.centroids.map(_.toSeq).toSeq !=
      init.centroids.map(_.toSeq).toSeq)
    val path = tmp()
    IncrSemDedup.writeIndex(hist, trained, path)
    val inc = IncrSemDedup.dedupAgainst(spark, newBatch, path, trained, minCos)
      .decisions.select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    val scratch = Similarity.semDedup(hist.unionByName(newBatch), trained,
      minCos)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
      .filter(_._1 >= 10L)
    assert(inc == scratch, s"incremental $inc != from-scratch $scratch")
  }

  test("retention compaction: incremental over the compacted store == from-scratch over the RETAINED corpus") {
    val path = tmp()
    val dst = tmp()
    IncrSemDedup.writeIndex(hist, model, path)
    // vectors 1 and 3 leave the corpus; only 2 is retained
    val retained = Seq(2L).toDF("vec_id")
    val stats = IncrSemDedup.compactIndex(spark, path, dst, retained)
    assert(stats == IncrSemDedup.CompactStats(3L, 1L),
      s"store must shrink to the retained corpus: $stats")
    // the hive-partitioned cell layout must survive compaction (static
    // pruning depends on it)
    assert(new java.io.File(dst).listFiles()
      .exists(_.getName.startsWith("ivf_cell=")))

    val inc = IncrSemDedup.dedupAgainst(spark, newBatch, dst, model, minCos)
      .decisions.select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    // vector 10 near-dup'ed ONLY the now-removed history — novel relative
    // to the retained corpus, must now be kept
    assert(inc == Map(10L -> true, 11L -> true, 12L -> false, 13L -> true))
    // full equality against from-scratch semDedup over (retained ∪ batch)
    val retainedCorpus = hist.filter(col("vec_id") === 2L)
    val scratch = Similarity.semDedup(
      retainedCorpus.unionByName(newBatch), model, minCos)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
      .filter(_._1 >= 10L)
    assert(inc == scratch, s"incremental $inc != from-scratch $scratch")
  }

  test("id-monotonicity guard is loud: a batch id at-or-below history fails fast") {
    val path = tmp()
    IncrSemDedup.writeIndex(hist, model, path)
    val bad = Seq((2L, Seq(0.5f, 0.5f, 0f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      IncrSemDedup.dedupAgainst(spark, bad, path, model, minCos)
    }
    assert(e.getMessage.contains("smaller-id survivorship"))
  }

  test("probe plan prunes the store to the batch's cells and never shuffles it") {
    val path = tmp()
    IncrSemDedup.writeIndex(hist, model, path)
    // a batch touching ONLY cell 0: the store scan must carry a partition
    // filter on ivf_cell (static directory pruning — cells 1-3's files
    // are never read) and the batch side must broadcast
    val batch = Seq((30L, Seq(1f, 0.01f, 0f, 0f))).toDF("vec_id", "embedding")
    val r = IncrSemDedup.dedupAgainst(spark, batch, path, model, minCos)
    val plan = r.decisions.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*ivf_cell#\\d+ (=|IN)".r
      .findFirstIn(plan).isDefined, plan.take(1500))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    // the store side must never be sort-merge-shuffled: its only path into
    // the pair join is as the streamed side of a broadcast join
    assert(!plan.contains("SortMergeJoin"),
      s"store side must not shuffle through a sort-merge join\n${plan.take(1500)}")
  }
}
