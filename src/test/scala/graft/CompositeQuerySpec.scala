package graft

import org.apache.spark.sql.functions._

/** Cross-validation of the composite/approximate catalog queries against
  * their exact or componentwise counterparts on real testdata — the
  * invariants that make the approximate paths trustworthy at scale. */
class CompositeQuerySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("survivors family shares ONE CC fixpoint per sweep (ccLabels identity)") {
    // components() runs its label-propagation rounds at call time, so the
    // three cluster-derived queries re-clustering independently would run
    // three identical fixpoints. The memoized frame is the proof: the
    // SAME object comes back, so the fixpoint cannot re-run.
    val a = Catalog.ccLabels(spark, sf)
    val b = Catalog.ccLabels(spark, sf)
    assert(a eq b, "ccLabels must memoize the labels frame per session+dir")
    // and the derived queries agree with each other on the clustering
    val surv = SparkEntry.queries("op_neardup_survivors")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val best = SparkEntry.queries("op_best_survivors")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(surv == best,
      "survivors and best-survivors must see the same cluster assignment")
  }

  test("incr pipeline ledger: stages gate monotonically and each class lands where designed") {
    val rows = SparkEntry.queries("op_incr_pipeline")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), Option(r.getString(4))))
    // monotone gating: published ⊆ text_keep ⊆ q_pass; split iff published
    rows.foreach { case (id, q, t, p, s) =>
      assert(!t || q, s"$id: text_keep without q_pass")
      assert(!p || t, s"$id: published without text_keep")
      assert(s.isDefined == p, s"$id: split must exist iff published")
    }
    def cls(lo: Long, hi: Long) = rows.filter(r => r._1 >= lo && r._1 < hi)
    // A (near-dup text): quality-passers exist, NONE survive text dedup
    val a = cls(1000000000L, 2000000000L)
    assert(a.exists(_._2) && a.forall(!_._3))
    // B (char-reversed): the stopword gate kills nearly all
    val b = cls(2000000000L, 3000000000L)
    assert(b.count(_._2) < b.length / 4)
    // C (token-reversed text, SAME embedding): passes text dedup, NEVER
    // publishes — the paraphrase-shaped dup only the semantic stage sees
    val c = cls(3000000000L, 4000000000L)
    assert(c.exists(_._3), "some C docs must reach the semantic stage")
    assert(c.forall(!_._4), "no C doc may survive its own source vector")
    // D (token-reversed text, fresh embedding): publishers exist
    val d = cls(4000000000L, 5000000000L)
    assert(d.exists(_._4), "class D must publish")
  }

  test("hist-quantile bucket contains the exact quantile value") {
    // op_hist_quantiles picks the $5-wide cents bucket holding the same
    // rank position op_state_quantiles resolves exactly: for every
    // (state, quantile) the exact value must fall inside [lo, lo + 500).
    val exact = SparkEntry.queries("op_state_quantiles")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val sketch = SparkEntry.queries("op_hist_quantiles")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(exact.keySet == sketch.keySet)
    exact.foreach { case (k, v) =>
      val lo = sketch(k)
      val cents = math.round(v * 100)
      assert(cents >= lo && cents < lo + 500,
        s"$k: exact $cents cents outside sketch bucket [$lo, ${lo + 500})")
    }
  }

  test("planted contamination is fully detected on testdata") {
    // op_contamination plants every 7th document (id + 5e9) as a verbatim
    // benchmark: each must hit its own original with overlap == its whole
    // shingle count (full coverage), whenever it clears the minOverlap=5
    // floor.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val planted = docs.filter(col("doc_id") % 7 === 3).count()
    val hits = SparkEntry.queries("op_contamination")(spark, sf).collect()
    val selfHits = hits.filter(r =>
      r.getAs[Long]("train_id") == r.getAs[Long]("bench_id") - 5000000000L)
    assert(selfHits.length == planted,
      s"expected all $planted planted docs to self-hit, got ${selfHits.length}")
    selfHits.foreach { r =>
      assert(r.getAs[Long]("overlap") == r.getAs[Long]("bench_n_sh"),
        s"verbatim plant must cover all its shingles: $r")
    }
  }

  test("curation pipeline agrees with composing its stages independently") {
    val piped = SparkEntry.queries("op_curation_pipeline")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    // stage-by-stage reference composition
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ok = graft.text.TextOps.qualityBucket(
      graft.text.TextOps.qualitySignals(docs, "text"))
      .filter(col("quality_bucket") === "ok")
    val survivors = ok.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .join(ok, "doc_id")
    val sampled = graft.ops.Sampling.stratified(
      survivors.select("lang", "doc_id"), Seq("lang"),
      graft.text.Dedup.portableHash(col("doc_id").cast("string")), 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(piped == sampled)

    // sample-size contract: at most 10 docs per language
    val perLang = piped.groupBy(_._1).view.mapValues(_.size)
    assert(perLang.values.forall(_ <= 10), perLang.toMap.toString)
  }

  test("curation v2: repetition filter -> dedup -> split composes as one lazy plan") {
    // The round-4 curation ops chain with the existing ones lazily:
    // repetition-filter (top-token share < 1/2) → exact dedup survivor →
    // deterministic split — no action until the final count, and every
    // stage is a declared-operator building block.
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rep = graft.text.TextOps.repetitionSignals(docs, "text")
      .filter(col("top_tok_n") * 2 < col("n_tokens"))
    val kept = docs.join(rep.select("doc_id"), "doc_id")
      .withColumn("keep_id", min("doc_id").over(
        Window.partitionBy(md5(col("text").cast("binary")))))
      .filter(col("doc_id") === col("keep_id"))
    val split = graft.ops.Sampling.assignSplit(kept,
      graft.text.Dedup.portableHash(col("doc_id").cast("string")))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split.keySet.subsetOf(Set("train", "val", "test")))
    val total = split.values.sum
    assert(total > 0 && total <= docs.count())
    // the filter bit: repetition-heavy docs (top token >= half) are gone
    val repHeavy = graft.text.TextOps.repetitionSignals(docs, "text")
      .filter(col("top_tok_n") * 2 >= col("n_tokens")).count()
    assert(total + repHeavy <= docs.count())
  }
}
