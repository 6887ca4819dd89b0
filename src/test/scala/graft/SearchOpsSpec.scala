package graft

import org.apache.spark.sql.functions._
import graft.ops.{FuzzyJoin, Profile}
import graft.text.Bm25

class SearchOpsSpec extends SparkSpec {

  test("profile: nulls, cardinality, numeric and lexical ranges per column") {
    import spark.implicits._
    val df = Seq((1L, Some(2.5), Some("b")), (2L, None, Some("a")),
      (3L, Some(7.5), None)).toDF("id", "x", "s")
    val out = Profile.profile(df)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("id").getLong(1) == 0 && out("id").getLong(2) == 3)
    assert(out("x").getLong(1) == 1 && out("x").getLong(2) == 2)
    assert(out("x").getDouble(3) == 2.5 && out("x").getDouble(4) == 7.5)
    assert(out("s").getString(5) == "a" && out("s").getString(6) == "b")
    assert(out("id").isNullAt(5) && out("x").isNullAt(6))
  }

  test("bm25: tf counting, df/idf monotonicity, and length normalization") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cats like cats"),     // tf(cats)=2, dl=3
      (2L, "cats sleep a lot more than dogs do here"), // tf(cats)=1, dl=9
      (3L, "dogs bark"),          // rare term
      (4L, "nothing relevant"))
      .toDF("doc_id", "text")
    val out = Bm25.score(docs, Seq("cats", "dogs"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // doc 4 matches nothing
    assert(out(1L)._2 == 2 && out(2L)._2 == 1)
    // higher tf in a shorter doc must outrank lower tf in a longer doc
    assert(out(1L)._4 > out(2L)._4)
    // 'dogs' (df=2) contributes less idf than a doc would get from the
    // rarer configuration — sanity: doc 3 (tf_dogs=1, tiny dl) scores > 0
    assert(out(3L)._4 > 0)
  }

  test("fuzzyJoin: length-band blocking finds all matches a cross join finds") {
    import spark.implicits._
    val clean = Seq("small ring", "red widget", "blue bolt").toDF("name")
    val dirty = Seq("smal ring", "red wdget", "bluebolt", "zzzzzz")
      .toDF("q")
    val all = FuzzyJoin.matches(dirty, clean, "q", "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val brute = (for {
      d <- Seq("smal ring", "red wdget", "bluebolt", "zzzzzz")
      c <- Seq("small ring", "red widget", "blue bolt")
      dist = {
        // classic DP levenshtein
        val (a, b) = (d, c)
        val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        m(a.length)(b.length)
      }
      if dist <= 2
    } yield (d, c, dist)).toSet
    assert(all == brute)
    assert(!all.exists(_._1 == "zzzzzz"))
  }

  test("fuzzyJoin bestMatch: min dist wins, lexical tie-break deterministic") {
    import spark.implicits._
    val clean = Seq("aaab", "aaac").toDF("name")
    val dirty = Seq("aaaa").toDF("q")
    val out = FuzzyJoin.bestMatch(dirty, clean, "q", "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq(("aaaa", "aaab", 1))) // tie on dist=1 -> lexical min
  }

  test("mrlRecall: prefix-signal embeddings keep recall at truncation, suffix-signal lose it") {
    import spark.implicits._
    import graft.text.Similarity
    // signal lives in dims 1-2; dims 3-4 are constant noise -> truncating
    // to 2 dims preserves the exact ranking (recall 1.0), and the full-dim
    // rung is 1.0 by construction
    val prefix = Seq(
      (0L, Seq(1.0f, 0.0f, 0.5f, 0.5f)),
      (1L, Seq(0.9f, 0.1f, 0.5f, 0.5f)),
      (2L, Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      (3L, Seq(0.1f, 0.9f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val outP = Similarity.mrlRecall(prefix,
      prefix.filter(col("vec_id") === 0), k = 2, dims = Seq(2, 4))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(3))))
      .toMap
    assert(outP(4) == ((2L, 1.0)), outP.toString)
    assert(outP(2) == ((2L, 1.0)), outP.toString)
    // signal ONLY in dims 3-4 (identical 2-dim prefixes): the truncated
    // ranking collapses to id ties and must miss at least one true hit
    val suffix = Seq(
      (0L, Seq(1.0f, 1.0f, 1.0f, 0.0f)),
      (1L, Seq(1.0f, 1.0f, 0.9f, 0.1f)),
      (2L, Seq(1.0f, 1.0f, -0.5f, 0.5f)),
      (3L, Seq(1.0f, 1.0f, 0.9f, 0.11f))).toDF("vec_id", "embedding")
    val outS = Similarity.mrlRecall(suffix,
      suffix.filter(col("vec_id") === 0), k = 2, dims = Seq(2, 4))
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(outS(4) == 1.0)
    assert(outS(2) < 1.0, outS.toString)
    intercept[IllegalArgumentException] {
      Similarity.mrlRecall(prefix, prefix, 2, Seq.empty)
    }
    // zero-norm truncated slice: vec 3's 2-dim prefix is all-zero, so its
    // truncated cosine is NULL (native CosineSim — the pre-round-16 HOF
    // form returned NaN, which desc-sorts FIRST and would hand the
    // degenerate neighbor a top-k slot). NULL sorts last: the d=2 top-2
    // stays {1, 2} and recall holds at 1.0; under the NaN ordering it
    // would read 0.5.
    val zeroPrefix = Seq(
      (0L, Seq(1.0f, 0.0f, 0.5f)),
      (1L, Seq(0.9f, 0.1f, 0.5f)),
      (2L, Seq(0.5f, 0.5f, 0.5f)),
      (3L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val outZ = Similarity.mrlRecall(zeroPrefix,
      zeroPrefix.filter(col("vec_id") === 0), k = 2, dims = Seq(2))
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(outZ(2) == 1.0, outZ.toString)
  }

  private def labeledEmb = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.0f), 1),
      (1L, Seq(0.95f, 0.05f), 2),
      (2L, Seq(0.9f, 0.1f), 1),
      (3L, Seq(0.0f, 1.0f), 3)).toDF("vec_id", "embedding", "label")
  }

  test("mrrAtK: first same-label rank in micro-units; misses stay in the denominator") {
    import graft.text.Similarity
    val emb = labeledEmb
    // query 0 (label 1): rank-1 neighbor is the hard negative (vec 1,
    // label 2), the first SAME-label hit is vec 2 at rank 2 -> 500000
    // micro; query 3 (label 3) has no same-label partner -> 0 micro but
    // still a query (the published MRR denominator rule)
    val q = emb.filter(col("vec_id") === 0 || col("vec_id") === 3)
    val r = Similarity.mrrAtK(emb, q, 10).collect().head
    assert(r.getAs[Long]("n_queries") == 2L)
    assert(r.getAs[Long]("n_hit") == 1L)
    assert(r.getAs[Long]("sum_rr_micro") == 500000L)
    assert(r.getAs[Double]("mrr") == 0.25)
    // k below the hit rank turns it into a miss
    val r1 = Similarity.mrrAtK(emb, q, 1).collect().head
    assert(r1.getAs[Long]("n_hit") == 0L)
    assert(r1.getAs[Long]("sum_rr_micro") == 0L)
  }

  test("ndcgAtK: discounted gains in exact micro-units; R=0 queries release NULL ndcg") {
    import graft.text.Similarity
    val emb = labeledEmb
    val q = emb.filter(col("vec_id") === 0 || col("vec_id") === 3)
    val out = Similarity.ndcgAtK(emb, q, 10).collect()
      .map(r => r.getLong(0) -> r).toMap
    // query 0 (label 1): rank 1 is the hard negative, the one relevant
    // neighbor (vec 2) sits at rank 2 -> dcg = floor(1e6*ln2/ln3) =
    // 630929; R = 1 so idcg = gain(1) = 1e6 exactly (ln2/ln2)
    val r0 = out(0L)
    assert(r0.getAs[Long]("n_rel_at_k") == 1L)
    assert(r0.getAs[Long]("dcg_micro") == 630929L)
    assert(r0.getAs[Long]("idcg_micro") == 1000000L)
    assert(r0.getAs[Double]("ndcg") == 630929.0 / 1000000.0)
    // query 3 (label 3, no same-label partner): R = 0 -> ndcg is NULL
    // (undefined), never 0.0 (which would mean "ranked them all last")
    val r3 = out(3L)
    assert(r3.getAs[Long]("n_rel_at_k") == 0L)
    assert(r3.getAs[Long]("idcg_micro") == 0L)
    assert(r3.isNullAt(r3.fieldIndex("ndcg")))
  }

  // cross-cell fixture for the routed evals: v0 (query, label 1) sits in
  // cell 0 with only the hard negative v1; its same-label hit v2 lives in
  // cell 1, so nprobe=1 MISSES it while nprobe=c recovers exactness
  private def crossCellEmb = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.0f), 1),
      (1L, Seq(0.95f, 0.05f), 2),
      (2L, Seq(0.05f, 0.95f), 1),
      (3L, Seq(0.0f, 1.0f), 3)).toDF("vec_id", "embedding", "label")
  }
  private val twoCells = graft.text.Ivf.Model(
    Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f)))

  test("mrrRouted: nprobe=c reproduces the exact baseline; nprobe=1 degrades and the gap shows") {
    import graft.text.Similarity
    val emb = crossCellEmb
    val q = emb.filter(col("vec_id") === 0 || col("vec_id") === 3)
    // probe every cell: the routed candidate set IS the corpus, so the
    // routed tier must agree with the exact baseline query by query
    val full = Similarity.mrrRouted(emb, q, twoCells, k = 10, nprobe = 2)
      .collect().head
    assert(full.getAs[Long]("n_queries") == 2L)
    assert(full.getAs[Long]("n_rr_agree") == 2L)
    assert(full.getAs[Long]("mrr_gap_micro") == 0L)
    assert(full.getAs[Double]("mrr_ivf") == full.getAs[Double]("mrr_exact"))
    // nprobe=1: query 0 probes only its own cell, where the sole
    // candidate is the hard negative — the routed tier misses the
    // cross-cell same-label hit the exact scan finds at rank 2
    val one = Similarity.mrrRouted(emb, q, twoCells, k = 10, nprobe = 1)
      .collect().head
    assert(one.getAs[Long]("n_hit_exact") == 1L)
    assert(one.getAs[Long]("n_hit_ivf") == 0L)
    assert(one.getAs[Long]("sum_rr_micro_exact") == 500000L)
    assert(one.getAs[Long]("mrr_gap_micro") == 500000L)
    // query 3 (both tiers miss — no partner exists) still agrees
    assert(one.getAs[Long]("n_rr_agree") == 1L)
  }

  test("ndcgRouted: shared idcg, dcg_agree flips only for the cell-pruned query") {
    import graft.text.Similarity
    val emb = crossCellEmb
    val q = emb.filter(col("vec_id") === 0 || col("vec_id") === 3)
    val full = Similarity.ndcgRouted(emb, q, twoCells, k = 10, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(full.values.forall(_.getAs[Boolean]("dcg_agree")))
    assert(full(0L).getAs[Double]("ndcg_ivf") ==
      full(0L).getAs[Double]("ndcg_exact"))
    val one = Similarity.ndcgRouted(emb, q, twoCells, k = 10, nprobe = 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r0 = one(0L)
    // exact finds the relevant neighbor at rank 2; the routed tier's
    // probed cell holds only the hard negative -> dcg 0 against the SAME
    // ideal, so the disagreement is attributable to routing, not to a
    // different gain scale
    assert(r0.getAs[Long]("dcg_micro_exact") == 630929L)
    assert(r0.getAs[Long]("dcg_micro_ivf") == 0L)
    assert(r0.getAs[Long]("idcg_micro") == 1000000L)
    assert(!r0.getAs[Boolean]("dcg_agree"))
    assert(r0.getAs[Double]("ndcg_ivf") == 0.0)
    // the no-partner query: R = 0 releases NULL ndcg on BOTH tiers and
    // agrees (0 == 0) — undefined is undefined on every path
    val r3 = one(3L)
    assert(r3.isNullAt(r3.fieldIndex("ndcg_exact")) &&
      r3.isNullAt(r3.fieldIndex("ndcg_ivf")))
    assert(r3.getAs[Boolean]("dcg_agree"))
  }

  test("tripletMine: best positive, hardest negative, margin; no-positive queries drop") {
    import graft.text.Similarity
    val emb = labeledEmb
    val q = emb.filter(col("vec_id") === 0 || col("vec_id") === 3)
    val out = Similarity.tripletMine(emb, q).collect()
    // query 3 (no same-label partner) drops; query 0 pairs its only
    // same-label vector with the nearest different-label one
    assert(out.length == 1, out.mkString("; "))
    val t = out.head
    assert(t.getAs[Long]("q_id") == 0L)
    assert(t.getAs[Long]("pos_id") == 2L)
    assert(t.getAs[Long]("neg_id") == 1L)
    // the hard negative sits CLOSER than the positive here -> negative
    // margin, exactly the triplet a contrastive fine-tune learns from
    assert(t.getAs[Double]("margin") < 0.0)
    assert(t.getAs[Double]("margin") ==
      t.getAs[Double]("pos_cos") - t.getAs[Double]("neg_cos"))
  }
}
