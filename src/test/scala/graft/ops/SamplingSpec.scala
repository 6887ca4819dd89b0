package graft.ops

import graft.SparkSpec
import graft.text.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Deterministic-sampling specs: partitioning invariance and rate. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("stratified sample is invariant under repartitioning") {
    def sample(parts: Int): Set[(String, Long)] =
      Sampling.stratified(docs.repartition(parts), Seq("lang"),
        Dedup.portableHash($"doc_id".cast(StringType)), 10)
        .select("lang", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val one = sample(1)
    assert(one == sample(8))
    assert(one.groupBy(_._1).forall(_._2.size <= 10))
  }

  test("byRates keeps per-group rates, defaults unknown groups, is a subset") {
    val h = Dedup.portableHash($"doc_id".cast(StringType))
    val kept = Sampling.byRates(docs, $"lang", h,
      Map("en" -> 0, "de" -> 1000), defaultPermille = 500)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("en"))              // rate 0 drops everything
    assert(kept("de") == all("de"))           // rate 1000 keeps everything
    // other langs near half (hash-uniform; small corpus tolerance)
    val others = (all.keySet - "en" - "de")
    val ratio = others.map(l => kept.getOrElse(l, 0L)).sum.toDouble /
      others.map(all).sum
    assert(ratio > 0.3 && ratio < 0.7, s"default-rate ratio $ratio")
    // deterministic: same call, same sample
    val again = Sampling.byRates(docs, $"lang", h,
      Map("en" -> 0, "de" -> 1000), defaultPermille = 500)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val first = Sampling.byRates(docs.repartition(7), $"lang", h,
      Map("en" -> 0, "de" -> 1000), defaultPermille = 500)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == first)
  }

  test("byTemperature: smallest group keeps all; heads downsample by sqrt ratio") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit}
    // groups of 1000 / 4000: sqrt(1000/4000) = 0.5 -> big group ~50%
    val df = ((1 to 1000).map(i => (i.toLong, "rare")) ++
      (1001 to 5000).map(i => (i.toLong, "big"))).toDF("id", "grp")
    val h = graft.text.Dedup.portableHash(col("id").cast("string"))
    val kept = graft.ops.Sampling.byTemperature(df, "grp", h)
      .groupBy("grp").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("rare") == 1000L) // permille 1000 keeps everything
    assert(kept("big") > 1700 && kept("big") < 2300, kept.toString) // ~2000
    // deterministic: rerun keeps the identical sample
    val again = graft.ops.Sampling.byTemperature(df, "grp", h)
      .groupBy("grp").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
    // reserved-column guard
    intercept[IllegalArgumentException] {
      graft.ops.Sampling.byTemperature(
        df.withColumn("__c", lit(1)), "grp", h)
    }
  }

  test("shardShuffle: full cover, contiguous positions, repartition-invariant") {
    def run(parts: Int): Array[(Long, Int, Int)] =
      Sampling.shardShuffle(docs.repartition(parts).select("doc_id"),
        Dedup.portableHash($"doc_id".cast(StringType)), $"doc_id", shards = 16)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"),
          r.getAs[Int]("shard_pos")))
        .sortBy(_._1)
    val one = run(1)
    assert(one.toSeq == run(8).toSeq) // partitioning-invariant
    assert(one.length == docs.count())
    assert(one.forall(t => t._2 >= 0 && t._2 < 16))
    // every shard's positions are exactly 1..n — a valid write order
    one.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        s"shard $shard positions not contiguous")
    }
  }

  test("capPerKey: keeps exactly each group's k best by priority; repartition-invariant") {
    def run(parts: Int): Set[(String, Long)] =
      Sampling.capPerKey(docs.repartition(parts)
          .select($"source", $"doc_id", $"text"),
        Seq("source"), struct(-length($"text"), $"doc_id"), k = 2)
        .select("source", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val got = run(1)
    assert(got == run(8))
    // driver-side mirror: 2 longest per source, ties -> smallest id
    val want = docs.select($"source", $"doc_id", length($"text").as("len"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).toSeq.flatMap { case (src, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(2).map(t => (src, t._2)).toSeq
      }.toSet
    assert(got == want)
  }

  test("weightedByHash: k winners, weight-1 degenerates to min-hash, repartition-invariant") {
    val w = floor($"n_chars" / lit(100)) + 1
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedByHash(df, $"doc_id", w, k = 30)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    val got = ids(docs)
    assert(got.length == 30 && got.distinct.length == 30)
    assert(got == ids(docs.repartition(11)))
    // all-weight-1: priority is hash(id ":1") — mirror it directly
    val uni = Sampling.weightedByHash(docs, $"doc_id", lit(1L), k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val mirror = docs.select($"doc_id",
        Dedup.portableHash(concat($"doc_id".cast(StringType), lit(":1")))
          .as("h"))
      .orderBy($"h", $"doc_id").limit(10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(uni == mirror)
    // heavier rows hold MORE tickets, so their min can only improve:
    // the weighted sample's worst winning priority <= the uniform one's
    val wp = Sampling.weightedByHash(docs, $"doc_id", w, k = 10)
      .agg(max("priority")).head().getLong(0)
    val up = Sampling.weightedByHash(docs, $"doc_id", lit(1L), k = 10)
      .agg(max("priority")).head().getLong(0)
    assert(wp <= up)
  }

  test("weightedByRace: portable series ln matches Math.log to 1e-12 relative") {
    // the whole point of negLnU is replacing libm (last-ulp
    // implementation-specific) with fixed IEEE arithmetic — verify the
    // series against the JVM's ln across the real hash range
    val hs = docs.limit(500).select(
        Dedup.portableHash($"doc_id".cast(StringType)).as("h"))
      .withColumn("series", Sampling.negLnU($"h"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(hs.nonEmpty)
    hs.foreach { case (h, series) =>
      val exact = -math.log((h + 1).toDouble / math.pow(2.0, 60))
      val abs = math.abs(series - exact)
      val rel = abs / math.max(exact, 1e-9)
      // rel covers the bulk; abs covers u → 1, where (60−p)·ln2 − ln(1+f)
      // cancels and RELATIVE error is inherently unbounded for ANY
      // fixed-precision ln (including libm itself)
      assert(rel < 1e-12 || abs < 1e-14,
        s"h=$h series=$series exact=$exact rel=$rel abs=$abs")
    }
  }

  test("portableLn: series ln(m) matches Math.log to 1e-12 relative over the count range") {
    // the log-prob scorer's ln — verify the p·ln2 + 2z·t composition
    // against the JVM's ln across small counts (the dense region), a
    // pseudo-random mid range, and the extremes of the documented domain
    val ms = ((1L to 1000L) ++
      (1 to 200).map(i => 1000L + i.toLong * i * i * 37L) ++
      Seq(1L << 40, (1L << 52) + 12345L, (1L << 62) - 1, 1L << 62)).distinct
    val got = ms.toDF("m").withColumn("series", Sampling.portableLn($"m"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    got.foreach { case (m, series) =>
      val exact = math.log(m.toDouble)
      if (m == 1L) assert(series == 0.0, s"ln(1) must be exactly 0: $series")
      else {
        val rel = math.abs(series - exact) / exact
        assert(rel < 1e-12, s"m=$m series=$series exact=$exact rel=$rel")
      }
    }
  }

  test("weightedByRace: scale invariance, clamped 10^6 dominance, k winners") {
    val w = ($"n_chars" % 97 + 1) * lit(50L)
    def ids(weight: org.apache.spark.sql.Column): Seq[Long] =
      Sampling.weightedByRace(docs, $"doc_id", weight, k = 30)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    val got = ids(w)
    assert(got.length == 30 && got.distinct.length == 30)
    // exponential-race keys scale by 1/c when every weight scales by c —
    // the selected set (and order) is weight-SCALE invariant
    assert(got == ids(w * 16))
    // pure function of the data: repartitioning cannot move the sample
    assert(got == Sampling.weightedByRace(docs.repartition(13), $"doc_id", w,
      k = 30).select("doc_id").collect().map(_.getLong(0)).toSeq)
    // a 10^6-weight row races 10^6 unit-rate exponentials: its key is its
    // hash-exponential / 10^6 — on this fixture it wins outright
    val heavy = Sampling.weightedByRace(docs, $"doc_id",
      when($"doc_id" === 42L, 1000000L).otherwise(1L), k = 1)
      .select("doc_id", "weight").collect().head
    assert(heavy.getLong(1) == 1000000L && heavy.getLong(0) == 42L,
      s"heavy row lost the race: $heavy")
  }

  test("weightedRacePerKey: per-group winners = the group's k smallest race keys") {
    val w = ($"n_chars" % 97 + 1) * lit(50L)
    val got = Sampling.weightedRacePerKey(docs, Seq("lang"), $"doc_id", w, k = 5)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // mirror: global race keys ranked within each lang
    val ranked = Sampling.weightedByRace(docs, $"doc_id", w, k = docs.count().toInt)
      .select("doc_id", "priority")
    val langs = docs.select("doc_id", "lang")
    val expected = ranked.join(langs, "doc_id")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy($"priority", $"doc_id")))
      .filter($"rn" <= 5).select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
    got.groupBy(_._1).foreach { case (l, g) =>
      assert(g.size <= 5, s"lang $l got ${g.size} rows")
    }
  }

  test("weightedByRace ~ weightedByHash: same selection pressure per weight class") {
    // distribution equivalence on the clamped overlap range [1, 64]: both
    // samplers realize P(win) proportional to weight, so on a 2-class
    // corpus (w=1 vs w=8) their per-class pick counts must agree within
    // sampling noise — the race is the closed form OF the ticket scheme
    val df = (1L to 4000L).map(i => (i, if (i % 2 == 0) 8L else 1L))
      .toDF("doc_id", "w")
    def shares(pick: => org.apache.spark.sql.DataFrame): (Long, Long) = {
      val rows = pick.select("doc_id").collect().map(_.getLong(0))
      (rows.count(_ % 2 == 0).toLong, rows.count(_ % 2 == 1).toLong)
    }
    val (raceH, raceL) = shares(
      Sampling.weightedByRace(df, $"doc_id", $"w", k = 500))
    val (tickH, tickL) = shares(
      Sampling.weightedByHash(df, $"doc_id", $"w", k = 500))
    // expected heavy share ≈ 8/9 of picks while the pool lasts; allow wide
    // deterministic-fixture tolerance but pin both samplers to the SAME
    // regime and to each other within 10%
    for ((h, l) <- Seq((raceH, raceL), (tickH, tickL))) {
      assert(h + l == 500)
      assert(h > 350, s"heavy class under-selected: $h")
    }
    assert(math.abs(raceH - tickH) <= 50,
      s"race $raceH vs tickets $tickH heavy picks diverge")
  }

  test("tokenBudgetMix: sqrt-tempered token rates; smallest group keeps all; exact accounting") {
    import spark.implicits._
    val df = ((1 to 100).map(i => (i.toLong, "small", 10L)) ++
      (101 to 500).map(i => (i.toLong, "big", 10L))).toDF("id", "grp", "nt")
    val h = Dedup.portableHash($"id".cast(StringType))
    val out = Sampling.tokenBudgetMix(df, "grp", $"nt", h)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4),
          r.getLong(5)))).toMap
    // small: 1000 tokens (min) -> rate 1000, keeps all
    assert(out("small") == ((100L, 1000L, 1000, 100L, 1000L)))
    // big: 4000 tokens -> floor(1000*sqrt(1000/4000)) = 500 permille
    val (nDocs, nTok, rate, keptD, keptT) = out("big")
    assert((nDocs, nTok, rate) == ((400L, 4000L, 500)))
    // accounting matches the brute-force hash filter at that rate
    val brute = df.filter($"grp" === "big")
      .filter(pmod(h, lit(1000L)) < rate).count()
    assert(keptD == brute && keptT == brute * 10L)
  }

  test("hash-threshold sample rate lands near permille/1000") {
    val n = docs.count()
    val sampled = Sampling.byHash(docs,
      Dedup.portableHash($"doc_id".cast(StringType)), permille = 250).count()
    assert(math.abs(sampled.toDouble / n - 0.25) < 0.08, s"$sampled of $n")
    // deterministic: same filter, same rows
    assert(sampled == Sampling.byHash(docs.repartition(13),
      Dedup.portableHash($"doc_id".cast(StringType)), 250).count())
  }
}
