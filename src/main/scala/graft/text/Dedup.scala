package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale design: signature computation is a narrow map (array expressions
  * inside codegen — no explode, no shuffle); the only shuffles are the
  * LSH band-bucket self-join (keyed on (band, band_hash), so candidate
  * generation is O(collisions), never O(n²)) and the final per-pair verify.
  * At 100 TB the corpus never materializes pairwise.
  */
object Dedup {
  /** 31-bit modulus keeps a*x+b inside a long under ANSI overflow checks. */
  private val P = 2147483647L
  val NumHashes = 64
  val Bands = 16
  val RowsPerBand = 4 // NumHashes / Bands

  /** Deterministic affine coefficients for the MinHash family (seeded,
    * data-independent). */
  private val coefA: Array[Long] =
    Array.tabulate(NumHashes)(i => 2654435761L * (i + 1) % P | 1L)
  private val coefB: Array[Long] =
    Array.tabulate(NumHashes)(i => 40503L * (i + 7) * 2654435769L % P)

  /** Exact dedup: canonical survivor per identical text. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol).cast(BinaryType)).as("text_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Word 3-gram shingles (distinct); short docs fall back to the whole
    * token array joined. */
  def shingles(text: Column): Column = {
    val toks = TextOps.tokens(text)
    array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2), i =>
          concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
            element_at(toks, i + 2))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** 64-bit base hashes of the shingles, folded into [0, 2^31). */
  private def baseHashes(sh: Column): Column =
    transform(sh, s => pmod(xxhash64(s), lit(P)))

  /** MinHash signature: 64 affine permutations over the base hashes. */
  def minhashSignature(text: Column): Column = {
    val base = baseHashes(shingles(text))
    val aLit = typedLit(coefA.toSeq)
    val bLit = typedLit(coefB.toSeq)
    transform(sequence(lit(0), lit(NumHashes - 1)), i =>
      array_min(transform(base, x =>
        pmod(element_at(aLit, i + 1) * x + element_at(bLit, i + 1), lit(P)))))
  }

  /** docs → (id, sig) with the signature computed in one codegen stage. */
  def withSignature(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("sig", minhashSignature(col(textCol)))

  /** LSH candidate pairs: band the signature (16 bands × 4 rows), bucket-join
    * on (band, hash-of-band), emit each unordered pair once. */
  def lshCandidates(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val sigs = withSignature(docs, textCol).select(col(idCol).as("id"), col("sig"))
    val banded = sigs.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(Bands - 1)), b =>
        xxhash64(slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val l = banded.select(col("band"), col("band_hash"), col("id").as("a"))
    val r = banded.select(col("band"), col("band_hash"), col("id").as("b"))
    l.join(r, Seq("band", "band_hash")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Candidate pairs + estimated Jaccard from signature agreement; keep
    * pairs with est ≥ threshold (num agreeing hashes ≥ thresh64/64). */
  def minhashPairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minAgree: Int = 32): DataFrame = {
    val sigs = withSignature(docs, textCol)
      .select(col(idCol).as("sid"), col("sig"))
    lshCandidates(docs, textCol, idCol)
      .join(sigs.select(col("sid").as("a"), col("sig").as("sig_a")), "a")
      .join(sigs.select(col("sid").as("b"), col("sig").as("sig_b")), "b")
      .withColumn("n_agree",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v))
      .filter(col("n_agree") >= minAgree)
      .select("a", "b", "n_agree")
  }

  /** 64-bit SimHash over shingle hashes: per-bit majority vote of ±1.
    * (Built via expr(): the Scala shiftleft/shiftright helpers only accept
    * literal Ints, but the underlying expressions take any int column.) */
  def withSimhash(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("sh_h64", transform(shingles(col(textCol)), s => xxhash64(s)))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), 0L, (acc, j) -> acc +
             if(aggregate(sh_h64, 0L,
                  (a, h) -> a + if(((h >> j) & 1) = 1, 1L, -1L)) > 0,
                shiftleft(1L, j), 0L))"""))
      .drop("sh_h64")

  /** Hamming distance between two simhash longs (bit_count of xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact n-gram Jaccard near-dup pairs via shingle inverted index:
    * explode shingles → self-join per shingle → per-pair intersection
    * count; union from per-doc distinct counts. Division-free output:
    * (a, b, inter, union) with 2*inter ≥ union (Jaccard ≥ 1/3 kept,
    * caller filters tighter). Hub shingles are capped to bound the join
    * (a shingle shared by > maxDf docs is dropped — standard inverted-
    * index trick; at 100 TB this is what keeps the op near-linear). */
  def jaccardPairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", maxDf: Int = 100): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), explode(shingles(col(textCol))).as("s"))
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val filtered = sh.join(
      sh.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= maxDf), "s")
    val inter = filtered.select(col("s"), col("id").as("a"))
      .join(filtered.select(col("s"), col("id").as("b")), "s")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col("id").as("a"), col("n_sh").as("na")), "a")
      .join(counts.select(col("id").as("b"), col("n_sh").as("nb")), "b")
      .withColumn("union_n", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * 2 >= col("union_n"))
      .select("a", "b", "inter", "union_n")
  }
}
