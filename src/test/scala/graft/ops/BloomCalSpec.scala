package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Bloom.fprCalibration]] against a driver-side filter recompute:
  * bit positions, fill, anti-joined probe set, and the all-k-bits-set
  * positive rule — plus the degenerate saturated-filter bound. */
class BloomCalSpec extends SparkSpec {
  import spark.implicits._

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("fpr matches a driver-side Bloom recompute (and members anti-join away)") {
    val members = (1 to 40).map(_.toString).toDF("k")
    // probes include 5 genuine members (must be anti-joined away) and 30
    // true non-members
    val probes = ((36 to 40) ++ (101 to 130)).map(_.toString).toDF("k")
    val m = 64; val kh = 3
    val bits = (for (v <- 1 to 40; j <- 0 until kh)
      yield md5_60(s"$v:bf$j") % m).toSet
    def positive(v: String): Boolean =
      (0 until kh).forall(j => bits(md5_60(s"$v:bf$j") % m))
    val expFp = (101 to 130).count(v => positive(v.toString))
    val row = Bloom.fprCalibration(members, col("k"), probes, col("k"),
      mBits = m, kHashes = kh).collect().head
    assert(row.getAs[Long]("m_bits") == m && row.getAs[Long]("k_hashes") == kh)
    assert(row.getAs[Long]("n_members") == 40L)
    assert(row.getAs[Long]("bits_set") == bits.size.toLong)
    assert(row.getAs[Double]("fill_frac") == bits.size.toDouble / m)
    assert(row.getAs[Long]("n_probes") == 30L) // the 5 members dropped
    assert(row.getAs[Long]("n_false_pos") == expFp.toLong)
    assert(row.getAs[Double]("fpr") == expFp.toDouble / 30.0)
  }

  test("saturated filter: every probe is a false positive") {
    // m=2: with >1 member and k=1 both bits are all but surely set; force
    // it with enough members that both bit values certainly appear
    val members = (1 to 64).map(_.toString).toDF("k")
    val probes = (1001 to 1010).map(_.toString).toDF("k")
    val row = Bloom.fprCalibration(members, col("k"), probes, col("k"),
      mBits = 2, kHashes = 1).collect().head
    assert(row.getAs[Long]("bits_set") == 2L)
    assert(row.getAs[Double]("fill_frac") == 1.0)
    assert(row.getAs[Long]("n_false_pos") == 10L)
    assert(row.getAs[Double]("fpr") == 1.0)
  }

  test("decomposition: bitRows+distinct feeds fprFromBits to the identical calibration row") {
    import spark.implicits._
    // the stream == batch argument for op_stream_bloom: the bit SET from
    // the narrow per-key map equals the batch build (union-merge is
    // order-insensitive), so the finisher must produce the same row
    val members = (1 to 40).map(_.toString).toDF("k")
    val probes = (101 to 160).map(_.toString).toDF("k")
    val direct = Bloom.fprCalibration(members, col("k"), probes, col("k"),
      mBits = 64, kHashes = 3).collect().head
    val bits = Bloom.bitRows(members, col("k"), mBits = 64, kHashes = 3)
      .groupBy("_b").agg(count(lit(1)).as("_n")).select("_b")
    val composed = Bloom.fprFromBits(bits, members, col("k"), probes,
      col("k"), mBits = 64, kHashes = 3).collect().head
    assert(composed == direct, s"$composed vs $direct")
    // shuffled arrival order changes nothing
    val shuffled = new scala.util.Random(11)
      .shuffle((1 to 40).map(_.toString)).toDF("k")
    val bits2 = Bloom.bitRows(shuffled, col("k"), mBits = 64, kHashes = 3)
      .groupBy("_b").agg(count(lit(1)).as("_n")).select("_b")
    val composed2 = Bloom.fprFromBits(bits2, members, col("k"), probes,
      col("k"), mBits = 64, kHashes = 3).collect().head
    assert(composed2 == direct)
  }

  test("empty probe set yields NULL fpr, and guards hold") {
    val members = Seq("1", "2").toDF("k")
    val row = Bloom.fprCalibration(members, col("k"), members, col("k"),
      mBits = 64, kHashes = 2).collect().head
    assert(row.getAs[Long]("n_probes") == 0L)
    assert(row.getAs[Long]("n_false_pos") == 0L)
    assert(row.isNullAt(row.fieldIndex("fpr")))
    intercept[IllegalArgumentException] {
      Bloom.fprCalibration(members, col("k"), members, col("k"), mBits = 1)
    }
    intercept[IllegalArgumentException] {
      Bloom.fprCalibration(members, col("k"), members, col("k"), kHashes = 0)
    }
  }
}
