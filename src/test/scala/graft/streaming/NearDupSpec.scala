package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming MinHash near-dup dedup: per-band stateful verdicts over the
  * real flatMapGroupsWithState path must flag exactly the docs with a
  * verified smaller-id band collision — the direct-neighbor rule the
  * op_stream_neardup oracle pins corpus-wide. */
class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the old river bank " +
      "while morning mist settles across the quiet valley floor below"
  private val other =
    "distributed query engines shuffle partitioned columnar data across " +
      "executor nodes applying vectorized expression evaluation per batch"

  test("near-dup arrival flags against smaller-id band-mates; fresh docs keep") {
    val dir = java.nio.file.Files.createTempDirectory("graft_neardup_spec")
    Seq(
      (1L, base),
      (2L, other),
      (3L, base + " with a small trailing change"), // near-dup of 1 -> drop
      (4L, base),                                   // exact dup of 1 -> drop
      (5L, "entirely novel content describing coral reef ecosystems and tidal current interactions"))
      .toDF("doc_id", "text")
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))
      .write.mode("overwrite").parquet(dir.toString)

    val verdicts = Replay.replayAppend(spark, dir.toString,
      StructType.fromDDL("doc_id BIGINT, text STRING, ts TIMESTAMP"),
      st => NearDup.bandVerdicts(st, horizonMs = 86400000L).toDF())
    // 16 band rows per doc
    assert(verdicts.count() == 5 * 16)
    val keep = verdicts.groupBy("doc_id")
      .agg((max(when(col("band_dup"), 1L).otherwise(0L)) === 0L).as("keep"))
      .as[(Long, Boolean)].collect().toMap
    assert(keep == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false,
      5L -> true), s"got $keep")
  }

  test("replayed verdicts equal the batch direct-neighbor band dedup on real docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_neardup_spec2")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 120)
    docs
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id")))
      .write.mode("overwrite").parquet(dir.toString)

    val streamKeep = Replay.replayAppend(spark, dir.toString,
      StructType.fromDDL("doc_id BIGINT, text STRING, ts TIMESTAMP"),
      st => NearDup.bandVerdicts(st, horizonMs = 86400000L).toDF())
      .groupBy("doc_id")
      .agg((max(when(col("band_dup"), 1L).otherwise(0L)) === 0L).as("keep"))
      .as[(Long, Boolean)].collect().toMap

    // batch direct-neighbor rule: drop iff a smaller-id doc shares a band
    // key and the signatures agree on >= 20 slots
    val sigs = graft.text.IncrDedup.signatures(docs)
    val bands = graft.text.IncrDedup.bandTable(sigs)
    val dropped = bands.select(col("bk"), col("id").as("a"))
      .join(bands.select(col("bk"), col("id").as("b")), "bk")
      .filter(col("a") < col("b")).select("a", "b").distinct()
      .join(sigs.select(col("id").as("a"), col("sig").as("sa")), "a")
      .join(sigs.select(col("id").as("b"), col("sig").as("sb")), "b")
      .withColumn("n_agree", aggregate(zip_with(col("sa"), col("sb"),
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v))
      .filter(col("n_agree") >= 20)
      .select("b").as[Long].collect().toSet
    val batchKeep = docs.select("doc_id").as[Long].collect()
      .map(id => id -> !dropped.contains(id)).toMap
    assert(streamKeep == batchKeep)
  }
}
