package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The decode step is a STUB (no image/audio codecs in this environment):
  * `decodeStub` derives deterministic fake pixels/samples from the payload
  * bytes. Everything around it — the schema, the per-partition batched
  * processing (the Scala analogue of `mapInPandas`), the partitioning, and
  * the feature shapes — is real and tested, so swapping in a real codec is
  * a one-function change.
  *
  * Scale: feature extraction is a narrow mapPartitions (no shuffle); payloads
  * stay off the driver; batches bound memory per task.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Int)
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      byte_mean: Double, byte_entropy: Double, histogram: Array[Long],
      frames_sampled: Int)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sampleRate", IntegerType), StructField("durationMs", IntegerType))))))

  /** Deterministic synthetic media table derived from the documents corpus:
    * payload = utf-8 bytes of the text (stands in for encoded image/audio),
    * kind round-robins image/audio/video, metadata derived from sizes. */
  def syntheticMedia(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("kind"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        (pmod(col("doc_id"), lit(640)) + 32).cast(IntegerType).as("width"),
        (pmod(col("doc_id"), lit(480)) + 24).cast(IntegerType).as("height"),
        lit(16000).as("sampleRate"),
        (length(col("text")) * 10).cast(IntegerType).as("durationMs")).as("meta"))
  }

  /** STUB decode: deterministic fake "pixels" from payload bytes. A real
    * implementation would JPEG/PNG/PCM-decode here. */
  def decodeStub(payload: Array[Byte]): Array[Int] =
    if (payload == null) Array.empty
    else payload.map(b => (b & 0xff)).toArray

  /** STUB frame sampler: every `stride`-th decoded unit, capped at `max`. */
  def sampleFrames(decoded: Array[Int], stride: Int, max: Int): Array[Int] = {
    val out = decoded.indices.collect { case i if i % stride == 0 => decoded(i) }
    out.take(max).toArray
  }

  /** Batched per-partition feature extraction — the Scala analogue of a
    * pandas-UDF `mapInPandas` stage: iterator-in/iterator-out, processing
    * `batchSize` rows at a time so one task never holds a partition's
    * payloads in memory at once. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val rowEnc = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val px = decodeStub(row.payload)
          val hist = Array.ofDim[Long](16)
          var sum = 0L
          px.foreach { v => hist(v / 16) += 1; sum += v }
          val n = math.max(px.length, 1)
          val entropy = hist.foldLeft(0.0) { (acc, c) =>
            if (c == 0) acc
            else { val p = c.toDouble / n; acc - p * math.log(p) }
          }
          val frames = sampleFrames(px, stride = 32, max = 64)
          MediaFeatures(row.media_id, row.kind, px.length,
            if (px.isEmpty) 0.0 else sum.toDouble / px.length,
            entropy, hist, frames.length)
        }
      }
    }
  }

  /** Resize stub for image payloads: nearest-neighbor index sampling of the
    * fake pixel array down to (w × h) values — the real version would do a
    * bilinear resample of the decoded bitmap. */
  def resizeStub(decoded: Array[Int], w: Int, h: Int): Array[Int] = {
    val target = w * h
    if (decoded.isEmpty || target == 0) Array.empty
    else Array.tabulate(math.min(target, decoded.length)) { i =>
      decoded((i.toLong * decoded.length / math.max(target, 1)).toInt.min(decoded.length - 1))
    }
  }
}
