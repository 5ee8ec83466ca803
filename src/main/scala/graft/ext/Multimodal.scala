package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (BASELINE.json extension surface): media
  * payloads are opaque `binary` columns with typed metadata, processed by
  * per-partition batch functions. The actual image/audio decoding libraries
  * are not present in this environment, so the decode step is a clearly
  * marked DETERMINISTIC STUB — the Spark-side contract (schema, batching,
  * partitioning, feature shape) is real and tested.
  *
  * Scale design: payloads never enter a shuffle — all feature extraction is
  * scan-side `mapPartitions`; only the small feature/metadata columns flow
  * downstream. For very large blobs the pattern extends to pointer columns
  * (URI + range) with partition-local fetch.
  */
object Multimodal {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StringType, nullable = true)))

  /** Fabricate a media table from the documents table (text bytes stand in
    * for an encoded payload; kind round-robins image/audio/video). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      to_json(struct(col("source"), col("n_chars"))).as("meta"))

  /** Cheap column-level features (no decode): byte length, digest, magic. */
  def payloadFeatures(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"),
      substring(hex(col("payload")), 1, 8).as("magic"))

  /** Output schema of the stubbed decoder. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** ===== STUB DECODE =====
    * Stands in for image/audio decode + feature extraction (the libs are not
    * in this container). Produces a deterministic 8-dim "feature" from byte
    * statistics so downstream plumbing (ANN over features, joins, etc.) is
    * exercisable end-to-end. Replace the body with a real decoder (JavaCPP /
    * ffmpeg / ImageIO) in production; the batch shape — one partition
    * iterator in, one iterator out, nothing collected — is the real contract.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "kind", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
        // deterministic fake feature: bucketed byte histogram, L1-normalized
        val hist = new Array[Float](8)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) % 8) += 1f; i += 1 }
        val total = math.max(1f, bytes.length.toFloat)
        Row(id, kind, bytes.length.toLong, hist.map(_ / total).toSeq)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Frame/segment sampling stub: slices the payload into `every`-byte
    * strides, keeping the first `frameLen` bytes of each stride — the same
    * row-explode shape a real video frame sampler has (one row per frame,
    * payload never shuffled whole). */
  def frameSample(media: DataFrame, every: Int, frameLen: Int): DataFrame = {
    // every = 0 would divide to Infinity, saturate the int cast at
    // Int.MaxValue, and blow up inside sequence() far from the bad
    // argument — guard the knobs at the call site like the sampling ops do
    require(every >= 1, s"every must be >= 1, got $every")
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    val nFrames = greatest(
      ceil(length(col("payload")) / lit(every.toDouble)).cast("int"), lit(1))
    media
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), nFrames - 1),
          i => col("payload").substr(i * every + 1, lit(frameLen)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
  }
}
