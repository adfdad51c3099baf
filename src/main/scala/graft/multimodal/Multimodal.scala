package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support for training-data pipelines (extension tier):
  * image/audio/video payloads ride through the engine as opaque `binary`
  * columns wrapped in a typed asset struct with metadata, so that Spark's
  * columnar machinery (pruning, predicate pushdown on metadata, partitioned
  * shuffles) applies unchanged while payload-touching steps stay isolated.
  *
  * Decode/feature-extraction is STUBBED: the container has no image/audio
  * codecs, so [[stubDecodeFeatures]] derives a deterministic fake feature
  * vector from the payload bytes. The Spark-side plumbing — the asset
  * schema, batch shape, partitioning, and the feature-vector contract
  * (`array<float>` consumable by [[graft.operators.Similarity]]) — is real
  * and tested; swapping the stub for a JNI/ONNX decoder changes only the
  * per-row kernel.
  *
  * Scale notes: payloads never participate in shuffles for metadata-only
  * operations (select the struct fields you need — column pruning drops the
  * bytes); feature extraction is a narrow map stage; dedup on
  * [[payloadHash]] runs on 8-byte keys.
  */
object Multimodal {

  /** The typed asset column layout: struct<uri, mime, bytes, meta>. */
  val assetSchema: StructType = StructType(Seq(
    StructField("uri", StringType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Pack loose columns into an asset struct. */
  def asset(uri: Column, mime: Column, bytes: Column, meta: Column): Column =
    struct(uri.as("uri"), mime.as("mime"), bytes.as("bytes"), meta.as("meta"))

  /** Content hash of the payload (xxhash64 over bytes) — the dedup key. */
  def payloadHash(assetCol: Column): Column = xxhash64(assetCol("bytes"))

  /** Payload size in bytes without decoding. */
  def payloadSize(assetCol: Column): Column =
    coalesce(length(assetCol("bytes")), lit(0)).cast("long")

  /** STUB decode: deterministic fake `dim`-length float features derived
    * from the payload hash (stands in for image-embed / audio-fingerprint;
    * real implementation would be a codec/model kernel with this exact
    * signature and the same `array<float>` contract).
    */
  def stubDecodeFeatures(assetCol: Column, dim: Int = 16): Column = {
    val h = payloadHash(assetCol)
    // k-th feature: xxhash64(payload_hash, k) scaled into [-1, 1]
    array((0 until dim).map { k =>
      (xxhash64(h, lit(k)).cast("double") / lit(Long.MaxValue.toDouble))
        .cast("float")
    }: _*)
  }

  /** STUB frame sampling: logical frame index list for a video asset given a
    * frame count from metadata (`meta['n_frames']`) and a stride; real
    * implementation would emit one row per decoded frame with this exact
    * explode shape.
    */
  def stubSampleFrames(df: DataFrame, assetCol: String,
      stride: Int = 10): DataFrame = {
    val nFrames = coalesce(
      element_at(col(assetCol)("meta"), "n_frames").cast("int"), lit(0))
    df.withColumn("frame_index",
      explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
  }

  /** Exact payload dedup across assets: keep the first uri per content hash. */
  def dedupByContent(df: DataFrame, assetCol: String): DataFrame = {
    val withHash = df.withColumn("__ph", payloadHash(col(assetCol)))
    val winners = withHash
      .groupBy(col("__ph"))
      .agg(min(col(assetCol)("uri")).as("__keep_uri"))
    withHash
      .join(winners, Seq("__ph"))
      .filter(col(assetCol)("uri") === col("__keep_uri"))
      .drop("__ph", "__keep_uri")
  }
}
