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

  /** Ingest raw media files as asset rows via Spark's binaryFile source:
    * one row per file with (uri, mime-from-extension, bytes, meta{length,
    * mtime}). `pathGlobFilter` bounds the listing (e.g. "*.jpg");
    * binaryFile never splits files, so parallelism = file count — batch
    * small files upstream or spill oversized ones with
    * [[AssetStore.spill]] right after ingest.
    */
  def ingestFiles(spark: org.apache.spark.sql.SparkSession, path: String,
      glob: String = "*"): org.apache.spark.sql.DataFrame = {
    val mime = element_at(
      map(
        lit("jpg"), lit("image/jpeg"), lit("jpeg"), lit("image/jpeg"),
        lit("png"), lit("image/png"), lit("gif"), lit("image/gif"),
        lit("mp4"), lit("video/mp4"), lit("mp3"), lit("audio/mpeg"),
        lit("wav"), lit("audio/wav"), lit("pdf"), lit("application/pdf")),
      lower(element_at(split(col("path"), "\\."), -1)))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(asset(
        col("path"),
        coalesce(mime, lit("application/octet-stream")),
        col("content"),
        map(
          lit("length"), col("length").cast("string"),
          lit("mtime"), col("modificationTime").cast("string"))).as("asset"))
  }

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

  /** STUB resize: returns an asset struct with target dimensions recorded in
    * meta (width/height) and the payload passed through; a real kernel would
    * re-encode the bytes with this exact struct-in/struct-out signature, so
    * downstream schema and pruning behavior are already final.
    */
  def stubResize(assetCol: Column, width: Int, height: Int): Column =
    struct(
      assetCol("uri").as("uri"),
      assetCol("mime").as("mime"),
      assetCol("bytes").as("bytes"),
      map_concat(
        coalesce(assetCol("meta"),
          map().cast(MapType(StringType, StringType))),
        map(lit("width"), lit(width.toString),
          lit("height"), lit(height.toString))).as("meta"))

  /** Batched per-partition decode seam: the shape a real codec/model kernel
    * needs — per-PARTITION initialization (codec context, ONNX session)
    * amortized across rows, rows processed in `batchSize` groups (the batch
    * shape vectorized kernels want), one narrow stage with no shuffle.
    * The kernel here is the deterministic stub; swapping in a real decoder
    * changes only the function body passed to `mapPartitions`.
    */
  def decodeBatchedStub(df: DataFrame, assetCol: String, dim: Int = 16,
      batchSize: Int = 64, outCol: String = "features"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, false))
    val enc = Encoders.row(outSchema)
    val assetIdx = df.schema.fieldIndex(assetCol)
    val bytesIdx = df.schema(assetCol).dataType.asInstanceOf[StructType]
      .fieldIndex("bytes")
    df.mapPartitions { it =>
      // per-partition init happens here ONCE (real impl: load codec/model)
      it.grouped(batchSize).flatMap { batch =>
        // real impl: one vectorized kernel call per batch
        batch.map { row =>
          val asset = row.getStruct(assetIdx)
          val bytes =
            if (asset == null || asset.isNullAt(bytesIdx)) Array.empty[Byte]
            else asset.getAs[Array[Byte]](bytesIdx)
          Row.fromSeq(row.toSeq :+ stubKernel(bytes, dim))
        }
      }
    }(enc)
  }

  /** Deterministic stand-in kernel: dim floats in [-1, 1] from the payload
    * bytes (MurmurHash3-seeded) — stable across partitionings and reruns.
    */
  private[multimodal] def stubKernel(bytes: Array[Byte], dim: Int): Seq[Float] = {
    val base = scala.util.hashing.MurmurHash3.bytesHash(bytes, 42)
    (0 until dim).map { k =>
      val h = scala.util.hashing.MurmurHash3.productHash((base, k))
      (h.toDouble / Int.MaxValue.toDouble).toFloat
    }
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
