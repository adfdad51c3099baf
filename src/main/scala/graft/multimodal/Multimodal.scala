package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support for training-data pipelines (extension tier):
  * image/audio/video payloads ride through the engine as opaque `binary`
  * columns wrapped in a typed asset struct with metadata, so that Spark's
  * columnar machinery (pruning, predicate pushdown on metadata, partitioned
  * shuffles) applies unchanged while payload-touching steps stay isolated.
  *
  * IMAGE decode is REAL ([[decodeImageFeatures]] / [[resizeImages]]): the
  * JDK ships `javax.imageio` readers for PNG/JPEG/GIF/BMP, so no external
  * codec jars are needed, and `javax.sound.sampled` likewise decodes
  * WAV/AIFF/AU PCM for real ([[decodeAudioFeatures]]). Compressed audio
  * (MP3/AAC) and VIDEO decode stay STUBBED ([[stubDecodeFeatures]]
  * derives a deterministic fake feature vector from payload bytes) —
  * those codecs genuinely are absent from the container. Either way the Spark-side plumbing — the asset schema, batch
  * shape, partitioning, and the feature-vector contract (`array<float>`
  * consumable by [[graft.operators.Similarity]]) — is identical; a
  * JNI/ONNX kernel swaps in at the same seam.
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

  /** Decode in-memory bytes WITHOUT ImageIO's default file cache:
    * `ImageIO.read(InputStream)` wraps the stream in a
    * FileCacheImageInputStream — every already-in-memory payload pays a
    * temp-file round trip, and 32 concurrent decode tasks contend on the
    * temp directory (the decode kernel's measured cost was bimodal under
    * interleaved suites for exactly this reason). An explicit
    * MemoryCacheImageInputStream keeps the whole decode in-heap and
    * per-task, with no global `ImageIO.setUseCache` mutation.
    */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // ImageIO.read(ImageInputStream) closes the stream after a successful
    // read, and ImageInputStreamImpl.close THROWS on a second close — so
    // the safety-net close (for the no-reader/exception paths) must be
    // quiet or it masks every successful decode as a failure
    try javax.imageio.ImageIO.read(iis)
    finally try iis.close() catch { case _: java.io.IOException => () }
  }

  /** Encode to in-memory PNG bytes, bypassing the file cache on the write
    * side too (`ImageIO.write(_, _, OutputStream)` otherwise spools
    * through a FileCacheImageOutputStream temp file).
    */
  private[multimodal] def writePng(
      img: java.awt.image.RenderedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      javax.imageio.ImageIO.write(img, "png", ios)
      ios.flush()
    } finally ios.close()
    bos.toByteArray
  }

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

  /** REAL image decode via JDK ImageIO (PNG/JPEG/GIF/BMP — no external
    * codec jars needed): same batched mapPartitions seam as
    * [[decodeBatchedStub]], emitting a 15-float feature vector per asset:
    * `[width, height, meanR, meanG, meanB, lumaMean, lumaStd,
    * lumaHist0..7]` (histogram normalized to sum 1). Undecodable, empty,
    * or null payloads yield a NULL feature column, not an exception —
    * corrupt bytes are routine in crawled corpora and must not kill the
    * stage. Pixels are read through `getRGB` (sRGB-converted by ImageIO),
    * so the statistics are colorspace-stable across input formats.
    */
  def decodeImageFeatures(df: DataFrame, assetCol: String,
      batchSize: Int = 64, outCol: String = "image_features"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, true))
    val enc = Encoders.row(outSchema)
    val assetIdx = df.schema.fieldIndex(assetCol)
    val bytesIdx = df.schema(assetCol).dataType.asInstanceOf[StructType]
      .fieldIndex("bytes")
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val asset = row.getStruct(assetIdx)
          val bytes =
            if (asset == null || asset.isNullAt(bytesIdx)) null
            else asset.getAs[Array[Byte]](bytesIdx)
          Row.fromSeq(row.toSeq :+ imageKernel(bytes))
        }
      }
    }(enc)
  }

  /** Decode + statistics for one payload; null on any failure. */
  private[multimodal] def imageKernel(bytes: Array[Byte]): Seq[Float] = {
    if (bytes == null || bytes.isEmpty) return null
    try {
      val img = readImage(bytes)
      if (img == null) return null // ImageIO returns null for non-images
      val w = img.getWidth
      val h = img.getHeight
      val n = (w.toLong * h).toDouble
      var sr, sg, sb, sy, syy = 0.0
      val hist = new Array[Long](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          val luma = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sy += luma; syy += luma * luma
          hist(math.min((luma / 32.0).toInt, 7)) += 1
          x += 1
        }
        y += 1
      }
      val lumaMean = sy / n
      val lumaVar = math.max(syy / n - lumaMean * lumaMean, 0.0)
      (Seq(w.toDouble, h.toDouble, sr / n, sg / n, sb / n, lumaMean,
        math.sqrt(lumaVar)) ++ hist.map(_ / n)).map(_.toFloat)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** REAL resize: decode, scale to `width` x `height` (bilinear), re-encode
    * as PNG — struct-in/struct-out with the SAME signature [[stubResize]]
    * promised, now with transformed bytes, `image/png` mime, and
    * width/height recorded in meta. Assets that fail to decode pass
    * through unchanged (tagged `resize_error` in meta) so one corrupt
    * payload can't fail a batch job.
    */
  def resizeImages(df: DataFrame, assetCol: String, width: Int,
      height: Int, batchSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val enc = Encoders.row(df.schema)
    val assetIdx = df.schema.fieldIndex(assetCol)
    val st = df.schema(assetCol).dataType.asInstanceOf[StructType]
    val (uriIdx, mimeIdx, bytesIdx, metaIdx) = (st.fieldIndex("uri"),
      st.fieldIndex("mime"), st.fieldIndex("bytes"), st.fieldIndex("meta"))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val asset = row.getStruct(assetIdx)
          val out = resizeOne(asset, uriIdx, mimeIdx, bytesIdx, metaIdx,
            width, height)
          Row.fromSeq(row.toSeq.updated(assetIdx, out))
        }
      }
    }(enc)
  }

  private def resizeOne(asset: Row, uriIdx: Int, mimeIdx: Int,
      bytesIdx: Int, metaIdx: Int, width: Int, height: Int): Row = {
    if (asset == null) return null
    val bytes =
      if (asset.isNullAt(bytesIdx)) null
      else asset.getAs[Array[Byte]](bytesIdx)
    val baseMeta = Option(asset.getAs[Map[String, String]](metaIdx))
      .getOrElse(Map.empty[String, String])
    def passThrough(err: String): Row = Row(asset.get(uriIdx),
      asset.get(mimeIdx), bytes, baseMeta + ("resize_error" -> err))
    if (bytes == null || bytes.isEmpty) return passThrough("empty_payload")
    try {
      val img = readImage(bytes)
      if (img == null) return passThrough("undecodable")
      val dst = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = dst.createGraphics()
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(img, 0, 0, width, height, null)
      g2.dispose()
      Row(asset.get(uriIdx), "image/png", writePng(dst),
        baseMeta ++ Map("width" -> width.toString,
          "height" -> height.toString))
    } catch {
      case scala.util.control.NonFatal(e) =>
        passThrough(Option(e.getMessage).getOrElse(e.getClass.getName))
    }
  }

  /** REAL audio decode for WAV/AIFF/AU via JDK `javax.sound.sampled` (the
    * formats the JDK decodes without external codecs; MP3/AAC stay behind
    * the stub). Emits 8 floats per asset: `[sampleRate, channels,
    * nFrames, durationSec, rms, peak, zeroCrossRate, dcOffset]` over the
    * first channel, PCM normalized to [-1, 1]. Same batched seam and
    * corrupt-byte contract as [[decodeImageFeatures]].
    */
  def decodeAudioFeatures(df: DataFrame, assetCol: String,
      batchSize: Int = 64, outCol: String = "audio_features"): DataFrame = {
    import org.apache.spark.sql.Encoders
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, true))
    val enc = Encoders.row(outSchema)
    val assetIdx = df.schema.fieldIndex(assetCol)
    val bytesIdx = df.schema(assetCol).dataType.asInstanceOf[StructType]
      .fieldIndex("bytes")
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val asset = row.getStruct(assetIdx)
          val bytes =
            if (asset == null || asset.isNullAt(bytesIdx)) null
            else asset.getAs[Array[Byte]](bytesIdx)
          Row.fromSeq(row.toSeq :+ audioKernel(bytes))
        }
      }
    }(enc)
  }

  /** Decode + signal statistics for one payload; null on any failure. */
  private[multimodal] def audioKernel(bytes: Array[Byte]): Seq[Float] = {
    if (bytes == null || bytes.isEmpty) return null
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val channels = fmt.getChannels
        val bits = fmt.getSampleSizeInBits
        // linear PCM only: ULAW/ALAW are companded — decoding their bytes
        // as linear amplitudes would produce garbage statistics, so they
        // degrade to null like any other unsupported codec
        val enc = fmt.getEncoding
        if (enc != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          enc != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
          return null
        if (bits != 16 && bits != 8) return null // PCM 8/16-bit only
        val data = in.readAllBytes()
        val bytesPerFrame = fmt.getFrameSize
        val n = if (bytesPerFrame > 0) data.length / bytesPerFrame else 0
        if (n == 0) return null
        val big = fmt.isBigEndian
        var ss, sp, s1 = 0.0
        var crossings = 0L
        var prevNeg = false
        var i = 0
        while (i < n) {
          val off = i * bytesPerFrame
          // first channel only
          val v: Double =
            if (bits == 16) {
              val lo = data(off + (if (big) 1 else 0)) & 0xff
              val hi = data(off + (if (big) 0 else 1))
              ((hi << 8) | lo).toShort / 32768.0
            } else { // 8-bit: WAV is unsigned, AU/AIFF signed
              if (fmt.getEncoding ==
                javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
                ((data(off) & 0xff) - 128) / 128.0
              else data(off) / 128.0
            }
          ss += v * v
          s1 += v
          sp = math.max(sp, math.abs(v))
          val neg = v < 0
          if (i > 0 && neg != prevNeg) crossings += 1
          prevNeg = neg
          i += 1
        }
        Seq(fmt.getSampleRate, channels.toFloat, n.toFloat,
          (n / fmt.getSampleRate.toDouble).toFloat,
          math.sqrt(ss / n).toFloat, sp.toFloat,
          (crossings.toDouble / math.max(n - 1, 1)).toFloat,
          (s1 / n).toFloat)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => null }
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

  /** Deterministic 16x16 two-color test-card PNG per id — REAL ImageIO
    * encode, built to exercise the decode path with a provable duplicate
    * structure: the color pair comes from `id % 100` and the pixel
    * ARRANGEMENT (checkerboard vs stripes) from `(id / 100) % 2`. Both
    * arrangements place the same 50/50 pixel multiset, so
    * [[decodeImageFeatures]]'s statistics (means, luma, histogram) are
    * identical for every id sharing `id % 100` while the ENCODED BYTES
    * only match when the arrangement matches too — feature-level content
    * dedup is strictly stronger than byte-level, and both reduce to id
    * arithmetic an external oracle can replay.
    */
  def renderTestCards(df: DataFrame, idCol: String,
      outCol: String = "asset"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val outSchema = df.schema.add(outCol, assetSchema)
    val enc = Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { row =>
        val id = row.get(idIdx) match {
          // integral types only: a fractional id would silently truncate
          // and collide distinct rows onto one card
          case n: java.lang.Long => n.longValue()
          case n: java.lang.Integer => n.longValue()
          case n: java.lang.Short => n.longValue()
          case n: java.lang.Byte => n.longValue()
          case other => throw new IllegalArgumentException(
            s"renderTestCards: id column must be integral, got $other")
        }
        Row.fromSeq(row.toSeq :+ Row(s"mem://card/$id", "image/png",
          renderKernel(id), Map.empty[String, String]))
      }
    }(enc)
  }

  /** PNG bytes of one test card (see [[renderTestCards]]). PNG is
    * lossless over TYPE_INT_RGB, so decoded pixels equal these exactly.
    */
  private[multimodal] def renderKernel(id: Long): Array[Byte] = {
    val c = (id % 100).toInt
    val a = ((c * 37) % 256) << 16 | ((c * 59) % 256) << 8 | ((c * 83) % 256)
    // +7 offset keeps b != a for every c (64c mod 256 never hits 249), so
    // the two arrangements are always byte-distinct
    val b = ((c * 101 + 7) % 256) << 16 | ((c * 131 + 13) % 256) << 8 |
      ((c * 151 + 29) % 256)
    val stripes = (id / 100) % 2 == 1
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val first = if (stripes) x % 2 == 0 else (x + y) % 2 == 0
        img.setRGB(x, y, if (first) a else b)
        x += 1
      }
      y += 1
    }
    writePng(img)
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
