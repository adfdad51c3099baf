package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = Seq(
    ("s3://bucket/a.jpg", "image/jpeg", "payload-a".getBytes, Map("w" -> "640", "n_frames" -> "0")),
    ("s3://bucket/b.jpg", "image/jpeg", "payload-b".getBytes, Map("w" -> "320")),
    ("s3://bucket/a2.jpg", "image/jpeg", "payload-a".getBytes, Map("w" -> "640")), // dup content of a
    ("s3://bucket/v.mp4", "video/mp4", "payload-v".getBytes, Map("n_frames" -> "95"))
  ).toDF("uri", "mime", "bytes", "meta")
    .select(Multimodal.asset($"uri", $"mime", $"bytes", $"meta").as("asset"))

  test("asset struct matches the declared schema") {
    assert(assets.schema("asset").dataType == Multimodal.assetSchema)
  }

  test("payload hash is content-determined") {
    val hs = assets.select($"asset.uri", Multimodal.payloadHash($"asset"))
      .as[(String, Long)].collect().toMap
    assert(hs("s3://bucket/a.jpg") == hs("s3://bucket/a2.jpg"))
    assert(hs("s3://bucket/a.jpg") != hs("s3://bucket/b.jpg"))
  }

  test("stub features are deterministic, sized, and in [-1,1]") {
    val f1 = assets.select(Multimodal.stubDecodeFeatures($"asset", 16).as("f"))
      .as[Array[Float]].collect()
    val f2 = assets.select(Multimodal.stubDecodeFeatures($"asset", 16).as("f"))
      .as[Array[Float]].collect()
    assert(f1.map(_.toSeq).toSeq == f2.map(_.toSeq).toSeq)
    f1.foreach { v =>
      assert(v.length == 16)
      v.foreach(x => assert(x >= -1.0f && x <= 1.0f))
    }
  }

  test("stub features feed the similarity operator (array<float> contract)") {
    val corpus = assets.select(
      monotonically_increasing_id().as("vec_id"),
      Multimodal.stubDecodeFeatures($"asset", 16).as("embedding"))
    val out = graft.operators.Similarity.bruteForceTopK(
      corpus, corpus.limit(1), k = 2, queryIdOut = "query_id")
    assert(out.count() == 2)
  }

  // --- real image path (JDK ImageIO; no external codecs) ---

  private def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real image decode: exact statistics on lossless PNG") {
    val red = pngBytes(4, 2)((_, _) => 0xff0000)
    val halfs = pngBytes(2, 2)((x, _) => if (x == 0) 0x000000 else 0xffffff)
    val df = Seq(("red.png", red), ("halfs.png", halfs), ("bad.png",
      "not an image".getBytes))
      .toDF("uri", "bytes")
      .select(Multimodal.asset($"uri", lit("image/png"), $"bytes",
        map().cast("map<string,string>")).as("asset"))
    val f = Multimodal.decodeImageFeatures(df, "asset")
      .select($"asset.uri", col("image_features"))
      .as[(String, Array[Float])].collect().toMap
    val fr = f("red.png")
    assert(fr(0) == 4.0f && fr(1) == 2.0f) // width, height
    assert(fr(2) == 255.0f && fr(3) == 0.0f && fr(4) == 0.0f) // mean RGB
    val fh = f("halfs.png")
    assert(fh(2) == 127.5f && fh(5) == 127.5f) // meanR, lumaMean
    assert(fh(7) == 0.5f && fh(14) == 0.5f) // luma hist: half dark, half bright
    assert(f("bad.png") == null) // corrupt bytes -> null, not a crash
  }

  test("real resize: target dims, png mime, re-decodable payload") {
    val grad = pngBytes(8, 8)((x, y) => (x * 32 << 16) | (y * 32 << 8))
    val df = Seq(("g.png", grad)).toDF("uri", "bytes")
      .select(Multimodal.asset($"uri", lit("image/png"), $"bytes",
        map(lit("src"), lit("test")).cast("map<string,string>")).as("asset"))
    val out = Multimodal.resizeImages(df, "asset", 4, 4)
      .select($"asset.uri", $"asset.mime", $"asset.bytes", $"asset.meta")
      .as[(String, String, Array[Byte], Map[String, String])]
      .head()
    assert(out._2 == "image/png")
    assert(out._4("width") == "4" && out._4("height") == "4")
    assert(out._4("src") == "test") // original meta preserved
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out._3))
    assert(back.getWidth == 4 && back.getHeight == 4)
    // corrupt payload passes through tagged, not thrown
    val bad = Seq(("b.bin", "junk".getBytes)).toDF("uri", "bytes")
      .select(Multimodal.asset($"uri", lit("application/octet-stream"),
        $"bytes", map().cast("map<string,string>")).as("asset"))
    val badOut = Multimodal.resizeImages(bad, "asset", 4, 4)
      .select($"asset.meta").as[Map[String, String]].head()
    assert(badOut("resize_error") == "undecodable")
  }

  private def wavBytes(sampleRate: Float, seconds: Double,
      freq: Double, amp: Double): Array[Byte] = {
    val n = (sampleRate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (amp * math.sin(2 * math.Pi * freq * i / sampleRate) *
        32767).toInt.toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true,
      false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real audio decode: sine-wave WAV statistics match theory") {
    val wav = wavBytes(8000f, 0.5, freq = 440, amp = 0.5)
    val df = Seq(("a.wav", wav), ("bad.wav", "noise".getBytes))
      .toDF("uri", "bytes")
      .select(Multimodal.asset($"uri", lit("audio/wav"), $"bytes",
        map().cast("map<string,string>")).as("asset"))
    val f = Multimodal.decodeAudioFeatures(df, "asset")
      .select($"asset.uri", col("audio_features"))
      .as[(String, Array[Float])].collect().toMap
    val fa = f("a.wav")
    assert(fa(0) == 8000f && fa(1) == 1f) // sample rate, channels
    assert(fa(2) == 4000f) // frames
    assert(math.abs(fa(3) - 0.5f) < 1e-3) // duration
    assert(math.abs(fa(4) - 0.5 / math.sqrt(2)) < 0.01) // rms = A/sqrt(2)
    assert(math.abs(fa(5) - 0.5f) < 0.01) // peak ~ A
    // sine at f crosses zero 2f times per second -> rate 2f/sr
    assert(math.abs(fa(6) - 2 * 440 / 8000.0) < 0.005)
    assert(math.abs(fa(7)) < 0.01) // no DC offset
    assert(f("bad.wav") == null) // undecodable -> null, not a crash
  }

  test("decoded image features feed similarity (array<float> contract)") {
    val imgs = (0 until 4).map { i =>
      (i.toLong, pngBytes(4, 4)((_, _) => i * 0x111111))
    }
    val corpus = imgs.toDF("vec_id", "bytes")
      .select($"vec_id", Multimodal.asset(lit("u"), lit("image/png"),
        $"bytes", map().cast("map<string,string>")).as("asset"))
    val feats = Multimodal.decodeImageFeatures(corpus, "asset")
      .select($"vec_id", col("image_features").as("embedding"))
    val out = graft.operators.Similarity.bruteForceTopK(
      feats, feats.limit(1), k = 2, queryIdOut = "query_id")
    assert(out.count() == 2)
  }

  test("stubResize records target dims in meta, payload/mime untouched") {
    val r = assets.select(
      Multimodal.stubResize($"asset", 224, 224).as("asset"))
    val row = r.select($"asset.mime", $"asset.meta", $"asset.bytes")
      .where($"asset.uri" === "s3://bucket/b.jpg")
      .as[(String, Map[String, String], Array[Byte])].head()
    assert(row._1 == "image/jpeg")
    assert(row._2("width") == "224" && row._2("height") == "224")
    assert(row._2("w") == "320") // original metadata preserved
    assert(new String(row._3) == "payload-b")
  }

  test("batched mapPartitions decode: deterministic, batch-shape invariant") {
    val a = Multimodal.decodeBatchedStub(assets, "asset", dim = 8,
      batchSize = 2)
      .select($"asset.uri", $"features")
      .as[(String, Seq[Float])].collect().toMap
    // batch size and partitioning must not change results
    val b = Multimodal.decodeBatchedStub(assets.repartition(3), "asset",
      dim = 8, batchSize = 64)
      .select($"asset.uri", $"features")
      .as[(String, Seq[Float])].collect().toMap
    assert(a == b)
    assert(a.values.forall(_.length == 8))
    // content-determined: identical payloads get identical features
    assert(a("s3://bucket/a.jpg") == a("s3://bucket/a2.jpg"))
    assert(a("s3://bucket/a.jpg") != a("s3://bucket/b.jpg"))
  }

  test("content dedup keeps one asset per payload") {
    val out = Multimodal.dedupByContent(assets, "asset")
    assert(out.count() == 3)
    val uris = out.select($"asset.uri").as[String].collect().toSet
    assert(uris.contains("s3://bucket/a.jpg")) // min uri wins
    assert(!uris.contains("s3://bucket/a2.jpg"))
  }

  test("frame sampling explodes stride-spaced indices from metadata") {
    val frames = Multimodal.stubSampleFrames(
      assets.filter($"asset.mime" === "video/mp4"), "asset", stride = 10)
    assert(frames.count() == 10) // 0,10,...,90
    val idx = frames.select($"frame_index").as[Int].collect().toSeq
    assert(idx == (0 until 95 by 10).toSeq)
  }

  test("binaryFile ingest produces asset rows with mime and metadata") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest")
    java.nio.file.Files.write(dir.resolve("a.jpg"), "jpegbytes".getBytes)
    java.nio.file.Files.write(dir.resolve("b.mp4"), "mp4bytes!!".getBytes)
    java.nio.file.Files.write(dir.resolve("notes.xyz"), "???".getBytes)
    val rows = Multimodal.ingestFiles(spark, dir.toString)
      .select($"asset.uri", $"asset.mime",
        org.apache.spark.sql.functions.length($"asset.bytes").as("len"),
        org.apache.spark.sql.functions.element_at($"asset.meta", "length")
          .as("meta_len"))
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getString(1),
        r.getInt(2), r.getString(3)))
      .toSet
    assert(rows == Set(
      ("a.jpg", "image/jpeg", 9, "9"),
      ("b.mp4", "video/mp4", 10, "10"),
      ("notes.xyz", "application/octet-stream", 3, "3")))
    assert(Multimodal.ingestFiles(spark, dir.toString, glob = "*.jpg")
      .count() == 1)
  }

  test("test cards: real PNG round trip, feature classes collapse " +
      "arrangements, byte classes do not") {
    val ids = spark.range(400).select($"id".as("vec_id"))
    val feats = Multimodal.decodeImageFeatures(
      Multimodal.renderTestCards(ids, "vec_id"), "asset")
    val rows = feats.select($"vec_id", $"image_features",
      Multimodal.payloadHash($"asset").as("ph")).collect()
    assert(rows.length == 400 && rows.forall(!_.isNullAt(1)))
    // checker id and stripes id of the same color pair: same features,
    // different bytes; different color pair: different features
    val bySeq = rows.map(r => r.getLong(0) ->
      (r.getSeq[Float](1), r.getLong(2))).toMap
    assert(bySeq(7L)._1 == bySeq(207L)._1)   // same pair, both checker
    assert(bySeq(7L)._2 == bySeq(207L)._2)   // ... identical bytes too
    assert(bySeq(7L)._1 == bySeq(107L)._1)   // stripes: features equal
    assert(bySeq(7L)._2 != bySeq(107L)._2)   // ... but bytes differ
    assert(bySeq(7L)._1 != bySeq(8L)._1)     // different pair differs
    // decoded stats are exact: width, height, and the 50/50 histogram mass
    val f = bySeq(0L)._1
    assert(f(0) == 16.0f && f(1) == 16.0f)
  }

  test("metadata-only projection prunes payload bytes from the scan") {
    val plan = assets.select($"asset.uri", $"asset.meta")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("bytes") || plan.contains("Project"))
  }
}
