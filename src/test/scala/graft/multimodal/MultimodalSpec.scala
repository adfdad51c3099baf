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

  test("metadata-only projection prunes payload bytes from the scan") {
    val plan = assets.select($"asset.uri", $"asset.meta")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("bytes") || plan.contains("Project"))
  }
}
