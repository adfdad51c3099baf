package graft.multimodal

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AssetStoreSpec extends SparkSpec {
  import spark.implicits._

  private val big = Array.tabulate[Byte](4096)(i => (i * 31).toByte)
  private val small = "tiny".getBytes

  private def mkAssets = Seq(
    ("a://big1", "video/mp4", big, Map("k" -> "v")),
    ("a://big1-dup", "video/mp4", big, Map.empty[String, String]), // same content
    ("a://small", "image/jpeg", small, Map("k" -> "v")),
    ("a://nullbytes", "image/jpeg", null.asInstanceOf[Array[Byte]], Map("k" -> "v"))
  ).toDF("uri", "mime", "bytes", "meta")
    .select(Multimodal.asset($"uri", $"mime", $"bytes", $"meta").as("asset"))

  test("spill externalizes only oversized payloads, content-addressed") {
    val dir = Files.createTempDirectory("graft-assetstore").toString
    val spilled = AssetStore.spill(mkAssets, "asset", dir, threshold = 1024)
      .cache()

    val rows = spilled
      .select($"asset.uri", $"asset.bytes".isNull.as("noBytes"),
        element_at($"asset.meta", "spilled").as("mark"),
        element_at($"asset.meta", "orig_size").as("sz"))
      .collect().map(r => (r.getString(0), r.getBoolean(1),
        Option(r.getString(2)), Option(r.getString(3)))).toList

    // both big rows now point into the store with no inline bytes
    assert(rows.count(r => r._2 && r._3.contains("true")) == 2)
    assert(rows.filter(r => r._3.contains("true"))
      .forall(r => r._1 != null && !r._1.startsWith("a://")))
    assert(rows.filter(r => r._3.contains("true")).forall(_._4.contains("4096")))
    // small + null rows untouched
    assert(rows.exists(r => r._1 == "a://small" && !r._2 && r._3.isEmpty))
    assert(rows.exists(r => r._1 == "a://nullbytes" && r._2 && r._3.isEmpty))

    // identical content -> ONE object in the store
    val objects = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".bin"))
    assert(objects.length == 1, objects.map(_.getName).mkString(","))
    assert(objects.head.length == 4096)

    // fetch restores the exact payload and strips the spill markers
    val restored = AssetStore.fetch(spilled, "asset")
    val back = restored
      .select($"asset.bytes", element_at($"asset.meta", "spilled").as("mark"),
        element_at($"asset.meta", "k").as("k"))
      .collect()
    assert(back.count(r => r.get(0) != null &&
      java.util.Arrays.equals(r.getAs[Array[Byte]](0), big)) == 2)
    back.foreach(r => assert(r.getString(1) == null))
    // original meta entries survive the round trip
    assert(back.count(r => r.getString(2) == "v") >= 2)
    spilled.unpersist()
  }

  test("parquet metadata reads prune the bytes field out of the scan") {
    // the slim-table promise: after spill, metadata-only stages must not
    // pay for the binary column (nested schema pruning reaches into the
    // asset struct)
    val dir = Files.createTempDirectory("graft-assetstore-prune").toString
    AssetStore.spill(mkAssets, "asset", s"$dir/store", threshold = 1024)
      .write.parquet(s"$dir/table")
    val plan = spark.read.parquet(s"$dir/table")
      .select($"asset.uri", element_at($"asset.meta", "content_hash"))
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(plan)
    assert(readSchema.contains("uri") && !readSchema.contains("bytes"),
      readSchema)
  }

  test("fetch fails loudly on store corruption") {
    val dir = Files.createTempDirectory("graft-assetstore-corrupt").toString
    val spilled = AssetStore.spill(mkAssets, "asset", dir, threshold = 1024)
    spilled.count() // materialize the store
    val obj = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".bin")).head
    Files.write(obj.toPath, "corrupted".getBytes)
    // drop Hadoop's local-FS CRC sidecar so the store's own content-hash
    // verification (the only guard on object stores) is what fires
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val ex = intercept[Exception] {
      AssetStore.fetch(spilled, "asset").select($"asset.bytes").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("content hash mismatch"))))
  }
}
