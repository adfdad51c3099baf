package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-addressed sidecar store for oversized binary payloads.
  *
  * Parquet row groups degrade badly when single cells reach tens of MB
  * (a 100 MB video in a `binary` column makes every scan of the table pay
  * for it, defeats page-level compression, and balloons shuffle blocks if
  * the column ever escapes pruning). The standard lakehouse answer is
  * spill-to-reference: rows above a size threshold store only
  * (uri, content-hash, size) and the payload lives as one object per unique
  * content hash in an external store — here a directory, on a cluster an
  * object-store prefix reached through the same Hadoop `FileSystem` API.
  *
  * Content addressing gives write idempotence (re-runs and duplicate
  * payloads land on the same object name — the create is skip-if-exists)
  * and makes the store self-deduplicating. Fetch is lazy: downstream
  * metadata-only stages keep operating on the slim table; only stages that
  * need bytes call [[fetch]], which is a narrow map stage with one object
  * read per row.
  */
object AssetStore {

  private val SpilledKey = "spilled"
  private val HashKey = "content_hash"
  private val SizeKey = "orig_size"

  private def fs(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    (f, p)
  }

  private def writeIfAbsent(storeDir: String, bytes: Array[Byte],
      hashHex: String): String = {
    val (f, base) = fs(storeDir)
    val target = new org.apache.hadoop.fs.Path(base, hashHex + ".bin")
    if (!f.exists(target)) {
      // write-then-rename for atomicity; losers of a concurrent race see
      // rename fail against an existing target and discard their temp
      val tmp = new org.apache.hadoop.fs.Path(base,
        s".${hashHex}.${java.util.UUID.randomUUID()}.tmp")
      val out = f.create(tmp, false)
      try out.write(bytes) finally out.close()
      if (!f.rename(tmp, target) && f.exists(tmp)) f.delete(tmp, false)
    }
    target.toString
  }

  private def readAndVerify(uri: String, expectedHashHex: String): Array[Byte] = {
    val (f, p) = fs(uri)
    val in = f.open(p)
    val bytes =
      try {
        val len = f.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(0, buf)
        buf
      } finally in.close()
    // lower(hex(bigint)) and Long.toHexString agree exactly (unsigned
    // two's-complement, no leading zeros), so string equality is a true
    // integrity check
    val actual = java.lang.Long.toHexString(
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42L))
    require(actual == expectedHashHex,
      s"content hash mismatch for $uri: stored=$expectedHashHex read=$actual")
    bytes
  }

  /** Spill payloads of `assetCol` (struct<uri,mime,bytes,meta>) larger than
    * `threshold` bytes into `storeDir`. Spilled rows keep the struct shape:
    * `uri` → stored object path, `bytes` → null, `meta` gains
    * spilled/content_hash/orig_size entries. Rows at or under the threshold
    * pass through untouched.
    */
  def spill(df: DataFrame, assetCol: String, storeDir: String,
      threshold: Long): DataFrame = {
    // null-tolerant: `when` does not guarantee the untaken branch is never
    // evaluated, so the UDF must no-op for rows that stay inline
    val writeObject = udf { (bytes: Array[Byte], hashHex: String) =>
      if (bytes == null || hashHex == null) null
      else writeIfAbsent(storeDir, bytes, hashHex)
    }
    val a = col(assetCol)
    val hashHex = lower(hex(xxhash64(a("bytes"))))
    val big = Multimodal.payloadSize(a) > threshold
    val spilled = Multimodal.asset(
      writeObject(a("bytes"), hashHex),
      a("mime"),
      lit(null).cast("binary"),
      map_concat(coalesce(a("meta"), map()), map(
        lit(SpilledKey), lit("true"),
        lit(HashKey), hashHex,
        lit(SizeKey), Multimodal.payloadSize(a).cast("string"))))
    df.withColumn(assetCol, when(big, spilled).otherwise(a))
  }

  /** Rehydrate spilled payloads: rows whose meta marks them spilled read
    * their object back into `bytes` (verifying the content hash) and drop
    * the spill markers; others pass through. One object read per spilled
    * row, no shuffle.
    */
  def fetch(df: DataFrame, assetCol: String): DataFrame = {
    val readObject = udf { (uri: String, expectedHashHex: String) =>
      if (uri == null || expectedHashHex == null) null
      else readAndVerify(uri, expectedHashHex)
    }
    val a = col(assetCol)
    val meta = coalesce(a("meta"), map())
    val isSpilled = element_at(meta, SpilledKey) === "true"
    val restored = Multimodal.asset(
      a("uri"),
      a("mime"),
      readObject(a("uri"), element_at(meta, HashKey)),
      map_filter(meta, (k, _) =>
        !k.isin(SpilledKey, HashKey, SizeKey)))
    df.withColumn(assetCol, when(isSpilled, restored).otherwise(a))
  }
}
