package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Once-per-round exact-vs-LSH SemDeDup parity at sf1 — the law that
  * lets the sf3 rung drop the x36 exact arm (it cost 65-99 s of every
  * rung run to exercise a contract-documented verification-only plan;
  * x131 carries the production LSH path's sf3 budget).
  *
  * Law: over the sf1 embeddings (10 per-copy perturbed copies of each
  * sf0.1 vector — deterministic near-colinear clusters, pairwise cosine
  * ~0.9999, while DISTINCT base vectors top out near 0.60), the
  * survivor set of [[graft.operators.Similarity.semanticDedup]] with
  * `exact = true` equals the survivor set with `exact = false` at
  * threshold 0.95, planes sized by
  * [[graft.operators.Similarity.recommendedPlanes]]. The cluster pairs
  * sit so far above the threshold that the OR-amplified recall is
  * w.h.p. exact (per-chain-edge miss ~1e-9 at this geometry), and no
  * cross-cluster pair comes near 0.95 — so set EQUALITY, not overlap,
  * is the assertion. A planted-cluster spec (SimilaritySpec
  * "semanticDedup: LSH path matches exact path") pins the same law at
  * unit scale; this main pins it at 60k rows with the real corpus-sized
  * plane count.
  *
  * Emits one JSON line + target/semdedup_parity_sf1.json; exits 1 on
  * any survivor-set difference.
  */
object SemDedupParitySf1 {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse("/tmp/sfdata/sf1")
    val outFile = args.lift(1).getOrElse("target/semdedup_parity_sf1.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-semdedup-parity-sf1")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT_BYTES", "2097152"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val rows = emb.count()
    val planes = graft.operators.Similarity.recommendedPlanes(rows)
    def survivors(exact: Boolean): (Set[Long], Double) = {
      val t0 = System.nanoTime()
      // survivor ids are corpus-minus-losers: bounded by the corpus id
      // count (60k at sf1) — a diagnostic collect, not a query plan
      val s = graft.operators.Similarity.semanticDedup(
          emb, threshold = 0.95, exact = exact,
          nPlanes = planes, nTables = 4)
        .select(col("vec_id").cast("long"))
        .collect().map(_.getLong(0)).toSet
      (s, (System.nanoTime() - t0) / 1e9)
    }
    val (ex, exSec) = survivors(exact = true)
    val (lsh, lshSec) = survivors(exact = false)
    val onlyExact = (ex -- lsh).toSeq.sorted
    val onlyLsh = (lsh -- ex).toSeq.sorted
    val ok = onlyExact.isEmpty && onlyLsh.isEmpty
    def num(d: Double) = String.format(java.util.Locale.ROOT, "%.2f",
      java.lang.Double.valueOf(d))
    val json =
      s"""{"metric":"semdedup_parity_sf1","rows":$rows,"planes":$planes""" +
      s""","exact_survivors":${ex.size},"lsh_survivors":${lsh.size}""" +
      s""","only_exact":${onlyExact.take(20).mkString("[", ",", "]")}""" +
      s""","only_lsh":${onlyLsh.take(20).mkString("[", ",", "]")}""" +
      s""","exact_sec":${num(exSec)},"lsh_sec":${num(lshSec)}""" +
      s""","equal":$ok}"""
    println(json)
    val p = java.nio.file.Paths.get(outFile)
    if (p.getParent != null)
      java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    if (!ok) {
      System.err.println(s"[semdedup-parity] FAIL: ${onlyExact.size} " +
        s"exact-only + ${onlyLsh.size} lsh-only survivors")
      sys.exit(1)
    }
    System.err.println(f"[semdedup-parity] PASS: ${ex.size} survivors " +
      f"both arms (exact $exSec%.1fs, lsh $lshSec%.1fs, $planes planes)")
  }
}
