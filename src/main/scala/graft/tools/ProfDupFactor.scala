package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch measurement (not library surface): cross-band candidate
  * duplication factor of the minhash band join — raw band-collision pairs
  * vs unique pairs. ROADMAP gates cross-band suppression on this being
  * > ~3: below that, carrying signatures into the band stream costs more
  * than the duplicate pair rows it saves.
  */
object ProfDupFactor {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bands = 16
    val rowsPerBand = 4
    val banded = docs
      .select(col("doc_id"),
        Dedup.minhashSignature(
          Dedup.shingleHashes(col("text"), 3), 64, 42L).as("__sig"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        ).as(Seq("__band", "__bandhash")))
    val a = banded.select(col("__band"), col("__bandhash"),
      col("doc_id").as("id_a"))
    val b = banded.select(col("__band"), col("__bandhash"),
      col("doc_id").as("id_b"))
    val raw = a.join(b, Seq("__band", "__bandhash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .persist()
    val nRaw = raw.count()
    val nUniq = raw.distinct().count()
    println(f"raw=$nRaw uniq=$nUniq dupFactor=${nRaw.toDouble / nUniq.max(1)}%.2f")
    spark.stop()
  }
}
