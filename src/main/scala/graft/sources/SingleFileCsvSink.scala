package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** Publishes a DataFrame as ONE named CSV file with a header.
  *
  * Reproduces the reference's publish contract
  * (`/root/reference/src/pipeline.py:21-36`): write to a temp directory with a
  * single task, locate the `part-*.csv`, move it to the target filename,
  * delete the temp directory. Overwrite mode makes the publish idempotent
  * (rerun-safe full refresh, `road_map.md:178-186`).
  *
  * Scale note: `coalesce(1)` funnels the whole plan into one task — this sink
  * exists ONLY for small publish artifacts (DQ ledgers, run logs, sub-million
  * row gold tables). The 100 TB path writes partitioned parquet; see callers.
  */
object SingleFileCsvSink {

  def write(df: DataFrame, targetFile: String): Unit = {
    val target = Paths.get(targetFile)
    val tmpDir = target.resolveSibling(s"_tmp_${target.getFileName}")
    df.coalesce(1)
      .write
      .mode("overwrite")
      .option("header", "true")
      .csv(tmpDir.toString)
    val part = Files
      .list(tmpDir)
      .iterator()
      .asScala
      .find(p => p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".csv"))
      .getOrElse(sys.error(s"no part file produced under $tmpDir"))
    if (target.getParent != null) Files.createDirectories(target.getParent)
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    // clean the temp dir (part file already moved out)
    Files.walk(tmpDir).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }
}
