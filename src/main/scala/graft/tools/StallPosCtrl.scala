package graft.tools

import org.apache.spark.sql.SparkSession

/** POSITIVE CONTROL for the StallSampler's spin-starvation meter.
  *
  * Round 19 left one validation hole (COVERAGE.md "external-contention
  * inducement inconclusive"): every EXTERNAL spinner topology tried was
  * shielded from the benched JVM by kernel autogrouping
  * (sched_autogroup_enabled=1) — the benched queries themselves never
  * inflated, so the experiments proved the LOAD never landed, not that
  * the meter works. Until a run shows the meter reading a real
  * fair-share starvation, a ~0-stall OVER can rule out suspension but
  * not all contention shapes.
  *
  * This main closes the hole from INSIDE the scheduling group: spinner
  * THREADS of this same JVM share its autogroup by construction, so the
  * scheduler must fair-share the Spark task threads, the sampler, and
  * the spinners against each other — the exact starvation shape the
  * meter exists to catch. For each spinner level it runs the bench's
  * fixed probe workload k times and records wall seconds and the
  * sampler's stall delta per run; the level-0 median is the quiet
  * baseline, so each contended run carries its own measured EXCESS to
  * compare its stall reading against.
  *
  * Expected shape (not a wall-clock identity — the spin samples ~20% of
  * the timeline): stall clearly positive under contention and scaling
  * with the excess, ~0 at level 0. A ~0 reading under demonstrable
  * inflation would falsify the meter and reopen the r19 watch item.
  */
object StallPosCtrl {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val reps = sys.env.getOrElse("SPARK_GRAFT_POSCTRL_REPS", "5").toInt
    val levels = sys.env.getOrElse("SPARK_GRAFT_POSCTRL_LEVELS",
      s"0,$cpus,${cpus.toInt * 2}").split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val stallNanos = StallSampler.start()
    def probe(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, 32)
        .select((col("id") % 99991L).as("k"), xxhash64(col("id")).as("h"))
        .groupBy("k").agg(sum("h").as("s")).count()
      (System.nanoTime() - t0) / 1e9
    }
    // warm the JIT/codegen paths so level-0 is steady state, not warmup
    (1 to 6).foreach(_ => probe())
    @volatile var spinOn = false
    def startSpinners(n: Int): Seq[Thread] = (1 to n).map { i =>
      val t = new Thread(() => {
        var x = i.toLong | 1L
        while (spinOn) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17 }
        if (x == 42L) println(x) // defeat dead-code elimination
      }, s"posctrl-spin-$i")
      t.setDaemon(true); t.start(); t
    }
    case class Level(n: Int, walls: Vector[Double], stalls: Vector[Double])
    val results = levels.map { n =>
      spinOn = true
      val threads = startSpinners(n)
      // let the scheduler settle the new runnables in
      Thread.sleep(500)
      val runs = Vector.fill(reps) {
        val s0 = stallNanos.get
        val w = probe()
        (w, (stallNanos.get - s0) / 1e9)
      }
      spinOn = false
      threads.foreach(_.join(2000))
      System.err.println(f"[posctrl] spinners=$n%3d walls=" +
        runs.map(r => f"${r._1}%.2f").mkString(",") + " stalls=" +
        runs.map(r => f"${r._2}%.2f").mkString(","))
      Level(n, runs.map(_._1), runs.map(_._2))
    }
    def med(v: Vector[Double]) = v.sorted.apply(v.length / 2)
    val base = med(results.find(_.n == 0)
      .getOrElse(results.minBy(_.n)).walls)
    def js(v: Vector[Double]) = v.map(d => f"$d%.3f").mkString("[", ",", "]")
    val levelJson = results.map { l =>
      val excess = med(l.walls) - base
      f"""{"spinners":${l.n},"walls":${js(l.walls)},""" +
      f""""stalls":${js(l.stalls)},"median_wall":${med(l.walls)}%.3f,""" +
      f""""median_stall":${med(l.stalls)}%.3f,""" +
      f""""median_excess_vs_quiet":$excess%.3f,""" +
      f""""inflation":${med(l.walls) / base}%.2f}"""
    }.mkString("[", ",", "]")
    println(s"""{"threads":$cpus,"reps":$reps,""" +
      f""""quiet_median_wall":$base%.3f,"levels":$levelJson}""")
    spark.stop()
  }
}
