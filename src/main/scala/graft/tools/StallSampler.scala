package graft.tools

/** In-window host/JVM stall meter, shared by the measurement mains
  * (Bench, StateGrowthSoak, StreamLongevitySoak).
  *
  * The round-19 transient adjudication found compute stalls that
  * inflate a query 2-13x while its BRACKETING calibration probes stay
  * quiet — the stall starts and ends inside the measured window, where
  * no probe can see (X117_TRANSIENT_r19.json). This daemon thread
  * measures from inside every window, with two complementary meters
  * accumulated into one counter:
  *
  *  - SLEEP OVERSLEEP (suspension meter): sleep 100ms, accumulate
  *    lateness beyond 150ms. Catches whole-JVM/vCPU pauses (GC,
  *    safepoint, host freeze) — but NOT fair-share CPU contention:
  *    validated by experiment, spinner load that inflated benched
  *    queries 2x left a sleeper waking on time every round (CFS boosts
  *    sleeper wakeups).
  *  - SPIN STARVATION (contention meter): after each sleep, spin a
  *    fixed integer loop sized to ~25ms and accumulate the spin's WALL
  *    minus THREAD-CPU time — exactly the nanoseconds the runnable
  *    sampler was preempted or paused, by direct measurement. The
  *    length matters and was validated by experiment: CFS
  *    wakeup-placement credit lets a freshly-woken thread run
  *    UNPREEMPTED for roughly a scheduling latency, so a short (~3ms)
  *    post-sleep spin measured ZERO under an induced starvation that
  *    inflated the benched queries — both a 2x-of-minimum test and
  *    wall-minus-cpu on the short spin are blind. A ~25ms spin
  *    outlives the credit and its tail takes the preemption.
  *
  * The spin samples ~20% of the timeline, so readings are INDICATORS
  * (~0 vs clearly positive), not a wall-clock decomposition. Cost:
  * ~24% of ONE thread = ~0.75% of a 32-core box — measured below
  * bench noise (a 68-query subset gate read 0.92x vs the pre-sampler
  * baseline). A caller snapshots the counter before and after a
  * window; the difference is that window's sampled stall.
  */
object StallSampler {

  /** Start the daemon sampler thread; returns the cumulative
    * stall-nanos counter it feeds. Call once per JVM (each call starts
    * an independent thread+counter; the mains call it once in main()).
    */
  def start(): java.util.concurrent.atomic.AtomicLong = {
    val stallNanos = new java.util.concurrent.atomic.AtomicLong
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
    val cpuTimeWorks = tmx.isCurrentThreadCpuTimeSupported
    val t = new Thread(() => {
      var sink = 0L // observed via the predicate below: not dead code
      while (true) {
        val t0 = System.nanoTime()
        try Thread.sleep(100) catch { case _: InterruptedException => }
        val afterSleep = System.nanoTime()
        val over = afterSleep - t0 - 150000000L
        if (over > 0) stallNanos.addAndGet(over)
        if (cpuTimeWorks) {
          val c0 = tmx.getCurrentThreadCpuTime
          var i = 0
          var x = afterSleep | 1L
          while (i < 8000000) {
            x ^= x << 13; x ^= x >>> 7; x ^= x << 17
            i += 1
          }
          sink += x
          val starved = (System.nanoTime() - afterSleep) -
            (tmx.getCurrentThreadCpuTime - c0)
          // 3ms floor: clock-granularity jitter between the two clocks
          // reads as sub-ms phantom starvation on a quiet host
          if (starved > 3000000L && sink != 1L)
            stallNanos.addAndGet(starved)
        }
      }
    }, "graft-stall-sampler")
    t.setDaemon(true)
    t.start()
    stallNanos
  }
}
