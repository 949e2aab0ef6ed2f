package graft

/**
 * Environment fingerprint shared by every benchmark entrypoint
 * ([[Bench]], the `graft.tools` ANN/skyline tools): committed timing
 * artifacts carry their own yardstick so host throttling and
 * contention are detectable from the artifact instead of adjudicated
 * post-hoc.
 *
 * Two measures, because they fail differently (VERDICT r14 item 1):
 *
 *  - [[spinSeconds]] — a fixed single-thread arithmetic loop. Catches
 *    per-core frequency throttling (r13: 1.92 -> 7.9 s across one
 *    session on identical code) but is BLIND to multi-core contention:
 *    the r14 driver bench ran 45% slow with spin reading a quiet
 *    1.73-2.01 s, because a single thread still got a full core while
 *    the 32-thread suite did not.
 *  - [[effectiveCores]] — N concurrent copies of the same fixed loop;
 *    effective cores = N * t_single / t_wall. On a quiet 32-core host
 *    this reads close to the core count; hypervisor-level multi-core
 *    contention (the r14 failure shape: ~17 effective cores) shows up
 *    directly. `tools/check_addendum.py` gates quoted artifacts on
 *    this figure (envgate rule).
 */
object EnvProbe {
  /** The fixed spin kernel. Returns wall seconds for `iters`
    * iterations of a data-dependent integer loop (not vectorizable,
    * not dead-code-eliminable). */
  private def spinWork(iters: Long): Double = {
    var x = 0L
    var i = 0L
    val t0 = System.nanoTime()
    while (i < iters) { x += i * 31 + (x >> 3); i += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    if (x == 42L) System.err.println("") // defeat dead-code elimination
    dt
  }

  /** The single-thread yardstick: 1.5e9 iterations, ~0.5-1.5 s on a
    * quiet core. Iteration count is part of the artifact contract —
    * changing it desynchronizes every committed spin figure. */
  def spinSeconds(): Double =
    math.rint(spinWork(1500000000L) * 1000) / 1000

  /** Parallel-spin effective cores: run `threads` concurrent copies of
    * a 300M-iteration spin (~1/5 of the yardstick loop each) and
    * compare against a single-thread run of the same work measured
    * immediately before. If the host delivers C unthrottled cores and
    * C >= threads, wall time of the parallel phase ~= the single run
    * and the result reads ~= `threads`; contention that only
    * multi-core load can see (the r14 blind spot) divides it down.
    * Cost ~0.5-1 s total on a quiet host. */
  def effectiveCores(threads: Int = Runtime.getRuntime.availableProcessors()): Double = {
    val perThreadIters = 300000000L
    val single = spinWork(perThreadIters)
    val times = new Array[Double](threads)
    val ts = (0 until threads).map { i =>
      new Thread(() => { times(i) = spinWork(perThreadIters) })
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start())
    ts.foreach(_.join())
    val wall = (System.nanoTime() - t0) / 1e9
    val eff = math.min(threads.toDouble, threads * single / math.max(wall, 1e-9))
    math.rint(eff * 100) / 100
  }

  private def loadAvg(): Double = {
    val v = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    math.rint(v * 100) / 100
  }

  /** One measurement point: spin + effective cores + load, as JSON
    * fragments keyed with the given suffix ("start"/"end"). */
  def snapshotJson(suffix: String): String = {
    val spin = spinSeconds()
    val eff = effectiveCores()
    val load = loadAvg()
    s""""spin_${suffix}_s":$spin,"eff_cores_$suffix":$eff,"load_$suffix":$load"""
  }

  /** Full env block for an artifact: start/end snapshots are taken by
    * the caller (they bracket the timed suite); this appends the
    * static host facts. */
  def staticJson(): String = {
    val heapGb = math.rint(Runtime.getRuntime.maxMemory / 1e9 * 100) / 100
    s""""heap_max_gb":$heapGb,"jvm_cpus":${Runtime.getRuntime.availableProcessors()}"""
  }
}
