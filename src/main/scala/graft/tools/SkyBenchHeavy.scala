package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Direction.Min
import graft.operators.SkylineOps._

/** High-dimensional stress runs: the d=7 hint grid from BASELINE.md plus
  * a d=10 ANTI-correlated run — the shape SURVEY §7 names as THE 100 TB
  * risk (the skyline approaches the input size and buffers balloon).
  * The run must either complete or fail loudly through the configured
  * buffer cap; an executor OOM is the one unacceptable outcome. */
object SkyBenchHeavy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = 7
    val cols = (1 to d).map(i => floor(rand(seed = i) * 1e9).cast("long").as(s"x$i"))
    val df = spark.range(10000000L).select(cols: _*)
    val dims = (1 to d).map(i => s"x$i" -> (Min: graft.core.Direction))
    // --kband-only skips the (slow) d=7 n=1e7 skyline grid when
    // iterating on the k-skyband sections below
    if (!args.contains("--kband-only"))
    for ((label, run) <- Seq[(String, () => Long)](
        "angle3" -> (() => df.skyline(dims, hint = graft.operators.AngleHint(3)).count()),
        "angle2" -> (() => df.skyline(dims, hint = graft.operators.AngleHint(2)).count()),
        "nohint+presort" -> (() => df.skyline(dims, presort = Some(true)).count()))) {
      val t0 = System.nanoTime()
      val size = run()
      println(f"[heavy] n=1e7 d=7 $label ${(System.nanoTime() - t0) / 1e9}%.1f s skyline=$size")
    }

    // d=10 anti-correlated: points near the anti-diagonal plane
    // sum(x_i) ~ const, where almost nothing dominates anything — the
    // worst case for skyline size. n is modest because the frontier is a
    // large fraction of n (BNL work ~ n * |frontier|).
    val d10 = 10
    val n10 = 100000L
    val anti = {
      val raw = (1 to d10).map(i => rand(seed = 100 + i).as(s"u$i"))
      val tot = (1 to d10).map(i => col(s"u$i")).reduce(_ + _)
      spark.range(n10).select(raw: _*)
        .select((1 to d10).map(i => (col(s"u$i") / tot * 1e9).as(s"x$i")): _*)
    }
    val dims10 = (1 to d10).map(i => s"x$i" -> (Min: graft.core.Direction))
    if (!args.contains("--kband-only")) {
      val t0 = System.nanoTime()
      val size = anti.skyline(dims10).count() // presort auto-enables at d >= 5
      println(f"[heavy] n=1e5 d=10 anti ${(System.nanoTime() - t0) / 1e9}%.1f s skyline=$size")

      // same data under a deliberately small cap: the required outcome is
      // the loud IllegalStateException, never a silent OOM
      spark.conf.set("spark.graft.skyline.maxBufferPoints", "2000")
      val capped = try {
        anti.skyline(dims10).count()
        "NOT TRIPPED (frontier fit under the cap)"
      } catch {
        case e: Exception if Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null).take(10)
            .exists(t => String.valueOf(t.getMessage).contains("maxBufferPoints")) =>
          "tripped loudly, as designed"
      }
      spark.conf.unset("spark.graft.skyline.maxBufferPoints")
      println(s"[heavy] d=10 anti with cap=2000: $capped")
    }

    // k-skyband grid: the band is a SUPERSET of the skyline and grows
    // with k; the FINAL merge is one task re-inserting every partial
    // buffer (O(sum-of-buffers x band) dominance tests) and the emission
    // recount is O(|band|^2) — so high-d data at k > 1 is its distinct
    // worst case, single-threaded where the skyline's small buffers
    // never hurt. Measured while sizing this grid: d=7 uniform n=1e6 at
    // k=2 put the final merge task past 2 min on one core, and d=10
    // anti n=1e5 at k=8 (band ~= the whole input) sat in the emission
    // recount for 10+ min UNDER the default 1M-point cap — the cap
    // bounds memory, and a band that fits it can still cost quadratic
    // CPU. The production posture on frontier-heavy data is therefore a
    // deliberate cap sized to what the consumer can actually use (the
    // trip demo below); the timing grid runs at sizes where the band is
    // a useful result, with and without the SFS presort to record what
    // the heuristic buys.
    val df2e5 = spark.range(200000L).select(cols: _*)
    val anti2e4 = anti.limit(20000)
    for (k <- Seq(2, 8); (label, data, dd) <- Seq(
        ("d=7 uniform n=2e5", df2e5, dims),
        ("d=10 anti n=2e4", anti2e4, dims10))) {
      for (ps <- Seq(false, true)) {
        val t1 = System.nanoTime()
        val bandSize = data.kSkyband(dd, k = k, presort = Some(ps)).count()
        println(f"[heavy] kband $label k=$k presort=$ps " +
          f"${(System.nanoTime() - t1) / 1e9}%.1f s band=$bandSize")
      }
    }
    // the verdict-shape worst case — d=10 anti-correlated n=1e5, k=8 —
    // under a consumer-sized cap: the loud trip is the REQUIRED outcome
    // (an uncapped run is a 10+ min single-core recount; an OOM is the
    // unacceptable one)
    spark.conf.set("spark.graft.skyline.maxBufferPoints", "20000")
    val kCapped = try {
      anti.kSkyband(dims10, k = 8).count()
      "NOT TRIPPED (band fit under the cap)"
    } catch {
      case e: Exception if Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).take(10)
          .exists(t => String.valueOf(t.getMessage).contains("maxBufferPoints")) =>
        "tripped loudly, as designed"
    }
    spark.conf.unset("spark.graft.skyline.maxBufferPoints")
    println(s"[heavy] d=10 anti n=1e5 k-skyband k=8 cap=20000: $kCapped")
    spark.stop()
  }
}
