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
    spark.stop()
  }
}
