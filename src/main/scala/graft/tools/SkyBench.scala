package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Direction.Min
import graft.operators._
import graft.operators.SkylineOps._

/**
 * Head-to-head with BASELINE.md: skyline over uniform random integers in
 * [0, 10^9] (the reference study's data distribution) at the reference's
 * N and d grid points, single JVM local[32] vs the reference's 12-core
 * YARN cluster + Kafka relay.
 */
object SkyBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def gen(n: Long, d: Int) = {
      val cols = (1 to d).map(i =>
        floor(rand(seed = i) * 1e9).cast("long").as(s"x$i"))
      spark.range(n).select(cols: _*)
    }

    val grid = (if (args.contains("--heavy")) Seq((1000000L, 7)) else Seq.empty) ++
      Seq((100000L, 2), (100000L, 5), (100000L, 7),
        (1000000L, 2), (1000000L, 5), (10000000L, 2), (10000000L, 3))
    for ((n, d) <- grid) {
      val df = gen(n, d)
      val dims = (1 to d).map(i => s"x$i" -> (Min: graft.core.Direction))
      val t0 = System.nanoTime()
      val size = df.skyline(dims).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[skybench] n=$n%8d d=$d  ${dt}%6.2f s  skyline=$size")
      if (args.contains("--hints") && d == 2) {
        for ((h, label) <- Seq(DimHint(12) -> "dim12", GridHint(7) -> "grid7",
            AngleHint(12) -> "angle12")) {
          val t1 = System.nanoTime()
          val s2 = df.skyline(dims, hint = h,
            bounds = Some(Seq.fill(d)((0.0, 1e9)))).count()
          println(f"[skybench] n=$n%8d d=$d $label ${(System.nanoTime() - t1) / 1e9}%6.2f s  skyline=$s2")
        }
      }
    }
    spark.stop()
  }
}
