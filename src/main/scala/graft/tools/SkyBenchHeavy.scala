package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Direction.Min
import graft.operators.SkylineOps._
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
        "nohint+presort" -> (() => df.skyline(dims, presort = true).count()))) {
      val t0 = System.nanoTime()
      val size = run()
      println(f"[heavy] n=1e7 d=7 $label ${(System.nanoTime() - t0) / 1e9}%.1f s skyline=$size")
    }
    spark.stop()
  }
}
