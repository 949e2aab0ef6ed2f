package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Direction.Min
import graft.operators.SkylineOps._

/** Quick timing probe for the external skyline cascade while tuning its
  * pass schedule (sampled pre-filter + geometric window growth). Args:
  * shape n d [cap] where shape is `anti` (frontier ≈ n) or `uniform`
  * (frontier small). Prints one line: seconds + result rows. */
object SkyExtProbe {
  def main(args: Array[String]): Unit = {
    val shape = if (args.length > 0) args(0) else "anti"
    val n = if (args.length > 1) args(1).toLong else 100000L
    val d = if (args.length > 2) args(2).toInt else 10
    val cap = if (args.length > 3) Some(args(3).toInt) else None
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cap.foreach(c =>
      spark.conf.set("spark.graft.skyline.maxBufferPoints", c.toString))
    val df = shape match {
      case "anti" =>
        val raw = (1 to d).map(i => rand(seed = 100 + i).as(s"u$i"))
        val tot = (1 to d).map(i => col(s"u$i")).reduce(_ + _)
        spark.range(n).select(raw: _*)
          .select((1 to d).map(i => (col(s"u$i") / tot * 1e9).as(s"x$i")): _*)
      case _ =>
        spark.range(n).select((1 to d).map(i =>
          floor(rand(seed = i) * 1e9).cast("long").as(s"x$i")): _*)
    }
    val dims = (1 to d).map(i => s"x$i" -> (Min: graft.core.Direction))
    val t0 = System.nanoTime()
    val rows = df.skylineExternal(dims).count()
    println(f"[skyext] $shape n=$n d=$d cap=${cap.getOrElse(-1)} " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s rows=$rows")
    spark.stop()
  }
}
