package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for selected queries (dev tool). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Seq("sky_li_2d", "q3_top_orders")
    // SPARK_GRAFT_EXPLAIN_EXEC=1: execute first and print the FINAL
    // adaptive plan (shows ReusedExchange / runtime join strategy picks
    // the static plan can't)
    val exec = sys.env.get("SPARK_GRAFT_EXPLAIN_EXEC").contains("1")
    names.foreach { n =>
      println(s"########## $n ##########")
      val df = graft.SparkEntry.queries(n)(spark, dir)
      if (exec) {
        df.count()
        println(df.queryExecution.executedPlan.toString)
      } else {
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
