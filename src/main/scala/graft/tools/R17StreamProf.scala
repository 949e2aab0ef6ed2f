package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-17 streaming-floor attribution (dev tool): drive ONE drain the
  * exact way [[graft.streaming.SkylineStreaming.runOnce]] does, but
  * keep the StreamingQuery handle and dump Spark's own per-micro-batch
  * duration breakdown (`StreamingQueryProgress.durationMs`: addBatch /
  * getBatch / latestOffset / queryPlanning / walCommit / commitOffsets /
  * triggerExecution) plus wall brackets around start()/awaitTermination,
  * so the ~1.3 s/query floor is attributed to its components instead of
  * guessed at.
  *
  * usage: runMain graft.tools.R17StreamProf [reps]
  */
object R17StreamProf {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def drainOnce(label: String): Unit = {
      val schema = spark.read.parquet(s"$dir/events.parquet").schema
      val stream = graft.sources.EventTime.withTsUtc(
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir))
      val agg = graft.streaming.EventStreams.windowedAgg(
        stream, "ts_utc", watermarkDelay = "1 hour", windowDuration = "1 hour",
        keyCols = Seq("event_type"),
        aggs = Seq(count(lit(1)).as("n_events")))
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val t0 = System.nanoTime()
        val q = agg.writeStream
          .format("memory").queryName(s"r17prof_$label")
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .start()
        val t1 = System.nanoTime()
        q.awaitTermination()
        val t2 = System.nanoTime()
        spark.table(s"r17prof_$label").count()
        val t3 = System.nanoTime()
        println(f"[$label] start()=${(t1 - t0) / 1e9}%.3f await=${(t2 - t1) / 1e9}%.3f read=${(t3 - t2) / 1e9}%.3f total=${(t3 - t0) / 1e9}%.3f")
        q.recentProgress.foreach { p =>
          println(s"  batch ${p.batchId}: rows=${p.numInputRows} durationMs=${p.durationMs}")
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    (1 to reps).foreach(i => drainOnce(s"w$i"))
    spark.stop()
  }
}
