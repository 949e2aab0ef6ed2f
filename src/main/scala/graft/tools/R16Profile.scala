package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB profiler for a named SparkEntry query (round-16 dev tool, not
  * part of the driver contract): registers a listener that records every
  * job's wall time + call site, runs the query once cold (warmup) and
  * once warm (the reported pass), and prints the warm pass's job
  * timeline. The point: the bench's expensive rows at sf0.1 are fixed
  * ORCHESTRATION cost (dozens of tiny jobs), not data — this attributes
  * the seconds to the individual actions so the optimization targets the
  * right call sites.
  *
  * usage: runMain graft.tools.R16Profile <query> [<query> ...]
  */
object R16Profile {
  private final case class JobRow(id: Int, desc: String, started: Long,
    var finished: Long = -1L)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: R16Profile <query> [<query> ...]")
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

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    @volatile var capture = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (capture) {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(e.jobId, JobRow(e.jobId, site, e.time))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (capture) {
        Option(jobs.get(e.jobId)).foreach(_.finished = e.time)
      }
    })

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // cold pass: codegen + JIT + AQE strategy warmup (same as Bench)
      try { fn(spark, dir).count() } catch { case e: Throwable =>
        System.err.println(s"[r16profile] $name warmup FAILED: $e") }
      spark.catalog.clearCache()
      jobs.clear()
      capture = true
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val total = (System.nanoTime() - t0) / 1e9
      capture = false
      spark.catalog.clearCache()
      val rows = jobs.values().toArray(Array.empty[JobRow]).sortBy(_.started)
      val base = rows.headOption.map(_.started).getOrElse(0L)
      println(f"==== $name%s warm pass: $total%.3f s, ${rows.length}%d jobs ====")
      var prevEnd = base
      rows.foreach { r =>
        val dur = (r.finished - r.started) / 1e3
        val gap = (r.started - prevEnd) / 1e3
        println(f"  t=${(r.started - base) / 1e3}%7.3f  gap=$gap%6.3f  job=${r.id}%4d  ${dur}%7.3f s  ${r.desc}%s")
        prevEnd = math.max(prevEnd, r.finished)
      }
      val jobSum = rows.map(r => (r.finished - r.started) / 1e3).sum
      println(f"  [sum of job wall times: $jobSum%.3f s; query total: $total%.3f s; " +
        f"driver-only (gaps): ${total - jobSum}%.3f s]")
    }
    spark.stop()
  }
}
