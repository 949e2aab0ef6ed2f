package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/scan paths once so the first timed query does
    // not absorb session startup costs.
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).collect()
    } catch { case _: Throwable => }
    // Per-query warmup: run the same query once immediately before timing
    // it, so the reported number is steady-state THROUGHPUT, not one-time
    // whole-stage-codegen compilation + JIT (measured 5-10x on the
    // sketch-heavy queries: dedup_minhash 5.9 s cold vs 0.7 s warm at
    // sf0.1; a smaller-SF warmup is NOT enough — AQE picks different join
    // strategies at different scales, generating different code).
    // Long-running cluster executors are warm; a per-round fresh JVM is
    // not. Disable with SPARK_GRAFT_WARM_DIR="" to measure cold, or point
    // it at another SF dir.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", sfDir)
    // Median-of-N timed runs per query (after warmup): a single timed run
    // is at the mercy of transient machine load — two rounds of phantom
    // 2-5x "regressions" on untouched code cleared on re-run. The median
    // of 3 defends the number. SPARK_GRAFT_RUNS=1 restores the old
    // single-shot behavior for quick local iteration.
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    // Sub-second queries are where the phantom swings live (r6: two
    // queries read 5-20x slower on UNTOUCHED code in the driver session,
    // then re-measured clean) — a short run is hostage to a single
    // load burst, and median-of-3 still loses when 2 of 3 runs land in
    // the burst. Queries whose median is under this threshold re-run to
    // `extraRuns` total and report the median of ALL runs: the extra
    // cost is bounded by the threshold itself (sub-second queries only),
    // so the suite total barely moves while the tail gets 7 samples.
    val subSecondThreshold =
      sys.env.getOrElse("SPARK_GRAFT_SUBSEC_THRESHOLD", "1.0").toDouble
    val extraRuns = sys.env.getOrElse("SPARK_GRAFT_SUBSEC_RUNS", "7").toInt.max(runs)
    // SPARK_GRAFT_ONLY="a,b,c" restricts the suite — local iteration only
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    // A failing query must NEVER bench as a (fast) number: round 5's
    // testdata regeneration made 8 queries fail analysis in ~0.05-0.3 s
    // and the old `catch -> -1L` recorded those as the round's "biggest
    // improvements". A query that throws on ANY timed run reports "err".
    val results: Map[String, Either[String, Double]] =
      selected.map { case (name, fn) =>
        if (warmDir.nonEmpty) {
          try { fn(spark, warmDir).count() } catch { case _: Throwable => }
          // the eager pair finders return persisted frames; drop them (and
          // anything else the warmup pinned) so accumulated caches don't
          // pressure the timed runs' execution memory across the suite
          spark.catalog.clearCache()
        }
        var failure: Option[Throwable] = None
        def timedRuns(n: Int): Vector[Double] =
          (1 to n).iterator.takeWhile(_ => failure.isEmpty).map { _ =>
            val t0 = System.nanoTime()
            try { fn(spark, sfDir).count() } catch { case e: Throwable => failure = Some(e) }
            val elapsed = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache() // timed pair finders pin caches too
            elapsed
          }.toVector
        def median(ts: Vector[Double]): Double = ts.sorted.apply(ts.size / 2)
        val first = timedRuns(runs)
        val times =
          if (failure.isEmpty && median(first) < subSecondThreshold && extraRuns > runs)
            first ++ timedRuns(extraRuns - runs)
          else first
        failure match {
          case Some(e) =>
            System.err.println(s"[bench] $name FAILED: ${e.toString.take(300)}")
            name -> Left("err")
          case None => name -> Right(median(times))
        }
      }
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map {
      case (k, Right(v)) => s"\"" + k + "\":" + r3(v)
      case (k, Left(tag)) => s"\"" + k + "\":\"" + tag + "\""
    }.mkString("{", ",", "}")
    val ok = results.values.collect { case Right(v) => v }
    val total = r3(if (ok.nonEmpty) ok.sum else 0.0)
    val nFailed = results.values.count(_.isLeft)
    // per-query map first, then the total as its own COMPACT FINAL line:
    // a log-tail truncation can eat the front of the long line, never the
    // short last one, so the headline number always parses.
    println(s"""{"metric":"per_query","unit":"sec","queries":$qs,"sf":"$sfDir","runs_per_query":$runs}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","runs_per_query":$runs,"n_queries":${results.size},"n_failed":$nFailed}""")
    spark.stop()
  }
}
