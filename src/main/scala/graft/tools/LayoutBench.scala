package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Measures what [[graft.sources.Layout.clusterByZOrder]] buys at scan
 * time: the same box-filter query against the same rows written (a)
 * unclustered and (b) z-order clustered. Parquet keeps min/max
 * statistics per row group; a query with predicates on BOTH dimensions
 * can skip a row group only when the file's rows are locally tight in
 * both — exactly what the Morton layout provides and a lexicographic or
 * random layout does not. Reports wall time and the scan's output rows
 * (rows surviving row-group/page pruning + pushed filters) per layout.
 *
 * Run: SPARK_GRAFT_N=10000000 sbt "runMain graft.tools.LayoutBench"
 */
object LayoutBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "10000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Layout

    // deterministic synthetic points on [0, 1e6)^2 via splittable hashing
    val pts = spark.range(n).select(
      (pmod(xxhash64(col("id"), lit(1)), lit(1000000L))).cast("double").as("x"),
      (pmod(xxhash64(col("id"), lit(2)), lit(1000000L))).cast("double").as("y"),
      col("id").as("payload"))

    val base = java.nio.file.Files.createTempDirectory("graft-layoutbench").toFile
    val files = 64
    val t0 = System.nanoTime()
    pts.repartition(files).write.mode("overwrite")
      .parquet(s"$base/unclustered")
    val tWriteU = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    Layout.clusterByZOrder(pts, Seq("x", "y"), numFiles = files)
      .write.mode("overwrite").parquet(s"$base/zordered")
    val tWriteZ = (System.nanoTime() - t1) / 1e9

    // ~1% box in each dimension -> 0.01% of the area
    def box(df: DataFrame) = df
      .filter(col("x").between(400000, 410000) && col("y").between(400000, 410000))
      .agg(count(lit(1)), sum(col("payload")))

    def measure(path: String): Double = {
      val df = box(spark.read.parquet(path))
      val t = System.nanoTime()
      df.collect()
      (System.nanoTime() - t) / 1e9
    }
    // The pruning factor itself, from the files' actual value ranges: a
    // reader (Spark row-group stats, any lakehouse file-skipping index)
    // must touch exactly the files whose [min,max] box intersects the
    // query box — everything else is skipped on footer stats alone.
    def filesNeeded(path: String): (Int, Int) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
          min(col("y")).as("y0"), max(col("y")).as("y1"))
        .collect()
      val hit = perFile.count { r =>
        r.getAs[Double]("x0") <= 410000 && r.getAs[Double]("x1") >= 400000 &&
        r.getAs[Double]("y0") <= 410000 && r.getAs[Double]("y1") >= 400000
      }
      (hit, perFile.length)
    }
    // warm the query shape once on each layout, then measure
    measure(s"$base/unclustered"); measure(s"$base/zordered")
    val secU = measure(s"$base/unclustered")
    val secZ = measure(s"$base/zordered")
    val (hitU, totU) = filesNeeded(s"$base/unclustered")
    val (hitZ, totZ) = filesNeeded(s"$base/zordered")
    println(f"[layoutbench] n=$n files=$files writeUnclustered=$tWriteU%.1fs writeZordered=$tWriteZ%.1fs")
    println(f"[layoutbench] box query unclustered: $secU%.3fs, files with stats overlapping the box: $hitU/$totU")
    println(f"[layoutbench] box query zordered:    $secZ%.3fs, files with stats overlapping the box: $hitZ/$totZ")
    println(f"[layoutbench] file-skipping factor: ${hitU.toDouble / math.max(hitZ, 1)}%.0fx fewer files must be read")
    // both 10M-row datasets live under base — don't leave them in /tmp
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(base)
    spark.stop()
  }
}
