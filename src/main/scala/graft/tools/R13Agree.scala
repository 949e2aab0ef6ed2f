package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * Round-13 diagnostic: how often does the two-level assignment kernel
 * disagree with the flat exact argmin at the 10M tier, per
 * distribution — and when it disagrees, how far down the row's EXACT
 * centroid-distance order does the chosen cell rank? The second number
 * is what calibration sees: a misassigned neighbor's cell at rank r
 * forces `nprobe >= r` for that neighbor, so a fat rank tail blows the
 * calibrated width up (observed: uniform 10M calibrated c1 with flat
 * assignment in r12, c109 with unverified two-level in the aborted r13
 * grid). Drives the `twoLevelMaxDisagree` verification threshold.
 *
 * Corpora are the AnnBench fixtures (same synthesis + stamp, so a
 * subsequent grid run reuses the parquet).
 */
object R13Agree {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = 64
    val n = 10000000L

    def corpusOf(dist: String): DataFrame = {
      val synthVer = 1
      val genVer = 2
      val params = s"""{"dist":"$dist","n":$n,"d":$d,"genver":$genVer,"synth":$synthVer}"""
      val path = s"/tmp/annbench/${dist}_${n}_d${d}_v${genVer}s$synthVer.parquet"
      val stamp = new java.io.File(s"$path/_params.json")
      val fresh = new java.io.File(path, "_SUCCESS").exists() &&
        stamp.exists() &&
        new String(java.nio.file.Files.readAllBytes(stamp.toPath), "UTF-8") == params
      if (!fresh) {
        val ids = spark.range(n).select(col("id").as("vec_id"))
        val coords = (0 until d).map { j =>
          val u = (xxhash64(col("vec_id"), lit(j)).cast("double") / lit(Long.MaxValue.toDouble))
          val expr = dist match {
            case "uniform" => u
            case "clustered" =>
              val center = when(
                xxhash64(pmod(col("vec_id"), lit(64L)), lit(j + 1000)) >= 0, 1.0).otherwise(-1.0)
              center + u * lit(0.15)
          }
          expr.cast("double")
        }
        ids.select(col("vec_id"), array(coords: _*).cast("array<float>").as("embedding"))
          .write.mode("overwrite").parquet(path)
        java.nio.file.Files.write(stamp.toPath, params.getBytes("UTF-8"))
      }
      spark.read.parquet(path).select("vec_id", "embedding")
    }

    for (dist <- Seq("clustered", "uniform")) {
      val corpus = corpusOf(dist).persist()
      corpus.count()
      val idx = Similarity.buildIvf(corpus, "vec_id", "embedding", d,
        nlist = 0, iters = 3, trainPointsPerCentroid = 0)
      val cents = idx.centroids
      val (supers, members) = Similarity.superStructure(cents, spill = 4)
      val slice = corpus
        .filter(pmod(xxhash64(col("vec_id"), lit("agree")), lit(n / 50000L)) === 0)
        .select(col("vec_id"),
          graft.functions.HashFunctions.nearestCentroid(col("embedding"), cents).as("flat"),
          graft.functions.HashFunctions.nearestCentroidTwoLevel(
            col("embedding"), supers, members, cents).as("two"),
          col("embedding"))
        .filter(col("flat").isNotNull)
      val rows = slice.collect()
      val total = rows.length
      val dis = rows.filter(r => r.getInt(1) != r.getInt(2))
      // rank of the two-level cell in the row's exact distance order
      def rankOf(v: Array[Double], cell: Int): Int = {
        val dd = cents.map { c =>
          var s = 0.0; var i = 0
          while (i < math.min(c.length, v.length)) { val t = v(i) - c(i); s += t * t; i += 1 }
          s
        }
        1 + dd.zipWithIndex.count { case (x, i) => x < dd(cell) || (x == dd(cell) && i < cell) }
      }
      val ranks = dis.map { r =>
        rankOf(r.getSeq[Number](3).map(_.doubleValue()).toArray, r.getInt(2))
      }.sorted
      def q(p: Double): Int = if (ranks.isEmpty) 1 else ranks(math.min(ranks.length - 1,
        math.max(0, math.ceil(p * ranks.length).toInt - 1)))
      println(f"[r13agree] $dist%9s nlist=${cents.length} sample=$total " +
        f"disagree=${dis.length} (${100.0 * dis.length / math.max(1, total)}%.2f%%) " +
        f"rank p50=${q(0.5)} p90=${q(0.9)} p99=${q(0.99)} max=${q(1.0)}")
      corpus.unpersist(blocking = false)
      idx.unpersist()
    }
    spark.stop()
  }
}
