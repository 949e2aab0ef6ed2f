package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-10 measurement: coarse-quantizer sample size vs cell recall on
  * the UNIFORM (structureless) corpus — the one shape where sampled
  * k-means measurably jitters the Voronoi cells (clustered corpora are
  * insensitive: the centers are the structure). One row per
  * trainPointsPerCentroid setting. */
object IvfSampleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet("/tmp/annbench/uniform_1000000.parquet").persist()
    corpus.count()
    val queries = corpus.filter(col("vec_id") < 50)
    def pairsOf(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairsOf(Similarity.topK(corpus, queries, "vec_id", "embedding", 10))
    for (tppc <- args.headOption.map(_.split(",").map(_.toInt).toSeq)
        .getOrElse(Seq(256, 1024, 4096))) {
      val t0 = System.nanoTime()
      val ivf = Similarity.buildIvf(corpus, "vec_id", "embedding", 64,
        nlist = 250, iters = 3, trainPointsPerCentroid = tppc)
      ivf.persist(); ivf.topWidths(1)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val got = pairsOf(ivf.topK(queries, "vec_id", "embedding", 10, nprobe = 62))
      val recall = (got & exact).size.toDouble / exact.size
      println(f"[ivfsample] tppc=$tppc%5d build=${tBuild}%6.1f s recall=${recall}%.3f")
      ivf.unpersist()
    }
    spark.stop()
  }
}
