package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Phase-level breakdown of the 10M-tier IVF build (r11: the clustered
  * nlist=790 auto-trained row measured 1646 s while the IVFPQ build —
  * a superset of the training work — took 599 s; this isolates where
  * the difference lives: trainer iterations vs layout cache encode vs
  * topWidths materialization). Run with SPARK_GRAFT_IVF_TIMING=1. */
object IvfBuildProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // default matches AnnBench's fingerprinted naming (dist_n_d64_v<gen>s<synth>)
    val path = args.headOption.getOrElse("/tmp/annbench/clustered_10000000_d64_v2s1.parquet")
    val nlist = args.lift(1).map(_.toInt).getOrElse(790)
    val corpus = spark.read.parquet(path).persist()
    corpus.count()
    def mark(label: String, t0: Long): Long = {
      val now = System.nanoTime()
      System.err.println(f"[ivfprofile] $label: ${(now - t0) / 1e9}%.1f s")
      now
    }
    var t = System.nanoTime()
    if (args.contains("ivfpq")) {
      // the composite build (VERDICT r11 item 3's ≤200 s target):
      // buildIvfPq's own phase marks break down train vs encode
      val idx = Similarity.buildIvfPq(corpus, "vec_id", "embedding", 64,
        nlist = nlist, ivfIters = 3, m = 16, ksub = 256, pqIters = 3,
        trainPointsPerCentroid = 0)
      t = mark("buildIvfPq (coded layout materialized)", t)
      val q = corpus.filter(col("vec_id") < 50)
      val cal = idx.calibrateNprobe(corpus, "vec_id", "embedding", 0.95)
      t = mark(s"calibrate (nprobe=$cal)", t)
      val r = idx.topK(q, "vec_id", "embedding", 10, cal, -1, corpus).count()
      t = mark(s"probe ($r rows)", t)
      idx.unpersist()
    } else {
      val idx = Similarity.buildIvf(corpus, "vec_id", "embedding", 64,
        nlist = nlist, iters = 3, trainPointsPerCentroid = 0)
      t = mark("buildIvf (train + lazy layout)", t)
      idx.persist()
      idx.topWidths(1)
      t = mark("persist + topWidths (layout cache encode)", t)
      val q = corpus.filter(col("vec_id") < 50)
      val r = idx.topK(q, "vec_id", "embedding", 10, math.max(1, nlist / 8))
        .count()
      t = mark(s"probe ($r rows)", t)
      idx.unpersist()
    }
    spark.stop()
  }
}
