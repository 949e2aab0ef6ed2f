package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-11 measurement pass, stage 2: on the uniform 10M corpus (the
  * trainer-sensitive regime), compare the MINI-BATCH auto trainer
  * against one-shot full-corpus training — cell recall at the same 25%
  * probe and build seconds — then probe an IVFPQ m=16 index at three
  * refine depths (auto / heap-ceiling / shallow) to pick the uniform
  * grid row. Stage-1 numbers (static 1.25M sample): uniform recall
  * 0.904 @ build 120 s; clustered 1.000 @ build 338 s; calibrated
  * nprobe 11/790 -> 0.964 @ 1.7 s clustered, 116/256 -> 0.962 uniform. */
object R11Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def pairsOf(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // AnnBench's fingerprinted naming (dist_n_d64_v<gen>s<synth>)
    val corpus = spark.read.parquet("/tmp/annbench/uniform_10000000_d64_v2s1.parquet").persist()
    val n = corpus.count()
    val queries = corpus.filter(col("vec_id") < 50)
    val nlist = 256
    val nprobe = 64
    println(s"[r11probe] uniform n=$n nlist=$nlist nprobe=$nprobe")
    val (exact, tExact) = timed(pairsOf(
      Similarity.topK(corpus, queries, "vec_id", "embedding", 10)))
    println(f"[r11probe] exact probe ${tExact}%.1f s")
    def rec(s: Set[(Long, Long)]): Double = (s & exact).size.toDouble / exact.size

    val trainers = Seq("minibatch" -> 0, "full" -> 39063)
    for ((label, tppc) <- trainers if args.isEmpty || args.contains(label)) {
      val (ivf, tBuild) = timed {
        val i = Similarity.buildIvf(corpus, "vec_id", "embedding", 64,
          nlist = nlist, iters = 3, trainPointsPerCentroid = tppc)
        i.persist(); i.topWidths(1); i
      }
      val (got, tProbe) = timed(pairsOf(
        ivf.topK(queries, "vec_id", "embedding", 10, nprobe)))
      println(f"[r11probe] ivf[$label] build=${tBuild}%.1f s " +
        f"probe=${tProbe}%.1f s recall=${rec(got)}%.3f")
      val cal = ivf.calibrateNprobe(0.95)
      val (calR, tCalProbe) = timed(pairsOf(
        ivf.topK(queries, "vec_id", "embedding", 10, cal)))
      println(f"[r11probe] ivf[$label] calibrated nprobe=$cal " +
        f"probe=${tCalProbe}%.1f s recall=${rec(calR)}%.3f")
      ivf.unpersist()
    }

    if (args.isEmpty || args.contains("ivfpq")) {
      val (idx, tBuild) = timed {
        val i = Similarity.buildIvfPq(corpus, "vec_id", "embedding", 64,
          nlist = nlist, ivfIters = 3, m = 16, ksub = 256, pqIters = 3,
          trainPointsPerCentroid = 0)
        i.coded.persist().count()
        i
      }
      println(f"[r11probe] ivfpq[mb,16x256] build=${tBuild}%.1f s")
      for (s <- Seq(-1, 65536, 8000)) {
        val (res, tProbe) = timed(pairsOf(
          idx.topK(queries, "vec_id", "embedding", 10, nprobe, s, corpus)))
        println(f"[r11probe] ivfpq[mb,16x256] shortlist=$s%6d " +
          f"probe=${tProbe}%.1f s recall=${rec(res)}%.3f")
      }
      idx.unpersist()
    }
    spark.stop()
  }
}
