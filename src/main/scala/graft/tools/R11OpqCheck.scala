package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Find the regime where the OPQ rotation's win is visible in recall
  * (not only in the unit spec's distortion metric): on the aniso
  * corpus, sweep TIGHT shortlists (below the ~976-row cluster width,
  * so the ADC ordering — not the exact re-rank — is the recall driver)
  * and codebook capacities. */
object R11OpqCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read
      .parquet("/tmp/annbench/aniso_1000000_d64_v2s2.parquet").persist()
    corpus.count()
    val queries = corpus.filter(col("vec_id") < 50)
    def pairsOf(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val exact = pairsOf(Similarity.topK(corpus, queries, "vec_id", "embedding", 10))
    def rec(s: Set[(Long, Long)]): Double = (s & exact).size.toDouble / exact.size

    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    for (ksub <- Seq(64, 256); opq <- Seq(0, 8)) {
      val (idx, tBuild) = timed {
        val i = Similarity.buildIvfPq(corpus, "vec_id", "embedding", 64,
          nlist = 250, ivfIters = 3, m = 16, ksub = ksub, pqIters = 3,
          opqIters = opq, trainPointsPerCentroid = 0)
        i.coded.persist().count()
        i
      }
      for (s <- Seq(50, 100, 200)) {
        val (r, tProbe) = timed(pairsOf(
          idx.topK(queries, "vec_id", "embedding", 10, 62, s, corpus)))
        println(f"[opqcheck] ksub=$ksub%3d opq=$opq s=$s%4d " +
          f"build=${tBuild}%5.1f s probe=${tProbe}%4.1f s recall=${rec(r)}%.3f")
        rows += f"""{"ksub":$ksub,"opq":$opq,"shortlist":$s,""" +
          f""""build_s":${"%.2f".format(tBuild)},"probe_s":${"%.2f".format(tProbe)},""" +
          f""""recall":${"%.4f".format(rec(r))}}"""
      }
      idx.unpersist()
    }
    val out = s"""{"artifact":"opqcheck","corpus":"aniso_1000000_d64_v2s2",""" +
      s""""nlist":250,"nprobe":62,"m":16,"entries":[\n  ${rows.mkString(",\n  ")}\n]}\n"""
    java.nio.file.Files.write(java.nio.file.Paths.get("OPQCHECK_r11.json"),
      out.getBytes("UTF-8"))
    println(s"[opqcheck] wrote OPQCHECK_r11.json with ${rows.size} entries")
    spark.stop()
  }
}
