package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * Measurement harness for the round-10 IVFPQ recall work: at the
 * headline 16 B/vector budget on the clustered n=1M corpus
 * (ANNBENCH's hard case — recall@10 0.43 in r9), sweep the knobs that
 * can move recall WITHOUT growing the index: refine depth (shortlist),
 * probe width (nprobe), Lloyd iterations, and (once implemented) the
 * OPQ rotation. Prints one line per configuration.
 */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = 64
    val k = 10

    val corpus = spark.read.parquet("/tmp/annbench/clustered_1000000.parquet").persist()
    val n = corpus.count()
    val queries = corpus.filter(col("vec_id") < 50)
    println(s"[opqprobe] corpus n=$n")

    def pairsOf(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (exact, tExact) = timed(pairsOf(
      Similarity.topK(corpus, queries, "vec_id", "embedding", k)))
    println(f"[opqprobe] exact probe ${tExact}%.1f s, ${exact.size} pairs")
    def rec(s: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 1.0 else (s & exact).size.toDouble / exact.size

    val nlist = 250
    val nprobe0 = 62
    for (opqIters <- args.headOption.map(_.split(",").map(_.toInt).toSeq)
        .getOrElse(Seq(0, 8))) {
      val (idx, tBuild) = timed {
        val i = Similarity.buildIvfPq(corpus, "vec_id", "embedding", d,
          nlist = nlist, ivfIters = 3, m = 16, ksub = 256, pqIters = 3,
          opqIters = opqIters)
        i.coded.persist().count()
        i
      }
      println(f"[opqprobe] build m=16 opqIters=$opqIters: ${tBuild}%.1f s")
      for (shortlist <- Seq(2000, 4000, 8000, 16000);
           nprobe <- Seq(nprobe0)) {
        val (res, tProbe) = timed(pairsOf(
          idx.topK(queries, "vec_id", "embedding", k, nprobe, shortlist, corpus)))
        println(f"[opqprobe] m=16 opq=$opqIters nprobe=$nprobe shortlist=$shortlist%6d " +
          f"probe=${tProbe}%5.1f s recall=${rec(res)}%.3f")
      }
      idx.coded.unpersist(blocking = false)
    }
    spark.stop()
  }
}
