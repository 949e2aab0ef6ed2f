package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/**
 * Text-dedup scale check: synthesize `n` documents (~55 tokens each,
 * deterministic), plant a near-duplicate for one in every 100, and run
 * the MinHash+LSH pipeline end to end. Verifies the pipeline SHAPE at
 * 40-200x the driver corpus: shingle explode -> 64 minhash aggs ->
 * banded bucket join -> verified pairs, with recall measured against
 * the planted structure (planted dups differ by one appended token,
 * J ~ 0.98).
 */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    require(n >= 100, s"need n >= 100 so near-dups get planted, got $n")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~55 pseudo-random words per doc from a 10k-word vocab (seeded);
    // every 100th doc is a near-copy of its predecessor + one extra token.
    val base = spark.range(n.toLong).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 55).map(j =>
        concat(lit("w"), pmod(xxhash64(col("id") - (col("id") % 100 === 99).cast("long"), lit(j)),
          lit(10000L)))): _*).as("body"),
      (col("id") % 100 === 99).cast("boolean").as("is_dup"))
    val docs = base.select(col("doc_id"),
      when(col("is_dup"), concat(col("body"), lit(" extratoken"))).otherwise(col("body")).as("text"))

    val t0 = System.nanoTime()
    // cache so the recall count below reuses the materialized pairs
    // (and the printed time covers all executed work)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", n = 3, threshold = 0.5).cache()
    val found = pairs.count()
    val planted = n / 100
    // planted pair = (100k+98, 100k+99) for each block k
    val recallHits = pairs
      .filter(col("id2") === col("id1") + 1 && col("id2") % 100 === 99)
      .count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[dedupbench] n=$n%8d minhash pairs=$found planted=$planted " +
      f"recall=${recallHits.toDouble / planted}%.3f time=${dt}%.1f s")
    spark.stop()
  }
}
