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

    // SimHash skew check: a corpus whose documents share a large common
    // template (so one 16-bit band collapses to few values — the hot-
    // bucket regime) must not degenerate into one quadratic straggler
    // bucket. Compare the whole-bucket join (hotBucketRows = MaxValue)
    // against the Manku band-extension path (default cutoff).
    if (args.contains("--skew")) {
      // The adversarial band-skew regime, stated directly in signature
      // space: every document shares ONE constant 16-bit band (a webpage
      // template dominating those bit votes) while the other 48 bits are
      // random — so band 0 is a single bucket holding the WHOLE corpus,
      // and almost no pair actually qualifies at hamming <= 3. The
      // whole-bucket join does |corpus|^2/2 comparisons in one straggler
      // task; Manku band extension splits the hot bucket by sub-bands of
      // the remaining 48 bits and must stay near-linear.
      val nSkew = math.min(n / 4, 120000)
      val sims = spark.range(nSkew.toLong).select(col("id"),
        shiftleft(abs(xxhash64(col("id"))), 16).bitwiseOR(lit(0xABCDL)).as("sim"))
      for ((label, cutoff) <- Seq("band-extension" -> 4096, "whole-bucket" -> Int.MaxValue)) {
        val s0 = System.nanoTime()
        val np = Dedup.simhashPairsOfSignatures(sims,
          maxHamming = 3, hotBucketRows = cutoff).count()
        println(f"[dedupbench] skew n=$nSkew $label pairs=$np " +
          f"time=${(System.nanoTime() - s0) / 1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
