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
    // Semantic-dedup scale check: n synthetic 64-dim embeddings (seeded
    // hash noise), every 100th a 1%-perturbed copy of its predecessor
    // (cos ~ 0.9999); run SemDeDup cell-verified pairs with nlist scaled
    // to hold ~2k vectors per cell and measure planted recall + time.
    // The shape under test at 5-40x the driver corpus: kmeans assignment
    // (fused CentroidDistances kernel) -> per-cell self-join -> exact
    // cosine verify.
    if (args.contains("--semantic")) {
      val dim = 64
      def elem(idCol: org.apache.spark.sql.Column, j: Int, seedBase: Int, scale: Double) =
        ((pmod(xxhash64(idCol, lit(seedBase + j)), lit(2000001L)).cast("double")
          / lit(1000000.5)) - lit(1.0)) * lit(scale)
      val baseId = col("id") - (col("id") % 100 === 99).cast("long")
      val vecs = spark.range(n.toLong).select(col("id"),
        array((0 until dim).map(j =>
          (elem(baseId, j, 0, 1.0) +
            when(col("id") % 100 === 99, elem(col("id"), j, 7000, 0.01))
              .otherwise(lit(0.0))).cast("float")): _*).as("v"))
      val nlist = math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt) // the auto default
      if (args.contains("--cells")) {
        val idx = graft.operators.Similarity.buildIvf(vecs, "id", "v",
          dim = dim, nlist = nlist, iters = 2)
        val widths = idx.persist().topWidths(5)
        println(s"[dedupbench] cells n=$n nlist=$nlist top5=${widths.mkString(",")}")
        idx.unpersist()
        spark.stop(); return
      }
      if (args.contains("--phases")) {
        var t = System.nanoTime()
        val idx = graft.operators.Similarity.buildIvf(vecs, "id", "v",
          dim = dim, nlist = nlist, iters = 2)
        println(f"[dedupbench] phase build=${(System.nanoTime() - t) / 1e9}%.1f s")
        t = System.nanoTime()
        val nRaw = idx.topWidths(1) // assignment WITHOUT cache build (not persisted yet)
        println(f"[dedupbench] phase assign-nocache=${(System.nanoTime() - t) / 1e9}%.1f s ($nRaw)")
        t = System.nanoTime()
        idx.persist()
        val nIdx = idx.topWidths(1) // forces materialization of the layout
        println(f"[dedupbench] phase assign=${(System.nanoTime() - t) / 1e9}%.1f s (top=$nIdx)")
        t = System.nanoTime()
        val k = idx.topK(vecs.limit(50), "id", "v", k = 5, nprobe = 4).count()
        println(f"[dedupbench] phase probe=${(System.nanoTime() - t) / 1e9}%.1f s ($k rows)")
        idx.unpersist()
        spark.stop(); return
      }
      val s0 = System.nanoTime()
      val pairs = Dedup.semanticPairs(vecs, "id", "v", dim = dim,
        threshold = 0.9, nlist = nlist, iters = 2)
      val found = pairs.count()
      val hits = pairs
        .filter(col("id2") === col("id1") + 1 && col("id2") % 100 === 99)
        .count()
      val planted = n / 100
      println(f"[dedupbench] semantic n=$n%8d nlist=$nlist pairs=$found planted=$planted " +
        f"recall=${hits.toDouble / planted}%.3f time=${(System.nanoTime() - s0) / 1e9}%.1f s")
      pairs.unpersist(blocking = false)
    }
    // Adversarial hot-cell check: a corpus where two thirds of the rows
    // carry ONE identical embedding (what a raw crawl's boilerplate-dup
    // mass looks like) concentrates a kmeans cell far past hotCellRows.
    // The guard must fail LOUDLY in bounded time — seconds, before the
    // quadratic within-cell join launches — and name the identical-mass
    // cause (1 distinct vector) so the user is pointed at exact dedup
    // upstream, not at nlist.
    if (args.contains("--semantic-skew")) {
      val dim = 64
      val nSkew = math.min(n, 100000)
      def elem(idCol: org.apache.spark.sql.Column, j: Int) =
        ((pmod(xxhash64(idCol, lit(j)), lit(2000001L)).cast("double")
          / lit(1000000.5)) - lit(1.0))
      val vecs = spark.range(nSkew.toLong).select(col("id"),
        array((0 until dim).map(j =>
          when(col("id") % 3 =!= 0, elem(lit(0L), j)) // the identical mass
            .otherwise(elem(col("id"), j)).cast("float")): _*).as("v"))
      val s0 = System.nanoTime()
      val outcome =
        try {
          val p = Dedup.semanticPairs(vecs, "id", "v", dim = dim, threshold = 0.9)
          val c = p.count(); p.unpersist(blocking = false)
          s"GUARD DID NOT TRIP ($c pairs)"
        } catch {
          case e: IllegalArgumentException => "tripped: " + e.getMessage.take(160)
        }
      println(f"[dedupbench] semantic-skew n=$nSkew " +
        f"time=${(System.nanoTime() - s0) / 1e9}%.1f s $outcome")
    }
    // Exact-duplicate skew check for the CLUSTER pipeline: 1 in 25 docs
    // is a copy of ONE boilerplate page (the dominant skew of raw
    // crawls), the rest distinct with the usual planted near-dups. The
    // uncollapsed path pays E²/2 pair-graph edges for the E-copy group
    // (pushing the labeling past driverMaxEdges into distributed
    // propagation); collapseIdentical routes ONE representative through
    // the pair finder and must produce the bit-identical labeling in
    // near-linear time.
    if (args.contains("--dupskew")) {
      val boiler = (1 to 55).map(i => s"boiler$i").mkString(" ")
      def skewCorpus(m: Int) = {
        val b = spark.range(m.toLong).select(col("id").as("doc_id"),
          concat_ws(" ", (0 until 55).map(j =>
            concat(lit("w"), pmod(xxhash64(col("id") - (col("id") % 100 === 99).cast("long"), lit(j)),
              lit(10000L)))): _*).as("body"),
          (col("id") % 100 === 99).cast("boolean").as("is_dup"))
        b.select(col("doc_id"),
          when(col("doc_id") % 25 === 0, lit(boiler))
            .otherwise(when(col("is_dup"), concat(col("body"), lit(" extratoken")))
              .otherwise(col("body"))).as("text"))
      }
      def run(docs: org.apache.spark.sql.DataFrame, m: Int, collapse: Boolean) = {
        val s0 = System.nanoTime()
        val labeled = Dedup.clusters(docs, "doc_id", "text",
          n = 3, threshold = 0.5, collapseIdentical = collapse).cache()
        val nClusters = labeled.select("cluster_id").distinct().count()
        val chk = labeled.agg(sum(col("id") * col("cluster_id"))).head().getLong(0)
        labeled.unpersist(blocking = false)
        println(f"[dedupbench] dupskew n=$m collapse=$collapse clusters=$nClusters " +
          f"checksum=$chk time=${(System.nanoTime() - s0) / 1e9}%.1f s")
        (nClusters, chk)
      }
      // head-to-head at a size where the uncollapsed E²/2-edge graph
      // still fits the local heap (past ~100k the E = n/25 copy group
      // OOMs the uncollapsed path outright — which IS the finding; run
      // the collapsed leg alone at full n to show it doesn't care)
      val nCmp = math.min(n, 50000)
      val cmpDocs = skewCorpus(nCmp).cache(); cmpDocs.count()
      val a = run(cmpDocs, nCmp, collapse = true)
      val b = run(cmpDocs, nCmp, collapse = false)
      require(a == b, s"collapsed and full labelings DISAGREE: $a vs $b")
      cmpDocs.unpersist(blocking = false)
      if (n > nCmp) {
        val big = skewCorpus(n).cache(); big.count()
        run(big, n, collapse = true)
        big.unpersist(blocking = false)
      }
    }
    spark.stop()
  }
}
