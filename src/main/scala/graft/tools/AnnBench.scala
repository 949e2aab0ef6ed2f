package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * ANN scale grid: synthesize an embedding corpus at 100-5000x the
 * driver testdata and run every similarity path — exact brute force,
 * IVF, PQ, BQ, IVF+PQ — measuring build time, probe time, and
 * recall@10 against the exact ranking. Distributions:
 *
 *  - `uniform`: i.i.d. coordinates — hostile to POSITIONAL structure
 *    (no clusters), but in d=64 the norms concentrate, so a
 *    directionally-trained coarse quantizer partitions it well — the
 *    round-11 trainer/calibration work exposed this: full-quality
 *    centroids + calibrated nprobe reach recall 1.0 at a ~1-cell scan.
 *  - `clustered`: 64 sign-pattern centers + 0.15 noise — the shape
 *    real embedding corpora actually have, and the WIDE-CLUSTER stress
 *    for the refine depth (a query's ~156k-row cluster at n=10M).
 *  - `aniso` (n=1M only, round 11): clustered latents with per-dim
 *    decaying scales, Hadamard-mixed — ANISOTROPIC residuals, the
 *    regime OPQ's learned rotation exists for (Ge et al. CVPR'13);
 *    the paired opq0/opq8 rows put the rotation's win IN the grid
 *    instead of only in a unit spec.
 *
 * Round 11: coarse training uses the AUTO budget everywhere
 * (trainPointsPerCentroid = 0 -> full training at or under ~1.25M
 * rows — bit-identical to the r9/r10 unsampled tiers — and the
 * MINI-BATCH trainer above it, which recovers full-training recall at
 * a per-iteration cost constant in n; the r10 one-sample t256 commit
 * had regressed uniform 10M recall to 0.91). Each 10M tier also
 * carries a CALIBRATED-nprobe row ([[graft.operators.Similarity.IvfIndex.calibrateNprobe]]
 * at target 0.95) next to the fixed-fraction row, and the m=16 auto
 * refine depth past the 65536 heap ceiling now runs on the spill-safe
 * rank engine instead of clamping (r10's clustered-0.82 cap).
 *
 * Corpora are materialized to parquet (the synthesis expression would
 * otherwise ride into every downstream plan) and reused ONLY when the
 * generator fingerprint stamp matches — a changed synthesis
 * regenerates instead of silently measuring stale data.
 *
 * Round 12: the 10M uniform tier adds an `nlist=auto` row (buildIvf's
 * 0 sentinel — ~sqrt(n)/4 cells) next to the hand-tuned 256-cell row,
 * and the mini-batch trainer early-stops on centroid-shift
 * convergence (both VERDICT r11 items).
 *
 * Round 13: each 10M tier adds a `ivfpq[conf-auto,...]` row — the
 * fully self-tuning conf surface (every sizing knob auto) driven
 * through the same annBuildIvfPq path annTopK runs, with build_s the
 * one-shot cost including calibration; assignment at nlist >= 256
 * runs the two-level kernel where the per-index verification keeps it
 * (flat fallback above 1% disagreement). An assignment-churn early
 * stop exists but ships DISABLED by default (trainStopChurn=0) — r13
 * measurement refuted churn as a calibration-width proxy — so the
 * grid does not run with it.
 *
 * Emits one JSON line per (dist, n, algo) and writes the whole grid to
 * ANNBENCH_r12.json (override via SPARK_GRAFT_ANNBENCH_OUT). Build =
 * index construction (amortized per corpus snapshot in production);
 * probe = one 50-query batch end to end (collect).
 */
object AnnBench {
  private case class Entry(dist: String, n: Long, algo: String,
      buildS: Double, probeS: Double, recall: Double)

  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(200000L, 1000000L, 10000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = 64
    val k = 10
    val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]

    // corpus synthesis + parquet cache: shared with AnnBenchR14 so
    // targeted r14 rows measure on bit-identical data
    def corpusOf(dist: String, n: Long): DataFrame =
      AnnData.synthCorpus(spark, dist, n, d)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    def pairsOf(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val dists = Seq("uniform", "clustered", "aniso")
    for (dist <- dists; n <- ns
         if !(dist == "aniso" && n != 1000000L)) { // aniso: the 1M OPQ tier only
      val big = n > 2000000L
      val corpus = corpusOf(dist, n).persist()
      corpus.count()
      val queries = corpus.filter(col("vec_id") < 50)

      val (exact, tExact) = timed(pairsOf(
        Similarity.topK(corpus, queries, "vec_id", "embedding", k)))
      entries += Entry(dist, n, "exact", 0.0, tExact, 1.0)
      def rec(s: Set[(Long, Long)]): Double =
        if (exact.isEmpty) 1.0 else (s & exact).size.toDouble / exact.size

      // nlist: <=1M tiers keep the r9/r10 sqrt(n)/4-capped-at-256 shape
      // so rows stay comparable across rounds. At 10M the two regimes
      // diverge: clustered data is where MANY cells pay (sublinear
      // probes at equal cell recall, smaller worst-case scans), so it
      // keeps the sqrt scaling (790); uniform data has no positional
      // structure for extra cells to exploit — more cells only inflate
      // the O(n*nlist*d) assignment pass — so it stays at 256.
      val nlist =
        if (big && dist == "clustered") math.max(16, math.sqrt(n.toDouble).toInt / 4)
        else math.min(256, math.max(16, math.sqrt(n.toDouble).toInt / 4))
      val nprobe =
        if (big && dist == "clustered") math.max(16, nlist / 8)
        else math.max(4, nlist / 4)
      // Coarse training: AUTO everywhere (round 11). At or under ~1.25M
      // rows this is EXACTLY the unsampled full training the r9/r10
      // small tiers pinned; above it the mini-batch trainer holds
      // full-training cell recall (uniform 10M: one-sample t256 0.91,
      // one-sample 1.25M 0.904, mini-batch 1.000) at a per-iteration
      // cost constant in n.
      val tppc = 0

      // build time includes materializing the layout (persist+count) —
      // the production build-once/probe-many contract
      val (ivf, tIvfBuild) = timed {
        val i = Similarity.buildIvf(corpus, "vec_id", "embedding", d, nlist,
          iters = 3, trainPointsPerCentroid = tppc)
        i.persist()
        i.topWidths(1) // any action over the layout fills the persisted blocks
        i
      }
      val (ivfRes, tIvfProbe) = timed(pairsOf(
        ivf.topK(queries, "vec_id", "embedding", k, nprobe)))
      entries += Entry(dist, n, s"ivf[$nlist/$nprobe,auto]", tIvfBuild, tIvfProbe, rec(ivfRes))

      // calibrated probe width (round 11): nprobe from a MEASURED
      // cell-recall estimate at target 0.95 instead of a fixed fraction
      // — the big tiers record the honest scan-fraction trade
      if (big) {
        val (cal, tCal) = timed(ivf.calibrateNprobe(0.95))
        val (calRes, tCalProbe) = timed(pairsOf(
          ivf.topK(queries, "vec_id", "embedding", k, cal)))
        entries += Entry(dist, n, s"ivf[$nlist/c$cal,auto]", tCal, tCalProbe, rec(calRes))
      }
      ivf.unpersist()

      // nlist=auto at 10M (round 12): the conf-surface sizing rule
      // (~sqrt(n)/4) measured against the hand-tuned row above. On
      // clustered data auto == the hand-tuned 790, so the uniform tier
      // carries the row where the rule actually deviates (790 vs 256).
      if (big && dist == "uniform") {
        val (aivf, tABuild) = timed {
          val i = Similarity.buildIvf(corpus, "vec_id", "embedding", d,
            nlist = 0, iters = 3, trainPointsPerCentroid = 0)
          i.persist()
          i.topWidths(1)
          i
        }
        val anl = aivf.centroids.length
        val (acal, _) = timed(aivf.calibrateNprobe(0.95))
        val (aRes, tAProbe) = timed(pairsOf(
          aivf.topK(queries, "vec_id", "embedding", k, acal)))
        entries += Entry(dist, n, s"ivf[a$anl/c$acal,auto]", tABuild, tAProbe, rec(aRes))
        aivf.unpersist()
      }

      if (!big) {
        // PQ: m=16 x 256 codewords, shortlist 2k
        val (pqModel, tPqBuild) = timed(
          Similarity.pqTrain(corpus, "vec_id", "embedding", d, m = 16, ksub = 256))
        val (pqRes, tPqProbe) = timed(pairsOf(
          Similarity.pqTopK(corpus, queries, "vec_id", "embedding", k, pqModel,
            shortlist = 2000)))
        entries += Entry(dist, n, "pq[16x256]", tPqBuild, tPqProbe, rec(pqRes))

        // BQ: training-free, shortlist 2k
        val (bqRes, tBqProbe) = timed(pairsOf(
          Similarity.bqTopK(corpus, queries, "vec_id", "embedding", k, d, shortlist = 2000)))
        entries += Entry(dist, n, "bq", 0.0, tBqProbe, rec(bqRes))
      }

      // IVF+PQ. m is bytes/vector; at the headline m=16 budget the auto
      // refine depth is the recall knob at fixed memory — and past the
      // 65536 heap ceiling it now runs on the spill-safe rank engine
      // instead of clamping (the r10 clustered-10M 0.82).
      def ivfpqRows(m: Int, opqIters: Int, probes: Seq[(Int, String, Int)],
          calibrate: Boolean = false): Unit = {
        val tag = if (opqIters > 0) s",opq$opqIters" else ""
        val (ivfpq, tBuild) = timed {
          val idx = Similarity.buildIvfPq(corpus, "vec_id", "embedding", d,
            nlist = nlist, ivfIters = 3, m = m, ksub = 256, pqIters = 3,
            opqIters = opqIters, trainPointsPerCentroid = tppc)
          idx.coded.persist().count() // materialize like a snapshot would
          idx
        }
        // calibrated width against THIS index's own coarse quantizer.
        // From r13 the calibrated row's build_s records the CALIBRATION
        // scan itself (the ivf cal rows' convention — the index build
        // cost is already on the sibling fixed-probe row from the same
        // build), so the estimator's cost is a first-class grid figure.
        val allProbes = probes.map(p => (p, tBuild)) ++ (if (calibrate) {
          val (c, tCal) = timed(
            ivfpq.calibrateNprobe(corpus, "vec_id", "embedding", 0.95))
          Seq(((c, s"c$c,auto", -1), tCal))
        } else Seq.empty)
        allProbes.foreach { case ((np, label, s), bS) =>
          val (res, tProbe) = timed(pairsOf(
            ivfpq.topK(queries, "vec_id", "embedding", k, np, s, corpus)))
          entries += Entry(dist, n, s"ivfpq[$nlist/$np,${m}x256$tag,$label]",
            bS, tProbe, rec(res))
        }
        ivfpq.coded.unpersist(blocking = false)
      }
      if (!big) {
        if (dist == "aniso") {
          // the OPQ pair: identical index bytes + fixed depth, rotation
          // off vs on — isolates what the learned rotation buys on
          // anisotropic residuals
          ivfpqRows(16, 0, Seq((nprobe, "s2000", 2000)))
          ivfpqRows(16, 8, Seq((nprobe, "s2000", 2000)))
        } else {
          ivfpqRows(16, 0, Seq((nprobe, "s2000", 2000), (nprobe, "auto", -1)))
          if (dist == "clustered" && n >= 1000000L)
            ivfpqRows(16, 8, Seq((nprobe, "s2000", 2000)))
          ivfpqRows(32, 0, Seq((nprobe, "s2000", 2000)))
        }
      } else {
        // the headline 16 B/vector budget, fixed-fraction AND calibrated
        // probe widths (the latter against the ivfpq index's own coarse
        // quantizer — see IvfPqIndex.calibrateNprobe)
        ivfpqRows(16, 0, Seq((nprobe, "auto", -1)), calibrate = true)
        if (dist == "clustered")
          ivfpqRows(32, 0, Seq((nprobe, "s2000", 2000), (nprobe, "auto", -1)))

        // the fully-auto CONF surface at scale (round 13): the
        // zero-knowledge entry point a pipeline actually calls —
        // algo=ivfpq with EVERY sizing knob on auto (nlist, tppc,
        // nprobe, shortlist); m=16/ksub=256 fix only the 16 B/vector
        // byte budget. Driven through the factored conf path
        // (annBuildIvfPq — exactly what annTopK runs), so build_s is
        // the honest one-shot cost INCLUDING calibration and probe_s
        // is one query batch at the resolved width/depth.
        val confKeys = Seq("algo", "nlist", "nprobe", "tppc", "shortlist",
          "m", "ksub")
        try {
          spark.conf.set("spark.graft.ann.algo", "ivfpq")
          Seq("nlist", "nprobe", "tppc", "shortlist")
            .foreach(kk => spark.conf.set(s"spark.graft.ann.$kk", "auto"))
          spark.conf.set("spark.graft.ann.m", "16")
          spark.conf.set("spark.graft.ann.ksub", "256")
          val (built, tCBuild) = timed(
            Similarity.annBuildIvfPq(corpus, "vec_id", "embedding", d))
          val (cIdx, cNp, cSl) = built
          try {
            val anl = cIdx.assignCentroids.length
            val (cRes, tCProbe) = timed(pairsOf(
              cIdx.topK(queries, "vec_id", "embedding", k, cNp, cSl, corpus)))
            entries += Entry(dist, n, s"ivfpq[conf-auto,a$anl/c$cNp,16x256]",
              tCBuild, tCProbe, rec(cRes))
          } finally cIdx.unpersist() // a probe failure must not leak the pinned layout
        } finally confKeys.foreach(kk => spark.conf.unset(s"spark.graft.ann.$kk"))
      }

      entries.filter(e => e.dist == dist && e.n == n).foreach { e =>
        println(f"[annbench] ${e.dist}%9s n=${e.n}%8d ${e.algo}%36s " +
          f"build=${e.buildS}%7.1f s probe=${e.probeS}%6.1f s recall=${e.recall}%.3f")
      }
      corpus.unpersist(blocking = false)
    }

    val json = entries.map { e =>
      f"""{"dist":"${e.dist}","n":${e.n},"d":$d,"k":$k,"algo":"${e.algo}",""" +
        f""""build_s":${"%.2f".format(e.buildS)},"probe_s":${"%.2f".format(e.probeS)},""" +
        f""""recall":${"%.4f".format(e.recall)}}"""
    }.mkString(",\n  ")
    val out = s"""{"artifact":"annbench","master":"local[32]","entries":[\n  $json\n]}\n"""
    val outName = sys.env.getOrElse("SPARK_GRAFT_ANNBENCH_OUT", "ANNBENCH_r13.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outName),
      out.getBytes("UTF-8"))
    println(s"[annbench] wrote $outName with ${entries.size} entries")
    spark.stop()
  }
}
