package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * Round-14 TARGETED ANN measurements (VERDICT r13 items 3-5) — not a
 * grid re-run. Each mode is one focused experiment on the shared
 * [[AnnData]] corpora (bit-identical to the r13 grid's), run in its
 * OWN JVM invocation so a session-long host throttle cannot smear one
 * experiment's numbers into the next (the r13 failure shape), and
 * every entry carries its own environment fingerprint (`spin_s`, the
 * fixed single-thread loop measured immediately before the entry's
 * measurement) so throttle inflation is detectable from the artifact.
 *
 * Modes (args(0)):
 *
 *  - `ratio`      VERDICT item 3: the conf-auto 10M probe gap. r13
 *                 measured conf-auto probe 30.68 s vs 7.75 s for the
 *                 hand-tuned calibrated row — but conf-auto ran LAST
 *                 in a progressively-throttled session and the two
 *                 paths produce plan-identical probes (same nlist,
 *                 same calibrated width, same auto shortlist), so the
 *                 gap was never confirmed as code. This mode builds
 *                 BOTH indexes, then probes them in STRICT ALTERNATION
 *                 (H,A,H,A,... `reps` times each) and reports medians
 *                 + the ratio — the within-run ratio method the r13
 *                 builder used for the throttle diagnosis itself.
 *  - `nlist4096`  VERDICT item 5: the two-level kernel in its design
 *                 regime. All committed rows run nlist <= 790; the
 *                 100 TB story quotes O(sqrt(nlist)) assignment at the
 *                 65536-cell cap. Clustered 10M at nlist=4096: one
 *                 flat-forced build (twoLevelAssignMin pushed above
 *                 nlist so the candidate gate never fires) vs one
 *                 default build (verification decides; on clustered
 *                 data the kernel is expected to verify clean and be
 *                 KEPT), both calibrated + probed + recall-gated.
 *  - `plateau-log` VERDICT item 4 step 1: uniform 10M flat-IVF auto
 *                 build with SPARK_GRAFT_IVF_PLATEAU_LOG set — emits
 *                 the per-iteration estimated calibration width
 *                 trajectory (stderr) without changing the training
 *                 outcome. The trajectory decides whether a plateau
 *                 patience exists that cuts >= 30% of build at
 *                 unchanged width — measured BEFORE shipping a default.
 *  - `plateau P`  VERDICT item 4 step 2: A/B/A — full build, plateau
 *                 build (trainStopPlateau=P), full build again (the
 *                 second full build bounds environment drift), each
 *                 calibrated + probed. Entries carry build_s, the
 *                 calibrated width in the algo label, and recall.
 *
 * Every mode APPENDS one JSON object per entry to
 * diagnostics/annbench_r14.jsonl (schema = the ANNBENCH entries plus
 * `spin_s` and optional `ratio`); tools/assemble_annbench_r14.py folds
 * the JSONL into ANNBENCH_r14.json for the addendum's inline checks.
 */
object AnnBenchR14 {
  private val OutJsonl = "diagnostics/annbench_r14.jsonl"

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def emit(dist: String, n: Long, algo: String, buildS: Double,
      probeS: Double, recall: Double, spinS: Double,
      extra: Seq[(String, Double)] = Seq.empty): Unit = {
    // Locale.ROOT everywhere (ADVICE r14): a comma-decimal default
    // locale would emit unparseable JSONL and silently break the
    // assembler.
    def fmt(p: String, v: Double): String =
      String.format(java.util.Locale.ROOT, p, Double.box(v))
    val extraJson =
      extra.map { case (k, v) => s""","$k":${fmt("%.4f", v)}""" }.mkString
    val line =
      s"""{"dist":"$dist","n":$n,"d":64,"k":10,"algo":"$algo",""" +
        s""""build_s":${fmt("%.2f", buildS)},"probe_s":${fmt("%.2f", probeS)},""" +
        s""""recall":${fmt("%.4f", recall)},"spin_s":${fmt("%.3f", spinS)}$extraJson}""" + "\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(OutJsonl),
      line.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    System.err.println(s"[annbench-r14] $line")
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: AnnBenchR14 ratio|nlist4096|plateau-log|plateau [P]|kernelgrid|calprofile")
    val mode = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = 64
    val k = 10
    new java.io.File("diagnostics").mkdirs()

    def exactOf(corpus: DataFrame, queries: DataFrame): Set[(Long, Long)] =
      pairsOf(Similarity.topK(corpus, queries, "vec_id", "embedding", k))
    def recOf(exact: Set[(Long, Long)], s: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 1.0 else (s & exact).size.toDouble / exact.size
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    mode match {
      // ---------------------------------------------------------------
      case "ratio" =>
        val n = 10000000L
        val corpus = AnnData.synthCorpus(spark, "clustered", n, d).persist()
        corpus.count()
        val queries = corpus.filter(col("vec_id") < 50)
        val exact = exactOf(corpus, queries)
        val nlist = math.max(16, math.sqrt(n.toDouble).toInt / 4) // 790

        // hand-tuned: the r13 grid's calibrated row's exact recipe
        val spinH = AnnData.spinSeconds()
        val (hIdx, tHBuild) = timed {
          val idx = Similarity.buildIvfPq(corpus, "vec_id", "embedding", d,
            nlist = nlist, ivfIters = 3, m = 16, ksub = 256, pqIters = 3,
            opqIters = 0, trainPointsPerCentroid = 0)
          idx.coded.persist().count()
          idx
        }
        val (npH, tHCal) = timed(
          hIdx.calibrateNprobe(corpus, "vec_id", "embedding", 0.95))

        // conf-auto: the zero-knowledge conf path, exactly as the r13 row
        val confKeys = Seq("algo", "nlist", "nprobe", "tppc", "shortlist",
          "m", "ksub")
        val spinA = AnnData.spinSeconds()
        val (aIdx, npA, slA, tABuild) =
          try {
            spark.conf.set("spark.graft.ann.algo", "ivfpq")
            Seq("nlist", "nprobe", "tppc", "shortlist")
              .foreach(kk => spark.conf.set(s"spark.graft.ann.$kk", "auto"))
            spark.conf.set("spark.graft.ann.m", "16")
            spark.conf.set("spark.graft.ann.ksub", "256")
            val (built, t) = timed(
              Similarity.annBuildIvfPq(corpus, "vec_id", "embedding", d))
            (built._1, built._2, built._3, t)
          } finally confKeys.foreach(kk =>
            spark.conf.unset(s"spark.graft.ann.$kk"))

        try {
          // STRICT ALTERNATION: H,A pairs so a drifting host inflates
          // both sides equally and the RATIO stays interpretable
          val reps = 5
          val hT = scala.collection.mutable.ArrayBuffer.empty[Double]
          val aT = scala.collection.mutable.ArrayBuffer.empty[Double]
          var hRes: Set[(Long, Long)] = Set.empty
          var aRes: Set[(Long, Long)] = Set.empty
          for (r <- 1 to reps) {
            val (h, th) = timed(pairsOf(
              hIdx.topK(queries, "vec_id", "embedding", k, npH, -1, corpus)))
            val (a, ta) = timed(pairsOf(
              aIdx.topK(queries, "vec_id", "embedding", k, npA, slA, corpus)))
            hRes = h; aRes = a
            hT += th; aT += ta
            System.err.println(
              f"[annbench-r14] ratio rep $r: hand=$th%.2f s auto=$ta%.2f s")
          }
          val (mH, mA) = (median(hT.toSeq), median(aT.toSeq))
          val anl = aIdx.assignCentroids.length
          emit("clustered", n, s"ivfpq[$nlist/c$npH,auto,r14]",
            tHBuild, mH, recOf(exact, hRes), spinH,
            Seq("cal_s" -> tHCal))
          emit("clustered", n, s"ivfpq[conf-auto,a$anl/c$npA,16x256,r14]",
            tABuild, mA, recOf(exact, aRes), spinA,
            Seq("ratio" -> (if (mH > 0) mA / mH else -1.0)))
        } finally { hIdx.unpersist(); aIdx.unpersist() }
        corpus.unpersist(blocking = false)

      // ---------------------------------------------------------------
      case "nlist4096" =>
        val n = 10000000L
        val nlist = 4096
        val corpus = AnnData.synthCorpus(spark, "clustered", n, d).persist()
        corpus.count()
        val queries = corpus.filter(col("vec_id") < 50)
        val exact = exactOf(corpus, queries)

        def ivfRow(label: String, forceFlat: Boolean): Unit = {
          val spin = AnnData.spinSeconds()
          if (forceFlat) // candidate gate never fires -> flat everywhere
            spark.conf.set("spark.graft.ann.twoLevelAssignMin", "1000000000")
          try {
            val (ivf, tBuild) = timed {
              val i = Similarity.buildIvf(corpus, "vec_id", "embedding", d,
                nlist, iters = 3, trainPointsPerCentroid = 0)
              i.persist()
              i.topWidths(1)
              i
            }
            val twoLevelKept = ivf.assignTwoLevel
            val (cal, tCal) = timed(ivf.calibrateNprobe(0.95))
            val (res, tProbe) = timed(pairsOf(
              ivf.topK(queries, "vec_id", "embedding", k, cal)))
            emit("clustered", n, s"ivf[$nlist/c$cal,$label]",
              tBuild, tProbe, recOf(exact, res), spin,
              Seq("cal_s" -> tCal,
                "two_level" -> (if (twoLevelKept) 1.0 else 0.0)))
            ivf.unpersist()
          } finally if (forceFlat)
            spark.conf.unset("spark.graft.ann.twoLevelAssignMin")
        }
        // flat first, then the verified default — the comparison row's
        // label records which kernel the verification actually kept
        ivfRow("flat-forced", forceFlat = true)
        ivfRow("default-gate", forceFlat = false)
        corpus.unpersist(blocking = false)

      // ---------------------------------------------------------------
      case "plateau-log" =>
        require(sys.env.contains("SPARK_GRAFT_IVF_PLATEAU_LOG"),
          "plateau-log mode expects SPARK_GRAFT_IVF_PLATEAU_LOG=1 in env " +
            "(the width trajectory is the entire point of the run)")
        // optional args(1): explicit nlist (default 0 = auto/790) — the
        // nlist=256 run is the COUNTERFACTUAL where r13 measured width
        // 102 at an early stop, i.e. where a correct plateau stop must
        // keep training
        val nlist = if (args.length > 1) args(1).toInt else 0
        val dist = if (args.length > 2) args(2) else "uniform"
        val n = 10000000L
        val corpus = AnnData.synthCorpus(spark, dist, n, d).persist()
        corpus.count()
        val queries = corpus.filter(col("vec_id") < 50)
        val exact = exactOf(corpus, queries)
        val spin = AnnData.spinSeconds()
        val (ivf, tBuild) = timed {
          val i = Similarity.buildIvf(corpus, "vec_id", "embedding", d,
            nlist = nlist, iters = 3, trainPointsPerCentroid = 0)
          i.persist()
          i.topWidths(1)
          i
        }
        val anl = ivf.centroids.length
        val (cal, tCal) = timed(ivf.calibrateNprobe(0.95))
        val (res, tProbe) = timed(pairsOf(
          ivf.topK(queries, "vec_id", "embedding", k, cal)))
        val tag = if (nlist == 0) s"a$anl" else s"$anl"
        emit(dist, n, s"ivf[$tag/c$cal,auto,traj]",
          tBuild, tProbe, recOf(exact, res), spin, Seq("cal_s" -> tCal))
        ivf.unpersist()
        corpus.unpersist(blocking = false)

      // ---------------------------------------------------------------
      case "plateau" =>
        val patience = if (args.length > 1) args(1).toInt else 2
        val n = 10000000L
        val corpus = AnnData.synthCorpus(spark, "uniform", n, d).persist()
        corpus.count()
        val queries = corpus.filter(col("vec_id") < 50)
        val exact = exactOf(corpus, queries)

        def build(label: String, plateau: Int): Unit = {
          val spin = AnnData.spinSeconds()
          // ALWAYS set (0 included): trainStopPlateau defaults ON, so
          // the full-build baseline must explicitly disable it
          spark.conf.set("spark.graft.ann.trainStopPlateau", plateau.toString)
          try {
            val (ivf, tBuild) = timed {
              val i = Similarity.buildIvf(corpus, "vec_id", "embedding", d,
                nlist = 0, iters = 3, trainPointsPerCentroid = 0)
              i.persist()
              i.topWidths(1)
              i
            }
            val anl = ivf.centroids.length
            val (cal, tCal) = timed(ivf.calibrateNprobe(0.95))
            val (res, tProbe) = timed(pairsOf(
              ivf.topK(queries, "vec_id", "embedding", k, cal)))
            emit("uniform", n, s"ivf[a$anl/c$cal,$label]",
              tBuild, tProbe, recOf(exact, res), spin, Seq("cal_s" -> tCal))
            ivf.unpersist()
          } finally spark.conf.unset("spark.graft.ann.trainStopPlateau")
        }
        // A/B/A: the repeated full build bounds environment drift — if
        // full#1 and full#2 disagree materially, the session was not
        // quiet and the plateau delta is not trustworthy
        build("full#1", 0)
        build(s"plateau$patience", patience)
        build("full#2", 0)
        corpus.unpersist(blocking = false)

      // ---------------------------------------------------------------
      // The assignment KERNEL cost isolated from everything else a
      // build pays: one full assignment pass over the persisted 10M
      // clustered corpus per (nlist, kernel), plus the measured
      // flat-vs-two-level disagreement at each nlist. Whole-build
      // comparisons at nlist=4096 came out cost-neutral (113 vs 121 s)
      // because builds bury the kernel under training/layout/persist
      // fixed costs AND the flat argmin's early exit is extremely
      // effective on clustered data — this mode measures where the
      // O(sqrt(nlist)) shape actually crosses over. Centroids are the
      // nlist lowest-id corpus vectors (the deterministic init rule):
      // kernel COST does not depend on centroid quality.
      case "kernelgrid" =>
        val n = 10000000L
        val corpus = AnnData.synthCorpus(spark, "clustered", n, d).persist()
        corpus.count()
        for (nlist <- Seq(4096, 16384, 65536)) {
          val cents = corpus.orderBy("vec_id").limit(nlist)
            .select("embedding").collect()
            .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)
          val spin = AnnData.spinSeconds()
          def pass(twoLevel: Boolean): Double = {
            val (_, t) = timed {
              corpus.select(Similarity.assignCellsChosen(
                  col("embedding"), cents, twoLevel,
                  Similarity.TwoLevelSpill).as("c"))
                .filter(col("c").isNotNull)
                .groupBy().count().collect()
            }
            t
          }
          val tFlat = pass(twoLevel = false)
          val tTwo = pass(twoLevel = true)
          // disagreement on a bounded slice (the verification's own shape)
          val slice = corpus.filter(pmod(xxhash64(col("vec_id"), lit("kg")),
            lit(n / 50000L)) === 0)
          val r = slice.select(
              Similarity.assignCellsChosen(col("embedding"), cents,
                twoLevel = false, Similarity.TwoLevelSpill).as("flat"),
              Similarity.assignCellsChosen(col("embedding"), cents,
                twoLevel = true, Similarity.TwoLevelSpill).as("two"))
            .filter(col("flat").isNotNull)
            .agg(count(lit(1)).as("n"),
              sum(when(col("flat") =!= col("two"), 1L).otherwise(0L)).as("dis"))
            .head()
          val disagree =
            if (r.getLong(0) == 0) 0.0
            else (if (r.isNullAt(1)) 0L else r.getLong(1)).toDouble / r.getLong(0)
          emit("clustered", n, s"assign[$nlist,flat]", 0.0, tFlat, 1.0, spin)
          emit("clustered", n, s"assign[$nlist,two-level]", 0.0, tTwo, 1.0, spin,
            Seq("disagree" -> disagree, "flat_ratio" -> (tFlat / tTwo)))
        }
        corpus.unpersist(blocking = false)

      // ---------------------------------------------------------------
      // diagnostic: where do the estimator's ~107 s/call go? A cheap
      // static-sample 1-iteration build (the estimator does not care how
      // good the centroids are) + three calibrations at distinct targets
      // (distinct memo keys -> three REAL estimator runs), stage-timed
      // via SPARK_GRAFT_IVF_TIMING. Emits nothing to the JSONL.
      case "calprofile" =>
        val n = 10000000L
        val corpus = AnnData.synthCorpus(spark, "uniform", n, d).persist()
        corpus.count()
        val (ivf, tBuild) = timed {
          val i = Similarity.buildIvf(corpus, "vec_id", "embedding", d,
            nlist = 790, iters = 1, trainPointsPerCentroid = 256)
          i.persist()
          i.topWidths(1)
          i
        }
        System.err.println(f"[calprofile] build(iters=1,static): $tBuild%.1f s")
        for (t <- Seq(0.95, 0.96, 0.97)) {
          val (w, tc) = timed(ivf.calibrateNprobe(t))
          System.err.println(f"[calprofile] calibrateNprobe($t%.2f) -> $w in $tc%.1f s")
        }
        ivf.unpersist()
        corpus.unpersist(blocking = false)

      case other => throw new IllegalArgumentException(s"unknown mode $other")
    }
    spark.stop()
  }
}
