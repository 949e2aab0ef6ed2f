package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * Round-15 TARGETED ANN measurements (VERDICT r14 items 2 and 5), on
 * the shared [[AnnData]] corpora. Artifact-schema notes (VERDICT r14
 * items 1 and 6, both addressed here):
 *
 *  - every entry carries BOTH environment yardsticks — `spin_s` (the
 *    r13 single-thread loop) and `eff_cores` (the r15 parallel-spin
 *    measure, [[graft.EnvProbe.effectiveCores]]) — because the r14
 *    driver run proved a quiet spin can coexist with a 45%-slow suite
 *    under multi-core contention;
 *  - entries carry an explicit `kind` field (`build` / `probe`) and
 *    never overload `probe_s` with non-probe times (the r14 kernel-
 *    isolation rows' defect).
 *
 * Modes (args(0)):
 *
 *  - `gen N`       materialize the clustered corpus at N rows into the
 *                  shared parquet cache and exit — lets the long
 *                  synthesis run detached from the measurements.
 *  - `tier100m [N]` VERDICT item 2: one decade up from the proven 10M
 *                  machinery, through the FULL production path — conf-
 *                  auto IVFPQ build (nlist/tppc/nprobe/shortlist auto,
 *                  plateau stop default-on) on clustered N (default
 *                  1e8), PARK the snapshot (save), reload, probe the
 *                  50-query batch from the parked layout (partition-
 *                  pruned scan), recall vs the EXACT oracle (one full
 *                  broadcast-query scan — at 100M this is minutes, paid
 *                  once; the auto-nlist ~ sqrt(n)/4 = 2500 regime is
 *                  where the verified two-level kernel engages by its
 *                  own verification gate, end-to-end rather than in
 *                  isolation).
 *  - `aniso [N]`   VERDICT item 5: does OPQ earn its keep on the
 *                  anisotropic corpus under the ZERO-KNOWLEDGE conf
 *                  path (auto shortlist + calibrated nprobe — the r11
 *                  OPQCHECK grid fixed both, and its measured edge was
 *                  small)? Three conf builds on aniso N (default 1e6):
 *                  opqIters auto (the new spectrum probe decides),
 *                  forced 0, forced 8 — each probed in strict
 *                  alternation, recall vs exact. The committed rows
 *                  DECIDE the auto rule's fate: if forced-8 shows no
 *                  recall edge at <= 1.2x build cost, the honest
 *                  shipping default is auto->0 everywhere.
 *
 * Every mode APPENDS one JSON object per entry to
 * diagnostics/annbench_r15.jsonl; tools/assemble_annbench_r15.py folds
 * the JSONL into ANNBENCH_r15.json for the addendum's inline checks.
 */
object AnnBenchR15 {
  private val OutJsonl = "diagnostics/annbench_r15.jsonl"
  private val D = 64
  private val K = 10

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def fmt(p: String, v: Double): String =
    String.format(java.util.Locale.ROOT, p, Double.box(v))

  /** One JSONL entry. `kind` is build/probe; numeric fields ride in
    * `fields` so a build row never carries a fake probe_s. */
  private def emit(kind: String, dist: String, n: Long, algo: String,
      spinS: Double, effCores: Double,
      fields: Seq[(String, Double)]): Unit = {
    val fj = fields.map { case (k, v) => s""","$k":${fmt("%.4f", v)}""" }.mkString
    val line =
      s"""{"dist":"$dist","n":$n,"d":$D,"k":$K,"kind":"$kind","algo":"$algo",""" +
        s""""spin_s":${fmt("%.3f", spinS)},"eff_cores":${fmt("%.2f", effCores)}$fj}""" +
        "\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(OutJsonl),
      line.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    System.err.println(s"[annbench-r15] $line")
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnBenchR15 gen N|tier100m [N]|aniso [N]")
    val mode = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File("diagnostics").mkdirs()

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def recOf(exact: Set[(Long, Long)], s: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 1.0 else (s & exact).size.toDouble / exact.size

    val confKeys =
      Seq("algo", "nlist", "nprobe", "tppc", "shortlist", "m", "ksub", "opqIters")
    def withConf[T](kv: (String, String)*)(f: => T): T =
      try {
        kv.foreach { case (k, v) => spark.conf.set(s"spark.graft.ann.$k", v) }
        f
      } finally confKeys.foreach(k => spark.conf.unset(s"spark.graft.ann.$k"))

    mode match {
      // ---------------------------------------------------------------
      case "gen" =>
        val n = args(1).toLong
        val dist = if (args.length > 2) args(2) else "clustered"
        val (cnt, t) = timed(AnnData.synthCorpus(spark, dist, n, D).count())
        System.err.println(f"[annbench-r15] gen $dist n=$cnt done in $t%.1f s")

      // ---------------------------------------------------------------
      case "tier100m" =>
        val n = if (args.length > 1) args(1).toLong else 100000000L
        val corpus = AnnData.synthCorpus(spark, "clustered", n, D)
        val queries = corpus.filter(col("vec_id") < 50)
        val spin0 = AnnData.spinSeconds()
        val eff0 = AnnData.effectiveCores()
        // exact oracle: ONE broadcast-query scan over the full corpus
        // (no sampling — the recall gate should not inherit oracle
        // noise); at 1e8 x 50 queries this is the expensive one-time
        // step and is timed + stamped like everything else
        val (exact, tExact) = timed(
          pairsOf(Similarity.topK(corpus, queries, "vec_id", "embedding", K)))
        emit("oracle", "clustered", n, "exact[50q]", spin0, eff0,
          Seq("scan_s" -> tExact))

        // conf-auto build: the zero-knowledge entry point, plateau stop
        // default-on, auto nlist ~ sqrt(n)/4
        val spinB = AnnData.spinSeconds()
        val effB = AnnData.effectiveCores()
        val ((idx, np, sl), tBuild) = withConf(
          "algo" -> "ivfpq", "nlist" -> "auto", "nprobe" -> "auto",
          "tppc" -> "auto", "shortlist" -> "auto",
          "m" -> "16", "ksub" -> "256") {
          timed(Similarity.annBuildIvfPq(corpus, "vec_id", "embedding", D))
        }
        val nlist = idx.assignCentroids.length
        val park = s"/tmp/annbench/park_clustered_${n}_r15"
        val (_, tSave) = timed { idx.save(park) }
        idx.unpersist()
        emit("build", "clustered", n, s"ivfpq[conf-auto,a$nlist/c$np,16x256]",
          spinB, effB, Seq("build_s" -> tBuild, "save_s" -> tSave))

        // serve from the PARKED snapshot — the production probe shape
        val spinP = AnnData.spinSeconds()
        val effP = AnnData.effectiveCores()
        val loaded = Similarity.loadIvfPq(spark, park)
        var res: Set[(Long, Long)] = Set.empty
        val ts = (1 to 3).map { _ =>
          val (r, t) = timed(pairsOf(
            loaded.topK(queries, "vec_id", "embedding", K, np, sl, corpus)))
          res = r
          t
        }
        emit("probe", "clustered", n, s"ivfpq[parked,a$nlist/c$np,16x256]",
          spinP, effP,
          Seq("probe_s" -> median(ts), "probe_min" -> ts.min,
            "probe_max" -> ts.max, "recall" -> recOf(exact, res)))

      // ---------------------------------------------------------------
      case "aniso" =>
        val n = if (args.length > 1) args(1).toLong else 1000000L
        val corpus = AnnData.synthCorpus(spark, "aniso", n, D).persist()
        corpus.count()
        val queries = corpus.filter(col("vec_id") < 50)
        val exact = pairsOf(
          Similarity.topK(corpus, queries, "vec_id", "embedding", K))

        case class Built(label: String, idx: Similarity.IvfPqIndex,
          np: Int, sl: Int, buildS: Double, spin: Double, eff: Double)
        def build(label: String, opq: String): Built = {
          val spin = AnnData.spinSeconds()
          val eff = AnnData.effectiveCores()
          val ((idx, np, sl), t) = withConf(
            "algo" -> "ivfpq", "nlist" -> "auto", "nprobe" -> "auto",
            "tppc" -> "auto", "shortlist" -> "auto",
            "m" -> "16", "ksub" -> "256", "opqIters" -> opq) {
            timed(Similarity.annBuildIvfPq(corpus, "vec_id", "embedding", D))
          }
          Built(label, idx, np, sl, t, spin, eff)
        }
        val variants = Seq(
          build("opq=auto", "auto"), build("opq=0", "0"), build("opq=8", "8"))
        try {
          // strict alternation across the three indexes so host drift
          // inflates all variants equally (the r14 ratio-mode method)
          val reps = 3
          val times = variants.map(_ => Vector.newBuilder[Double])
          val results = new Array[Set[(Long, Long)]](variants.size)
          for (_ <- 1 to reps; (v, i) <- variants.zipWithIndex) {
            val (r, t) = timed(pairsOf(
              v.idx.topK(queries, "vec_id", "embedding", K, v.np, v.sl, corpus)))
            results(i) = r
            times(i) += t
          }
          variants.zipWithIndex.foreach { case (v, i) =>
            val rot = v.idx.model.rotation.isDefined
            emit("build", "aniso", n,
              s"ivfpq[conf,${v.label},rot=$rot,a${v.idx.assignCentroids.length}/c${v.np}]",
              v.spin, v.eff, Seq("build_s" -> v.buildS))
            emit("probe", "aniso", n,
              s"ivfpq[conf,${v.label},rot=$rot,a${v.idx.assignCentroids.length}/c${v.np}]",
              v.spin, v.eff,
              Seq("probe_s" -> median(times(i).result()),
                "recall" -> recOf(exact, results(i))))
          }
        } finally variants.foreach(_.idx.unpersist())
        corpus.unpersist(blocking = false)

      // ---------------------------------------------------------------
      // Re-save an existing parked snapshot through the FIXED layout
      // write (one file per cell — the cluster-by-cell repartition in
      // Similarity.writeLayout) and time both the save and a probe from
      // the re-parked copy. The tier100m run measured the PRE-fix park:
      // 487,500 files (one per source-task x cell pair), save_s ~2.3x
      // build_s; this mode pins the post-fix number on the same index
      // bytes, and asserts the re-parked probe returns EXACTLY the rows
      // the original park returns (same layout content => same probe).
      case "repark" =>
        val n = if (args.length > 1) args(1).toLong else 100000000L
        val src = s"/tmp/annbench/park_clustered_${n}_r15"
        val dst = s"/tmp/annbench/park_clustered_${n}_r15_fixed"
        val corpus = AnnData.synthCorpus(spark, "clustered", n, D)
        val queries = corpus.filter(col("vec_id") < 50)
        val spin = AnnData.spinSeconds()
        val eff = AnnData.effectiveCores()
        val loaded = Similarity.loadIvfPq(spark, src)
        val (_, tSave) = timed(loaded.save(dst))
        val nFiles = {
          def walk(f: java.io.File): Long =
            if (f.isDirectory) f.listFiles().map(walk).sum
            else if (f.getName.endsWith(".parquet")) 1L else 0L
          walk(new java.io.File(s"$dst/layout"))
        }
        val np = 27 // the tier100m calibrated width (persisted with src)
        val sl = -1
        val reparked = Similarity.loadIvfPq(spark, dst)
        var resSrc: Set[(Long, Long)] = Set.empty
        var resDst: Set[(Long, Long)] = Set.empty
        val ts = (1 to 3).map { _ =>
          val (r, t) = timed(pairsOf(
            reparked.topK(queries, "vec_id", "embedding", K, np, sl, corpus)))
          resDst = r
          t
        }
        val (rs, _) = timed(pairsOf(
          loaded.topK(queries, "vec_id", "embedding", K, np, sl, corpus)))
        resSrc = rs
        require(resSrc == resDst,
          s"re-parked probe diverged: ${(resSrc diff resDst).take(3)} / " +
            s"${(resDst diff resSrc).take(3)}")
        emit("build", "clustered", n, s"ivfpq[repark-fixed,a2500/c$np,16x256]",
          spin, eff, Seq("save_s" -> tSave, "files" -> nFiles.toDouble))
        emit("probe", "clustered", n, s"ivfpq[repark-fixed,a2500/c$np,16x256]",
          spin, eff,
          Seq("probe_s" -> median(ts), "probe_min" -> ts.min,
            "probe_max" -> ts.max, "equal_to_prefix_park" -> 1.0))

      case other =>
        throw new IllegalArgumentException(
          s"unknown mode $other — usage: AnnBenchR15 gen N|tier100m [N]|aniso [N]|repark [N]")
    }
    spark.stop()
  }
}
