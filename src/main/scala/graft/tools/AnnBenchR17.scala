package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * Round-17 TARGETED ANN measurements (VERDICT r16 item 1): the same
 * modes as [[AnnBenchR16]], re-pointed at round-17 artifacts. The one
 * that matters this round is `m32` — the FULL zero-knowledge conf path
 * at n=1e8 under the REBUILT probed-mass trigger, which must resolve
 * 32x256 by itself (the r16 worst-cell trigger resolved 16x32 there and
 * parked recall was 0.342); the row records what the rule picked and
 * the parked-probe recall vs the persisted oracle.
 *
 *  - `oracle [N]`    compute the exact top-K pairs for the 50-query
 *                    batch over clustered N (default 1e8) and PERSIST
 *                    them (`/tmp/annbench/oracle_<dist>_<n>_k10.parquet`)
 *                    so every subsequent recall row in the round reuses
 *                    one oracle scan instead of re-paying ~33 min each.
 *  - `probe PARK [np] [sl] [reps]`
 *                    probe a parked snapshot with the 50-query batch,
 *                    recall vs the persisted oracle. sl<=0 = auto depth.
 *                    The first r16 row: the r15 `_fixed` park (2500
 *                    files) probed on the SAME index bytes that read
 *                    1217.9 s at 487,500 files — separating metadata
 *                    poisoning from real scan cost.
 *  - `depthsweep PARK np div1,div2,...`
 *                    hypothesis (a) of the r15 recall defect: probe at
 *                    shortlist = worstScan/div for each divisor (1 =
 *                    re-rank the full scan — the cell-recall ceiling),
 *                    one rep each, recall vs the persisted oracle. The
 *                    r10 recall-vs-depth curve, one decade up.
 *  - `repark SRC DST` timed save of SRC through the r15 cell-clustered
 *                    writeLayout into DST + file count + content
 *                    equality (layout rows of DST set-equal to SRC) —
 *                    the repark_s figure the r15 round ran out of clock
 *                    before emitting.
 *  - `m32 [N]`       hypothesis (b): the FULL conf path at m=32 codes
 *                    (2x bytes, 2^128-resolution codebooks) on
 *                    clustered N — build, park through the fixed
 *                    writer, probe from the park, recall vs the
 *                    persisted oracle.
 *  - `delete PARK frac`
 *                    VERDICT item 6: tombstone `frac` of the parked
 *                    index's ids (at 1e8 and frac=0.1 that is 10M ids —
 *                    the bloom anti-join regime, > TombstoneBroadcastMax),
 *                    probe (timing + no-deleted-id assert), compact
 *                    (timed), probe again, file count. Run it on a COPY
 *                    — deletion mutates the snapshot.
 *
 * Rows append to diagnostics/annbench_r17.jsonl with the r15 schema
 * (explicit `kind`, spin_s + eff_cores on every entry);
 * tools/assemble_annbench_r17.py folds them into ANNBENCH_r16.json.
 */
object AnnBenchR17 {
  private val OutJsonl = "diagnostics/annbench_r17.jsonl"
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
    System.err.println(s"[annbench-r17] $line")
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  private def recOf(exact: Set[(Long, Long)], s: Set[(Long, Long)]): Double =
    if (exact.isEmpty) 1.0 else (s & exact).size.toDouble / exact.size

  private def oraclePath(dist: String, n: Long) =
    s"/tmp/annbench/oracle_${dist}_${n}_k$K.parquet"

  private def loadOracle(spark: SparkSession, dist: String, n: Long): Set[(Long, Long)] =
    pairsOf(spark.read.parquet(oraclePath(dist, n)))

  private def parquetFiles(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1L else 0L
    walk(new java.io.File(dir))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: AnnBenchR17 oracle [N]|probe PARK [np] [sl] [reps]|" +
        "depthsweep PARK np divs|repark SRC DST|m32 [N]|delete PARK frac")
    val mode = args(0)
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    // the 100M probe's re-rank shuffle+sort spill can exceed the
    // sandbox root disk's headroom; SPARK_GRAFT_LOCAL_DIR points the
    // spill at a roomier volume (e.g. /dev/shm) for campaign runs
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").foreach(d =>
      builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File("diagnostics").mkdirs()

    val confKeys =
      Seq("algo", "nlist", "nprobe", "tppc", "shortlist", "m", "ksub", "opqIters")
    def withConf[T](kv: (String, String)*)(f: => T): T =
      try {
        kv.foreach { case (k, v) => spark.conf.set(s"spark.graft.ann.$k", v) }
        f
      } finally confKeys.foreach(k => spark.conf.unset(s"spark.graft.ann.$k"))

    mode match {
      // ---------------------------------------------------------------
      case "oracle" =>
        val n = if (args.length > 1) args(1).toLong else 100000000L
        val corpus = AnnData.synthCorpus(spark, "clustered", n, D)
        val queries = corpus.filter(col("vec_id") < 50)
        val spin = AnnData.spinSeconds()
        val eff = AnnData.effectiveCores()
        val (res, t) = timed(
          Similarity.topK(corpus, queries, "vec_id", "embedding", K)
            .select("query_id", "neighbor_id").localCheckpoint())
        res.write.mode("overwrite").parquet(oraclePath("clustered", n))
        emit("oracle", "clustered", n, s"exact[50q,persisted]", spin, eff,
          Seq("scan_s" -> t, "pairs" -> res.count().toDouble))

      // ---------------------------------------------------------------
      case "probe" =>
        val park = args(1)
        val np = if (args.length > 2) args(2).toInt else 27
        val sl = if (args.length > 3) args(3).toInt else -1
        val reps = if (args.length > 4) args(4).toInt else 3
        val n = 100000000L
        val corpus = AnnData.synthCorpus(spark, "clustered", n, D)
        val queries = corpus.filter(col("vec_id") < 50)
        val exact = loadOracle(spark, "clustered", n)
        val files = parquetFiles(s"$park/layout")
        val spin = AnnData.spinSeconds()
        val eff = AnnData.effectiveCores()
        val loaded = Similarity.loadIvfPq(spark, park)
        var res: Set[(Long, Long)] = Set.empty
        val ts = (1 to reps).map { _ =>
          val (r, t) = timed(pairsOf(
            loaded.topK(queries, "vec_id", "embedding", K, np, sl, corpus)))
          res = r
          t
        }
        emit("probe", "clustered", n,
          s"ivfpq[parked,a${loaded.assignCentroids.length}/c$np," +
            s"${loaded.model.m}x${loaded.model.ksub},sl=$sl]",
          spin, eff,
          Seq("probe_s" -> median(ts), "probe_min" -> ts.min,
            "probe_max" -> ts.max, "recall" -> recOf(exact, res),
            "files" -> files.toDouble))

      // ---------------------------------------------------------------
      case "depthsweep" =>
        val park = args(1)
        val np = args(2).toInt
        val divs = args(3).split(",").map(_.trim.toLong)
        val n = 100000000L
        val corpus = AnnData.synthCorpus(spark, "clustered", n, D)
        val queries = corpus.filter(col("vec_id") < 50)
        val exact = loadOracle(spark, "clustered", n)
        val loaded = Similarity.loadIvfPq(spark, park)
        // worst-case scan: the np widest cells (the autoShortlist base)
        val worstScan = loaded.coded.groupBy("c").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc).limit(np)
          .collect().map(_.getLong(1)).sum
        System.err.println(s"[annbench-r17] depthsweep worstScan=$worstScan")
        divs.foreach { div =>
          val sl = math.max(2L * K, worstScan / div).min(Int.MaxValue.toLong).toInt
          val spin = AnnData.spinSeconds()
          val eff = AnnData.effectiveCores()
          val (res, t) = timed(pairsOf(
            loaded.topK(queries, "vec_id", "embedding", K, np, sl, corpus)))
          emit("probe", "clustered", n,
            s"ivfpq[depthsweep,a${loaded.assignCentroids.length}/c$np,scan/$div=$sl]",
            spin, eff,
            Seq("probe_s" -> t, "recall" -> recOf(exact, res),
              "shortlist" -> sl.toDouble, "worst_scan" -> worstScan.toDouble))
        }

      // ---------------------------------------------------------------
      case "repark" =>
        val src = args(1)
        val dst = args(2)
        val n = 100000000L
        val spin = AnnData.spinSeconds()
        val eff = AnnData.effectiveCores()
        val loaded = Similarity.loadIvfPq(spark, src)
        val (_, tSave) = timed(loaded.save(dst))
        val files = parquetFiles(s"$dst/layout")
        // content equality: the reparked layout must hold EXACTLY the
        // source's rows (save is a rewrite, never a transform) — an
        // anti-join both ways over (c, id) with code bytes
        val a = spark.read.parquet(s"$src/layout")
          .select(col("c"), col("id"), col("codes"))
        val b = spark.read.parquet(s"$dst/layout")
          .select(col("c"), col("id"), col("codes"))
        val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        require(diff == 0, s"repark content diverged: $diff rows differ")
        emit("build", "clustered", n,
          s"ivfpq[repark,a${loaded.assignCentroids.length}]", spin, eff,
          Seq("save_s" -> tSave, "files" -> files.toDouble,
            "content_equal" -> 1.0))

      // ---------------------------------------------------------------
      case "m32" =>
        // round-16 fold-in evidence: the FULL zero-knowledge conf path —
        // every knob auto INCLUDING the new m/ksub density rule. On the
        // failing 1e8 clustered corpus the occupancy probe must resolve
        // 32x256 by itself (the emitted row records what it picked); on
        // small corpora the same path resolves 16x32 (gate-verified).
        val n = if (args.length > 1) args(1).toLong else 100000000L
        val corpus = AnnData.synthCorpus(spark, "clustered", n, D)
        val queries = corpus.filter(col("vec_id") < 50)
        val exact = loadOracle(spark, "clustered", n)
        val spinB = AnnData.spinSeconds()
        val effB = AnnData.effectiveCores()
        val ((idx, np, sl), tBuild) = withConf(
          "algo" -> "ivfpq", "nlist" -> "auto", "nprobe" -> "auto",
          "tppc" -> "auto", "shortlist" -> "auto") {
          timed(Similarity.annBuildIvfPq(corpus, "vec_id", "embedding", D))
        }
        val nlist = idx.assignCentroids.length
        val mPicked = idx.model.m
        val ksubPicked = idx.model.ksub
        val park = s"/tmp/annbench/park_clustered_${n}_r17_auto"
        val (_, tSave) = timed(idx.save(park))
        idx.unpersist()
        val files = parquetFiles(s"$park/layout")
        emit("build", "clustered", n,
          s"ivfpq[conf-auto,a$nlist/c$np,auto->${mPicked}x$ksubPicked]",
          spinB, effB, Seq("build_s" -> tBuild, "save_s" -> tSave,
            "files" -> files.toDouble, "m" -> mPicked.toDouble,
            "ksub" -> ksubPicked.toDouble))
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
        emit("probe", "clustered", n, s"ivfpq[parked,a$nlist/c$np,${mPicked}x$ksubPicked]",
          spinP, effP,
          Seq("probe_s" -> median(ts), "probe_min" -> ts.min,
            "probe_max" -> ts.max, "recall" -> recOf(exact, res)))

      // ---------------------------------------------------------------
      case "delete" =>
        val park = args(1)
        val frac = args(2).toDouble
        val np = if (args.length > 3) args(3).toInt else 27
        val n = 100000000L
        val corpus = AnnData.synthCorpus(spark, "clustered", n, D)
        val queries = corpus.filter(col("vec_id") < 50)
        // survivors-only queries: keep query ids out of the removal set
        // so probe results stay interpretable
        val mod = math.max(2L, math.round(1.0 / frac))
        val removals = corpus.select(col("vec_id"))
          .filter(pmod(col("vec_id"), lit(mod)) === lit(1L))
        val spin = AnnData.spinSeconds()
        val eff = AnnData.effectiveCores()
        val (nDel, tDel) = timed(
          Similarity.deleteFromIndex(spark, park, removals, "vec_id"))
        emit("build", "clustered", n, s"ivfpq[delete,mod$mod]", spin, eff,
          Seq("delete_s" -> tDel, "tombstones" -> nDel.toDouble))
        // probe with tombstones live (bloom anti-join regime at >1M)
        val loaded = Similarity.loadIvfPq(spark, park)
        val sl = -1
        var res: Set[(Long, Long)] = Set.empty
        val ts = (1 to 3).map { _ =>
          val (r, t) = timed(pairsOf(
            loaded.topK(queries, "vec_id", "embedding", K, np, sl, corpus)))
          res = r
          t
        }
        val ghost = res.count { case (_, nb) => nb % mod == 1 }
        require(ghost == 0, s"deleted ids surfaced in probe: $ghost pairs")
        emit("probe", "clustered", n, s"ivfpq[tombstoned,mod$mod,c$np]",
          spin, eff, Seq("probe_s" -> median(ts), "probe_min" -> ts.min,
            "probe_max" -> ts.max, "ghosts" -> ghost.toDouble))
        // compact: rewrite affected cells, clear tombstones
        val (removed, tCompact) = timed(Similarity.compactIndex(spark, park))
        val files = parquetFiles(s"$park/layout")
        val spin2 = AnnData.spinSeconds()
        val eff2 = AnnData.effectiveCores()
        val loaded2 = Similarity.loadIvfPq(spark, park)
        var res2: Set[(Long, Long)] = Set.empty
        val ts2 = (1 to 3).map { _ =>
          val (r, t) = timed(pairsOf(
            loaded2.topK(queries, "vec_id", "embedding", K, np, sl, corpus)))
          res2 = r
          t
        }
        require(res2 == res,
          s"compaction changed probe results: ${(res diff res2).take(3)}")
        emit("build", "clustered", n, s"ivfpq[compact,mod$mod]", spin2, eff2,
          Seq("compact_s" -> tCompact, "removed" -> removed.toDouble,
            "files" -> files.toDouble))
        emit("probe", "clustered", n, s"ivfpq[compacted,mod$mod,c$np]",
          spin2, eff2, Seq("probe_s" -> median(ts2), "probe_min" -> ts2.min,
            "probe_max" -> ts2.max, "equal_to_tombstoned" -> 1.0))

      case other =>
        throw new IllegalArgumentException(
          s"unknown mode $other — usage: AnnBenchR17 oracle [N]|probe PARK " +
            "[np] [sl] [reps]|depthsweep PARK np divs|repark SRC DST|" +
            "m32 [N]|delete PARK frac")
    }
    spark.stop()
  }
}
