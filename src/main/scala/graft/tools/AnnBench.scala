package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * ANN scale grid: synthesize an embedding corpus at 100-5000x the
 * driver testdata and run every similarity path — exact brute force,
 * IVF, PQ, BQ, IVF+PQ — measuring build time, probe time, and
 * recall@10 against the exact ranking. Two distributions:
 *
 *  - `uniform`: i.i.d. coordinates — the HOSTILE case (no cluster
 *    structure for IVF cells, cosines concentrate near 0 so 1-bit and
 *    8-bit codes are all variance). Lower-bounds every approximate
 *    path's recall.
 *  - `clustered`: 64 sign-pattern centers + 0.15 noise — the shape
 *    real embedding corpora actually have. Shows the probe-cost and
 *    recall headroom the hostile case hides.
 *
 * Round 10 additions: the m=16 (16 B/vector) rows carry BOTH the fixed
 * shortlist=2000 figure and the `auto` refine-depth figure (the
 * fixed-memory recall fix — see IvfPqIndex.autoShortlist), an OPQ row
 * at n<=1M documents the rotation's measured effect on this corpus's
 * isotropic residuals, and an n=10M tier (d=64, both dists) stresses
 * the probe's cell-collect, the shortlist heap, and the sampled
 * trainer one order up with a reduced algo set (exact / IVF /
 * IVFPQ-m32 / IVFPQ-m16-auto).
 *
 * Emits one JSON line per (dist, n, algo) and writes the whole grid to
 * ANNBENCH_r10.json. Build = index construction (amortized per corpus
 * snapshot in production); probe = one 50-query batch end to end
 * (collect).
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

    def corpusOf(dist: String, n: Long): DataFrame = {
      // u_j in [-1, 1] from xxhash64(id, j); clustered adds a sign
      // center per (id % 64) cluster with 0.15 noise amplitude.
      // Materialized to parquet: the 64-coordinate synthesis expression
      // would otherwise ride into EVERY downstream plan (a >64 KB
      // codegen unit that trips Janino on the wider pipelines, and a
      // re-synthesis on every index probe) — and a parquet scan is what
      // a real corpus read is anyway. Reused across runs when present.
      val path = s"/tmp/annbench/${dist}_$n.parquet"
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        val ids = spark.range(n).select(col("id").as("vec_id"))
        val coords = (0 until d).map { j =>
          val u = (xxhash64(col("vec_id"), lit(j)).cast("double") / lit(Long.MaxValue.toDouble))
          val expr = if (dist == "uniform") u else {
            val center = when(
              xxhash64(pmod(col("vec_id"), lit(64L)), lit(j + 1000)) >= 0, 1.0).otherwise(-1.0)
            center + u * lit(0.15)
          }
          expr.cast("float")
        }
        ids.select(col("vec_id"), array(coords: _*).as("embedding"))
          .write.mode("overwrite").parquet(path)
      }
      spark.read.parquet(path)
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    def pairsOf(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    for (dist <- Seq("uniform", "clustered"); n <- ns) {
      val big = n > 2000000L
      val corpus = corpusOf(dist, n).persist()
      corpus.count()
      val queries = corpus.filter(col("vec_id") < 50)

      val (exact, tExact) = timed(pairsOf(
        Similarity.topK(corpus, queries, "vec_id", "embedding", k)))
      entries += Entry(dist, n, "exact", 0.0, tExact, 1.0)
      def rec(s: Set[(Long, Long)]): Double =
        if (exact.isEmpty) 1.0 else (s & exact).size.toDouble / exact.size

      // IVF: nlist scales with sqrt(n)/4 (the sampled coarse trainer —
      // round 10 — makes this affordable: training cost is bounded by
      // nlist*256 rows, the corpus pays one assignment pass). The <=1M
      // tiers keep the r9 configs (256 cap, probe a quarter) so rows
      // stay comparable across rounds; the 10M tier runs the sqrt
      // scaling with an nlist/8 probe fraction — bigger nlist is what
      // BUYS the sublinear probe fraction at equal cell recall, and it
      // shrinks the worst-case scan that sizes the auto refine depth.
      // big-tier probe fraction is per-dist: clustered corpora keep cell
      // recall at 1/8 (a query's cluster spans ~nlist/64 cells and the
      // nearest-centroid order finds them), while uniform data has no
      // structure for cells to exploit — cell recall IS the probe
      // fraction there, so it keeps the 1/4 the <=1M tiers use
      val nlist =
        if (big) math.max(16, math.sqrt(n.toDouble).toInt / 4)
        else math.min(256, math.max(16, math.sqrt(n.toDouble).toInt / 4))
      val nprobe =
        if (big && dist == "clustered") math.max(16, nlist / 8)
        else math.max(4, nlist / 4)
      // coarse-trainer sample budget: the <=1M tiers pin the UNSAMPLED
      // path (tppc * nlist >= n) so their rows stay semantics-identical
      // to r9; the 10M tier runs the scale path (FAISS's 256/centroid
      // convention). The IvfSampleProbe dose-response (uniform 1M,
      // nprobe=62): tppc 256 -> 0.830, 1024 -> 0.862, full -> 1.000 --
      // structureless data is the one shape where sampling costs cell
      // recall; clustered corpora measure insensitive.
      val tppc = if (big) 256 else 4096
      // build time includes materializing the layout (persist+count) —
      // the production build-once/probe-many contract, same treatment
      // as the ivfpq coded layout below; without it every probe re-pays
      // the O(n·nlist·d) assignment, which at nlist=790/n=10M dwarfs
      // the actual scan
      val (ivf, tIvfBuild) = timed {
        val i = Similarity.buildIvf(corpus, "vec_id", "embedding", d, nlist,
          iters = 3, trainPointsPerCentroid = tppc)
        i.persist()
        i.topWidths(1) // any action over the layout fills the persisted blocks
        i
      }
      val (ivfRes, tIvfProbe) = timed(pairsOf(
        ivf.topK(queries, "vec_id", "embedding", k, nprobe)))
      entries += Entry(dist, n, s"ivf[$nlist/$nprobe,t$tppc]", tIvfBuild, tIvfProbe, rec(ivfRes))
      ivf.unpersist()

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

      // IVF+PQ. m is bytes/vector; at the headline m=16 budget the
      // refine depth (shortlist) is the recall knob at fixed memory —
      // both figures recorded. The m=32 build is skipped at n=10M for
      // the uniform dist (m=16 already saturates there in every grid).
      def ivfpqRows(m: Int, opqIters: Int, shortlists: Seq[(String, Int)]): Unit = {
        val tag = if (opqIters > 0) s",opq$opqIters" else ""
        val (ivfpq, tBuild) = timed {
          val idx = Similarity.buildIvfPq(corpus, "vec_id", "embedding", d,
            nlist = nlist, ivfIters = 3, m = m, ksub = 256, pqIters = 3,
            opqIters = opqIters, trainPointsPerCentroid = tppc)
          idx.coded.persist().count() // materialize like a snapshot would
          idx
        }
        shortlists.foreach { case (label, s) =>
          val (res, tProbe) = timed(pairsOf(
            ivfpq.topK(queries, "vec_id", "embedding", k, nprobe, s, corpus)))
          entries += Entry(dist, n, s"ivfpq[$nlist/$nprobe,${m}x256$tag,t$tppc,$label]",
            tBuild, tProbe, rec(res))
        }
        ivfpq.coded.unpersist(blocking = false)
      }
      if (!big) {
        ivfpqRows(16, 0, Seq("s2000" -> 2000, "auto" -> -1))
        // OPQ at the headline budget: measured no-op on THIS corpus's
        // isotropic residuals (the spec's Hadamard data shows the win)
        if (dist == "clustered" && n >= 1000000L)
          ivfpqRows(16, 8, Seq("s2000" -> 2000))
        ivfpqRows(32, 0, Seq("s2000" -> 2000))
      } else {
        ivfpqRows(16, 0, Seq("auto" -> -1))
        if (dist == "clustered")
          ivfpqRows(32, 0, Seq("s2000" -> 2000, "auto" -> -1))
      }

      entries.filter(e => e.dist == dist && e.n == n).foreach { e =>
        println(f"[annbench] ${e.dist}%9s n=${e.n}%8d ${e.algo}%34s " +
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
    java.nio.file.Files.write(java.nio.file.Paths.get("ANNBENCH_r10.json"),
      out.getBytes("UTF-8"))
    println(s"[annbench] wrote ANNBENCH_r10.json with ${entries.size} entries")
    spark.stop()
  }
}
