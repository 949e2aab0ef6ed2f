package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Direction, SkylineCore, SkylineQuery}
import org.apache.spark.sql.graft.ColumnShim

/**
 * Partitioning hints mirroring the reference's three schemes
 * (`/root/reference/src/utils/functions.py:57-300`). The default
 * ([[NoHint]]) needs none of them: Spark's partial aggregation already
 * computes per-task local skylines on whatever partitioning the scan
 * produced, so pre-shuffling by a spatial key is an *option*, not a
 * requirement — it pays off when per-task local skylines would be large
 * (high d) and a spatial split shrinks them (esp. [[AngleHint]]).
 */
sealed trait PartitionHint
case object NoHint extends PartitionHint
/** MR_DIM: 1-D range partition on the first skyline dimension into `p` buckets. */
final case class DimHint(p: Int) extends PartitionHint
/** MR_GRID: base-`b` grid cells + plan-time dominated-cell pruning. */
final case class GridHint(b: Int) extends PartitionHint
/** MR_ANGLE: angular cells, `p` buckets per angle. MIN-only, first orthant. */
final case class AngleHint(p: Int) extends PartitionHint

/**
 * The user-facing skyline API:
 *
 * {{{
 *   import graft.operators.SkylineOps._
 *   df.skyline(Seq("price" -> Direction.Min, "size" -> Direction.Max))
 *   df.skyline("SKYLINE OF price MIN, size MAX", hint = GridHint(4))
 * }}}
 *
 * Output: one row per skyline point, with the original column names and
 * types (exact duplicates collapsed — the reference's set semantics,
 * functions.py:40,51).
 */
object SkylineOps {

  /** Default occupied-grid-cell cap for [[GridHint]]'s plan-time prune:
    * 2^20 cells ≈ 8 MB of Long keys on the driver — far beyond any grid a
    * sane hint produces (b <= 12 in practice ⇒ thousands of cells), small
    * enough that the pre-pass collect can never OOM the driver. Override
    * per session with `spark.graft.skyline.maxGridCells`. */
  val DefaultMaxGridCells: Int = 1 << 20

  private[operators] def configuredMaxGridCells(
      spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("spark.graft.skyline.maxGridCells")
      .map(_.toInt).getOrElse(DefaultMaxGridCells)

  /** Run directories `skylineExternal` has written this JVM. The
    * returned DataFrame reads its result run LAZILY, so there is no safe
    * in-call point to delete it — the retention contract is
    * process-lifetime: every run dir is removed by ONE Hadoop shutdown
    * hook (registered at priority 40, above the FileSystem-cache close
    * at 10, so the delete still has a live filesystem). Callers that
    * loop over many inputs and have materialized the results elsewhere
    * can reclaim disk earlier with [[cleanExternalRuns]]. */
  private val externalRunDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[
      (String, org.apache.hadoop.conf.Configuration)]
  @volatile private var cleanupHookRegistered = false
  private def registerExternalRunDir(path: String,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    if (!cleanupHookRegistered) synchronized {
      if (!cleanupHookRegistered) {
        org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
          new Runnable { def run(): Unit = cleanExternalRuns() }, 40)
        cleanupHookRegistered = true
      }
    }
    externalRunDirs.add((path, conf))
  }

  /** Pass count of the most recent `skylineExternal` cascade in this
    * JVM — a DIAGNOSTIC for bench artifacts and tuning (the pass
    * schedule is the operator's main knob on frontier-heavy data), not
    * part of the result contract. Volatile single-slot: concurrent
    * cascades overwrite each other. */
  @volatile var lastExternalPassCount: Int = 0

  /** True when a failure's cause chain contains the bounded-buffer trip
    * of the skyline/k-skyband aggregates (Spark wraps the executor's
    * IllegalStateException in task/job failure layers). Drives
    * [[SkylineOps.kSkybandAuto]]'s dispatch; the chain walk is bounded
    * because wrapped causes can self-reference. */
  private[graft] def isBufferCapTrip(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .exists(t => String.valueOf(t.getMessage).contains("maxBufferPoints"))

  /** On a real cluster the driver's java temp dir is NOT visible to
    * executors — runs written there would silently produce wrong results
    * (empty scans), so a non-local master REQUIRES an explicit shared
    * location. Loud beats a scaladoc caveat. */
  private[graft] def requireSharedExternalDir(
      masterIsLocal: Boolean, configured: Option[String]): Unit =
    require(masterIsLocal || configured.isDefined,
      "skylineExternal on a non-local master requires " +
        "spark.graft.skyline.externalDir to point at a SHARED " +
        "filesystem URI (HDFS/S3): the default java temp dir is " +
        "driver-local and executors cannot read runs written there")

  /** Eagerly delete every run directory written by `skylineExternal` in
    * this JVM so far. Only call after the returned DataFrames are
    * materialized (collected or written elsewhere) — their lineage reads
    * the run files. */
  def cleanExternalRuns(): Unit = {
    var entry = externalRunDirs.poll()
    while (entry != null) {
      try {
        val hp = new org.apache.hadoop.fs.Path(entry._1)
        val fs = hp.getFileSystem(entry._2)
        if (fs.exists(hp)) fs.delete(hp, true)
      } catch { case _: Throwable => () } // best-effort at shutdown
      entry = externalRunDirs.poll()
    }
  }

  /** Lossless dimension-value <-> double codecs per column type. Timestamps
    * go through microseconds (exact in a double up to year ~2255); dates
    * through epoch days. Integral/double types are exact below 2^53. */
  private def toDouble(c: Column, dt: DataType): Column = dt match {
    case TimestampType    => unix_micros(c).cast(DoubleType)
    case TimestampNTZType => unix_micros(c.cast(TimestampType)).cast(DoubleType) // session TZ is UTC
    case DateType         => unix_date(c).cast(DoubleType)
    case _: NumericType   => c.cast(DoubleType)
    case other => throw new IllegalArgumentException(s"unsupported skyline dimension type: $other")
  }

  private def fromDouble(c: Column, dt: DataType): Column = dt match {
    case TimestampType    => timestamp_micros(c.cast(LongType))
    case TimestampNTZType => timestamp_micros(c.cast(LongType)).cast(TimestampNTZType)
    case DateType         => date_from_unix_date(c.cast(IntegerType))
    case DoubleType       => c
    case nt: NumericType  => c.cast(nt)
    case other => throw new IllegalArgumentException(s"unsupported skyline dimension type: $other")
  }

  /** Column form of [[SkylineCore.dimKey]] — same formula, so the plan-time
    * kept-key enumeration for the grid prune matches the runtime keys. */
  private def dimKeyExpr(p: Int, lo: Double, hi: Double, x: Column): Column = {
    val range = (hi - lo) / p
    // Clamp in DOUBLE before the Int cast (matches SkylineCore.dimKey's
    // clamp-before-truncate): with caller-supplied bounds that under-cover
    // the data, floor((x-lo)/range) can sit far outside Int range and the
    // bare cast would throw under ANSI mode (or wrap with ANSI off).
    when(x >= lit(hi), lit(p - 1))
      .otherwise(least(greatest(floor((x - lit(lo)) / lit(range)), lit(0.0)), lit((p - 1).toDouble))
        .cast(IntegerType))
  }

  implicit class DataFrameSkyline(val df: DataFrame) {

    def skyline(query: String): DataFrame = skyline(SkylineQuery.parse(query))

    /**
     * Per-group skylines: one Pareto frontier per distinct key tuple
     * (e.g. the price/quality frontier per product category). Composes
     * the same native aggregate with groupBy — partial aggregation
     * computes per-task per-group local skylines, the shuffle carries
     * only (key, skyline-buffer) pairs.
     */
    def skylineBy(keyCols: Seq[String], dims: Seq[(String, Direction)],
        presort: Option[Boolean] = None): DataFrame = {
      require(dims.nonEmpty, "empty dimension list")
      require(keyCols.nonEmpty, "skylineBy needs at least one key column (use skyline otherwise)")
      val overlap = keyCols.toSet.intersect(dims.map(_._1).toSet)
      require(overlap.isEmpty, s"key and dimension columns overlap: $overlap")
      val reserved = keyCols.filter(k => k.startsWith("_d") || k == "_sky" || k == "_pt")
      require(reserved.isEmpty, s"key column names collide with internal aliases: $reserved")
      val schema = df.schema
      val types = dims.map { case (name, _) => schema(name).dataType }
      val minDir = dims.map(_._2.isMin).toArray
      val fwd = dims.zip(types).map { case ((name, _), dt) => toDouble(col(name), dt) }
      val nonNull = dims.map { case (name, _) => col(name).isNotNull }.reduce(_ && _)
      val projected = df.filter(nonNull).select(
        keyCols.map(col) ++ fwd.zipWithIndex.map { case (c, i) => c.as(s"_d$i") }: _*)
      // SFS presort applies per group too: hash aggregation feeds each
      // group's buffer in partition order, and a subsequence of a
      // score-sorted partition is still score-sorted — so one partition-
      // local sort serves every group at once. Same d >= 5 heuristic as
      // the global path.
      val pts = if (!presort.getOrElse(dims.length >= 5)) projected else {
        val sfsScore = dims.indices
          .map(i => if (minDir(i)) col(s"_d$i") else -col(s"_d$i"))
          .reduce(_ + _)
        projected.sortWithinPartitions(sfsScore.asc)
      }
      val skyCol = ColumnShim.column(SkylineAggExpr(
        dims.indices.map(i => ColumnShim.expression(col(s"_d$i"))), minDir,
        SkylineAggExpr.configuredCap(df.sparkSession))
        .toAggregateExpression())
      pts.groupBy(keyCols.map(col): _*)
        .agg(skyCol.as("_sky"))
        .select(keyCols.map(col) :+ explode(col("_sky")).as("_pt"): _*)
        .select(keyCols.map(col) ++ dims.zip(types).zipWithIndex.map {
          case (((name, _), dt), i) => fromDouble(element_at(col("_pt"), i + 1), dt).as(name)
        }: _*)
    }

    /**
     * k-skyband (Papadias et al., SIGMOD'03): all points dominated by
     * FEWER than `k` others — the relaxed skyline (`k = 1` IS the
     * skyline; larger k widens the frontier band, the standard "top
     * alternatives" query when the strict frontier is too thin). Output:
     * one row per band point with the original columns plus
     * `n_dominators` (the point's exact global dominator count). Same
     * execution shape as the skyline: partial candidate buffers map-side,
     * buffers-only shuffle, final merge ([[KSkybandAggExpr]]).
     */
    def kSkyband(dims: Seq[(String, Direction)], k: Int,
        presort: Option[Boolean] = None): DataFrame = {
      require(dims.nonEmpty, "empty dimension list")
      require(k >= 1, s"k must be >= 1, got $k")
      val schema = df.schema
      val types = dims.map { case (name, _) => schema(name).dataType }
      val minDir = dims.map(_._2.isMin).toArray
      val fwd = dims.zip(types).map { case ((name, _), dt) => toDouble(col(name), dt) }
      val nonNull = dims.map { case (name, _) => col(name).isNotNull }.reduce(_ && _)
      val projected = df.filter(nonNull)
        .select(fwd.zipWithIndex.map { case (c, i) => c.as(s"_d$i") }: _*)
      // SFS presort, same d >= 5 heuristic as the skyline. For the band
      // it pays twice: under score order an arriving point can dominate
      // no incumbent (its score would have to be smaller), so inserts
      // never run the eviction sweep, and a >= k-dominated point is
      // rejected the moment it arrives — the candidate buffer stays near
      // the true band, which also shrinks the O(|buf|^2) emission
      // recount. Exactness is order-independent (see the core proof), so
      // the presort is purely a pruning accelerator.
      val pts = if (!presort.getOrElse(dims.length >= 5)) projected else {
        val sfsScore = dims.indices
          .map(i => if (minDir(i)) col(s"_d$i") else -col(s"_d$i"))
          .reduce(_ + _)
        projected.sortWithinPartitions(sfsScore.asc)
      }
      val bandCol = ColumnShim.column(KSkybandAggExpr(
        dims.indices.map(i => ColumnShim.expression(col(s"_d$i"))), minDir, k,
        SkylineAggExpr.configuredCap(df.sparkSession))
        .toAggregateExpression())
      pts.agg(bandCol.as("_band"))
        .select(explode(col("_band")).as("_e"))
        .select(dims.zip(types).zipWithIndex.map {
          case (((name, _), dt), i) =>
            fromDouble(element_at(col("_e.p"), i + 1), dt).as(name)
        } :+ col("_e.c").cast(LongType).as("n_dominators"): _*)
    }

    /** Per-group k-skybands: [[kSkyband]] composed with groupBy — the
      * relaxed frontier per key tuple, with exact per-point dominator
      * counts WITHIN the group. Same shuffle shape as [[skylineBy]]:
      * only (key, candidate-buffer) pairs cross the wire. */
    def kSkybandBy(keyCols: Seq[String], dims: Seq[(String, Direction)],
        k: Int, presort: Option[Boolean] = None): DataFrame = {
      require(dims.nonEmpty, "empty dimension list")
      require(keyCols.nonEmpty, "kSkybandBy needs at least one key column (use kSkyband otherwise)")
      require(k >= 1, s"k must be >= 1, got $k")
      val overlap = keyCols.toSet.intersect(dims.map(_._1).toSet)
      require(overlap.isEmpty, s"key and dimension columns overlap: $overlap")
      val reserved = keyCols.filter(c => c.startsWith("_d") || c == "_band" || c == "_e")
      require(reserved.isEmpty, s"key column names collide with internal aliases: $reserved")
      val schema = df.schema
      val types = dims.map { case (name, _) => schema(name).dataType }
      val minDir = dims.map(_._2.isMin).toArray
      val fwd = dims.zip(types).map { case ((name, _), dt) => toDouble(col(name), dt) }
      val nonNull = dims.map { case (name, _) => col(name).isNotNull }.reduce(_ && _)
      val projected = df.filter(nonNull).select(
        keyCols.map(col) ++ fwd.zipWithIndex.map { case (c, i) => c.as(s"_d$i") }: _*)
      // per-group SFS: one partition-local sort serves every group (a
      // subsequence of a score-sorted partition is still score-sorted);
      // see kSkyband for why score order accelerates band pruning
      val pts = if (!presort.getOrElse(dims.length >= 5)) projected else {
        val sfsScore = dims.indices
          .map(i => if (minDir(i)) col(s"_d$i") else -col(s"_d$i"))
          .reduce(_ + _)
        projected.sortWithinPartitions(sfsScore.asc)
      }
      val bandCol = ColumnShim.column(KSkybandAggExpr(
        dims.indices.map(i => ColumnShim.expression(col(s"_d$i"))), minDir, k,
        SkylineAggExpr.configuredCap(df.sparkSession))
        .toAggregateExpression())
      pts.groupBy(keyCols.map(col): _*)
        .agg(bandCol.as("_band"))
        .select(keyCols.map(col) :+ explode(col("_band")).as("_e"): _*)
        .select(keyCols.map(col) ++ dims.zip(types).zipWithIndex.map {
          case (((name, _), dt), i) =>
            fromDouble(element_at(col("_e.p"), i + 1), dt).as(name)
        } :+ col("_e.c").cast(LongType).as("n_dominators"): _*)
    }

    /**
     * Join-based EXACT k-skyband — the PARALLEL completion path for
     * frontier-heavy inputs, where [[kSkyband]]'s aggregate pays an
     * O(|candidates|²) single-threaded final merge (one task re-inserts
     * every partial buffer; measured 21–33 s on 20k anti-correlated
     * points where this path takes ~1 s, and the n=1e5 k=8 shape that
     * previously could only cap_trip completes). Three phases, all
     * parallel:
     *
     *  1. PRUNE, map-side, zero shuffle: each point's dominator count
     *     within a driver-bounded random sample via a codegen'd kernel
     *     with early exit at k ([[graft.functions.DominatorCountUpTo]]);
     *     ≥ k sample dominators proves the point out (sample dominators
     *     are real ones). A survivor with true dominator population D
     *     survives with probability ~P[Binomial(m, D/n) < k], so the
     *     candidate set concentrates near the true band.
     *  2. COLLECT candidates — bounded by `maxCandidates`, loud error
     *     past it naming the aggregate fallback — and stream the WHOLE
     *     input past them: each row emits the indices of candidates it
     *     strictly dominates ([[graft.functions.DominatedIndices]]);
     *     groupBy(index)+count is the exact per-candidate dominator
     *     population. Emission stays small by phase-1 construction.
     *  3. Filter count < k; restore names, types, orientation.
     *
     * Semantics identical to [[kSkyband]] (set semantics — exact
     * duplicates collapse; NaN rows are incomparable: in band with 0
     * dominators). The kernels compare with Java double semantics
     * PRECISELY so NaN behaves as in the core library — a SQL-join
     * formulation would inherit Spark's NaN total ordering (NaN = NaN,
     * NaN above everything) and silently disagree. Spec-gated equal to
     * the aggregate and the brute-force oracle across dims/dirs/k.
     *
     * Memory shape at scale: the sample (m·d doubles) and the candidate
     * set (≤ maxCandidates·d doubles) live on the driver and ride to
     * tasks as referenced objects — the same magnitude the aggregate's
     * buffer cap admits; everything else is map-side passes plus one
     * (int index, count) aggregation. EAGER like the pair finders: the
     * (small) result is materialized and internal caches released —
     * `unpersist()` it when looping.
     */
    def kSkybandJoin(dims: Seq[(String, Direction)], k: Int,
        sampleSize: Int = 8192, maxCandidates: Int = 1 << 20,
        seed: Long = 42L): DataFrame = {
      require(dims.nonEmpty, "empty dimension list")
      require(k >= 1, s"k must be >= 1, got $k")
      require(sampleSize >= 1, s"sampleSize must be >= 1, got $sampleSize")
      val spark = df.sparkSession
      val schema = df.schema
      val types = dims.map { case (name, _) => schema(name).dataType }
      val d = dims.length
      val fwd = dims.zip(types).map { case ((name, dir), dt) =>
        val v = toDouble(col(name), dt)
        if (dir.isMin) v else -v
      }
      val nonNull = dims.map { case (name, _) => col(name).isNotNull }.reduce(_ && _)
      val projected = df.filter(nonNull)
        .select(fwd.zipWithIndex.map { case (c, i) => c.as(s"_d$i") }: _*)
        .distinct()
        .persist()
      try {
        val ptCol = array(dims.indices.map(i => col(s"_d$i")): _*)
        val nAll = projected.count()
        val refs: Array[Array[Double]] =
          if (nAll == 0) Array.empty
          else projected
            .sample(withReplacement = false,
              math.min(1.0, sampleSize.toDouble / nAll), seed)
            .collect().map(r => Array.tabulate(d)(r.getDouble))
        val pruned = projected.filter(
          graft.functions.DominanceFunctions.dominatorCountUpTo(ptCol, refs, d, k) < k)
        val candRows = pruned.limit(maxCandidates + 1).collect()
        if (candRows.length > maxCandidates) throw new IllegalArgumentException(
          s"kSkybandJoin: more than $maxCandidates candidates survive the " +
            s"sample prune (band ≈ input at k=$k) — raise maxCandidates if " +
            "the driver can hold them, or use the kSkyband aggregate with a " +
            "deliberate spark.graft.skyline.maxBufferPoints cap")
        val cands = candRows.map(r => Array.tabulate(d)(r.getDouble))
        val counts = projected
          .select(explode(
            graft.functions.DominanceFunctions.dominatedIndices(ptCol, cands, d))
            .as("_ci"))
          .groupBy(col("_ci")).agg(count(lit(1)).as("_cnt"))
        import spark.implicits._
        val candDf = cands.zipWithIndex
          .map { case (p, i) => (i, p.toSeq) }.toSeq.toDF("_ci", "_p")
        val out = candDf.join(counts, Seq("_ci"), "left")
          .select(dims.zip(types).zipWithIndex.map { case (((name, dir), dt), i) =>
            val v = element_at(col("_p"), i + 1)
            fromDouble(if (dir.isMin) v else -v, dt).as(name)
          } :+ coalesce(col("_cnt"), lit(0L)).as("n_dominators"): _*)
          .filter(col("n_dominators") < k)
          .persist()
        try out.count()
        catch { case t: Throwable => out.unpersist(blocking = false); throw t }
        out
      } finally projected.unpersist(blocking = false)
    }

    /**
     * Cap-trip auto-dispatch (round 10, VERDICT r9 item 5): run the
     * [[kSkyband]] aggregate EAGERLY and, iff its bounded buffer trips
     * (`spark.graft.skyline.maxBufferPoints` — the frontier-heavy shape
     * where every partial buffer approaches the input), route to the
     * [[kSkybandJoin]] completion path automatically instead of naming
     * it in an error message. The trip stays LOUD as a log line: the
     * dispatch is a mechanism change mid-query, and an operator that
     * silently switches cost models hides exactly the signal a capacity
     * planner needs. Identical rows either way (both paths are
     * spec-gated equal to the brute-force oracle); the result is EAGER
     * like [[kSkybandJoin]]'s — `unpersist()` it when looping.
     *
     * The aggregate attempt is not wasted work on the happy path: for
     * thin-band data it IS the cheapest plan (one buffers-only shuffle,
     * no driver-side candidate set), so auto = aggregate-first with the
     * join as the measured-completion fallback, the same
     * try-cheap-then-complete shape as the external skyline cascade.
     */
    def kSkybandAuto(dims: Seq[(String, Direction)], k: Int,
        presort: Option[Boolean] = None, sampleSize: Int = 8192,
        maxCandidates: Int = 1 << 20, seed: Long = 42L): DataFrame = {
      val agg = kSkyband(dims, k, presort).persist()
      try { agg.count(); agg }
      catch {
        case e: Throwable if SkylineOps.isBufferCapTrip(e) =>
          agg.unpersist(blocking = false)
          System.err.println(
            "[graft] kSkyband aggregate tripped spark.graft.skyline.maxBufferPoints " +
              s"(frontier-heavy input at k=$k) — auto-dispatching to the " +
              "kSkybandJoin completion path. Root cause: " +
              String.valueOf(e.getMessage).take(200))
          kSkybandJoin(dims, k, sampleSize, maxCandidates, seed)
        case e: Throwable =>
          agg.unpersist(blocking = false)
          throw e
      }
    }

    /**
     * TOP-K DOMINATING points (Papadias, Tao, Fu, Seeger, TODS'05 —
     * the companion ranking operator of the skyline family): score each
     * point by how many points it strictly dominates and return the `k`
     * highest scorers with their scores. The "give me the k best"
     * operator that needs no user weight vector, with output size
     * CONTROLLED (exactly k rows, unlike a skyline, whose size the data
     * decides).
     *
     * Scale shape — the [[kSkybandJoin]] machinery reused end to end,
     * justified by a containment theorem: every top-k dominating point
     * lies in the k-skyband, because each of a point's dominators
     * strictly outscores it (dominance is transitive: q dom p ⟹
     * dom(q) ⊇ dom(p) ∪ {p}), so ≥ k dominators ⟹ ≥ k strictly
     * higher scorers ⟹ out of the top k. So: (1) the map-side sample
     * prune keeps a small superset of the k-skyband; (2) the bounded
     * candidate set rides to tasks and the whole input streams past it
     * ONCE — scores come from the same [[graft.functions
     * .DominatedIndices]] kernel evaluated in NEGATED space (c dominates
     * r ⟺ −r dominates −c, so each row emits the candidates that
     * dominate IT); (3) order by (score desc, dims asc — a total order
     * over the distinct projected points) and take k.
     *
     * Set semantics like the rest of the family (exact duplicates
     * collapse; a NaN-carrying row is incomparable — dominates nothing,
     * scores 0). EAGER: the k-row result is materialized and internal
     * caches released.
     */
    def topKDominating(dims: Seq[(String, Direction)], k: Int,
        sampleSize: Int = 8192, maxCandidates: Int = 1 << 20,
        seed: Long = 42L): DataFrame = {
      require(dims.nonEmpty, "empty dimension list")
      require(k >= 1, s"k must be >= 1, got $k")
      val spark = df.sparkSession
      val schema = df.schema
      val types = dims.map { case (name, _) => schema(name).dataType }
      val d = dims.length
      val fwd = dims.zip(types).map { case ((name, dir), dt) =>
        val v = toDouble(col(name), dt)
        if (dir.isMin) v else -v
      }
      val nonNull = dims.map { case (name, _) => col(name).isNotNull }.reduce(_ && _)
      val projected = df.filter(nonNull)
        .select(fwd.zipWithIndex.map { case (c, i) => c.as(s"_d$i") }: _*)
        .distinct()
        .persist()
      try {
        val ptCol = array(dims.indices.map(i => col(s"_d$i")): _*)
        val negPtCol = array(dims.indices.map(i => -col(s"_d$i")): _*)
        val nAll = projected.count()
        val refs: Array[Array[Double]] =
          if (nAll == 0) Array.empty
          else projected
            .sample(withReplacement = false,
              math.min(1.0, sampleSize.toDouble / nAll), seed)
            .collect().map(r => Array.tabulate(d)(r.getDouble))
        val pruned = projected.filter(
          graft.functions.DominanceFunctions.dominatorCountUpTo(ptCol, refs, d, k) < k)
        val candRows = pruned.limit(maxCandidates + 1).collect()
        if (candRows.length > maxCandidates) throw new IllegalArgumentException(
          s"topKDominating: more than $maxCandidates candidates survive the " +
            s"sample prune (k-skyband ≈ input at k=$k) — raise maxCandidates " +
            "if the driver can hold them")
        val cands = candRows.map(r => Array.tabulate(d)(r.getDouble))
        // NaN is already incomparable under the kernel's Java-double
        // comparisons, so negation (−NaN = NaN) preserves it exactly
        val negCands = cands.map(_.map(x => -x))
        val counts = projected
          .select(explode(
            graft.functions.DominanceFunctions.dominatedIndices(negPtCol, negCands, d))
            .as("_ci"))
          .groupBy(col("_ci")).agg(count(lit(1)).as("_cnt"))
        import spark.implicits._
        val candDf = cands.zipWithIndex
          .map { case (p, i) => (i, p.toSeq) }.toSeq.toDF("_ci", "_p")
        val named = candDf.join(counts, Seq("_ci"), "left")
          .select(dims.zip(types).zipWithIndex.map { case (((name, dir), dt), i) =>
            val v = element_at(col("_p"), i + 1)
            fromDouble(if (dir.isMin) v else -v, dt).as(name)
          } :+ coalesce(col("_cnt"), lit(0L)).as("n_dominated"): _*)
        val out = named
          .orderBy(col("n_dominated").desc +: dims.map { case (name, _) => col(name).asc }: _*)
          .limit(k)
          .persist()
        try out.count()
        catch { case t: Throwable => out.unpersist(blocking = false); throw t }
        out
      } finally projected.unpersist(blocking = false)
    }

    def skyline(query: String, hint: PartitionHint): DataFrame =
      skyline(SkylineQuery.parse(query), hint)

    /**
     * Bounded-memory EXACT skyline for frontier-heavy data — the
     * completion path for inputs where the in-memory aggregate's buffer
     * cap (`spark.graft.skyline.maxBufferPoints`) trips because the
     * Pareto frontier itself approaches the input size (high-d or
     * anti-correlated data; see SKYBENCH_r7.json's `cap_trip` outcome).
     * The standard path holds the whole global frontier in ONE
     * aggregation buffer; here no single buffer ever holds more than a
     * window of it.
     *
     * Algorithm — an external sort-filter-skyline cascade (the monotone
     * score of SFS, Chomicki et al. ICDE'03, + the window-and-temp-file
     * discipline of the original external BNL, Börzsönyi et al.
     * ICDE'01, expressed as Spark jobs instead of a single JVM's heap):
     *
     *  1. orient every dim so MIN is better; route NaN-carrying rows to
     *     the output directly (NaN is incomparable under dominance —
     *     never dominated, never dominating — exactly the in-memory
     *     aggregate's treatment);
     *  2. score each point E = Σ_i (v_i - lo_i)/(hi_i - lo_i). IEEE
     *     add/sub/div are monotone, so p dominates q ⟹ E(p) <= E(q)
     *     — possibly EQUAL under rounding, which is why every boundary
     *     below is E-closed;
     *  3. pre-filter (round 9): drop every point strictly dominated by
     *     the frontier of a bounded random sample — sound because
     *     dominance by ANY point disqualifies, and the dominators
     *     themselves remain candidates; on correlated/low-d data this
     *     alone removes almost everything before the first pass;
     *  4. loop until no survivors: take eT = the pass window-th
     *     smallest E (a TakeOrdered over the score column only; the
     *     window GROWS geometrically from `windowSize` per pass, capped
     *     a sixteenth under the aggregate buffer cap so frontier-heavy
     *     inputs finish in O(n/cap) passes without ever risking a cap
     *     trip); the
     *     HEAD block {E <= eT} contains every possible dominator of any
     *     of its own points, so its frontier — computed with the
     *     existing bounded aggregate — is a subset of the global
     *     skyline: append it to the on-disk result, then broadcast it
     *     against the strictly-greater tail as a nested-loop ANTI join
     *     (dominance = conjunction of d column comparisons + one strict
     *     disjunct — codegen-friendly, no HOFs), and recurse on the
     *     filtered tail. Transitivity makes filtering against the head
     *     FRONTIER (not the whole head) sufficient: a dominated
     *     dominator implies a surviving one.
     *
     * Memory shape at 100 TB: the TakeOrdered carries 8-byte scores
     * only; the head-frontier aggregate buffer is capped (trips loudly
     * if one E-tie block's frontier alone exceeds it — raise the cap or
     * the window); the broadcast is the head frontier; survivors and
     * per-pass frontiers round-trip through parquet RUNS on disk (the
     * external-BNL temp files — which also resets plan lineage each
     * pass: a persist()-based cascade compounds the logical plan
     * exponentially, since each pass references the previous one from
     * both the head and tail branches, and ~16 passes OOM the DRIVER on
     * plan strings alone — measured, hence this design). Survivors
     * shrink by at least the pass window per pass, which doubles up to
     * ~the buffer cap, so passes <= O(log(cap/windowSize) +
     * candidates/cap). Time stays O(n·f) pair comparisons in the worst
     * (frontier ≈ n) case — inherent to every exact BNL-family skyline;
     * this path trades none of the standard path's speed when you don't
     * need it, and turns its hard memory wall into disk when you do.
     *
     * On a multi-node cluster `spark.graft.skyline.externalDir` MUST be
     * set to a SHARED filesystem URI (HDFS/S3) — enforced with a loud
     * `require` at call time, because the default java temp dir is only
     * visible to executors where driver and executors share a
     * filesystem (local mode).
     *
     * Retention: the returned DataFrame lazily reads the on-disk result
     * run, so the run directory is kept for the JVM's lifetime and
     * removed by a shutdown hook; callers looping over many inputs can
     * reclaim disk earlier with [[SkylineOps.cleanExternalRuns]] once
     * results are materialized elsewhere.
     *
     * Reference scope: the reference has no completion story at all for
     * frontier-heavy data (its single-node BNL simply exhausts memory);
     * this is a beyond-reference operator.
     */
    def skylineExternal(
        dims: Seq[(String, Direction)],
        windowSize: Int = 1 << 16,
        maxPasses: Int = 1 << 20): DataFrame = {
      require(dims.nonEmpty, "empty dimension list")
      require(windowSize >= 1, s"windowSize must be >= 1, got $windowSize")
      val spark = df.sparkSession
      val schema = df.schema
      val types = dims.map { case (name, _) => schema(name).dataType }
      val d = dims.length
      val dim = (i: Int) => col(s"_d$i")
      // oriented projection: every dim negated where MAX, so dominance
      // is uniformly "componentwise <=, somewhere <". Exact duplicates
      // collapse up front (the operator's set semantics).
      val fwd = dims.zip(types).map { case ((name, dir), dt) =>
        val v = toDouble(col(name), dt)
        if (dir.isMin) v else -v
      }
      val nonNull = dims.map { case (name, _) => col(name).isNotNull }.reduce(_ && _)
      val projected = df.filter(nonNull)
        .select(fwd.zipWithIndex.map { case (c, i) => c.as(s"_d$i") }: _*)
        .distinct()
      val anyNaN = dims.indices.map(i => isnan(dim(i))).reduce(_ || _)
      val clean = projected.filter(!anyNaN)

      val configuredDir = spark.conf.getOption("spark.graft.skyline.externalDir")
      requireSharedExternalDir(spark.sparkContext.isLocal, configuredDir)
      val baseDir = configuredDir
        .getOrElse(java.nio.file.Files.createTempDirectory("graft-skyext-").toString)
      val runDir = s"$baseDir/skyext-${java.util.UUID.randomUUID}"
      val resultDir = s"$runDir/result" // pass=N partition layout
      val workDir = s"$runDir/work"
      val hconf = spark.sparkContext.hadoopConfiguration
      // retention: the returned DataFrame lazily reads the result run,
      // so the run dir lives until JVM shutdown (one hook removes all
      // runs); SkylineOps.cleanExternalRuns() reclaims earlier once
      // results are materialized elsewhere
      registerExternalRunDir(runDir, hconf)
      def rm(p: String): Unit = {
        val hp = new org.apache.hadoop.fs.Path(p)
        val f = hp.getFileSystem(hconf)
        if (f.exists(hp)) f.delete(hp, true)
      }

      // pass=0 holds the schema (so an empty result reads back) and the
      // NaN rows, which are skyline members by incomparability
      clean.limit(0).write.mode("append").parquet(s"$resultDir/pass=0")
      projected.filter(anyNaN).write.mode("append").parquet(s"$resultDir/pass=0")

      val statsRow = clean.agg(
        (dims.indices.flatMap(i => Seq(min(dim(i)), max(dim(i)))) :+
          count(lit(1)).as("_n")).head,
        (dims.indices.flatMap(i => Seq(min(dim(i)), max(dim(i)))) :+
          count(lit(1)).as("_n")).tail: _*).head()
      if (!statsRow.isNullAt(0)) {
        val e = dims.indices.map { i =>
          val lo = statsRow.getDouble(2 * i)
          val hi = statsRow.getDouble(2 * i + 1)
          if (hi > lo) (dim(i) - lit(lo)) / lit(hi - lo) else lit(0.0)
        }.reduce(_ + _)
        val nClean = statsRow.getLong(2 * d)
        val cap = SkylineAggExpr.configuredCap(spark)
        def sky(cols: Seq[Column]): Column = ColumnShim.column(
          SkylineAggExpr(cols.map(ColumnShim.expression),
            Array.fill(d)(true), cap).toAggregateExpression())
        // dominance predicate of a broadcast frontier (_w*) against
        // candidate rows (_d*): componentwise <=, somewhere < — shared
        // by the sampled pre-filter and the per-pass tail anti-join
        val allLe = dims.indices.map(i => col(s"_w$i") <= dim(i)).reduce(_ && _)
        val oneLt = dims.indices.map(i => col(s"_w$i") < dim(i)).reduce(_ || _)
        def frontierOf(src: DataFrame, as: Int => String): DataFrame =
          src.agg(sky(dims.indices.map(dim)).as("_sky"))
            .select(explode(col("_sky")).as("_pt"))
            .select(dims.indices.map(i =>
              element_at(col("_pt"), i + 1).as(as(i))): _*)
        // Geometric window growth: pass p takes the min(windowSize *
        // 2^(p-1), maxWindow)-smallest scores, so frontier-heavy inputs
        // (where each pass removes little beyond its own head) finish in
        // O(log + n/maxWindow) passes instead of n/windowSize. maxWindow
        // stays a sixteenth under the aggregate's buffer cap: the head
        // frontier is at most head-sized, so growth can never turn the
        // bounded-memory completion path into a cap trip (the 1/16
        // headroom absorbs E-tie spill past the window).
        val maxWindow = math.max(windowSize, cap - (cap >>> 4))
        try {
          var survPath = s"$workDir/surv_0"
          // Sampled pre-filter: the frontier of a driver-bounded random
          // sample dominates most of a correlated input, and dominance
          // by ANY point disqualifies — so anti-joining the full set
          // against the sample's frontier before pass 1 is sound (the
          // frontier points themselves pass: a point never strictly
          // dominates itself) and cuts the cascade to 1-2 passes on
          // low-d data. Skipped when the input already fits one window.
          // 8k sample: survival odds of a uniform point against an
          // m-sample's frontier scale ~(ln m)^(d-1)/((d-1)!·m) — already
          // ~0.1% at d=2 and ~13% at d=10 for m=8192, and growing m 8x
          // buys almost nothing more while the pre-filter's nested-loop
          // cost (n × |sample frontier|) scales linearly with m. On
          // frontier-heavy data the pre-filter removes little either
          // way, so small m also bounds the wasted work there.
          val sampleTarget = math.min(math.min(windowSize, maxWindow), 1 << 13)
          val candidates =
            if (nClean <= 2L * sampleTarget) clean.withColumn("_e", e)
            else {
              val frac = math.min(1.0, sampleTarget.toDouble / nClean)
              val sampleFront = frontierOf(
                clean.sample(withReplacement = false, frac, seed = 42L),
                i => s"_w$i")
              clean.withColumn("_e", e)
                .join(broadcast(sampleFront), allLe && oneLt, "left_anti")
            }
          candidates.write.parquet(survPath)
          var nLeft = spark.read.parquet(survPath).count()
          var pass = 0
          while (nLeft > 0) {
            pass += 1
            if (pass > maxPasses) throw new IllegalStateException(
              s"skylineExternal did not finish within $maxPasses passes " +
                s"($nLeft candidates left; windowSize=$windowSize) — raise " +
                "maxPasses or windowSize")
            val passWindow = math.min(
              windowSize.toLong << math.min(pass - 1, 30), maxWindow.toLong).toInt
            val surv = spark.read.parquet(survPath)
            // the passWindow-th smallest score; scores only cross the wire
            val eT = surv.select(col("_e")).orderBy(col("_e").asc)
              .limit(passWindow).agg(max(col("_e"))).head().getDouble(0)
            // E-closed head: contains every possible dominator of its own
            // points even when rounding collapses a strict dominance into
            // an E-tie. Its frontier goes straight to this pass's result
            // run; the tail anti-join reads it back — a constant-size
            // plan per pass, no recomputation, no lineage growth.
            val passDir = s"$resultDir/pass=$pass"
            // Head frontier via SELF broadcast anti-join, NOT the
            // aggregate: the aggregate's final merge re-inserts the
            // whole head into one buffer on ONE thread — O(w·f) serial,
            // the measured wall on frontier-heavy data where f ≈ w. The
            // anti-join does the identical set arithmetic (a point is in
            // the frontier iff no head point strictly dominates it;
            // exact duplicates collapsed up front, so equality never
            // eliminates) as a codegen'd nested loop, parallel across
            // the head's partitions with early exit on first dominator.
            // Memory: the broadcast head is w·d doubles — the same
            // magnitude as the buffer the in-memory cap already allows.
            val head = surv.filter(col("_e") <= eT)
              .select(dims.indices.map(i => dim(i)): _*)
            val headW = head
              .select(dims.indices.map(i => dim(i).as(s"_w$i")): _*)
            head.join(broadcast(headW), allLe && oneLt, "left_anti")
              .write.parquet(passDir)
            // dominance anti-join of the tail against the head frontier
            val front = spark.read.parquet(passDir)
              .select(dims.indices.map(i => dim(i).as(s"_w$i")): _*)
            val nextPath = s"$workDir/surv_$pass"
            surv.filter(col("_e") > eT)
              .join(broadcast(front), allLe && oneLt, "left_anti")
              .write.parquet(nextPath)
            rm(survPath)
            survPath = nextPath
            nLeft = spark.read.parquet(nextPath).count()
          }
          SkylineOps.lastExternalPassCount = pass
        } finally rm(workDir)
      }

      // read back (partition discovery adds the pass column — dropped by
      // the dim selection), un-orient, restore names and types
      spark.read.parquet(resultDir)
        .select(dims.zip(types).zipWithIndex.map { case (((name, dir), dt), i) =>
          val v = if (dir.isMin) col(s"_d$i") else -col(s"_d$i")
          fromDouble(v, dt).as(name)
        }: _*)
    }

    /**
     * Compute the skyline (Pareto frontier) of `df` over `dims`.
     *
     * @param dims   (column, direction) per skyline dimension
     * @param hint   optional pre-partitioning scheme (see [[PartitionHint]])
     * @param bounds per-dim (lo, hi) value bounds for Dim/Grid hints, in
     *               `dims` order after [[toDouble]] conversion. When absent
     *               they are computed with one distributed min/max pass —
     *               at large scale pass them explicitly (the reference
     *               hard-codes `[0, 10^9]`, configurations.py:17-18).
     * @param presort SFS monotone-score sortWithinPartitions before the
     *               aggregate. `None` (default) auto-enables it at d >= 5
     *               — measured ~12% win at d=7 and a 3-4x LOSS at d <= 3,
     *               so the heuristic follows the dimensionality (see the
     *               tradeoff note at the implementation site);
     *               `Some(true)`/`Some(false)` force it either way.
     */
    def skyline(
        dims: Seq[(String, Direction)],
        hint: PartitionHint = NoHint,
        bounds: Option[Seq[(Double, Double)]] = None,
        presort: Option[Boolean] = None): DataFrame = {
      require(dims.nonEmpty, "empty dimension list")
      val schema = df.schema
      val types = dims.map { case (name, _) => schema(name).dataType }
      val minDir = dims.map(_._2.isMin).toArray
      hint match {
        case AngleHint(_) =>
          require(minDir.forall(identity),
            "MR_ANGLE supports MIN-only queries (reference restriction, functions.py:327-329)")
        case _ =>
      }

      val fwd = dims.zip(types).map { case ((name, _), dt) => toDouble(col(name), dt) }
      val nonNull = dims.map { case (name, _) => col(name).isNotNull }.reduce(_ && _)
      // One projected double column per dimension — no array packing on
      // the per-row hot path; SkylineAggExpr consumes them directly.
      val projected = df.filter(nonNull)
        .select(fwd.zipWithIndex.map { case (c, i) => c.as(s"_d$i") }: _*)
      // SFS presort (Chomicki et al., ICDE'03): a monotone score
      // — the sum of coordinates oriented so "better" is smaller — sorted
      // ascending WITHIN partitions (no shuffle). If a dominates b then
      // score(a) < score(b), so no point is ever dominated by a later
      // one: the BNL insert never evicts incumbents. Measured: ~12% win
      // at d=7/1M rows, but a 3-4x LOSS at d<=3 (the sort costs more
      // than the near-free low-d BNL) — hence the d >= 5 auto-heuristic,
      // where local skylines grow large enough for evictions to matter.
      val usePresort = presort.getOrElse(dims.length >= 5)
      val pts = if (!usePresort) projected else {
        val sfsScore = dims.indices
          .map(i => if (minDir(i)) col(s"_d$i") else -col(s"_d$i"))
          .reduce(_ + _)
        projected.sortWithinPartitions(sfsScore.asc)
      }

      /** Skyline aggregate over the given dimension columns (native
        * TypedImperativeAggregate; see [[SkylineAggExpr]]). */
      def sky(cols: Seq[Column]): Column = ColumnShim.column(
        SkylineAggExpr(cols.map(ColumnShim.expression), minDir,
          SkylineAggExpr.configuredCap(df.sparkSession)).toAggregateExpression())

      val dim = (i: Int) => col(s"_d$i")
      val dimCols = dims.indices.map(dim)

      def resolvedBounds(): Seq[(Double, Double)] = bounds.getOrElse {
        val aggs = dims.indices.flatMap(i => Seq(min(dim(i)), max(dim(i))))
        val row = pts.agg(aggs.head, aggs.tail: _*).head()
        // Empty input: min/max are null. Any bounds yield the correct
        // empty skyline; use a degenerate-safe placeholder.
        if (row.isNullAt(0)) dims.indices.map(_ => (0.0, 1.0))
        else dims.indices.map { i =>
          val lo = row.getDouble(2 * i)
          val hi = row.getDouble(2 * i + 1)
          if (hi > lo) (lo, hi) else (lo, lo + 1.0) // all-equal dim: 1 bucket
        }
      }

      /** Two-stage: per-key local skylines, then global merge — the shape of
        * batch_job.py:96-188 as one declarative plan. Points travel as
        * array<double> only between the (tiny) local and global stages. */
      def twoStage(keyed: DataFrame): DataFrame =
        keyed
          .groupBy("_k").agg(sky(dimCols).as("_ls"))
          .select(explode(col("_ls")).as("_p"))
          .agg(sky(dims.indices.map(i => element_at(col("_p"), i + 1))).as("_sky"))

      val skyDf = hint match {
        case NoHint => pts.agg(sky(dimCols).as("_sky"))

        case DimHint(p) =>
          val (lo, hi) = resolvedBounds().head
          twoStage(pts.withColumn("_k", dimKeyExpr(p, lo, hi, dim(0))))

        case GridHint(b) =>
          require(BigInt(b).pow(dims.length) <= BigInt(Long.MaxValue),
            s"grid key space b^d = $b^${dims.length} overflows Long")
          val bs = resolvedBounds()
          // Exact Long multipliers (math.pow doubles lose precision past 2^53).
          val mult = Seq.iterate(1L, dims.length)(_ * b)
          val key = dims.indices
            .map(i => lit(mult(i)) * dimKeyExpr(b, bs(i)._1, bs(i)._2, dim(i)))
            .reduce(_ + _)
          val keyed = pts.withColumn("_k", key)
          // Dominated-cell prune (D7), made sound: one cheap pre-pass finds
          // the occupied cells (map-side-combined distinct over at most b^d
          // keys), the kept set is computed on the driver, and the prune
          // becomes a plan-time isin filter — not a runtime UDF as in the
          // reference. See SkylineCore.keptOccupiedKeys for why the
          // reference's geometric best-cell prune is unsound on sparse data.
          // Keys stay Long end-to-end: truncating to Int would corrupt the
          // kept-set for b^d > 2^31 and silently drop cells.
          // The occupied-cell collect is bounded by b^d in every sane use
          // (b <= 12), but b^d only has to fit a Long, so a pathological
          // hint (say b=8, d=12) could pull an unbounded set onto the
          // driver. limit(cap+1) bounds what the driver can ever hold and
          // the overflow fails with the tuning knob named, same contract
          // as the skyline buffer cap.
          val cellCap = SkylineOps.configuredMaxGridCells(df.sparkSession)
          val occupied = keyed.select("_k").distinct().limit(cellCap + 1)
            .collect().map(_.getLong(0))
          if (occupied.length > cellCap) throw new IllegalStateException(
            s"GridHint($b) over ${dims.length} dims has more than $cellCap occupied " +
              s"cells (spark.graft.skyline.maxGridCells): the plan-time prune would " +
              s"collect an unbounded cell set onto the driver. Lower b, raise the " +
              s"cap, or use NoHint/AngleHint (partial aggregation needs no grid).")
          val kept = SkylineCore.keptOccupiedKeys(minDir, b, occupied.toSeq)
          twoStage(keyed.filter(col("_k").isin(kept: _*)))

        case AngleHint(p) =>
          val d = dims.length
          require(d < 2 || BigInt(p).pow(d - 1) <= BigInt(Long.MaxValue),
            s"angle key space p^(d-1) = $p^${d - 1} overflows Long")
          // d=1 has no angular coordinate: a single partition.
          if (d == 1) twoStage(pts.withColumn("_k", lit(0L))) else {
          val range = (math.Pi / 2) / p
          val mult = Seq.iterate(1L, math.max(d - 1, 1))(_ * p)
          val key = (0 until d - 1).map { i =>
            val tail = sqrt((i + 1 until d).map(j => dim(j) * dim(j)).reduce(_ + _))
            val k = when(dim(i) === lit(0.0), lit(p - 1))
              .otherwise(least(greatest(floor(atan(tail / dim(i)) / lit(range)).cast(IntegerType), lit(0)), lit(p - 1)))
            lit(mult(i)) * k
          }.reduce(_ + _)
          twoStage(pts.withColumn("_k", key))
          }
      }

      skyDf
        .select(explode(col("_sky")).as("_pt"))
        .select(dims.zip(types).zipWithIndex.map { case (((name, _), dt), i) =>
          fromDouble(element_at(col("_pt"), i + 1), dt).as(name)
        }: _*)
    }
  }
}
