package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.BinaryType

/**
 * Training-data pipeline operators beyond dedup/similarity: reproducible
 * sampling and sequence packing. Everything here is a pure DataFrame
 * composition — no UDFs, no driver loops — and deterministic: re-running
 * the pipeline on the same corpus yields byte-identical splits, which is
 * what makes 100 TB dataset builds auditable and resumable.
 */
object PipelineOps {

  /** Hex threshold for an md5-prefix Bernoulli filter: the first 8 hex
    * chars of md5 are uniform on [0, 16^8), so `prefix < hex(f * 16^8)`
    * keeps an f-fraction, deterministically per key. */
  private def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    // "g" sorts after every hex digit, so `prefix < "g"` keeps ALL rows —
    // the exact fraction-1.0 semantic (a capped hex max would drop keys
    // hashing to ffffffff)
    if (fraction >= 1.0) "g" else f"${(fraction * 4294967296.0).toLong}%08x"
  }

  private def hashKey(keyCol: Column, salt: String): Column =
    substring(md5(concat(keyCol.cast("string"), lit(":" + salt)).cast("binary")), 1, 8)

  /**
   * Deterministic Bernoulli sample: keep a row iff the md5 of its key
   * (plus salt) falls under the fraction threshold. Unlike
   * `df.sample(...)` — whose output depends on partitioning and rerolls
   * per run — this is a pure function of (key, salt): stable across
   * runs, cluster sizes, and engines (md5 of the key's string bytes is
   * engine-portable, so an external system can reproduce the exact
   * split). Changing `salt` draws an independent sample — the standard
   * train/validation split device.
   */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = "graft"): DataFrame =
    if (fraction >= 1.0) df
    else df.filter(hashKey(col(keyCol), salt) < lit(hexThreshold(fraction)))

  /**
   * Deterministic train/validation/test split assignment: every row
   * maps to exactly ONE named split with probability proportional to
   * its weight, as a pure function of (key, salt) — stable across
   * runs, partitionings, cluster sizes, and engines (the same
   * fixed-width md5-hex device as [[hashSample]], so an external
   * system can reproduce the assignment row for row; a given id keeps
   * its split even as the corpus around it grows, which is what makes
   * incremental refreshes leakage-free: a train doc can never drift
   * into test). Map-side only — one projection, no shuffle. Changing
   * `salt` redraws all assignments independently. Output: `df`'s
   * columns plus `split`.
   */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], salt: String = "graft"): DataFrame = {
    require(splits.nonEmpty, "assignSplits needs at least one split")
    require(splits.forall(_._2 > 0.0),
      s"split weights must be positive, got $splits")
    val names = splits.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate split names in $names")
    require(!df.columns.contains("split"),
      "df already has a 'split' column; rename it first")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-6,
      s"split weights must sum to 1, got $total")
    val h = hashKey(col(keyCol), salt)
    // cumulative upper bounds for all but the last split; the last is
    // the catch-all (immune to float rounding in the partial sums)
    val cum = splits.init.map(_._2).scanLeft(0.0)(_ + _).tail
    val assignment =
      if (splits.size == 1) lit(names.head)
      else {
        val first = when(h < lit(hexThreshold(cum.head)), names.head)
        names.tail.init.zip(cum.tail).foldLeft(first) {
          case (acc, (n, c)) => acc.when(h < lit(hexThreshold(c)), n)
        }.otherwise(names.last)
      }
    df.withColumn("split", assignment)
  }

  /**
   * Leakage-AWARE train/val/test assignment: the split is decided per
   * near-dup CLUSTER, not per document — the per-id [[assignSplits]]
   * happily puts a near-duplicate of a test document into train, which
   * is exactly the contamination an eval split exists to prevent. Here
   * every member inherits its cluster's assignment (a pure md5 function
   * of cluster_id), so near-duplicates move between splits TOGETHER and
   * an id never drifts as the corpus grows (cluster ids are min-reachable
   * ids — stable under growth unless a new doc bridges clusters, which
   * is the correct re-assignment). Output: (id, cluster_id, split).
   *
   * Composes [[Dedup.clusters]] (pair graph + component labeling — the
   * expensive part, runs once) with the md5-hex split device keyed on
   * the cluster label. Same scale shape as both parents.
   */
  def assignSplitsByCluster(df: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)], n: Int, threshold: Double,
      salt: String = "graft"): DataFrame = {
    val labels = Dedup.clusters(df, idCol, textCol, n, threshold)
    try assignSplitsByClusterLabels(labels, splits, salt)
    finally labels.unpersist(blocking = false)
  }

  /** The split step of [[assignSplitsByCluster]] over a PRECOMPUTED
    * labeling (id, cluster_id) — public so one materialized
    * [[Dedup.clusters]] result can feed splits, retention, and survivor
    * queries without re-running the pair graph. */
  def assignSplitsByClusterLabels(labels: DataFrame,
      splits: Seq[(String, Double)], salt: String = "graft"): DataFrame =
    assignSplits(labels, "cluster_id", splits, salt)
      .select(col("id"), col("cluster_id"), col("split"))

  /**
   * Deterministic stratified sampling — the dataset-mixing primitive: a
   * per-stratum keep fraction (e.g. upsample curated sources, downsample
   * crawl), applied with the same md5 device so mixes are reproducible.
   * Strata absent from `fractions` get `defaultFraction`. Map-side only:
   * a filter with a CASE threshold, no shuffle, no sampleBy reroll.
   */
  def hashSampleBy(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = "graft"): DataFrame = {
    val thr = fractions.foldLeft(lit(hexThreshold(defaultFraction))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === lit(stratum), lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(hashKey(col(keyCol), salt) < thr)
  }

  /**
   * Distribution drift between two corpus snapshots — Population
   * Stability Index over baseline deciles: bin edges are snapshot A's
   * quantiles (so A's mass is ~uniform by construction), both snapshots
   * bin against those edges, and each bin contributes
   * (pB − pA) · ln((pB+ε)/(pA+ε)) — the standard drift monitor for "did
   * the crawl's length/quality/score distribution move since the last
   * build" (PSI > 0.2 is the conventional re-examine threshold; the ε
   * keeps empty bins finite). Output: one row per bin —
   * (bin, n_a, n_b, psi_term), the total being the caller's sum.
   *
   * Engine-parity devices (the oracle recomputes everything from raw
   * data): edges are exact quantiles ROUNDED to 6 decimals before
   * binning (both engines interpolate identically — the q_percentile
   * parity — and the rounding absorbs any summation-order ulp); the bin
   * of x is the INDICATOR SUM Σ(x > edge_i), which is order-free; each
   * psi term rounds to 6 decimals independently, so no cross-bin float
   * accumulation exists anywhere.
   *
   * 100 TB shape: one exact-quantile aggregate over A (driver gets
   * bins−1 doubles; swap `percentile` → `approx_percentile` at scale),
   * then ONE scan of each snapshot with a literal CASE-free indicator
   * chain and a bins-sized aggregate. Nothing but bin counts cross the
   * exchange.
   */
  /** The baseline's quantile bin edges, ROUNDED to 6 decimals — the
    * engine-parity device [[psiDrift]] and the streaming drift monitor
    * share (both engines interpolate quantiles identically, and the
    * rounding absorbs any summation-order ulp before values compare
    * against the edges). bins−1 doubles on the driver. */
  def psiBinEdges(df: DataFrame, valueCol: String, bins: Int): Seq[Double] = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val probs = (1 until bins).map(_.toDouble / bins)
    df.agg(percentile(col(valueCol).cast("double"),
        typedLit(probs.toArray)).as("_e"))
      .head().getSeq[Double](0)
      .map(round6HalfAwayFromZero)
  }

  /** round(x, 6) with the EXACT semantics of SQL round on doubles
    * (DuckDB/C `std::round(x * 1e6) / 1e6`): half-away-from-zero on the
    * SCALED BINARY value. Neither of the plausible alternatives matches
    * it on ties, and a quantile edge landing on one would move a bin
    * boundary between engines: `math.rint` is half-to-EVEN on the scaled
    * double (rint(0.5) = 0 where SQL gives 1), and decimal-exact
    * rounding (BigDecimal HALF_UP) sees the full binary expansion, where
    * the scaled tie usually isn't a decimal tie at all (the double
    * nearest 5e-7 is 4.9999…e-7, so decimal rounding gives 0 where
    * round(5e-7 * 1e6) = round(0.5) = 1e-6 — verified against DuckDB,
    * incl. the away-from-zero negative ties round(-5e-7,6) = -1e-6 and
    * round(-2.5,0) = -3). Non-tie values take `rint`, which is
    * correctly-rounded nearest — identical to C round there. */
  private[graft] def round6HalfAwayFromZero(x: Double): Double = {
    if (x.isNaN || x.isInfinite) x
    else {
      val s = x * 1e6
      val fl = math.floor(s)
      val r = if (s - fl == 0.5) { if (s > 0) fl + 1.0 else fl }
        else math.rint(s)
      r / 1e6
    }
  }

  /** Bin index of `c` against literal `edges`: the order-free indicator
    * sum Σ(c > edge) — map-side, streaming-legal, and reproducible by
    * any engine from the same edge literals. */
  def psiBin(c: Column, edges: Seq[Double]): Column =
    edges.map(e => (c > lit(e)).cast("int")).reduce(_ + _)

  def psiDrift(dfA: DataFrame, dfB: DataFrame, valueCol: String,
      bins: Int = 10, eps: Double = 1e-6): DataFrame = {
    val edges = psiBinEdges(dfA, valueCol, bins)
    def binOf(c: Column): Column = psiBin(c, edges)
    def binCounts(df: DataFrame, as: String): DataFrame =
      df.select(binOf(col(valueCol).cast("double")).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(as))
    val spark = dfA.sparkSession
    import spark.implicits._
    val allBins = (0 until bins).toDF("bin")
    val joined = allBins
      .join(binCounts(dfA, "n_a"), Seq("bin"), "left")
      .join(binCounts(dfB, "n_b"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totA = sum(col("n_a")).over(Window.partitionBy())
    val totB = sum(col("n_b")).over(Window.partitionBy())
    joined
      .withColumn("_pa", col("n_a").cast("double") / totA)
      .withColumn("_pb", col("n_b").cast("double") / totB)
      .select(col("bin"), col("n_a"), col("n_b"),
        round((col("_pb") - col("_pa")) *
          log((col("_pb") + lit(eps)) / (col("_pa") + lit(eps))), 6)
          .as("psi_term"))
  }

  /**
   * Robust per-group outlier statistics — median/MAD z-score (the
   * heavy-tail-safe alternative to mean/stddev, which one extreme value
   * drags arbitrarily; winsorize's quantile cousin for FLAGGING instead
   * of clamping): per group, the median, the median absolute deviation,
   * and the count of values with |x - med| > k * 1.4826 * MAD (1.4826
   * scales MAD to sigma-equivalent under normality, so `k` reads as a
   * z-score). Output: (group, med, mad, n_rows, n_outliers).
   *
   * Exact medians by design (the DuckDB-parity contract — both sides
   * are quantile_cont interpolation); exact percentile buffers a
   * group's values in its aggregation buffer, so at 100 TB swap
   * `percentile` for `approx_percentile` — same plan shape, bounded
   * buffers, documented error. Three aggregate passes are inherent
   * (median, then MAD needs the median, then the flag count needs
   * both); each group-stat frame is ONE row per group and broadcasts
   * back, so the corpus never shuffles — it is scanned three times,
   * which a `.cache()` of the projected (g, x) sliver amortizes when
   * it fits.
   */
  def robustOutliers(df: DataFrame, valueCol: String, byCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val base = df.select(col(byCol).as("g"), col(valueCol).cast("double").as("x"))
    val med = base.groupBy(col("g"))
      .agg(percentile(col("x"), lit(0.5)).as("med"))
    val withMed = base.join(broadcast(med), "g")
    val mad = withMed.groupBy(col("g"))
      .agg(percentile(abs(col("x") - col("med")), lit(0.5)).as("mad"))
    withMed.join(broadcast(mad), "g")
      .groupBy(col("g"))
      .agg(first(col("med")).as("med"), first(col("mad")).as("mad"),
        count(lit(1)).as("n_rows"),
        sum((abs(col("x") - col("med")) > col("mad") * lit(k * 1.4826))
          .cast("long")).as("n_outliers"))
      .select(col("g").as(byCol), col("med"), col("mad"),
        col("n_rows"), col("n_outliers"))
  }

  /**
   * Deterministic EXACT-COUNT stratified sample: the k rows per stratum
   * whose md5 priority is smallest — the balanced-eval-set device
   * ([[hashSampleBy]] draws a Bernoulli FRACTION per stratum, so actual
   * counts vary; eval sets need exactly k per source). A pure function
   * of (key, salt): stable across runs, partitionings, and engines, and
   * changing `salt` draws an independent sample.
   *
   * Priority = the first 13 hex chars of md5(key ":" salt), compared
   * numerically. 13 hex digits = 52 bits, exactly representable in the
   * double the heap aggregate compares — and fixed-width lowercase hex
   * compares identically as a string, which is what lets an external
   * engine (the DuckDB oracle, or any re-implementation) reproduce the
   * selection with a plain `ORDER BY substr(md5(..),1,13), key`.
   *
   * 100 TB shape: per-stratum bottom-k via the bounded heap aggregate
   * ([[TopKAggExpr]], `largest = false`) — partial size-k heaps map-side,
   * only k-entry buffers cross the exchange — NEVER a
   * `row_number().over(partitionBy(stratum))`, which funnels an entire
   * stratum (a crawl source can be most of the corpus) through one task.
   * The picked ids (k × #strata rows) broadcast back onto the corpus as
   * a semi-join to recover full rows.
   *
   * Contract: `keyCol` must be integral (the heap carries long ids) and
   * unique per row — the tie-break and the join-back key.
   */
  def sampleKPerStratum(df: DataFrame, keyCol: String, strataCol: String,
      k: Int, salt: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keyType = df.schema(keyCol).dataType
    require(Seq("tinyint", "smallint", "int", "bigint").contains(keyType.simpleString),
      s"sampleKPerStratum requires an integral key column, got $keyType " +
        "(pre-map ids to long)")
    val priority = conv(
      substring(md5(concat(col(keyCol).cast("string"), lit(":" + salt))
        .cast(BinaryType)), 1, 13), 16, 10).cast("long").cast("double")
    val picked = df
      .select(col(strataCol).as("__st"), col(keyCol).cast("long").as("__id"),
        priority.as("__p"))
      .groupBy(col("__st"))
      .agg(TopKFunctions.topKByScore(col("__p"), col("__id"), k, largest = false)
        .as("__top"))
      .select(explode(col("__top.id")).as("__id"))
    df.join(broadcast(picked), col(keyCol).cast("long") === col("__id"), "left_semi")
  }

  /**
   * Concat-and-chunk sequence packing (the GPT-pretraining layout):
   * documents are laid end-to-end in deterministic (`streamCol`,
   * `orderCol`) order and chunked into fixed `maxTokens` windows; a
   * document's sequence id is the window its first token lands in.
   * Output adds `seq_id` (per stream) and `seq_offset` (the document's
   * first-token offset within its stream, from which any trainer can
   * derive intra-sequence position and straddling).
   *
   * Packing is inherently sequential, so the parallel unit is the
   * stream (`streamCol`, e.g. source or shard): each stream packs
   * independently inside one window partition — the same sharding real
   * pretraining pipelines use. At 100 TB choose a streamCol with enough
   * distinct values to spread (e.g. `pmod(hash(id), shards)`), not a
   * global sort.
   *
   * Determinism contract: `orderCol` must be UNIQUE within each stream
   * (a doc id qualifies; a timestamp may not) — the layout is the order,
   * so ties would make offsets depend on arbitrary intra-tie order and
   * break the byte-identical-rerun guarantee this module promises.
   */
  def packSequences(df: DataFrame, streamCol: String, orderCol: String,
      tokenCol: String, maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val w = Window.partitionBy(streamCol).orderBy(col(orderCol).asc)
    // start offset = tokens of all PRECEDING docs in the stream
    val startOffset = coalesce(
      sum(col(tokenCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L)).cast("long")
    df.withColumn("seq_offset", startOffset)
      .withColumn("seq_id", floor(col("seq_offset") / maxTokens).cast("long"))
  }

  /**
   * Overlapping token-window chunking — the retrieval/embedding prep
   * step: chunks of up to `chunkTokens` whitespace tokens, starting
   * every `chunkTokens - overlapTokens` tokens. A chunk only starts
   * while it still ADDS unseen tokens (start <= tokens - overlap - 1):
   * without that cap, a short tail (e.g. 10 tokens, chunk 4, overlap 1)
   * would emit a final chunk already fully contained in the previous
   * one — pure redundancy in a retrieval index. Output adds `chunk_id`
   * (0-based within the document), `chunk_text`, and `n_chunk_tokens`;
   * token-less documents produce no chunks.
   *
   * Map-side only (tokenize → explode start offsets → slice); each
   * chunk slices the token array once (O(tokens) total work per doc,
   * never per-element re-evaluation). Deterministic: chunk boundaries
   * are a pure function of the text.
   */
  def chunkDocuments(df: DataFrame, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val step = chunkTokens - overlapTokens
    val withToks = df.withColumn("_toks",
      graft.functions.TextFunctions.tokens(col(textCol)))
    withToks
      .withColumn("_start", explode(when(size(col("_toks")) > 0,
        sequence(lit(0),
          greatest(size(col("_toks")) - overlapTokens - 1, lit(0)), lit(step)))
        .otherwise(array().cast("array<int>"))))
      .withColumn("chunk_id", (col("_start") / step).cast("int"))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("_toks"), col("_start") + 1, lit(chunkTokens))))
      .withColumn("n_chunk_tokens",
        least(lit(chunkTokens), size(col("_toks")) - col("_start")))
      .drop("_toks", "_start")
  }

  /**
   * Corpus-level boilerplate removal (the CCNet/RefinedWeb line-dedup
   * step, on token segments since this corpus has no newlines): a
   * document's tokens split into fixed `segmentTokens` windows (trailing
   * remainder kept, so reassembly is lossless); any segment appearing in
   * at least `minDocFreq` DISTINCT documents is boilerplate and removed
   * from every document; survivors reassemble in original order. Output:
   * (`idCol`, `clean_text`, `n_kept_segments`, `n_removed_segments`) —
   * one row per input document, including fully-stripped and empty ones.
   *
   * Scale shape: no skewable single-task operator anywhere. The distinct
   * doc-frequency per segment is a two-phase distinct aggregate
   * (`groupBy(_h).agg(count_distinct(doc))` — both hops map-side
   * combined, so a segment appearing in 30% of the corpus never piles
   * its raw rows into one partition the way a `Window.partitionBy(_h)`
   * formulation would); the boilerplate set — by definition the tiny
   * high-frequency head of the segment distribution — broadcasts back
   * as an anti-flag, and the reassembly is one groupBy(doc): segments
   * sort within their own document (array_sort on an (idx, text)
   * struct), never a global order. Zero-segment documents ride along as
   * a sentinel row (`_s = -1`), so every input doc yields an output row.
   * The price is tokenizing the corpus twice (the frequency pass and
   * the reassembly pass — Spark does not share unmaterialized subplans);
   * two linear scans beat one scan plus a straggler. The hash stands in
   * for segment equality (the CCNet trade: a 2^-64-per-pair collision
   * can strip a rare segment). Within-doc repetition does NOT make
   * boilerplate — frequency counts distinct documents. If the
   * boilerplate set ever outgrows a broadcast, drop the hint: the
   * shuffle join's skew is then AQE-splittable (joins are; windows are
   * not).
   */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
      segmentTokens: Int, minDocFreq: Int): DataFrame = {
    require(segmentTokens > 0, s"segmentTokens must be positive, got $segmentTokens")
    require(minDocFreq >= 2, s"minDocFreq below 2 would strip every segment, got $minDocFreq")
    val k = segmentTokens
    val segs = df
      .select(col(idCol), graft.functions.TextFunctions.tokens(col(textCol)).as("_toks"))
      .withColumn("_nseg", ((size(col("_toks")) + (k - 1)) / k).cast("int"))
      .withColumn("_s", explode(when(col("_nseg") > 0,
        sequence(lit(0), col("_nseg") - 1)).otherwise(array(lit(-1)))))
      .select(col(idCol), col("_s"),
        when(col("_s") >= 0,
          concat_ws(" ", slice(col("_toks"), col("_s") * k + 1, lit(k)))).as("_seg"))
      .withColumn("_h", when(col("_s") >= 0, xxhash64(col("_seg"))))
    val boiler = segs.filter(col("_s") >= 0)
      .groupBy(col("_h")).agg(count_distinct(col(idCol)).as("_df"))
      .filter(col("_df") >= minDocFreq)
      .select(col("_h"), lit(true).as("_boiler"))
    val keep = col("_s") >= 0 && col("_boiler").isNull
    segs
      .join(broadcast(boiler), Seq("_h"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(keep, struct(col("_s"), col("_seg"))))),
          x => x.getField("_seg")), " ").as("clean_text"),
        sum(keep.cast("long")).as("n_kept_segments"),
        (sum((col("_s") >= 0).cast("long")) - sum(keep.cast("long")))
          .as("n_removed_segments"))
  }

  /**
   * C4-style corpus-wide segment deduplication: split every document
   * into consecutive `segmentTokens`-token segments and keep each
   * distinct segment's FIRST occurrence only — ordered by (`idCol`,
   * segment index) — removing every later occurrence, across documents
   * AND within one (C4 does this at the three-sentence-span level;
   * token windows are this corpus's analog, same trade as
   * [[stripBoilerplate]]'s segmenter). Complements [[stripBoilerplate]]:
   * that removes segments frequent across MANY docs everywhere,
   * this keeps one canonical copy of ANY repeat. Output per input row:
   * (`idCol`, clean_text, n_kept_segments, n_removed_segments).
   *
   * Scale shape: the first-occurrence winner per segment comes from
   * `min(struct(id, seg_idx))` under a groupBy on the segment hash —
   * a partial/final aggregate with map-side combine, so a segment
   * duplicated a billion times costs its holder ONE row into the
   * shuffle per map task (a `row_number() over (partition by segment)`
   * window would funnel all of them through one task — windows don't
   * pre-aggregate and AQE cannot split them). The winners table is
   * distinct-segment-sized (NOT broadcastable at corpus scale), so it
   * shuffle-joins back on the hash — equi-join, AQE-skew-splittable —
   * and reassembly is one groupBy on the doc id. Segment equality is
   * by xxhash64, the same 2^-64-per-pair collision trade (and the same
   * loud-alias contract) as [[stripBoilerplate]].
   */
  def dedupSegments(df: DataFrame, idCol: String, textCol: String,
      segmentTokens: Int): DataFrame = {
    require(segmentTokens > 0, s"segmentTokens must be positive, got $segmentTokens")
    val internal = Seq("_toks", "_nseg", "_s", "_seg", "_h", "_first")
    require(!internal.contains(idCol),
      s"idCol '$idCol' collides with an internal alias of dedupSegments")
    val k = segmentTokens
    val segs = df
      .select(col(idCol), graft.functions.TextFunctions.tokens(col(textCol)).as("_toks"))
      .withColumn("_nseg", ((size(col("_toks")) + (k - 1)) / k).cast("int"))
      .withColumn("_s", explode(when(col("_nseg") > 0,
        sequence(lit(0), col("_nseg") - 1)).otherwise(array(lit(-1)))))
      .select(col(idCol), col("_s"),
        when(col("_s") >= 0,
          concat_ws(" ", slice(col("_toks"), col("_s") * k + 1, lit(k)))).as("_seg"))
      .withColumn("_h", when(col("_s") >= 0, xxhash64(col("_seg"))))
    val firsts = segs.filter(col("_s") >= 0)
      .groupBy(col("_h"))
      .agg(min(struct(col(idCol), col("_s"))).as("_first"))
    val keep = col("_s") >= 0 &&
      col("_first")(idCol) === col(idCol) && col("_first")("_s") === col("_s")
    segs
      .join(firsts, Seq("_h"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(keep, struct(col("_s"), col("_seg"))))),
          x => x.getField("_seg")), " ").as("clean_text"),
        sum(keep.cast("long")).as("n_kept_segments"),
        (sum((col("_s") >= 0).cast("long")) - sum(keep.cast("long")))
          .as("n_removed_segments"))
  }

  /**
   * BPE merge-table training — the iterative closure of the single
   * merge-selection step `q_bpe_pairs` demonstrates: `numMerges` rounds
   * of (count adjacent symbol pairs weighted by word frequency → adopt
   * the most frequent pair as a new symbol → re-segment). Returns the
   * learned merge table (rank, left, right, merged, pair_freq) — the
   * artifact a tokenizer ships.
   *
   * Scale shape: the corpus collapses ONCE to the (word, freq) table —
   * a single corpus aggregation; training then iterates on that
   * vocabulary-sized table, never re-touching the corpus (how real BPE
   * trainers work, whether on full corpora or samples). When the table
   * fits `driverVocabCap` rows it is collected ONCE and training
   * finishes DRIVER-LOCAL with incrementally-maintained pair counts —
   * what real BPE trainers do, and the only shape that survives a
   * production vocabulary: the distributed loop launches one Spark job
   * per merge, and 32k sequential job launches are a scheduler wall
   * regardless of data size (a vocabulary is a few million rows — a
   * driver-trivial collect — while the corpus it came from is the
   * 100 TB part that stays distributed in the ONE aggregation above).
   * Past the cap (or with `driverVocabCap = 0`) each round is one
   * distributed weighted pair-count plus a 1-ROW argmax collect
   * (driver state = the merge table, bounded by `numMerges` — the
   * kmeans-centroid pattern); the merge itself is a fold-with-carry
   * `aggregate` over the symbol array (leftmost-greedy, the standard
   * BPE order), executed map-side — no UDF, no shuffle. Lineage is
   * truncated with a localCheckpoint every 16 rounds so plan depth
   * stays bounded. Ties break deterministically on (freq desc, left
   * asc, right asc) with BINARY (UTF-8 code-point) string order on
   * both paths, so retraining reproduces the identical table
   * (merge-for-merge parity spec-gated).
   */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
      minPairFreq: Long = 2L, driverVocabCap: Long = 4000000L): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(minPairFreq >= 1, s"minPairFreq must be >= 1, got $minPairFreq")
    val spark = df.sparkSession
    var words = df
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_freq"))
      .select(split(col("_w"), "").as("_syms"), col("_freq"))
      .persist()
    val vocabN = words.count() // materialize before the corpus-scan lineage is dropped
    if (vocabN > 0 && vocabN <= driverVocabCap) {
      val rows =
        try words.collect() finally words.unpersist(blocking = false)
      val local = trainBpeLocal(
        rows.map(r => (r.getSeq[String](0).toArray, r.getLong(1))),
        numMerges, minPairFreq)
      import spark.implicits._
      return local.toDF("rank", "left", "right", "pair_freq")
        .select(col("rank"), col("left"), col("right"),
          concat(col("left"), col("right")).as("merged"), col("pair_freq"))
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      var round = 0
      var continue = true
      while (round < numMerges && continue) {
        val top = words
          .select(col("_freq"), explode(zip_with(
            slice(col("_syms"), lit(1), size(col("_syms")) - 1),
            slice(col("_syms"), lit(2), size(col("_syms")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("_p"))
          .groupBy(col("_p.l").as("_l"), col("_p.r").as("_r"))
          .agg(sum(col("_freq")).as("_pf"))
          .orderBy(col("_pf").desc, col("_l").asc, col("_r").asc)
          .limit(1).collect()
        if (top.isEmpty || top(0).getAs[Long]("_pf") < minPairFreq) continue = false
        else {
          val l = top(0).getAs[String]("_l")
          val r = top(0).getAs[String]("_r")
          val pf = top(0).getAs[Long]("_pf")
          merges += ((merges.size + 1, l, r, pf))
          val m = l + r
          // leftmost-greedy adjacent merge as a fold with carried symbol
          val mergedSyms = aggregate(
            col("_syms"),
            struct(array().cast("array<string>").as("out"),
              lit(null).cast("string").as("prev")),
            (acc, x) =>
              when(acc.getField("prev") === l && x === r,
                struct(concat(acc.getField("out"), array(lit(m))).as("out"),
                  lit(null).cast("string").as("prev")))
              .when(acc.getField("prev").isNull,
                struct(acc.getField("out").as("out"), x.as("prev")))
              .otherwise(
                struct(concat(acc.getField("out"), array(acc.getField("prev"))).as("out"),
                  x.as("prev"))),
            acc => when(acc.getField("prev").isNull, acc.getField("out"))
              .otherwise(concat(acc.getField("out"), array(acc.getField("prev")))))
          val next0 = words.select(mergedSyms.as("_syms"), col("_freq"))
          // localCheckpoint (eager) truncates the k-round lineage every
          // 16 merges so plan analysis stays O(1) per round; in between,
          // persist+count materializes on top of the previous cache
          val next =
            if ((round + 1) % 16 == 0) next0.localCheckpoint()
            else { val p = next0.persist(); p.count(); p }
          words.unpersist(blocking = false)
          words = next
          round += 1
        }
      }
    } finally words.unpersist(blocking = false)
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "pair_freq")
      .select(col("rank"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("pair_freq"))
  }

  /** Driver-local BPE training over the collected (symbols, freq)
    * vocabulary — the finishing path of [[bpeTrain]], byte-for-byte the
    * distributed loop's semantics (merge-for-merge parity spec-gated):
    * overlapping adjacent pair counts weighted by word freq, argmax
    * ties on (freq desc, left asc, right asc), leftmost-greedy
    * non-overlapping merge. Pair counts are maintained INCREMENTALLY
    * (only words containing the merged pair recount — the standard fast
    * trainer), with a pair → word-index occurrence map whose entries
    * are a may-contain superset (stale entries re-verified on use).
    * Returns (rank, left, right, pair_freq). */
  private[graft] def trainBpeLocal(
      words0: Array[(Array[String], Long)], numMerges: Int,
      minPairFreq: Long): Seq[(Int, String, String, Long)] = {
    // Tie-break comparison must equal the distributed path's ORDER BY
    // on strings, which is Spark's UTF8String binary order = UTF-8
    // byte-wise = code-point order. Scala's String < is UTF-16
    // code-unit order — it disagrees on supplementary-plane characters
    // (emoji), which real corpora contain.
    def utf8Lt(a: String, b: String): Boolean = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    val syms = words0.map(_._1)
    val freq = words0.map(_._2)
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val occ = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.HashSet[Int]]
    def bump(p: (String, String), by: Long): Unit = {
      val c = counts.getOrElse(p, 0L) + by
      if (c <= 0L) counts.remove(p) else counts(p) = c
    }
    var wi = 0
    while (wi < syms.length) {
      val s = syms(wi)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        bump(p, freq(wi))
        occ.getOrElseUpdate(p, scala.collection.mutable.HashSet.empty) += wi
        i += 1
      }
      wi += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var continue = true
    while (out.size < numMerges && continue) {
      // deterministic argmax regardless of hash iteration order
      var best: (String, String) = null
      var bestC = 0L
      counts.foreach { case (p, c) =>
        if (best == null || c > bestC ||
            (c == bestC && (utf8Lt(p._1, best._1) ||
              (p._1 == best._1 && utf8Lt(p._2, best._2))))) {
          best = p; bestC = c
        }
      }
      if (best == null || bestC < minPairFreq) continue = false
      else {
        val (l, r) = best
        out += ((out.size + 1, l, r, bestC))
        val m = l + r
        occ.get(best).foreach(_.toArray.foreach { w =>
          val old = syms(w)
          var has = false
          var i = 0
          while (i < old.length - 1 && !has) {
            has = old(i) == l && old(i + 1) == r
            i += 1
          }
          if (has) { // occ entries are stale-safe may-contains
            val f = freq(w)
            var j = 0
            while (j < old.length - 1) { bump((old(j), old(j + 1)), -f); j += 1 }
            val b = scala.collection.mutable.ArrayBuffer.empty[String]
            var k = 0
            while (k < old.length) {
              if (k + 1 < old.length && old(k) == l && old(k + 1) == r) {
                b += m; k += 2
              } else { b += old(k); k += 1 }
            }
            val nw = b.toArray
            syms(w) = nw
            var j2 = 0
            while (j2 < nw.length - 1) {
              val p = (nw(j2), nw(j2 + 1))
              bump(p, f)
              occ.getOrElseUpdate(p, scala.collection.mutable.HashSet.empty) += w
              j2 += 1
            }
          }
        })
        // a single leftmost pass removes every (l, r) adjacency (a
        // skipped overlap leaves (merged, r), never (l, r)), so the
        // count is now zero on both paths; drop the bookkeeping
        occ.remove(best)
        counts.remove(best)
      }
    }
    out.toSeq
  }

  /** Collect a trained merge table ([[bpeTrain]] output) into the ordered
    * (left, right) list [[bpeEncode]] applies. Driver state is the merge
    * table only — numMerges rows, the kmeans-centroid trade. */
  def collectMerges(merges: DataFrame): Seq[(String, String)] =
    merges.orderBy("rank").collect().toSeq
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))

  /**
   * Apply a BPE merge list corpus-wide — the tokenizer-APPLY closure of
   * [[bpeTrain]]: each word's characters are merged by each
   * (left, right) rule in rank order, leftmost-first and
   * non-overlapping within a rule — exactly the trainer's internal merge
   * semantics (gated merge-for-merge in the spec). Output one row per
   * word occurrence: (`idCol`, pos, word, enc, n_word_tokens), with
   * `enc` the encoded word as space-joined tokens.
   *
   * Shape at 100 TB: the merge chain runs once per DISTINCT word (the
   * vocabulary-sized frame), never per occurrence — the corpus-sized
   * exploded frame only equi-joins the encoded vocabulary back
   * (AQE-skew-splittable on stopword hot words). The per-word encoding
   * is a chain of codegen'd literal `replace` calls over a
   * control-char-delimited symbol string (\u0002tok\u0003 per symbol): a
   * pattern match consumes exactly two whole delimited tokens, so
   * literal replace's leftmost-scan-resume-after semantics IS the greedy
   * merge — no interpreted higher-order fold per row, and the identical
   * chain is expressible in any engine with `replace` (the DuckDB
   * oracle runs it verbatim).
   *
   * Contract: merge symbols must be non-empty, whitespace-free, and free
   * of the \u0002/\u0003 delimiters (trained merges satisfy this by
   * construction — symbols descend from whitespace-split tokens).
   *
   * Merge-table size: every literal `replace` compiles into the SAME
   * generated Java method, and Janino enforces the JVM's 64KB method
   * bytecode limit -- a production-size merge table (32k merges) as a
   * literal chain would fail codegen (or silently fall back to
   * interpreted evaluation of a 32k-deep expression tree). Past
   * `literalMergeCap` merges the encoder dispatches to a LOOP encoder
   * over a broadcast merge table -- one sequential left-to-right pass
   * per rule in rank order over the word's symbol array, the exact
   * literal-`replace` semantics (leftmost match, resume after the
   * replacement) -- still per DISTINCT word, so the per-occurrence
   * corpus cost is unchanged. A per-word monotone symbol-presence set
   * skips inapplicable rules in O(1): a 32k-rule table costs ~32k set
   * probes per word, not 32k array passes.
   */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], literalMergeCap: Int = 512): DataFrame = {
    require(merges.nonEmpty, "empty merge list (train with bpeTrain first)")
    merges.foreach { case (l, r) =>
      require(l.nonEmpty && r.nonEmpty, s"empty merge symbol in ($l, $r)")
      require(!(l + r).exists(c => c.isWhitespace || c == '\u0002' || c == '\u0003'),
        s"merge symbols must be whitespace/delimiter-free: ($l, $r)")
    }
    val exploded = df.select(col(idCol),
      posexplode(graft.functions.TextFunctions.tokens(col(textCol))).as(Seq("_pos", "_w")))
    val enc: org.apache.spark.sql.Column =
      if (merges.size <= literalMergeCap) {
        val wrapped = regexp_replace(col("_w"), "(.)", "\u0002$1\u0003")
        val mergedStr = merges.foldLeft(wrapped) { case (acc, (l, r)) =>
          call_function("replace", acc,
            lit("\u0002" + l + "\u0003\u0002" + r + "\u0003"),
            lit("\u0002" + l + r + "\u0003"))
        }
        translate(
          call_function("replace", mergedStr, lit("\u0003\u0002"), lit(" ")),
          "\u0002\u0003", "")
      } else {
        val bc = df.sparkSession.sparkContext.broadcast(merges.toArray)
        val encodeWord = udf { (w: String) => applyMergesSequential(w, bc.value) }
        encodeWord(col("_w"))
      }
    val encoded = exploded.select(col("_w")).distinct()
      .select(col("_w"), enc.as("_enc"))
      .withColumn("_n", size(split(col("_enc"), " ")).cast("long"))
    exploded.join(encoded, "_w")
      .select(col(idCol), col("_pos").as("pos"), col("_w").as("word"),
        col("_enc").as("enc"), col("_n").as("n_word_tokens"))
  }

  /** The loop form of the literal-`replace` merge chain: one
    * left-to-right non-overlapping pass per rule in rank order, leftmost
    * match first, scan resuming AFTER each replacement (a merged token
    * is never the left element of another match within the same pass) --
    * byte-for-byte the semantics of chained SQL `replace` over the
    * delimited symbol string, validated by a parity property spec
    * against an independent java.lang.String#replace reference. The
    * `present` set only ever grows (stale entries are a sound
    * may-contain filter), giving O(1) skip of the
    * overwhelmingly-inapplicable rules in a production merge table. */
  private[graft] def applyMergesSequential(
      word: String, merges: Array[(String, String)]): String = {
    var syms: Array[String] = word.map(_.toString).toArray
    val present = scala.collection.mutable.HashSet.empty[String]
    syms.foreach(present += _)
    merges.foreach { case (l, r) =>
      if (present.contains(l) && present.contains(r)) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        var mergedAny = false
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += l + r; mergedAny = true; i += 2
          } else { out += syms(i); i += 1 }
        }
        if (mergedAny) { syms = out.toArray; present += (l + r) }
      }
    }
    syms.mkString(" ")
  }

  /**
   * Per-document novelty scoring — the information-gain curation signal:
   * the fraction of a document's distinct word `n`-grams that no
   * EARLIER document (lower id) contains. Boilerplate-heavy and
   * near-duplicate docs score low; first occurrences score high —
   * the greedy selection objective of dedup-aware data curation,
   * computed exactly in one pass. Output: (`idCol`, n_shingles,
   * n_novel, novelty) for documents with at least one n-gram.
   *
   * Shape at 100 TB: one corpus tokenize into a PERSISTED (doc,
   * shingle-hash) sliver (two consumers — Spark does not share
   * unmaterialized subplans); first-occurrence per shingle is a
   * partial/final `min` aggregate (a billion-fold repeated shingle
   * pre-combines map-side — never a window over the shingle), joined
   * back as a plain equi-join AQE can skew-split on hot boilerplate
   * shingles. Shingles travel as 64-bit hashes — strings never shuffle
   * (collision odds ~|shingles|²/2⁶⁵, the [[graft.operators.Dedup]]
   * trade). Determinism: novelty = one IEEE division of exact counts,
   * rounded to 4.
   */
  def noveltyScore(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"shingle width must be positive, got $n")
    val ex = df.select(col(idCol).as("_id"),
        graft.functions.TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col("_id"), explode(
        graft.functions.TextFunctions.shingleSetFromTokens(col("_toks"), n)).as("_sh"))
      .select(col("_id"), xxhash64(col("_sh")).as("_s"))
      .persist()
    val first = ex.groupBy(col("_s")).agg(min(col("_id")).as("_first"))
    ex.join(first, "_s")
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_first") === col("_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles"), 4))
      .select(col("_id").as(idCol), col("n_shingles"), col("n_novel"),
        col("novelty"))
  }

  /**
   * Mix a corpus DOWN TO a unit budget (tokens/chars/bytes) with
   * per-source weights — the data-mixture step run before every
   * pretraining job: "x% of the budget from curated, y% from crawl".
   * Per stratum s the keep fraction is `min(1, budget·w_s / units_s)`
   * (a stratum smaller than its allocation keeps everything — the
   * budget is a CAP, not an upsampler), applied with the same md5-hex
   * device as [[hashSample]]: deterministic per key, engine-portable,
   * leakage-free under reruns. Strata absent from `weights` are
   * DROPPED — the mixture spec IS the source list. Weights must sum to
   * 1 (the [[assignSplits]] contract).
   *
   * Shape at 100 TB: per-stratum unit totals are one aggregate-only
   * shuffle of partial sums (≤|weights| rows); fractions and hex
   * thresholds derive on that tiny frame and broadcast back; the keep
   * filter is map-side. The corpus never shuffles. Determinism: unit
   * totals are exact Long sums cast once to double, so every engine
   * computes the identical fraction, threshold, and kept set.
   */
  def mixToBudget(df: DataFrame, keyCol: String, strataCol: String,
      unitCol: String, budgetUnits: Long, weights: Map[String, Double],
      salt: String = "graft"): DataFrame = {
    require(budgetUnits > 0, s"budgetUnits must be positive, got $budgetUnits")
    require(weights.nonEmpty, "mixToBudget needs at least one stratum weight")
    require(weights.values.forall(_ > 0), s"weights must be positive, got $weights")
    val total = weights.values.sum
    require(math.abs(total - 1.0) < 1e-6, s"weights must sum to 1, got $total")
    val entries = weights.toSeq
    val in = df.filter(col(strataCol).isin(entries.map(_._1): _*))
    val wCol = entries.tail.foldLeft(
      when(col(strataCol) === lit(entries.head._1), lit(entries.head._2))) {
      case (acc, (s, w)) => acc.when(col(strataCol) === lit(s), lit(w))
    }
    val thr = in.groupBy(col(strataCol))
      .agg(sum(col(unitCol)).cast("double").as("_units"))
      .withColumn("_frac",
        least(lit(1.0), lit(budgetUnits.toDouble) * wCol / col("_units")))
      // the hexThreshold device as a plan expression (fractions are
      // data-dependent here): floor(f * 16^8) as 8 lowercase hex chars;
      // 'g' sorts after every hex digit = keep all
      .withColumn("_thr", when(col("_frac") >= 1.0, lit("g"))
        .otherwise(lpad(lower(hex(floor(col("_frac") * 4294967296d))), 8, "0")))
      .select(col(strataCol), col("_thr"))
    in.join(broadcast(thr), strataCol)
      .filter(hashKey(col(keyCol), salt) < col("_thr"))
      .drop("_thr")
  }

  /**
   * Equi-depth quantile bucketing of a numeric column — feature
   * discretization, length-bucketed batching (pack similar-length docs
   * to cut padding waste), and curriculum sharding all reduce to it.
   * Every row gets `bucket` ∈ [0, k): the count of interior cut points
   * (quantiles i/k, i = 1..k-1) strictly below-or-equal via `value >
   * cut` — a value equal to a cut stays in the lower bucket; heavy ties
   * may leave buckets empty (same semantics on any engine).
   *
   * Two modes, one contract: `exact = true` computes interpolated exact
   * quantiles (`percentile`) — a full per-column sort, the
   * oracle-parity mode, fine up to memory-of-one-executor scale.
   * `exact = false` (default, the 100 TB path) uses
   * `approx_percentile`'s mergeable fixed-memory sketch: partials
   * combine map-side, no sort, error bounded by `accuracy` (1/accuracy
   * relative rank error). Both produce ONE broadcast row of k-1 cuts;
   * assignment is a map-side codegen fold over the cut array — the
   * corpus never shuffles.
   */
  def quantileBuckets(df: DataFrame, idCol: String, valueCol: String,
      k: Int, exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(k >= 2, s"need at least 2 buckets, got $k")
    require(accuracy > 0, s"accuracy must be positive, got $accuracy")
    require(!df.columns.contains("bucket"),
      "df already has a 'bucket' column; rename it first")
    val v = col(valueCol).cast("double")
    val probs = array((1 until k).map(i => lit(i.toDouble / k)): _*)
    val cuts = (if (exact) df.agg(percentile(v, probs).as("_cuts"))
                else df.agg(approx_percentile(v, probs, lit(accuracy)).as("_cuts")))
    df.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        aggregate(col("_cuts"), lit(0),
          (acc, c) => acc + when(v > c, 1).otherwise(0)))
      .drop("_cuts")
  }

  /**
   * Numeric-column profiling — the dataset-statistics primitive every
   * ingestion step runs first: per column, row/null/distinct counts and
   * min/max, as ROWS (one per column) so downstream checks join on the
   * column name. One corpus scan computes every column's aggregates in
   * a single partial/final pass (no per-column jobs); the stack to rows
   * happens on the 1-row aggregate result. Exact distincts by default
   * for cross-engine parity — pass `exactDistinct = false` at 100 TB to
   * swap in HLL registers (each exact distinct re-shuffles that
   * column's values; the sketch ships fixed-size registers).
   */
  def profileNumeric(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profileNumeric needs at least one column")
    cols.foreach { c =>
      require(df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"profileNumeric covers numeric columns; $c is ${df.schema(c).dataType}")
    }
    val aggs = cols.flatMap { c =>
      val v = col(c)
      Seq(count(lit(1)).as(s"_n_$c"),
        sum(v.isNull.cast("long")).as(s"_nulls_$c"),
        (if (exactDistinct) countDistinct(v) else approx_count_distinct(v))
          .as(s"_dist_$c"),
        min(v.cast("double")).as(s"_min_$c"),
        max(v.cast("double")).as(s"_max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col(s"_n_$c").as("n_rows"),
        col(s"_nulls_$c").as("n_nulls"), col(s"_dist_$c").as("n_distinct"),
        col(s"_min_$c").as("min_v"), col(s"_max_$c").as("max_v"))
    }
    one.select(explode(array(stacked: _*)).as("_p")).select(col("_p.*"))
  }

  /**
   * Winsorize a numeric column PER GROUP: clamp values below/above the
   * group's [pLo, pHi] interpolated percentiles to the boundary — the
   * standard outlier-taming step before loss-weighted sampling or
   * feature standardization (a crawl's pathological 100 MB "document"
   * stops dominating a mean; the clamped column appends as
   * `<valueCol>_w`, originals untouched).
   *
   * Shape at 100 TB: per-group cut points reduce to a TWO-double row per
   * group (mergeable percentile aggregate — `approx_percentile`'s
   * fixed-memory sketch by default, the exact interpolated form when
   * `exact` for oracle parity), broadcast back, clamp map-side with
   * least/greatest — the corpus itself never shuffles.
   */
  def winsorizeBy(df: DataFrame, keyCol: String, valueCol: String,
      pLo: Double, pHi: Double, exact: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    require(!df.columns.contains("_lo") && !df.columns.contains("_hi"),
      "df already has a _lo/_hi column; rename it first")
    val wCol = s"${valueCol}_w"
    require(!df.columns.contains(wCol), s"df already has a '$wCol' column")
    val v = col(valueCol).cast("double")
    val cuts =
      if (exact) df.groupBy(col(keyCol))
        .agg(percentile(v, lit(pLo)).as("_lo"), percentile(v, lit(pHi)).as("_hi"))
      else df.groupBy(col(keyCol))
        .agg(approx_percentile(v, lit(pLo), lit(accuracy)).as("_lo"),
          approx_percentile(v, lit(pHi), lit(accuracy)).as("_hi"))
    df.join(broadcast(cuts), keyCol)
      .withColumn(wCol, least(greatest(v, col("_lo")), col("_hi")))
      .drop("_lo", "_hi")
  }

  /**
   * BM25 relevance of every document against a small query-term set —
   * the retrieval primitive for targeted corpus curation ("find docs
   * about X to upweight/inspect"). Lucene's non-negative idf variant:
   *
   *   idf(t) = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
   *   score  = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
   *
   * Shape at 100 TB: the query terms are a handful of literals, so the
   * corpus token explode filters to them MAP-SIDE (`isin` over literals,
   * codegen) before anything shuffles — only the matching (doc, term)
   * sliver aggregates; the document length rides the same projection so
   * no second corpus join is needed for dl. N/avgdl reduce to ONE row
   * and df(t) to ≤|terms| rows — both broadcast. Total motion: one slim
   * shuffle of matching pairs + two broadcasts; the corpus-sized scan
   * stays map-side. (A second column-pruned pass computes N/avgdl over
   * ALL docs — required by the formula, aggregate-only shuffle of
   * partial sums.)
   *
   * The matching sliver is persisted: df(t) and the scoring join both
   * consume it, and Spark does not share unmaterialized subplans — an
   * unpersisted plan would tokenize the corpus twice. The df(t)
   * broadcast job populates the cache before the main job reads it. The
   * sliver stays cached after return (same contract as the pair
   * finders); long-lived sessions should `spark.catalog.clearCache()`
   * between pipelines.
   *
   * Determinism: per-(doc,term) weights derive from identical doubles on
   * any engine (avgdl is computed as exact Long sum / count, THEN one
   * IEEE division); the per-doc sum over ≤|terms| weights is
   * order-dependent, so the output rounds to 4 decimals — the same
   * trade as the byte-entropy and LM-score kernels. Output:
   * (`idCol`, bm25, n_terms) for documents matching ≥1 term.
   */
  def bm25Score(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Score needs at least one query term")
    require(terms.distinct.size == terms.size,
      s"duplicate query terms in $terms")
    require(k1 >= 0 && b >= 0 && b <= 1, s"need k1 >= 0, b in [0,1]; got k1=$k1 b=$b")
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    val docs = df.select(col(idCol).as("_id"),
      size(toks).cast("long").as("_dl"), toks.as("_toks"))
    // exact integer sum, ONE division: bit-identical avgdl on any engine
    val stats = docs.agg(count(lit(1)).as("_n"),
      (sum(col("_dl")).cast("double") / count(lit(1))).as("_avgdl"))
    val tf = docs
      .select(col("_id"), col("_dl"), explode(col("_toks")).as("_term"))
      .filter(col("_term").isin(terms: _*)) // map-side, pre-shuffle
      .groupBy(col("_id"), col("_term"))
      .agg(count(lit(1)).as("_tf"), max(col("_dl")).as("_dl"))
      .persist()
    val dft = tf.groupBy(col("_term")).agg(count(lit(1)).as("_df"))
    tf.join(broadcast(dft), "_term")
      .crossJoin(broadcast(stats)) // 1-row stats side
      .withColumn("_idf",
        log(lit(1.0) + (col("_n") - col("_df") + 0.5) / (col("_df") + 0.5)))
      .withColumn("_w",
        col("_idf") * (col("_tf") * (k1 + 1)) /
          (col("_tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("_dl") / col("_avgdl"))))
      .groupBy(col("_id"))
      .agg(round(sum(col("_w")), 4).as("bm25"), count(lit(1)).as("n_terms"))
      .select(col("_id").as(idCol), col("bm25"), col("n_terms"))
  }

  /**
   * TF-IDF keyword extraction: the `topPerDoc` highest-scoring tokens
   * per document, `score = tf * (ln((N+1)/(df+1)) + 1)` (smoothed idf,
   * sklearn's form). Output: (`idCol`, token, tf, df, rank, score).
   *
   * Scale shape: the corpus is tokenized ONCE — term frequencies
   * aggregate (doc, token) with map-side combine into a PERSISTED tf
   * table ([[bm25Score]]'s device: Spark does not share unmaterialized
   * subplans, so the df aggregate would otherwise re-tokenize the
   * corpus). Document frequencies reduce from tf with a second
   * partial/final aggregate and join back on token as a plain shuffle
   * join — AQE splits the hot stopword keys, where the former
   * `count over (partition by token)` window funneled every row of a
   * hot token through ONE task (the straggler that kills this at
   * 100 TB; a broadcast of the df table is no alternative once the
   * vocabulary outgrows a broadcast). The corpus size joins in as a
   * broadcast 1-row aggregate. The ranking window partitions by
   * document — groups bounded by per-doc vocabulary, so no global sort
   * anywhere. The tf sliver stays cached after return (pair-finder
   * contract); long-lived sessions should `clearCache()` between
   * pipelines.
   */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      topPerDoc: Int): DataFrame = {
    require(topPerDoc > 0, s"topPerDoc must be positive, got $topPerDoc")
    val tf = df.select(col(idCol), explode(
        graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .persist()
    val dft = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = df.agg(count_distinct(col(idCol)).as("_n"))
    tf.join(dft, "token")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * (log((col("_n") + 1) / (col("df") + 1)) + 1))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("score").desc, col("token").asc)).cast("long"))
      .filter(col("rank") <= topPerDoc)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("rank"),
        col("score"))
  }

  /**
   * Benchmark decontamination: corpus documents sharing at least one word
   * `n`-gram with the benchmark set, with the count of distinct shared
   * n-grams as the contamination strength. The training-data hygiene step
   * run before every serious pretraining job — eval questions leaking
   * into the corpus inflate benchmark scores.
   *
   * Shape at 100 TB: the CORPUS side explodes to (id, shingle-hash) rows
   * (map-side, 64-bit hashes — string shingles never shuffle); the
   * BENCHMARK side — eval suites are tiny next to a corpus — collapses to
   * a distinct hash set and broadcasts, so the probe is a broadcast hash
   * join with no corpus shuffle; only the per-doc count aggregates.
   * Output: (id, n_shared), one row per contaminated document.
   */
  def contamination(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    def shingleHashes(df: DataFrame, withId: Boolean): DataFrame = {
      val base = df.select(
        (if (withId) Seq(col(idCol).as("id")) else Nil) :+
          graft.functions.TextFunctions.tokens(col(textCol)).as("_toks"): _*)
      base.select(
        (if (withId) Seq(col("id")) else Nil) :+
          explode(graft.functions.TextFunctions.shingleSetFromTokens(col("_toks"), n)).as("_sh"): _*)
        .withColumn("s", xxhash64(col("_sh"))).drop("_sh")
    }
    val c = shingleHashes(corpus, withId = true)
    val b = shingleHashes(bench, withId = false).select("s").distinct()
    // count, not count_distinct: a document's shingle SET is already
    // distinct (shingleSetFromTokens), so its joined (id, s) rows are
    // unique and the two aggregates are equal — and plain count makes
    // this operator legal on a STREAMING corpus (distinct aggregates
    // are unsupported in streaming; the benchmark side stays a static
    // broadcast), which is what stream_contamination runs
    c.join(broadcast(b), "s")
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
  }

  /**
   * Per-group feature standardization (z-scoring) of a vector column —
   * the embedding-normalization step before clustering/ANN when features
   * have per-domain scale differences. Per key, elementwise mean and
   * population std aggregate through the native `vector_avg` buffer (one
   * `(count, double[dim])` pair per group per task — no posexplode row
   * inflation); the tiny per-key stats table broadcasts back and each
   * vector rescales map-side. Output: one row per (row, dimension) with
   * `z = (x - mean) / std` (0 where std = 0).
   *
   * Determinism contract for cross-engine parity: stats are ROUNDED to 6
   * decimals first, so z is computed from identical doubles on any
   * engine (IEEE division of equal inputs) and rounds identically to 4
   * decimals; the raw avg/std agree at 6 decimals across summation
   * orders (the q_centroid device).
   */
  def standardizeBy(df: DataFrame, keyCol: String, idCol: String,
      vecCol: String): DataFrame = {
    val stats = df.groupBy(col(keyCol))
      .agg(
        VectorAggFunctions.vectorAvg(col(vecCol)).as("_m"),
        VectorAggFunctions.vectorAvg(transform(col(vecCol),
          x => x.cast("double") * x.cast("double"))).as("_m2"))
      .select(col(keyCol),
        transform(col("_m"), m => round(m, 6)).as("_mean"),
        zip_with(col("_m2"), col("_m"),
          (m2, m) => round(sqrt(greatest(m2 - m * m, lit(0.0))), 6)).as("_std"))
    df.select(col(idCol), col(keyCol), col(vecCol).as("_v"))
      .join(broadcast(stats), Seq(keyCol))
      .select(col(idCol), col(keyCol),
        posexplode(zip_with(
          zip_with(col("_v"), col("_mean"), (x, m) => x.cast("double") - m),
          col("_std"),
          // + 0.0 normalizes IEEE negative zero (-0.0 + 0.0 = +0.0) so
          // engines that keep round's -0.0 and those that don't agree
          (d, s) => when(s > 0, round(d / s, 4) + lit(0.0)).otherwise(lit(0.0)))))
      .select(col(idCol), col(keyCol),
        (col("pos") + 1).cast("long").as("i"), col("col").as("z"))
  }

  /**
   * Skew-resilient equi-join for hot keys: the result is EXACTLY
   * `big.join(small, bigKey === smallKey, joinType)`, but a hot join key
   * no longer lands in one reducer. Each big-side row gets a salt in
   * `[0, salt)` (round-robin within its input partition — identical
   * duplicate rows spread too, which a row-hash salt would not do), the
   * small side is replicated `salt` ways, and the join runs on
   * `(key, salt)` — one hot key's rows split across `salt` tasks at the
   * cost of `salt`× the small side. The salt ASSIGNMENT is arbitrary by
   * construction and the JOIN RESULT is independent of it (every salt
   * value carries the full small side), so the output stays
   * deterministic even though the per-row salt is not.
   *
   * When to reach for it at 100 TB: a shuffle join whose key histogram
   * has a few keys holding a double-digit percentage of rows (the
   * "null-key/default-key" pathology), where AQE's skew-join split
   * doesn't apply (e.g. the skew is on the BUILD side, or the join is
   * feeding an aggregation that pins the partitioning). For a small `small`
   * side prefer `broadcast(small)` — no shuffle at all; salting is for
   * the middle regime where the small side is broadcast-too-big but
   * replicate-`salt`-ways fine.
   *
   * `left` joins are supported (an unmatched big row carries exactly one
   * salt value, so it appears exactly once, null-padded). Right/full
   * outer are NOT: an unmatched small row would appear `salt` times.
   */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter",
      s"saltedJoin supports inner and left joins, got '$joinType' " +
        "(right/full outer would duplicate unmatched small-side rows per salt)")
    // the trailing drop would silently eat same-named user columns
    Seq("_salt_b", "_salt_s").foreach { reserved =>
      require(!big.columns.contains(reserved) && !small.columns.contains(reserved),
        s"saltedJoin reserves column name '$reserved'; rename it in the input")
    }
    val saltedBig = big.withColumn("_salt_b",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val saltedSmall = small.withColumn("_salt_s",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey)
          && col("_salt_b") === col("_salt_s"),
        joinType)
      .drop("_salt_b", "_salt_s")
  }

  /**
   * Deterministic per-group row cap — the per-domain page cap of web
   * corpus builds: at most `maxRows` ids survive per group, chosen by
   * md5 priority (a pure function of id+salt, so the SAME ids survive on
   * every run, engine, and partitioning). Returns (`groupCol`, `idCol`)
   * survivor pairs; semi-join back to retain full rows.
   *
   * Scale shape: the selection is a bounded top-k HEAP aggregate
   * ([[TopKAggExpr]]), not a `row_number` window — per task each group
   * keeps a size-`maxRows` heap map-side and only k-entry buffers cross
   * the exchange, so a group with 10^9 rows (one hot domain) costs O(k)
   * memory instead of a single-task sort of the whole domain.
   *
   * Priority = the numeric value of the first 13 hex digits of
   * `md5(id:salt)` — 52 bits, exactly representable in double, and
   * fixed-width hex compares identically as string or number (the DuckDB
   * oracle sorts the string form). Lower is better; ties (impossible in
   * practice at 13 hex digits) break to the lower id in both engines.
   */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      maxRows: Int, salt: String = "graft"): DataFrame = {
    require(maxRows >= 1, s"maxRows must be >= 1, got $maxRows")
    val idType = df.schema(idCol).dataType
    Checks.requireIntegralId("capPerGroup", idCol, idType)
    val pri = conv(substring(
        md5(concat(col(idCol).cast("string"), lit(":" + salt)).cast("binary")), 1, 13),
      16, 10).cast("double")
    df.select(col(groupCol), col(idCol).cast("long").as("_id"), pri.as("_pri"))
      .groupBy(col(groupCol))
      .agg(TopKFunctions.topKByScore(col("_pri"), col("_id"), maxRows,
        largest = false).as("_kept"))
      .select(col(groupCol), explode(col("_kept")).as("_e"))
      .select(col(groupCol), col("_e.id").cast(idType).as(idCol))
  }

  /**
   * Corpus-trained bigram LM cross-entropy — the perplexity-style
   * quality signal of CCNet-class pipelines, self-trained so no
   * external model ships: score(doc) = -(1/n_bigrams) Σ ln P(w|prev)
   * with P(w|prev) = c(prev,w) / c(prev,·) counted over THIS corpus.
   * Low scores = phrasing the corpus has seen often (fluent/common);
   * high scores = rare transitions (noise, gibberish, boilerplate
   * concatenations). Output: (`idCol`, n_bigrams, xent) — xent rounded
   * to 4 decimals (the per-doc sum is order-dependent double math;
   * rounding makes it partitioning- and engine-stable, same trade as
   * the byte-entropy kernel), null for docs with < 2 tokens.
   *
   * Scale shape: the bigram table explodes once; counts are two
   * partial/final aggregates (map-side combine); the per-bigram NLL is
   * derived on the VOCAB-sized count tables first (bigram-vocab join
   * prev-vocab), so the corpus-sized exploded table takes exactly ONE
   * equi-join against (prev, w, nll) — AQE-skew-splittable where a
   * naive per-row join against both count tables would shuffle the
   * corpus twice. Stopword-headed bigrams make hot keys; AQE splits
   * them (joins are splittable; windows would not be).
   */
  def lmCrossEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val internal = Seq("_toks", "_p", "_w", "_cb", "_cp", "_nll")
    require(!internal.contains(idCol),
      s"idCol '$idCol' collides with an internal alias of lmCrossEntropy")
    val toks = df.select(col(idCol),
      graft.functions.TextFunctions.tokens(col(textCol)).as("_toks"))
    val bi = toks
      .filter(size(col("_toks")) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("_toks"), lit(1), size(col("_toks")) - 1),
        slice(col("_toks"), lit(2), size(col("_toks")) - 1),
        (a, b) => struct(a.as("_p"), b.as("_w")))).as("_bi"))
      .select(col(idCol), col("_bi._p").as("_p"), col("_bi._w").as("_w"))
    val cb = bi.groupBy(col("_p"), col("_w")).agg(count(lit(1)).as("_cb"))
    val cp = cb.groupBy(col("_p")).agg(sum(col("_cb")).as("_cp"))
    val nll = cb.join(cp, Seq("_p")).select(col("_p"), col("_w"),
      (-log(col("_cb").cast("double") / col("_cp"))).as("_nll"))
    val scored = bi.join(nll, Seq("_p", "_w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("_nll")) / count(lit(1)), 4).as("xent"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("xent"))
  }

  /**
   * Incremental-corpus snapshot diff: classify every document id across
   * two corpus snapshots as `added` (only in `current`), `removed`
   * (only in `previous`), `changed` (in both, content differs) or
   * `unchanged` — the refresh-planning primitive of an incremental
   * training-data pipeline (re-process only `added`+`changed`, retire
   * `removed` from the index).
   *
   * Scale shape: both sides project to (id, xxhash64(content)) BEFORE
   * the full-outer join, so the shuffle ships 16 bytes per doc instead
   * of document bodies — at 100 TB the join is two column-pruned scans
   * plus an id-keyed exchange of ~nothing. Content equality is by
   * xxhash64 (the same 2^-64-per-pair collision trade as the segment
   * pipelines: a collision misclassifies one changed doc as unchanged).
   * Output: (`idCol`, status).
   */
  def snapshotDiff(previous: DataFrame, current: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    val prev = previous.select(col(idCol).as("_pid"),
      xxhash64(col(contentCol)).as("_ph"))
    val cur = current.select(col(idCol).as("_cid"),
      xxhash64(col(contentCol)).as("_ch"))
    prev.join(cur, col("_pid") === col("_cid"), "full_outer")
      .select(
        coalesce(col("_cid"), col("_pid")).as(idCol),
        when(col("_pid").isNull, "added")
          .when(col("_cid").isNull, "removed")
          .when(col("_ph") =!= col("_ch"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /**
   * Exact left-semi join with a bloom-filter pre-filter on the big side:
   * the result is EXACTLY `big.join(small, bigKey === smallKey,
   * "left_semi")`, but `big` is first filtered through a bloom filter of
   * the small side's keys, so rows that cannot match never enter the
   * join's shuffle. The bloom has no false negatives (every true match
   * survives the pre-filter) and the semi join removes its false
   * positives — exactness does not depend on `fpp`.
   *
   * Why this exists when Spark has runtime row-level filtering
   * (`spark.sql.optimizer.runtime.bloomFilter.*`): the built-in
   * `InjectRuntimeFilter` only fires when stats-based thresholds line up
   * (creation-side size estimate, selectivity heuristics) and silently
   * does nothing otherwise — on a 100 TB fact scan whose dim side is too
   * big to broadcast-hash-join but whose KEY SET fits a few MB of bloom
   * bits, this operator makes the filter deterministic and caller-sized.
   * The shape is the standard one: one pass over `small` builds the
   * filter (distributed partial blooms, bitwise-OR merge), the bits ship
   * to the big-side scan as a plan literal, and the scan-side test is a
   * codegen'd `might_contain` on `xxhash64(key)` — cheap enough to sit
   * inside the fact table's WholeStageCodegen span.
   *
   * Sizing: `expectedItems` defaults to `small.count()` (one cheap extra
   * job; pass the known key cardinality to skip it). Optimal bit count
   * for the target `fpp` is capped at `maxNumBits` — default 2^26 bits =
   * 8 MB, matching Spark's own runtime-filter ceiling (the aggregate
   * additionally clamps to the session's
   * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`/`maxNumItems`,
   * so raising the cap past the conf requires raising the conf too). The
   * bits ride the serialized plan to every task, hence broadcast-sized.
   * Past the cap the realized false-positive rate degrades gracefully
   * and only pre-filter EFFICIENCY suffers, never correctness. Null keys
   * never match an equi-join, so both sides drop them up front.
   */
  def bloomSemiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long = 0L, fpp: Double = 0.03,
      maxNumBits: Long = 1L << 26): DataFrame =
    bloomOf(small, smallKey, xxhash64(big(bigKey)),
        expectedItems, fpp, maxNumBits) match {
      case None => big.filter(lit(false)) // no keys -> empty semi join
      case Some(mightContain) =>
        big.filter(big(bigKey).isNotNull && mightContain)
          .join(small, big(bigKey) === small(smallKey), "left_semi")
    }

  /**
   * Exact left-anti join against a large blocklist — the
   * training-pipeline "remove every document whose key appears in the
   * removal list" shape when the list is broadcast-too-big. The result
   * is EXACTLY `big.join(small, bigKey === smallKey, "left_anti")`, but
   * rows the bloom proves ABSENT from the blocklist (no false negatives
   * — most of a 100 TB corpus, for any sane blocklist) are kept
   * map-side without entering any join; only the might-contain sliver
   * (true blocks + fpp of the rest) shuffles into the real anti join,
   * which settles the false positives.
   *
   * Cost shape: TWO pruned scans of `big` (the keep branch and the
   * maybe branch partition it exactly) instead of ONE scan + a
   * full-table shuffle — at wide-row 100 TB the shuffle is the
   * expensive half, and both scans push the same pruned columns. When
   * `small` broadcasts comfortably, prefer the plain anti join (zero
   * shuffle, one scan); this operator is for the blocklist that fits
   * megabytes of bloom bits but not a broadcast hash table. Null big
   * keys match nothing in an anti join, so they are kept outright;
   * sizing and caps as in [[bloomSemiJoin]].
   */
  def bloomAntiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long = 0L, fpp: Double = 0.03,
      maxNumBits: Long = 1L << 26): DataFrame =
    bloomOf(small, smallKey, xxhash64(big(bigKey)),
        expectedItems, fpp, maxNumBits) match {
      case None => big // empty blocklist removes nothing
      case Some(mightContain) =>
        val definiteKeep = big.filter(big(bigKey).isNull || !mightContain)
        val settled = big.filter(big(bigKey).isNotNull && mightContain)
          .join(small, big(bigKey) === small(smallKey), "left_anti")
        definiteKeep.union(settled)
    }

  /**
   * EXACT heavy hitters over a (possibly astronomically large) token
   * stream: every token whose count `cnt` satisfies
   * `cnt * supportDenom >= N` (N = total non-null tokens), with its
   * exact count. Two bounded-state passes, no full token shuffle:
   *
   *  1. a Misra-Gries summary ([[MisraGriesAggExpr]], O(capacity) state
   *     per task, `capacity` entries per partition over the exchange)
   *     produces a candidate set GUARANTEED to contain every token with
   *     count > N/(capacity+1) — a superset of the answer whenever
   *     `capacity >= supportDenom` (enforced);
   *  2. a second scan recounts ONLY the candidates (map-side semi-join
   *     against the broadcast ≤`capacity`-row candidate frame, then a
   *     tiny groupBy), and the in-plan total-count frame supplies the
   *     threshold.
   *
   * Contrast with `groupBy(token).count()`: that shuffles one row per
   * corpus token (~10^13 rows at 100 TB) to answer a question whose
   * output is a handful of rows. Here the exchange carries bounded
   * summaries and the recount streams map-side. Everything is a pure
   * plan — the candidate set never touches the driver.
   *
   * Reference scope: frequency analysis the reference has no operator
   * for; standard MG guarantee (Misra & Gries 1982; merge step per
   * Agarwal et al., PODS 2012).
   */
  def heavyHitters(tokens: DataFrame, tokenCol: String,
      supportDenom: Int = 100, capacity: Int = 128): DataFrame = {
    require(supportDenom >= 2, s"supportDenom must be >= 2, got $supportDenom")
    require(capacity >= supportDenom,
      s"capacity ($capacity) must be >= supportDenom ($supportDenom) for the " +
        "MG superset guarantee (count >= N/supportDenom implies count > N/(capacity+1))")
    val tok = col(tokenCol)
    // project down to the token column first: internal names below must
    // not collide with (or become ambiguous against) caller columns
    val tokOnly = tokens.filter(tok.isNotNull).select(tok)
    // one corpus scan: the MG summary and the total count in the same
    // aggregate; the total rides along on each (≤ capacity) candidate
    // row so the summary never computes twice
    val cands = tokOnly
      .agg(FreqFunctions.misraGries(tok, capacity).as("__hh_mg"),
        count(tok).as("__hh_n"))
      .select(explode(col("__hh_mg.token")).as(tokenCol), col("__hh_n"))
    // second scan: map-side broadcast filter to the candidates, tiny
    // groupBy, in-plan threshold — exact by the MG superset guarantee
    tokOnly
      .join(broadcast(cands), Seq(tokenCol))
      .groupBy(tok).agg(count(lit(1)).as("cnt"), first(col("__hh_n")).as("__hh_n"))
      .filter(col("cnt") * lit(supportDenom.toLong) >= col("__hh_n"))
      .select(tok, col("cnt"))
  }

  /** Build the bloom bits over `small`'s non-null `smallKey` set (one
    * distributed aggregation, partial blooms OR-merged) and return the
    * might-contain predicate for `probe`, or None when the key set is
    * empty. The bits are embedded as a plan literal — broadcast-sized by
    * the `maxNumBits` cap. */
  private def bloomOf(small: DataFrame, smallKey: String, probe: Column,
      expectedItems: Long, fpp: Double, maxNumBits: Long): Option[Column] = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    require(maxNumBits >= 64, s"maxNumBits must be >= 64, got $maxNumBits")
    val keys = small.select(col(smallKey)).filter(col(smallKey).isNotNull)
    val n = if (expectedItems > 0) expectedItems else keys.count()
    if (n == 0) return None
    // m = -n ln(p) / (ln 2)^2, the textbook optimum, then the plan-size cap
    val optimalBits = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val numBits = math.max(64L, math.min(optimalBits, maxNumBits))
    val bloomAgg = ColumnShim.column(new BloomFilterAggregate(
      ColumnShim.expression(xxhash64(col(smallKey))),
      Literal(n), Literal(numBits)).toAggregateExpression())
    val bytes = keys.agg(bloomAgg.as("_bf")).head().getAs[Array[Byte]](0)
    if (bytes == null) None // defensive: empty agg yields null bits
    else Some(ColumnShim.column(BloomFilterMightContain(
      Literal(bytes, BinaryType), ColumnShim.expression(probe))))
  }
}
