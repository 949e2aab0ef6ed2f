package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact edit-distance join (entity resolution / dirty-catalog matching):
 * all (left, right) pairs with `levenshtein(leftText, rightText) <=
 * maxDistance`, computed WITHOUT the cross join.
 *
 * Candidate generation is the ed-join shape (positional q-gram prefix
 * filtering — Gravano et al., VLDB 2001; Xiao et al., "Ed-Join", VLDB
 * 2008), which is LOSSLESS, so the verified output is exactly the
 * brute-force answer:
 *
 *  - a string of length L has G = L-q+1 positional q-grams; an edit
 *    destroys at most q of them and shifts surviving positions by at
 *    most d = maxDistance, so ed(s1,s2) <= d implies s1 and s2 share
 *    >= max(L1,L2)-q+1-d*q grams at position offset <= d;
 *  - therefore any d*q+1 grams of s1 (we pick the RAREST under the
 *    right-side gram-frequency order — pure efficiency, any choice is
 *    correct) must contain at least one such shared gram: suppressing
 *    the other G-(d*q+1) grams suppresses fewer grams than the match
 *    uses. Probing the full right positional gram index with only the
 *    prefix grams, with the |p1-p2| <= d and |L1-L2| <= d filters,
 *    yields a candidate superset;
 *  - candidates are settled by banded `levenshtein(_, _, maxDistance)`
 *    (O(d*min(L1,L2)) per pair, never the full DP).
 *
 * Strings too short for the bound (left len < q*(d+1), where the gram
 * count can't force a shared gram) are routed to an explicit
 * length-banded nested-loop over the SHORT slivers of both sides —
 * exact, and bounded because both slivers live in a fixed length class;
 * a loud row-product cap guards the pathological corpus that is mostly
 * sub-gram-length strings (lower q if it trips).
 *
 * Scale shape: explode + one gram-frequency aggregate + an equi-join on
 * gram — no shuffle carries more than the gram index (O(total chars)),
 * the per-left prefix window partitions by left id (group size = one
 * string's grams, bounded by string length), and the verify sliver is
 * |candidates|. Intended for short-string columns (names, titles);
 * per-gram `substr` makes gram extraction O(L^2) on long documents —
 * use [[Dedup.editDistancePairs]]'s shingle candidates there instead.
 */
object FuzzyJoin {

  /** Positional q-grams of `t` as array<struct<g,p>> (empty when the
    * string is shorter than q — `sequence` would wrap descending on an
    * empty range, so it is guarded). */
  private def posGrams(t: Column, len: Column, q: Int): Column =
    when(len >= q,
      transform(sequence(lit(1), len - lit(q - 1)),
        i => struct(t.substr(i, lit(q)).as("g"), i.as("p"))))
      .otherwise(array().cast("array<struct<g:string,p:int>>"))

  /**
   * @return (id1, id2, edit_dist) — every pair with edit distance
   *         <= `maxDistance`, exact. Ids are cast to long; null texts
   *         never match.
   *
   * EAGER, like [[Dedup.jaccardPairs]]: the prepared inputs and the
   * positional gram index feed multiple plan branches (index build,
   * frequency ranking, candidate probe, verify joins), so they are
   * cached for the call's scope, the result is materialized while they
   * are live, and the caches are released before returning. The
   * returned qualifying-pair set stays PERSISTED — callers that loop
   * should `unpersist()` each result when done with it.
   */
  def edJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftText: String, rightId: String, rightText: String,
      maxDistance: Int, q: Int = 2,
      shortPairCap: Long = 100000000L): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    require(q >= 1, s"q must be >= 1, got $q")
    val d = maxDistance
    val minSafeLen = q * (d + 1) // left len >= this makes the prefix bound binding

    // cached: each side feeds its gram branch, a verify join, the short
    // sliver, and the sliver-count guard — without the cache the full
    // upstream lineage re-executes per branch (the r7 q_fuzzy_join cost:
    // roughly half the 11.7 s was recomputation)
    val l = left.filter(col(leftText).isNotNull)
      .select(col(leftId).cast("long").as("id1"), col(leftText).as("t1"),
        length(col(leftText)).as("len1"))
      .cache()
    val r = right.filter(col(rightText).isNotNull)
      .select(col(rightId).cast("long").as("id2"), col(rightText).as("t2"),
        length(col(rightText)).as("len2"))
      .cache()

    // full positional gram index over every right string that has grams;
    // cached — it feeds BOTH the gram-frequency aggregate and the
    // candidate probe join (two scans of an exploded O(total chars)
    // frame without it)
    val rIdx = r.filter(col("len2") >= q)
      .select(col("id2"), col("len2"),
        explode(posGrams(col("t2"), col("len2"), q)).as("gp"))
      .select(col("id2"), col("len2"), col("gp.g").as("g"), col("gp.p").as("p2"))
      .cache()
    val gramDf = rIdx.groupBy("g").agg(count(lit(1)).as("gdf"))

    // left prefixes: the d*q+1 rarest grams per left string (rarity =
    // right-index frequency; grams absent from the index sort first and
    // can only shrink the probe). The window partitions by left id —
    // group size is one string's gram count, never a hot key.
    val lGrams = l.filter(col("len1") >= minSafeLen)
      .select(col("id1"), col("len1"),
        explode(posGrams(col("t1"), col("len1"), q)).as("gp"))
      .select(col("id1"), col("len1"), col("gp.g").as("g"), col("gp.p").as("p1"))
    val lPrefix = lGrams
      .join(gramDf, Seq("g"), "left")
      .na.fill(0L, Seq("gdf"))
      .withColumn("_rk", row_number().over(Window.partitionBy(col("id1"))
        .orderBy(col("gdf").asc, col("g").asc, col("p1").asc)))
      .filter(col("_rk") <= d * q + 1)

    val candidates = lPrefix.join(rIdx, Seq("g"))
      .filter(abs(col("p1") - col("p2")) <= d &&
        abs(col("len1") - col("len2")) <= d)
      .select(col("id1"), col("id2")).distinct()

    val verifiedLong = candidates
      .join(l.select(col("id1"), col("t1")), Seq("id1"))
      .join(r.select(col("id2"), col("t2")), Seq("id2"))
      .withColumn("edit_dist", levenshtein(col("t1"), col("t2"), d))
      .filter(col("edit_dist") >= 0)
      .select(col("id1"), col("id2"), col("edit_dist"))

    // short-string fallback: |len1-len2| <= d confines both sides to a
    // fixed length class; exact nested loop over the slivers only.
    // Both sliver counts come from ONE aggregate job over the cached
    // length projections (the r7 version ran two eager count() actions,
    // each re-executing the full upstream lineage).
    val sliverCounts = l.select(col("len1").as("_len"), lit(0).as("_side"))
      .unionByName(r.select(col("len2").as("_len"), lit(1).as("_side")))
      .agg(
        sum(when(col("_side") === 0 && col("_len") < minSafeLen, 1L)
          .otherwise(0L)).as("nl"),
        sum(when(col("_side") === 1 && col("_len") < minSafeLen + d, 1L)
          .otherwise(0L)).as("nr"))
      .head()
    val nLShort = sliverCounts.getLong(0)
    val nRShort = sliverCounts.getLong(1)
    // overflow-safe product guard: nLShort * nRShort can wrap negative
    // past ~3e9 x 3e9 and silently bypass the cap
    if (nLShort > 0L && nRShort > shortPairCap / nLShort) {
      Seq(l, r, rIdx).foreach(_.unpersist(blocking = false))
      throw new IllegalArgumentException(
        s"fuzzy join short-string fallback would compare $nLShort x $nRShort " +
          s"pairs (> cap $shortPairCap): most strings are shorter than " +
          s"q*(maxDistance+1) = $minSafeLen chars — lower q (or raise " +
          "shortPairCap if the cross product is intended)")
    }
    val out =
      if (nLShort == 0L) verifiedLong
      else {
        val lShort = l.filter(col("len1") < minSafeLen)
        val rShort = r.filter(col("len2") < minSafeLen + d)
        val verifiedShort = lShort
          .join(rShort, abs(col("len1") - col("len2")) <= d)
          .withColumn("edit_dist", levenshtein(col("t1"), col("t2"), d))
          .filter(col("edit_dist") >= 0)
          .select(col("id1"), col("id2"), col("edit_dist"))
        verifiedLong.unionByName(verifiedShort)
      }
    // materialize the qualifying pairs while the caches are live, then
    // release them — the jaccardPairs materializeThenRelease discipline
    val cached = out.persist()
    try cached.count()
    catch { case t: Throwable => cached.unpersist(blocking = false); throw t }
    finally Seq(l, r, rIdx).foreach(_.unpersist(blocking = false))
    cached
  }
}
