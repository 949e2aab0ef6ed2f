package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Watermarked event-time windowed aggregation — the canonical Structured
 * Streaming analytics shape (`readStream → withWatermark → groupBy(
 * window(...)) → agg`). Spark keeps one state row per open (window, key)
 * group; the watermark bounds that state by evicting windows older than
 * `max(event time) - delay`, which is what makes the operator runnable
 * forever on an unbounded stream — without it, state grows with every
 * window ever seen.
 *
 * Output-mode semantics (caller's choice at the sink):
 *  - `append`: a window emits ONCE, when the watermark passes its end —
 *    exactly-once per window, but windows still open when a bounded run
 *    drains are never emitted;
 *  - `update`/`complete`: windows re-emit as they refine; `complete`
 *    with a bounded drain reproduces the batch groupBy exactly (how the
 *    oracle-gated query below runs).
 */
object EventStreams {

  /**
   * @param tsCol event-time column — must already be TimestampType
   *   (convert epoch-nanos longs with `timestamp_micros(ts div 1000)`
   *   upstream; dividing by 1e9 in double would quantize near window
   *   boundaries for post-2001 epochs, ~1.8e18 ns > 2^53)
   * @param watermarkDelay how long to admit late events, e.g. "1 hour" —
   *   also the state-retention bound per open window
   * @param slideDuration None = tumbling; Some(s) = sliding (each event
   *   lands in windowDuration/s windows)
   * @param keyCols extra grouping keys beside the time window
   * @param aggs at least one aggregate column, pre-aliased
   */
  def windowedAgg(
      stream: DataFrame, tsCol: String, watermarkDelay: String,
      windowDuration: String, slideDuration: Option[String] = None,
      keyCols: Seq[String] = Nil, aggs: Seq[Column]): DataFrame = {
    require(stream.isStreaming, "windowedAgg expects a streaming DataFrame")
    require(aggs.nonEmpty, "windowedAgg needs at least one aggregate")
    val win = slideDuration match {
      case Some(s) => window(col(tsCol), windowDuration, s)
      case None => window(col(tsCol), windowDuration)
    }
    stream.withWatermark(tsCol, watermarkDelay)
      .groupBy(win.as("window") +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Streaming gap-based sessionization via `session_window`: per key, an
   * event joins the current session iff it arrives within `gap` of the
   * session's last event — Spark merges the per-event windows
   * `[t, t+gap)` on overlap OR adjacency, so a new session opens only at
   * `t_new - t_last > gap` (strictly; exactly-gap spacing merges, the
   * same boundary as the batch lag formulation in `q_sessionize`,
   * asserted in StreamingSpec). The state row per OPEN session is bounded by the
   * watermark: once it passes `last event + gap`, the session can never
   * merge again and its state is dropped (append mode emits it exactly
   * then). `session.start` is exactly the first event's timestamp,
   * `session.end` the last's + gap.
   *
   * This is the streaming form of the batch lag/running-sum
   * sessionization (`q_sessionize`): a complete-mode drain produces the
   * same sessions, which is how the oracle gates it.
   */
  def sessionizeStream(
      stream: DataFrame, tsCol: String, watermarkDelay: String,
      gap: String, keyCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(stream.isStreaming, "sessionizeStream expects a streaming DataFrame")
    require(keyCols.nonEmpty, "sessionizeStream needs at least one key column " +
      "(a keyless global session would funnel every event into one state row)")
    require(aggs.nonEmpty, "sessionizeStream needs at least one aggregate")
    stream.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap).as("session") +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Streaming exact dedup with BOUNDED state
   * (`dropDuplicatesWithinWatermark`): the first event per key passes,
   * re-arrivals within `watermarkDelay` of it are dropped, and the key's
   * state is evicted once the watermark passes — so state holds only the
   * keys seen inside the watermark horizon, not every key ever
   * (a plain streaming `dropDuplicates` grows forever on a 100 TB
   * keyspace; that unbounded form exists for reference parity in
   * [[SkylineStreaming.skylineStream]]'s dedup flag). A key re-appearing
   * AFTER eviction passes again — the dedup guarantee is exactly-once
   * per key per watermark horizon, the standard at-scale trade.
   */
  def dedupStream(
      stream: DataFrame, keyCols: Seq[String], tsCol: String,
      watermarkDelay: String): DataFrame = {
    require(stream.isStreaming, "dedupStream expects a streaming DataFrame")
    require(keyCols.nonEmpty, "dedupStream needs at least one key column")
    stream.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  /**
   * Watermarked stream-stream interval join — the streaming attribution
   * shape (purchase stream joined to the same user's view stream within a
   * time window). Both sides are watermarked and the join carries an
   * event-time range condition; together those let Spark bound the join
   * STATE: a buffered left row can be dropped once the right watermark
   * passes `leftTs + lookAhead`, and vice versa — without them an inner
   * stream-stream join must buffer both streams forever. Inner matches
   * emit as soon as both rows have arrived (no watermark wait), so a
   * bounded drain emits exactly the batch join of the same inputs — which
   * is how the oracle gates this operator. Outer variants additionally
   * emit their null-padded rows only when the watermark proves no match
   * can still arrive; rows still inside the horizon when a bounded run
   * drains are never null-emitted.
   *
   * Join condition: for each key-equal pair,
   * `rightTs ∈ [leftTs - lookBehind, leftTs + lookAhead]`.
   *
   * Column names must be disjoint between the two sides (rename upstream
   * — the streaming state format keys both sides by position, and a
   * disjoint schema keeps the joined output unambiguous).
   */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      leftDelay: String, rightDelay: String,
      keyPairs: Seq[(String, String)],
      lookBehind: String, lookAhead: String,
      joinType: String = "inner"): DataFrame = {
    require(left.isStreaming && right.isStreaming,
      "intervalJoin expects two streaming DataFrames (use a plain join for batch)")
    require(keyPairs.nonEmpty,
      "intervalJoin needs at least one equi-key pair — a keyless interval join " +
        "buffers every row of each stream against every row of the other")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalJoin requires disjoint column names, both sides have: ${overlap.mkString(", ")}")
    val allowed = Set("inner", "left_outer", "leftouter", "right_outer", "rightouter")
    require(allowed.contains(joinType.toLowerCase),
      s"intervalJoin supports inner and one-sided outer joins, got '$joinType'")
    val l = left.withWatermark(leftTs, leftDelay)
    val r = right.withWatermark(rightTs, rightDelay)
    val keyCond = keyPairs.map { case (lk, rk) => l(lk) === r(rk) }.reduce(_ && _)
    val range =
      r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lookBehind") &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $lookAhead")
    l.join(r, keyCond && range, joinType)
  }
}
