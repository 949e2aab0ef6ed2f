package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators Spark lacks as built-ins: as-of (point-in-time)
 * join and bucketed interval/range join. Both are declared as plain
 * DataFrame compositions so Catalyst keeps pushdown/pruning, and both are
 * shaped for the 100 TB case: exactly one shuffle, no theta-join
 * (`BroadcastNestedLoopJoin`) fallback, no per-row driver work.
 */
object TemporalJoins {

  /**
   * As-of join (the "merge_asof" / point-in-time lookup): for every left
   * row, the single right row with the same `byCols` key and the nearest
   * `rightTimeCol` at-or-before (`direction = "backward"`) or at-or-after
   * (`"forward"`) the left row's `leftTimeCol`. Left-outer semantics:
   * unmatched left rows keep null right values. `tolerance` (same units
   * as the time columns, which must then be numeric) nulls out matches
   * further than the bound.
   *
   * Implementation is the scalable merge shape, not a join: both sides
   * are tagged and unioned, shuffled ONCE on `byCols`, and time-sorted
   * within each key partition; `last(_, ignoreNulls)` over the running
   * window carries the most recent right row onto each left row. That is
   * the exact cost profile of a dedicated as-of physical operator (one
   * exchange + one sort), with none of the range-condition pitfalls that
   * make naive `l.ts >= r.ts` joins plan as nested-loop. At equal
   * timestamps the right row IS visible to the left row (ties match,
   * like DuckDB's ASOF and pandas merge_asof defaults).
   *
   * Contracts:
   *  - `byCols` must be non-empty — it is the shuffle key; per-key data
   *    is sorted in one task, so keys must be granular enough to spread
   *    (at 100 TB: user/entity ids qualify; a single global key does not).
   *  - (`byCols`, `rightTimeCol`) should be unique on the right, or the
   *    winner among equal-timestamp right rows is tie-broken arbitrarily
   *    (any of them is a valid as-of answer, but reruns may differ).
   *  - `rightValueCols` must not collide with left column names — alias
   *    the right side first (self-as-of joins always need this).
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftTimeCol: String,
      rightTimeCol: String,
      byCols: Seq[String],
      rightValueCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(byCols.nonEmpty, "asofJoin requires at least one equi-key in byCols " +
      "(it is the shuffle key; an empty key would sort everything in one task)")
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    val valueCols = rightValueCols.distinct
    require(valueCols.nonEmpty, "asofJoin requires at least one right value column")
    val leftCols = left.columns.toSeq
    val clash = valueCols.toSet.intersect(leftCols.toSet)
    require(clash.isEmpty,
      s"right value columns collide with left columns: ${clash.mkString(", ")} — " +
        "alias the right side before joining")

    // the right payload travels as one struct so every carried column
    // comes from the SAME right row; __rt is the match's timestamp for
    // the tolerance bound
    val rvStruct = struct(valueCols.map(col) :+ col(rightTimeCol).as("__rt"): _*)
    val lrowStruct = struct(leftCols.map(col): _*)
    val rvType = right.select(rvStruct.as("_rv")).schema.head.dataType
    val lrowType = left.select(lrowStruct.as("_lrow")).schema.head.dataType

    val lTagged = left.select(
      byCols.map(col) ++ Seq(
        col(leftTimeCol).as("_t"), lit(1).as("_side"),
        lrowStruct.as("_lrow"), lit(null).cast(rvType).as("_rv")): _*)
    val rTagged = right.select(
      byCols.map(col) ++ Seq(
        col(rightTimeCol).as("_t"), lit(0).as("_side"),
        lit(null).cast(lrowType).as("_lrow"), rvStruct.as("_rv")): _*)
    require(lTagged.schema("_t").dataType == rTagged.schema("_t").dataType,
      s"time columns must share a type: left $leftTimeCol is " +
        s"${lTagged.schema("_t").dataType}, right $rightTimeCol is " +
        s"${rTagged.schema("_t").dataType}")

    // backward: scan forward in time, right rows first at equal t so ties
    // match; forward: scan backward in time, same tie placement
    val timeOrd = if (direction == "backward") col("_t").asc else col("_t").desc
    val w = Window.partitionBy(byCols.map(col): _*)
      .orderBy(timeOrd, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val matched = last(col("_rv"), ignoreNulls = true).over(w)
    val withMatch = lTagged.unionByName(rTagged)
      .withColumn("_m", matched)
      .filter(col("_side") === 1)
    val bounded = tolerance match {
      case None => withMatch
      case Some(tol) =>
        val dist = if (direction == "backward") col("_t") - col("_m.__rt")
                   else col("_m.__rt") - col("_t")
        withMatch.withColumn("_m",
          when(col("_m").isNotNull && dist <= lit(tol), col("_m")))
    }
    bounded.select(
      leftCols.map(c => col("_lrow").getField(c).as(c)) ++
        valueCols.map(c => col("_m").getField(c).as(c)): _*)
  }

  /**
   * Range (interval) join: every (point, interval) pair with
   * `lo <= point <= hi`, without an equi-key. Spark plans a raw
   * inequality join as `BroadcastNestedLoopJoin` — O(|points| x
   * |intervals|) and a hard wall once the interval side outgrows a
   * broadcast. This instead buckets time: points map to one bucket
   * (`point div bucketWidth`), intervals explode to every bucket they
   * overlap, and the match is a plain equi-join on the bucket followed
   * by the exact range filter. Each qualifying pair is produced exactly
   * once (a point lives in exactly one bucket).
   *
   * Cost: |intervals| inflates by ~(interval length / bucketWidth + 1),
   * so pick `bucketWidth` near the TYPICAL interval length — the classic
   * interval-bucketing trade (width >> intervals: buckets collapse and
   * the equi-join skews; width << intervals: the explode fans out).
   * Integer `div` bucketing keeps epoch-nanos exact (long division
   * through doubles would quantize above 2^53) and is sign-safe: any
   * monotone bucketing function works as long as both sides share it.
   *
   * Contracts: `pointCol`, `loCol`, `hiCol` are integral (epoch-nanos
   * longs here); column names of the two frames must be disjoint;
   * intervals with `hi < lo` are dropped (empty by definition).
   */
  def rangeJoinPoints(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals share column names: ${overlap.mkString(", ")} — " +
        "alias one side before joining")
    def bucket(c: String): Column = expr(s"`$c` div $bucketWidth")
    val p = points.withColumn("_pb", bucket(pointCol))
    val i = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("_pb", explode(sequence(bucket(loCol), bucket(hiCol))))
    p.join(i, "_pb")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_pb")
  }
}
