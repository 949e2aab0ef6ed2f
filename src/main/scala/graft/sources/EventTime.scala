package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Event-time normalization across testdata generations.
 *
 * The `events.ts` column has shipped in two physical parquet encodings:
 *   - TIMESTAMP(NANOS), which Spark cannot represent natively and which
 *     `spark.sql.legacy.parquet.nanosAsLong=true` surfaces as a
 *     nanos-since-epoch `LongType`;
 *   - `timestamp[us]` (TIMESTAMP_NTZ or TIMESTAMP), Spark's native micros.
 *
 * Every consumer in this library does its event-time arithmetic in
 * nanos-since-epoch longs (exact integer math, engine-portable — the
 * DuckDB oracles use `epoch_ns(ts)` on their side). These helpers are the
 * single choke point that absorbs the physical encoding: a future
 * regeneration of the testdata changes ONE dispatch here, not eight
 * queries. Both representations carry micro precision end-to-end (DuckDB
 * loaded the old NANOS files at micros too), so results are identical
 * across generations.
 *
 * The session time zone must be UTC (all entry points pin it): a
 * TIMESTAMP_NTZ wall-clock is interpreted in the session zone when cast
 * to TIMESTAMP, and the oracles' `epoch_ns` treats naive timestamps as
 * UTC.
 */
object EventTime {

  /** `colName` as nanos-since-epoch (LongType), whatever the read type. */
  def tsNanos(df: DataFrame, colName: String = "ts"): Column = {
    requireUtc(df)
    df.schema(colName).dataType match {
      case LongType => col(colName) // legacy nanosAsLong read — already ns
      case TimestampType | TimestampNTZType =>
        // micros -> nanos is exact in Long until year ~2262
        unix_micros(col(colName).cast(TimestampType)) * lit(1000L)
      case other =>
        throw new IllegalArgumentException(
          s"column '$colName' has unsupported event-time type $other — " +
            "expected LongType (legacy nanos) or Timestamp/TimestampNTZ")
    }
  }

  /** `df` with `colName` replaced (in place, same position) by ns-longs. */
  def withTsNanos(df: DataFrame, colName: String = "ts"): DataFrame =
    df.withColumn(colName, tsNanos(df, colName))

  /** `df` plus a TimestampType column `to` (micro precision, UTC) derived
    * from `from` — the event-time column watermarks and windows need.
    * Works on streaming frames (pure schema dispatch, no action). */
  def withTsUtc(df: DataFrame, from: String = "ts",
      to: String = "ts_utc"): DataFrame = {
    requireUtc(df)
    val c = df.schema(from).dataType match {
      // integer `div`, not `/`: Column `/` promotes the ns-epoch long
      // (~1.8e18 > 2^53) to double, quantizing near boundaries
      case LongType => timestamp_micros(expr(s"`$from` div 1000"))
      case TimestampType | TimestampNTZType => col(from).cast(TimestampType)
      case other =>
        throw new IllegalArgumentException(
          s"column '$from' has unsupported event-time type $other")
    }
    df.withColumn(to, c)
  }

  private def requireUtc(df: DataFrame): Unit = {
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
    require(tz == "UTC",
      s"event-time normalization requires spark.sql.session.timeZone=UTC " +
        s"(got '$tz') — NTZ wall-clocks and the DuckDB oracles both assume it")
  }
}
