package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.EventTime

/** Unit coverage for the event-time normalization choke point: the two
  * physical `ts` encodings must produce identical nanos and identical
  * event-time columns, and a non-UTC session must be rejected loudly
  * (NTZ wall-clocks silently shift under any other zone). */
class EventTimeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("legacy nanos-long passes through; timestamp converts to the identical nanos") {
    import spark.implicits._
    val us = 1735689600123456L // 2025-01-01T00:00:00.123456Z in micros
    val asLong = Seq(us * 1000L).toDF("ts") // legacy nanos encoding
    val asTs = Seq(us).toDF("_us")
      .select(timestamp_micros(col("_us")).as("ts")) // micros encoding
    val a = EventTime.withTsNanos(asLong).select("ts").head().getLong(0)
    val b = EventTime.withTsNanos(asTs).select("ts").head().getLong(0)
    assert(a == us * 1000L && b == us * 1000L,
      s"both encodings must normalize to the same nanos: $a vs $b")
    // schema contract: ts replaced in place, LongType either way
    assert(EventTime.withTsNanos(asTs).schema("ts").dataType.typeName == "long")
  }

  test("withTsUtc yields the identical TimestampType event-time for both encodings") {
    import spark.implicits._
    val us = 1735689600123456L
    val fromLong = EventTime.withTsUtc(Seq(us * 1000L).toDF("ts"))
      .select(col("ts_utc").cast("string")).head().getString(0)
    val fromTs = EventTime.withTsUtc(
        Seq(us).toDF("_us").select(timestamp_micros(col("_us")).as("ts")))
      .select(col("ts_utc").cast("string")).head().getString(0)
    assert(fromLong == fromTs && fromLong.startsWith("2025-01-01 00:00:00.123456"),
      s"$fromLong vs $fromTs")
  }

  test("unsupported column types and non-UTC sessions are rejected") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      EventTime.withTsNanos(Seq("not-a-time").toDF("ts"))
    }
    // a sibling session with a different zone must be refused: the
    // DuckDB oracles interpret naive timestamps as UTC, so silent
    // session-zone drift would shift every event time
    val shifted = spark.newSession()
    shifted.conf.set("spark.sql.session.timeZone", "America/New_York")
    val df = shifted.range(1).select(col("id").as("ts"))
    val e = intercept[IllegalArgumentException] {
      EventTime.withTsNanos(df)
    }
    assert(e.getMessage.contains("UTC"))
  }
}
