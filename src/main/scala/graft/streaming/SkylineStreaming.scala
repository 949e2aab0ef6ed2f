package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.core.Direction
import graft.operators.SkylineOps._
import graft.operators.{NoHint, PartitionHint}

/**
 * Structured-Streaming parity for the reference's streaming jobs
 * (`/root/reference/src/jobs/{batch_job,stream_job}.py`):
 *
 *  - the reference's "batch" job is a streaming query with
 *    `trigger(once=True)` draining a Kafka topic — here any streaming
 *    source (file, rate, Kafka) with `Trigger.AvailableNow` (the
 *    non-deprecated once-trigger);
 *  - the continuous job uses processing-time micro-batches with the
 *    global skyline aggregate in Complete output mode; the running
 *    skyline is re-emitted each micro-batch, monotonically refining —
 *    the same contract as the reference's complete-mode stage 2
 *    (`batch_job.py:196-205`);
 *  - like the reference, state is unbounded by design (no watermark
 *    exists in the reference; the skyline buffer is the state and it is
 *    small for low d).
 *
 * Partition hints: only hints that need no pre-pass action work on a
 * stream (NoHint; Dim/Angle with explicit bounds). GridHint's occupancy
 * prune requires a batch pre-pass and is rejected here.
 */
object SkylineStreaming {

  /** Decode the reference's CSV wire format (`batch_job.py:92-94`): a
    * `value` payload column of comma-separated coordinates. */
  def fromCsvPayload(raw: DataFrame, schemaDdl: String): DataFrame =
    raw.select(from_csv(col("value").cast("string"), structFromDdl(schemaDdl), Map.empty[String, String]).as("data"))
      .select("data.*")

  /** Decode the reference's JSON local-skyline relay format
    * (`batch_job.py:159-180`): a JSON array of point structs, exploded
    * back to rows. */
  def fromJsonSkylinePayload(raw: DataFrame, schemaDdl: String): DataFrame = {
    val pointSchema = structFromDdl(schemaDdl)
    raw.select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.ArrayType(pointSchema), Map.empty[String, String]).as("pts"))
      .select(explode(col("pts")).as("p"))
      .select("p.*")
  }

  private def structFromDdl(ddl: String) =
    org.apache.spark.sql.types.StructType.fromDDL(ddl)

  /** Streaming skyline: the same single-aggregate plan as the batch path
    * — Complete output mode is required by the global aggregate. */
  def skylineStream(
      stream: DataFrame,
      dims: Seq[(String, Direction)],
      hint: PartitionHint = NoHint,
      bounds: Option[Seq[(Double, Double)]] = None): DataFrame = {
    require(stream.isStreaming, "skylineStream expects a streaming DataFrame")
    hint match {
      case graft.operators.GridHint(_) =>
        throw new IllegalArgumentException(
          "GridHint needs a batch occupancy pre-pass; not available on streams")
      case graft.operators.DimHint(_) | graft.operators.AngleHint(_) =>
        require(bounds.isDefined || hint.isInstanceOf[graft.operators.AngleHint],
          "streaming DimHint requires explicit bounds (no pre-pass action on a stream)")
      case _ =>
    }
    stream.skyline(dims, hint, bounds)
  }

  /** Drain-the-source one-shot run into an in-memory table (the
    * reference's batch_job shape: streaming plan + once-trigger), and
    * return the materialized result. */
  def runOnce(result: DataFrame, queryName: String): DataFrame = {
    val spark = result.sparkSession
    val q = result.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
