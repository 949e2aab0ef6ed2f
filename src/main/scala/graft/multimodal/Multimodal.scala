package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded media metadata produced by the (stubbed) image decoder. */
case class DecodedMedia(
    doc_id: Long,
    n_bytes: Long,
    width: Int,
    height: Int,
    format: String,
    mean_byte: Double)

/**
 * Multimodal-column plumbing: media as opaque `binary` columns with
 * typed metadata, decoded via partition-batched typed `mapPartitions`.
 *
 * The Spark side — schema, partitioning, the per-partition batch loop,
 * and the typed output contract — is real and tested. The *codec* is a
 * deterministic STUB (this container has no image/audio libraries): a
 * production deployment replaces `decodeStub` with a real decoder
 * (e.g. libjpeg/ffmpeg via JNI) without touching the dataflow, which is
 * the part that must survive 100 TB: binary payloads stay distributed,
 * are decoded once per partition batch, and never collect to the driver.
 */
object Multimodal {

  /** Fabricate a media table from any (id, text) table: the text bytes
    * stand in for an encoded image payload. */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("content"),
      lit("image").as("media_type"))

  /** STUB decoder: deterministic metadata derived from the payload bytes.
    * Replace with a real codec in production (`???` marks the boundary). */
  private def decodeStub(id: Long, bytes: Array[Byte]): DecodedMedia = {
    // real impl: val img = ImageIO.read(...) — unavailable here: ???
    val n = bytes.length.toLong
    // First *code point* of the decoded payload, not the first raw byte:
    // for multi-byte UTF-8 leaders the two diverge (0xC3 vs U+00E9) and
    // the arithmetic oracle works in code points.
    val first =
      if (bytes.isEmpty) 0
      else new String(bytes, 0, math.min(4, bytes.length),
        java.nio.charset.StandardCharsets.UTF_8).codePointAt(0) // 1 code point <= 4 bytes
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    DecodedMedia(
      doc_id = id,
      n_bytes = n,
      width = (64 + n % 577).toInt,
      height = (64 + (first * 7) % 577).toInt,
      format = (n % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" },
      mean_byte = if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** Decode a media table: typed mapPartitions over (doc_id, content)
    * batches — the shape a vectorized decode (Arrow batch / pandas-UDF
    * equivalent) takes in Scala Spark. */
  def decode(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch => batch.map { case (id, bytes) => decodeStub(id, bytes) } }
  }

  /**
   * Frame-sampling plan for video payloads (STUB codec, real dataflow):
   * derive a deterministic fake duration from the payload size, then
   * emit one row per sampled frame at `everyNthSec` spacing — the
   * explode-shaped output a real decoder (ffmpeg via JNI) would produce,
   * with frames staying distributed (never collected).
   */
  def frameSamplePlan(media: DataFrame, everyNthSec: Int): DataFrame = {
    require(everyNthSec > 0, s"everyNthSec must be positive, got $everyNthSec")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        // real impl: ffprobe duration + frame grab — unavailable here: ???
        val durationSec = 1 + (bytes.length % 120) // fake: up to 2 minutes
        (0 until durationSec by everyNthSec).map { t =>
          (id, t, durationSec, s"frame_${id}_$t") // handle, not pixels
        }
      }
      .toDF("doc_id", "frame_ts_sec", "duration_sec", "frame_ref")
  }

  /**
   * Feature-extraction plan (STUB model, real dataflow): one fixed-`dim`
   * Float vector per media row — the embedding-ready shape ANN/semantic
   * dedup consume downstream. The stub "model" is a `dim`-bucket byte
   * histogram, L1-normalized; a production deployment swaps in a real
   * encoder forward pass (ONNX/JNI) inside the same typed
   * `mapPartitions` batch loop without touching the dataflow: payloads
   * stay distributed, one model invocation scope per partition batch
   * (where a real impl amortizes model load), nothing collects.
   *
   * Float values are produced as double-divisions rounded to float
   * (`(c/n).toFloat`), so an engine computing in double and casting gets
   * the bit-identical float — the cross-engine parity device for the
   * mm_features oracle.
   */
  def featureExtract(media: DataFrame, dim: Int = 8): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // real impl: load the encoder ONCE here, run batched forward
        // passes — unavailable in this container: ???
        batch.map { case (id, bytes) =>
          val counts = new Array[Long](dim)
          var i = 0
          while (i < bytes.length) { counts((bytes(i) & 0xff) % dim) += 1; i += 1 }
          val n = bytes.length
          val feats =
            if (n == 0) new Array[Float](dim)
            else counts.map(c => (c.toDouble / n).toFloat)
          (id, feats)
        }
      }
      .toDF("doc_id", "features")
  }

  /** Resize step stub: recompute target dims preserving aspect ratio —
    * pure metadata arithmetic here; a real impl transforms pixels.
    * `carry` lists extra decoded-metadata columns to keep in the same
    * projection: at a real media scale the codec dominates the scan, so
    * downstream consumers must take everything they need from ONE decode
    * pass rather than self-joining the decoded frame (which re-evaluates
    * the `mapPartitions` codec per branch — Spark does not share
    * unmaterialized subplans). */
  def resizePlan(decoded: Dataset[DecodedMedia], maxSide: Int,
      carry: Seq[String] = Nil): DataFrame =
    decoded.toDF().select(
      Seq(col("doc_id"), col("width"), col("height"),
        least(lit(maxSide), col("width")).as("target_w"),
        // floor, not cast: Spark's double->int cast truncates while DuckDB's
        // rounds; floor agrees in both for the non-negative case.
        floor(least(lit(maxSide), col("width")) * col("height") / col("width"))
          .cast("int").as("target_h")) ++ carry.map(col): _*)
}
