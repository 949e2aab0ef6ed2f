package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Direction.Min
import graft.operators.SkylineOps._
import graft.streaming.SkylineStreaming

/** Structured-Streaming parity tests (reference batch_job/stream_job
  * shapes): one-shot drain == batch result; incremental micro-batches
  * refine the complete-mode skyline monotonically; the CSV wire format
  * decodes like the reference's Kafka payload. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val dims = Seq("l_extendedprice" -> Min, "l_discount" -> Min)

  test("one-shot streaming skyline equals batch skyline (trigger-once parity)") {
    val dir = "/root/testdata/sf0.001"
    val batchDf = spark.read.parquet(s"$dir/lineitem.parquet")
    val stream = spark.readStream.schema(batchDf.schema)
      .option("pathGlobFilter", "lineitem.parquet").parquet(dir)
    val got = SkylineStreaming.runOnce(
      SkylineStreaming.skylineStream(stream, dims), "stream_once_test")
      .collect().map(_.toSeq).toSet
    val want = batchDf.skyline(dims).collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("incremental micro-batches: complete-mode skyline refines to the union") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-stream-in").toFile
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toFile

    // batch 1: CSV lines in the reference's wire format
    Files.write(new java.io.File(inDir, "b1.csv").toPath,
      "5,5\n3,7\n9,9\n".getBytes)
    val raw = spark.readStream.text(inDir.getAbsolutePath)
    val pts = SkylineStreaming.fromCsvPayload(raw, "x1 INT, x2 INT")
    val sky = SkylineStreaming.skylineStream(pts, Seq("x1" -> Min, "x2" -> Min))
    val q = sky.writeStream.format("memory").queryName("stream_inc_test")
      .outputMode("complete")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("stream_inc_test").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(after1 == Set((5, 5), (3, 7)))

      // batch 2 arrives: (4,4) dominates (5,5); (1,9) extends the frontier
      Files.write(new java.io.File(inDir, "b2.csv").toPath,
        "4,4\n1,9\n7,7\n".getBytes)
      q.processAllAvailable()
      val after2 = spark.table("stream_inc_test").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(after2 == Set((4, 4), (3, 7), (1, 9)))
    } finally q.stop()
  }

  test("JSON skyline-relay payload decodes like the reference stage-2 input") {
    import spark.implicits._
    val raw = Seq("""[{"x1":1,"x2":2},{"x1":3,"x2":4}]""").toDF("value")
    val got = SkylineStreaming.fromJsonSkylinePayload(raw, "x1 INT, x2 INT")
      .collect().map(_.toSeq).toSet
    assert(got == Set(Seq(1, 2), Seq(3, 4)))
  }

  test("GridHint is rejected on streams (needs batch occupancy pre-pass)") {
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/lineitem.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/lineitem.parquet")
    intercept[IllegalArgumentException] {
      SkylineStreaming.skylineStream(stream, dims, hint = graft.operators.GridHint(4))
    }
  }
}
