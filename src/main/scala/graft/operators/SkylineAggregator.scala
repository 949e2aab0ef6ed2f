package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import graft.core.SkylineCore

/**
 * The skyline operator as a typed Spark [[Aggregator]].
 *
 * This single aggregator replaces the reference's entire two-stage
 * Kafka-relayed topology (`/root/reference/src/jobs/batch_job.py:96-208`):
 * Spark's partial aggregation runs `reduce` map-side per task — exactly
 * the reference's "local skyline" stage — and `merge` combines partial
 * skylines at the final (single-group or per-key) reducer — exactly the
 * reference's "global skyline" stage. No Kafka hop, no Python UDF, no
 * driver-side merge, and crucially no `collect_list` materialization of
 * whole partitions (the reference's OOM failure mode, report pp. 1-3):
 * the buffer only ever holds a skyline, which is small for low d.
 *
 * Input: one row = one point as `Seq[Double]` (the caller packs the
 * dimension columns with `array(...)`). Output: the skyline as
 * `Seq[Seq[Double]]`, sorted lexicographically for determinism.
 */
class SkylineAggregator(minDir: Array[Boolean])
    extends Aggregator[Seq[Double], ArrayBuffer[Array[Double]], Seq[Seq[Double]]] {

  override def zero: ArrayBuffer[Array[Double]] = ArrayBuffer.empty

  override def reduce(buf: ArrayBuffer[Array[Double]], row: Seq[Double]): ArrayBuffer[Array[Double]] = {
    if (row != null) SkylineCore.insert(buf, row.toArray, minDir)
    buf
  }

  override def merge(
      a: ArrayBuffer[Array[Double]],
      b: ArrayBuffer[Array[Double]]): ArrayBuffer[Array[Double]] =
    SkylineCore.merge(a, b, minDir)

  override def finish(buf: ArrayBuffer[Array[Double]]): Seq[Seq[Double]] =
    buf.map(_.toSeq).sortBy(identity)(SkylineAggregator.lexOrdering).toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[Array[Double]]] =
    Encoders.kryo[ArrayBuffer[Array[Double]]]

  override def outputEncoder: Encoder[Seq[Seq[Double]]] =
    ExpressionEncoder[Seq[Seq[Double]]]()
}

object SkylineAggregator {
  val lexOrdering: Ordering[Seq[Double]] = (a: Seq[Double], b: Seq[Double]) => {
    var i = 0
    val n = math.min(a.length, b.length)
    var cmp = 0
    while (cmp == 0 && i < n) { cmp = java.lang.Double.compare(a(i), b(i)); i += 1 }
    if (cmp != 0) cmp else a.length - b.length
  }
}
