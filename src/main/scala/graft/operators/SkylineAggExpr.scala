package graft.operators

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

import graft.core.SkylineCore

/**
 * The skyline aggregate as a native [[TypedImperativeAggregate]] — the
 * production form of [[SkylineAggregator]].
 *
 * Versus the `functions.udaf`-wrapped typed Aggregator, this consumes
 * the dimension expressions directly per input row: no `array(...)`
 * column packing, no encoder round-trip, no `Seq[Double]` boxing —
 * `update` evaluates d child expressions into a primitive array and
 * runs the BNL insert. Spark still performs partial aggregation (the
 * reference's map-side local skylines) and merges buffers at the final
 * stage; only skyline buffers ever cross the wire, serialized as a
 * flat double payload.
 *
 * Output: array<array<double>> of the skyline points, sorted
 * lexicographically for determinism.
 */
case class SkylineAggExpr(
    dims: Seq[Expression],
    minDir: Array[Boolean],
    maxBuffer: Int = SkylineAggExpr.DefaultMaxBuffer,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Array[Double]]] {

  override def children: Seq[Expression] = dims

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(ArrayType(DoubleType, false), false)

  override def createAggregationBuffer(): ArrayBuffer[Array[Double]] = ArrayBuffer.empty

  /** The one genuine 100 TB risk of this aggregate (SURVEY §7): on high-d
    * or anti-correlated data the skyline itself — and therefore every
    * buffer — can approach the input size, and an executor dies with an
    * opaque OOM mid-shuffle. A bounded buffer turns that into an
    * immediate, diagnosable failure with remedies attached. */
  private def checkCap(buf: ArrayBuffer[Array[Double]]): ArrayBuffer[Array[Double]] = {
    if (buf.length > maxBuffer) {
      throw new IllegalStateException(
        s"skyline buffer exceeded $maxBuffer points (spark.graft.skyline.maxBufferPoints): " +
          "the Pareto frontier of this data is too large to aggregate safely — at high " +
          "dimensionality or on anti-correlated data the skyline approaches the input size. " +
          "Raise the cap if the result genuinely fits in executor memory, reduce dimensions, " +
          "or pre-filter; a result this size is rarely a useful frontier.")
    }
    buf
  }

  override def update(
      buf: ArrayBuffer[Array[Double]], input: InternalRow): ArrayBuffer[Array[Double]] = {
    val d = dims.length
    val p = new Array[Double](d)
    var i = 0
    while (i < d) {
      val v = dims(i).eval(input)
      if (v == null) return buf // reference drops rows with missing coords
      p(i) = v.asInstanceOf[Double]
      i += 1
    }
    SkylineCore.insert(buf, p, minDir)
    checkCap(buf)
  }

  override def merge(
      a: ArrayBuffer[Array[Double]],
      b: ArrayBuffer[Array[Double]]): ArrayBuffer[Array[Double]] =
    checkCap(SkylineCore.merge(a, b, minDir))

  override def eval(buf: ArrayBuffer[Array[Double]]): Any = {
    // Double.compare, not <: the IEEE operators are not a strict weak
    // order when NaN is present (NaN points are incomparable under
    // dominance, so they can reach the buffer) and TimSort would throw
    // "Comparison method violates its general contract!".
    val ord: Ordering[Array[Double]] = (x: Array[Double], y: Array[Double]) => {
      var i = 0
      var cmp = 0
      while (cmp == 0 && i < x.length) { cmp = java.lang.Double.compare(x(i), y(i)); i += 1 }
      cmp
    }
    val sorted = buf.sorted(ord)
    new GenericArrayData(sorted.map(p => new GenericArrayData(p): ArrayData).toArray)
  }

  override def serialize(buf: ArrayBuffer[Array[Double]]): Array[Byte] = {
    val d = dims.length
    val bb = ByteBuffer.allocate(8 + buf.length * d * 8)
    bb.putInt(buf.length).putInt(d)
    buf.foreach(p => p.foreach(bb.putDouble))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Array[Double]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val d = bb.getInt()
    val buf = new ArrayBuffer[Array[Double]](n)
    var i = 0
    while (i < n) {
      val p = new Array[Double](d)
      var j = 0
      while (j < d) { p(j) = bb.getDouble(); j += 1 }
      buf += p
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SkylineAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SkylineAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SkylineAggExpr =
    copy(dims = newChildren)

  override def prettyName: String = "skyline"
}

object SkylineAggExpr {
  /** Default buffer cap: 2^20 points. At d = 10 that is ~84 MB of doubles
    * in one buffer — near the ceiling of what a partial-aggregation
    * buffer should ever hold, and far beyond any frontier a user can
    * consume. Override per session with
    * `spark.graft.skyline.maxBufferPoints`. */
  val DefaultMaxBuffer: Int = 1 << 20

  /** Session-configured cap, read by the DataFrame/SQL entry points. */
  def configuredCap(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("spark.graft.skyline.maxBufferPoints")
      .map(_.toInt).getOrElse(DefaultMaxBuffer)
}
