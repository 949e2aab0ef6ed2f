package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Bounded Misra-Gries frequent-items summary over string keys.
 *
 * Invariant (the MG guarantee): after processing a stream of N items,
 * every key with true count > N / (capacity + 1) is present in the
 * summary, and each kept key's stored count undercounts its true count
 * by at most N / (capacity + 1). The summary is MERGEABLE (Agarwal et
 * al., "Mergeable Summaries", PODS 2012): combining two summaries and
 * re-shrinking to `capacity` preserves the same guarantee over the
 * union of the streams — which is exactly what Spark's partial/final
 * aggregation needs: O(capacity) state per task, only bounded buffers
 * cross the exchange, regardless of corpus size.
 */
private[graft] final class MisraGriesBuffer(val capacity: Int) {
  // String keys (not UTF8String): eval-time UTF8Strings may alias the
  // scanner's reused row buffer, so they are copied on entry anyway —
  // and String gives a stable hashCode/equals for the HashMap.
  val counts = new java.util.HashMap[String, Long](capacity * 2)

  def add(key: String, weight: Long): Unit = {
    val cur = counts.get(key)
    if (cur != 0L || counts.containsKey(key)) {
      counts.put(key, cur + weight)
    } else if (counts.size < capacity) {
      counts.put(key, weight)
    } else {
      // full, new key: the classic MG decrement-all step. The net
      // effect of "insert w then decrement min(w, current minimum)
      // from everything" is applied in one pass.
      decrementAll(weight, key)
    }
  }

  /** Insert (key, w) into a full buffer: subtract d = min over the
    * buffer+newcomer of what can be absorbed, drop non-positives. This
    * is the batched form of w repetitions of the unit MG step. */
  private def decrementAll(weight: Long, key: String): Unit = {
    var minC = weight
    val it0 = counts.values().iterator()
    while (it0.hasNext) { val c = it0.next(); if (c < minC) minC = c }
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nc = e.getValue - minC
      if (nc <= 0L) it.remove() else e.setValue(nc)
    }
    if (weight > minC) counts.put(key, weight - minC)
  }

  /** Merge another summary in, then shrink back to `capacity` by
    * subtracting the (capacity+1)-th largest count from every entry
    * (the mergeable-summaries shrink step). */
  def mergeIn(other: MisraGriesBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > capacity) {
      val arr = new Array[Long](counts.size)
      var i = 0
      val vs = counts.values().iterator()
      while (vs.hasNext) { arr(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(arr)
      // (capacity+1)-th largest = arr[size - capacity - 1] ascending
      val cut = arr(counts.size - capacity - 1)
      val es = counts.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        val nc = e.getValue - cut
        if (nc <= 0L) es.remove() else e.setValue(nc)
      }
    }
  }

  /** Entries sorted (count desc, key asc) — a deterministic order. */
  def sorted: Array[(String, Long)] = {
    val out = new Array[(String, Long)](counts.size)
    var i = 0
    val es = counts.entrySet().iterator()
    while (es.hasNext) { val e = es.next(); out(i) = (e.getKey, e.getValue); i += 1 }
    out.sortWith { case ((k1, c1), (k2, c2)) =>
      if (c1 != c2) c1 > c2 else k1 < k2
    }
  }
}

/**
 * Misra-Gries frequent-items as a native [[TypedImperativeAggregate]]:
 * returns `array<struct<token string, mg_count bigint>>` sorted
 * (count desc, token asc), at most `capacity` entries.
 *
 * This is the 100 TB shape for "which tokens are frequent": a full
 * `groupBy(token).count()` shuffles the ENTIRE exploded token stream
 * (per-token rows ≈ corpus token count ≈ 10^13 at 100 TB); the MG
 * summary reduces each task to a bounded map and ships `capacity`
 * entries per partition. Combined with an exact recount of the
 * candidate set ([[PipelineOps.heavyHitters]]) the final answer is
 * EXACT — MG's superset guarantee makes the recount lossless.
 */
case class MisraGriesAggExpr(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesBuffer] {

  require(capacity >= 1, s"misra_gries needs capacity >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string input, got $t")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("mg_count", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MisraGriesBuffer =
    new MisraGriesBuffer(capacity)

  override def update(buf: MisraGriesBuffer, input: InternalRow): MisraGriesBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: MisraGriesBuffer, b: MisraGriesBuffer): MisraGriesBuffer = {
    a.mergeIn(b)
    a
  }

  override def eval(buf: MisraGriesBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (k, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(k), c)): AnyRef
    })

  override def serialize(buf: MisraGriesBuffer): Array[Byte] = {
    val entries = buf.sorted
    var size = 4
    val bytes = entries.map { case (k, _) => k.getBytes("UTF-8") }
    bytes.foreach(b => size += 4 + b.length + 8)
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(entries(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new MisraGriesBuffer(capacity)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val kb = new Array[Byte](len)
      bb.get(kb)
      val c = bb.getLong()
      buf.counts.put(new String(kb, "UTF-8"), c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAggExpr =
    copy(child = newChildren(0))

  override def prettyName: String = "misra_gries"
}

object FreqFunctions {
  /** Column API for [[MisraGriesAggExpr]] — `token` must be string.
    * Returns `array<struct<token, mg_count>>`, at most `capacity`
    * entries, every key with true count > N/(capacity+1) guaranteed
    * present. */
  def misraGries(token: Column, capacity: Int): Column =
    ColumnShim.column(MisraGriesAggExpr(
      ColumnShim.expression(token), capacity).toAggregateExpression())
}
