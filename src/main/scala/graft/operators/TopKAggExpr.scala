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

/**
 * Bounded top-k buffer: a binary heap of at most `k` (score, id) entries
 * with the WORST kept entry at the root, so a full heap evicts in O(log k).
 * "Better" means higher score when `largest` (ties to the lower id), lower
 * score otherwise — matching `ORDER BY score DESC|ASC, id ASC` exactly,
 * including NaN placement (java.lang.Double.compare, where NaN is greater
 * than any value, is the same total order Spark's sort uses for doubles).
 */
private[graft] final class TopKBuffer(val k: Int, val largest: Boolean) {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  /** Is (s1, i1) strictly worse (evicted before) (s2, i2)? */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val cmp = java.lang.Double.compare(s1, s2)
    if (cmp != 0) { if (largest) cmp < 0 else cmp > 0 }
    else i1 > i2
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i // index of the worst among i and its children
      if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      swap(i, w)
      i = w
    }
  }

  def insert(score: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown()
    }
  }

  /** Entries sorted best-first (the final per-group rank order). */
  def sortedBestFirst: Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    // best-first == reverse of the heap's worse-first order
    out.sortWith((a, b) => worse(b._1, b._2, a._1, a._2))
  }
}

/**
 * Bounded exact top-k as a native [[TypedImperativeAggregate]]: per group,
 * the `k` entries with the best `score` (ties to the lower `id`), returned
 * best-first as `array<struct<id, score>>`.
 *
 * This replaces the `row_number().over(Window.partitionBy(group))` ranking
 * shape, which funnels ALL of a group's candidate rows into one task for a
 * full sort — a multi-GB single-task sort per query at 100 TB corpus scale.
 * Here Spark's partial aggregation keeps a size-k heap per group per task
 * (O(k) memory, O(log k) per row map-side), and the exchange carries only
 * k-entry buffers; the merge is O(k log k). Same pattern as
 * [[SkylineAggExpr]]: only bounded buffers ever cross the wire.
 */
case class TopKAggExpr(
    score: Expression,
    id: Expression,
    k: Int,
    largest: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult = (score.dataType, id.dataType) match {
    case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (s, i) => TypeCheckResult.TypeCheckFailure(
      s"topk_agg requires (double score, bigint id) inputs, got ($s, $i)")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, largest)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null) buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.size) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedBestFirst.map { case (s, id) =>
      new GenericInternalRow(Array[Any](id, s)): AnyRef
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k, largest)
    var i = 0
    // entries arrive heap-ordered from a valid buffer; re-inserting
    // preserves the invariant regardless of order
    while (i < n) { val s = bb.getDouble(); val id = bb.getLong(); buf.insert(s, id); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggExpr =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "topk_agg"
}

object TopKFunctions {
  /** Column API for [[TopKAggExpr]] — `score` must be double, `id` bigint.
    * Returns `array<struct<id, score>>` sorted best-first. */
  def topKByScore(score: Column, id: Column, k: Int, largest: Boolean = true): Column =
    ColumnShim.column(TopKAggExpr(
      ColumnShim.expression(score), ColumnShim.expression(id), k, largest)
      .toAggregateExpression())
}
