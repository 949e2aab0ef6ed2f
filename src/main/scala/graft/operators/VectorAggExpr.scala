package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Running element-wise sum of fixed-dimension vectors. */
private[graft] final class VecSumBuffer {
  var count: Long = 0L
  var sums: Array[Double] = null

  def add(values: Array[Double]): Unit = {
    if (sums == null) sums = new Array[Double](values.length)
    else if (sums.length != values.length) throw new IllegalStateException(
      s"vector_avg saw ragged dimensions: ${sums.length} vs ${values.length} — " +
        "vector columns must be fixed-width")
    var i = 0
    while (i < values.length) { sums(i) += values(i); i += 1 }
    count += 1L
  }

  def mergeFrom(other: VecSumBuffer): Unit = {
    if (other.count > 0) {
      if (sums == null) { sums = other.sums.clone(); count = other.count }
      else {
        if (sums.length != other.sums.length) throw new IllegalStateException(
          s"vector_avg merge saw ragged dimensions: ${sums.length} vs ${other.sums.length}")
        var i = 0
        while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
        count += other.count
      }
    }
  }
}

/**
 * Element-wise mean of a vector column (`array<float|double>`) as a
 * native [[TypedImperativeAggregate]] — the centroid/mean-pooling
 * primitive (per-cluster centroids, per-class prototype embeddings,
 * sentence-from-token pooling).
 *
 * The built-in way to average arrays is `posexplode` -> groupBy(key,
 * pos) -> avg -> re-collect: it inflates every row by the vector width
 * (64x for these embeddings) and shuffles the inflated rows twice. Here
 * partial aggregation keeps ONE (count, double[dim]) buffer per group
 * per task and the exchange carries only those buffers — the same
 * only-bounded-state-crosses-the-wire design as [[SkylineAggExpr]] and
 * [[TopKAggExpr]].
 *
 * Null contract (matches the vector kernels in
 * `graft.functions.VectorExprs`): null vectors and vectors containing a
 * null element are skipped; ragged dimensions fail loudly (a silent
 * dim-mismatch would corrupt every centroid); an empty group yields
 * null.
 */
case class VectorAvgAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] {

  // resolved lazily: child.dataType is only legal after analysis
  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_avg requires array<float> or array<double>, got $other")
  }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val values = new Array[Double](n)
      var i = 0
      var clean = true
      while (clean && i < n) {
        if (arr.isNullAt(i)) clean = false
        else {
          values(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          i += 1
        }
      }
      if (clean) buf.add(values)
    }
    buf
  }

  override def merge(a: VecSumBuffer, b: VecSumBuffer): VecSumBuffer = {
    a.mergeFrom(b); a
  }

  override def eval(buf: VecSumBuffer): Any =
    if (buf.count == 0L) null
    else {
      val out = new Array[Any](buf.sums.length)
      var i = 0
      while (i < buf.sums.length) { out(i) = buf.sums(i) / buf.count; i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val dim = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(12 + dim * 8)
    bb.putLong(buf.count)
    bb.putInt(dim)
    var i = 0
    while (i < dim) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new VecSumBuffer
    buf.count = bb.getLong()
    val dim = bb.getInt()
    if (dim > 0) {
      buf.sums = new Array[Double](dim)
      var i = 0
      while (i < dim) { buf.sums(i) = bb.getDouble(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvgAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvgAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorAvgAggExpr =
    copy(child = newChildren(0))

  override def prettyName: String = "vector_avg"
}

/** Running second-moment accumulator: count, element-wise sum, and the
  * upper triangle of the sum of outer products (row-major, d*(d+1)/2
  * doubles) — everything a covariance/PCA fit needs in ONE pass. */
private[graft] final class GramBuffer {
  var count: Long = 0L
  var sums: Array[Double] = null // d
  var gram: Array[Double] = null // d*(d+1)/2 upper triangle, row-major

  def add(values: Array[Double]): Unit = {
    val d = values.length
    if (sums == null) { sums = new Array[Double](d); gram = new Array[Double](d * (d + 1) / 2) }
    else if (sums.length != d) throw new IllegalStateException(
      s"vector_gram saw ragged dimensions: ${sums.length} vs $d — " +
        "vector columns must be fixed-width")
    var i = 0
    var t = 0
    while (i < d) {
      sums(i) += values(i)
      var j = i
      while (j < d) { gram(t) += values(i) * values(j); j += 1; t += 1 }
      i += 1
    }
    count += 1L
  }

  def mergeFrom(other: GramBuffer): Unit = {
    if (other.count > 0) {
      if (sums == null) {
        sums = other.sums.clone(); gram = other.gram.clone(); count = other.count
      } else {
        if (sums.length != other.sums.length) throw new IllegalStateException(
          s"vector_gram merge saw ragged dimensions: ${sums.length} vs ${other.sums.length}")
        var i = 0
        while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
        var t = 0
        while (t < gram.length) { gram(t) += other.gram(t); t += 1 }
        count += other.count
      }
    }
  }
}

/**
 * Count + element-wise sum + upper-triangular sum-of-outer-products of a
 * vector column in ONE distributed pass — the sufficient statistics of a
 * covariance matrix (and therefore of a PCA fit): cov(i,j) =
 * gram(i,j)/n - mean(i)*mean(j). Output: struct(n, sum: array<double>,
 * gram: array<double> upper triangle row-major).
 *
 * 100 TB shape: the corpus never shuffles — each task folds its rows
 * into one (8 + 8d + 4d(d+1)) -byte buffer and only those buffers cross
 * the exchange (d=64 embeddings: ~17 KB per task). The alternative
 * (posexplode to (i, j, v_i*v_j) rows and groupBy) inflates every row
 * d^2/2-fold before a corpus-sized shuffle. Same null contract as
 * [[VectorAvgAggExpr]]: null vectors / null elements skipped, ragged
 * dimensions fail loudly, empty input evals to null.
 */
case class VectorGramAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] {

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_gram requires array<float> or array<double>, got $other")
  }

  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sum", ArrayType(DoubleType, containsNull = false)),
    StructField("gram", ArrayType(DoubleType, containsNull = false))))

  override def createAggregationBuffer(): GramBuffer = new GramBuffer

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val values = new Array[Double](n)
      var i = 0
      var clean = true
      while (clean && i < n) {
        if (arr.isNullAt(i)) clean = false
        else {
          values(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          i += 1
        }
      }
      if (clean) buf.add(values)
    }
    buf
  }

  override def merge(a: GramBuffer, b: GramBuffer): GramBuffer = {
    a.mergeFrom(b); a
  }

  override def eval(buf: GramBuffer): Any =
    if (buf.count == 0L) null
    else InternalRow(buf.count,
      new GenericArrayData(buf.sums.map(x => x: Any)),
      new GenericArrayData(buf.gram.map(x => x: Any)))

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val dim = if (buf.sums == null) 0 else buf.sums.length
    val tri = if (buf.gram == null) 0 else buf.gram.length
    val bb = ByteBuffer.allocate(16 + (dim + tri) * 8)
    bb.putLong(buf.count)
    bb.putInt(dim)
    bb.putInt(tri)
    var i = 0
    while (i < dim) { bb.putDouble(buf.sums(i)); i += 1 }
    i = 0
    while (i < tri) { bb.putDouble(buf.gram(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new GramBuffer
    buf.count = bb.getLong()
    val dim = bb.getInt()
    val tri = bb.getInt()
    if (dim > 0) {
      buf.sums = new Array[Double](dim)
      var i = 0
      while (i < dim) { buf.sums(i) = bb.getDouble(); i += 1 }
      buf.gram = new Array[Double](tri)
      i = 0
      while (i < tri) { buf.gram(i) = bb.getDouble(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorGramAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorGramAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorGramAggExpr =
    copy(child = newChildren(0))

  override def prettyName: String = "vector_gram"
}

object VectorAggFunctions {
  /** Column API for [[VectorAvgAggExpr]]: element-wise mean of an
    * `array<float|double>` column, returned as `array<double>`. */
  def vectorAvg(vec: Column): Column =
    ColumnShim.column(VectorAvgAggExpr(ColumnShim.expression(vec))
      .toAggregateExpression())

  /** Column API for [[VectorGramAggExpr]]: one-pass covariance
    * sufficient statistics struct(n, sum, gram-upper-triangle). */
  def vectorGram(vec: Column): Column =
    ColumnShim.column(VectorGramAggExpr(ColumnShim.expression(vec))
      .toAggregateExpression())
}
