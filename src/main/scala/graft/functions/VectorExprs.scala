package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expressions for the vector hot path. Spark's
 * higher-order functions (`zip_with` + `aggregate`) evaluate their
 * lambdas interpreted — measured ~30x slower than a fused loop on the
 * all-pairs cosine workload — so the dot product and squared norm are
 * implemented as codegen'd expressions: a tight primitive loop over
 * `ArrayData`, no boxing, fully inside whole-stage codegen.
 *
 * Both accept ANY numeric array natively — float/double/integral —
 * widening each element to double in the loop (bit-identical to casting
 * the array first, at half the memory bandwidth on the 100 TB-relevant
 * float-embedding path; integral reads are exact below 2^53). Null
 * arrays propagate null; an array containing a null ELEMENT makes the
 * result null too (a silent 0.0 would corrupt scores — the guard is
 * emitted only when the input type admits nulls), and a dot of vectors
 * with DIFFERENT lengths is null (a truncated dot over full norms would
 * be a wrong-but-plausible cosine).
 */
private[graft] object VecGen {
  import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

  /** Per-element read widened to double, by declared element type
    * (codegen form). Integral reads are exact below 2^53. */
  def get(arr: String, i: String, et: DataType): String = et match {
    case DoubleType => s"$arr.getDouble($i)"
    case FloatType => s"((double) $arr.getFloat($i))"
    case LongType => s"((double) $arr.getLong($i))"
    case IntegerType => s"((double) $arr.getInt($i))"
    case ShortType => s"((double) $arr.getShort($i))"
    case ByteType => s"((double) $arr.getByte($i))"
    case other => throw new IllegalStateException(s"unsupported vector element type $other")
  }

  /** Interpreted counterpart of [[get]]. */
  def getEval(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case other => throw new IllegalStateException(s"unsupported vector element type $other")
  }

  def elemType(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => et
    case _ => DoubleType
  }

  def elemsNullable(dt: DataType): Boolean = dt match {
    case ArrayType(_, n) => n
    case _ => false
  }

  /** Any numeric array the dot/norm kernels can read directly. */
  def vecType(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType | FloatType | LongType | IntegerType | ShortType | ByteType, _) =>
      true
    case _ => false
  }
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecGen.vecType(left.dataType) && VecGen.vecType(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two numeric-array inputs, " +
          s"got ${left.dataType} and ${right.dataType}")
    }

  @transient private lazy val lType = VecGen.elemType(left.dataType)
  @transient private lazy val rType = VecGen.elemType(right.dataType)
  @transient private lazy val anyElemNullable =
    VecGen.elemsNullable(left.dataType) || VecGen.elemsNullable(right.dataType)

  // Length contract (same rationale as the signature kernels): vectors of
  // DIFFERENT lengths dot to null — a truncated dot over full norms is a
  // wrong-but-plausible cosine with no signal.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (anyElemNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += VecGen.getEval(x, i, lType) * VecGen.getEval(y, i, rType)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck = if (anyElemNullable) {
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      } else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |double $s = 0.0;
         |if (!${ev.isNull}) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += ${VecGen.get(a, i, lType)} * ${VecGen.get(b, i, rType)};
         |  }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Sum of squared elements (squared L2 norm) of a numeric array. */
case class SquaredNorm(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecGen.vecType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"squared_norm requires a numeric-array input, got ${child.dataType}")

  @transient private lazy val eType = VecGen.elemType(child.dataType)
  @transient private lazy val elemNullable = VecGen.elemsNullable(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (elemNullable && x.isNullAt(i)) return null
      val v = VecGen.getEval(x, i, eType)
      s += v * v
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val nullCheck = if (elemNullable) {
        s"""if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      } else ""
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $v = ${VecGen.get(a, i, eType)};
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SquaredNorm =
    copy(child = newChild)
}

/**
 * Affine projection of a vector onto `k` axes in one pass:
 * `out[c] = sum_j v[j] * mat[c][j] - offset[c]` — the map-side apply
 * step of a PCA/whitening fit (mat = component rows, offset = the
 * centering term `mat . mean`, folded into one subtraction per output
 * coordinate so the input vector is never materialized centered). The
 * matrix rides along as a referenced object like
 * [[graft.functions.CentroidDistances]]'s centroids: identical codegen
 * source whatever the fitted values.
 *
 * Length contract (same as the other vector kernels): a vector whose
 * length differs from `dim` projects to NULL — a silently-truncated
 * projection would be a wrong-but-plausible embedding. Null elements
 * null the result.
 */
case class MatrixProject(child: Expression, matFlat: Array[Double],
    offsets: Array[Double], k: Int, dim: Int)
    extends UnaryExpression {

  require(matFlat.length == k * dim, "projection matrix shape mismatch")
  require(offsets.length == k, "offset shape mismatch")

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "matrix_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"matrix_project requires array<float|double> input, got $other")
  }

  @transient private lazy val eType = VecGen.elemType(child.dataType)
  @transient private lazy val elemNullable = VecGen.elemsNullable(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    if (elemNullable) {
      var j = 0
      while (j < dim) { if (arr.isNullAt(j)) return null; j += 1 }
    }
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val base = c * dim
      var s = 0.0
      var j = 0
      while (j < dim) { s += VecGen.getEval(arr, j, eType) * matFlat(base + j); j += 1 }
      out(c) = s - offsets(c)
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("mat", matFlat, "double[]")
    val offRef = ctx.addReferenceObj("off", offsets, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val out = ctx.freshName("out")
      val nullGuard = if (elemNullable) {
        s"""if (!${ev.isNull}) {
           |  for (int $j = 0; $j < $dim; $j++) {
           |    if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
           |  }
           |}""".stripMargin
      } else ""
      s"""
         |if ($a.numElements() != $dim) { ${ev.isNull} = true; }
         |$nullGuard
         |if (!${ev.isNull}) {
         |  double[] $out = new double[$k];
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $base = $c * $dim;
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $s += ${VecGen.get(a, j, eType)} * $matRef[$base + $j];
         |    }
         |    $out[$c] = $s - $offRef[$c];
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatrixProject =
    copy(child = newChild)
}

object VectorFunctions {
  private def e(c: Column): Expression = ColumnShim.expression(c)

  /** Column API for [[DotProduct]] — any numeric arrays, equal length. */
  def dot(a: Column, b: Column): Column = ColumnShim.column(DotProduct(e(a), e(b)))

  /** Column API for [[SquaredNorm]]. */
  def squaredNorm(a: Column): Column = ColumnShim.column(SquaredNorm(e(a)))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(squaredNorm(a))

  /** Column API for [[MatrixProject]] — project a fp vector onto the
    * rows of `mat` with per-row affine offsets. */
  def matrixProject(vec: Column, mat: Array[Array[Double]],
      offsets: Array[Double]): Column =
    ColumnShim.column(MatrixProject(e(vec), mat.flatten, offsets,
      mat.length, mat.head.length))
}
