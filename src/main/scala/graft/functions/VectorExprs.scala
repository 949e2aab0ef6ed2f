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
 * Both accept `array<float>` AND `array<double>` natively (accumulation
 * is always double, so a float input produces bit-identical results to
 * casting it to array<double> first — float widens exactly — at half
 * the memory bandwidth on the 100 TB-relevant embedding path). Null
 * arrays propagate null; an array containing a null ELEMENT makes the
 * result null too (a silent 0.0 would corrupt scores — see the
 * element-null guard, emitted only when the input type admits nulls).
 */
private[functions] object VecGen {
  /** Per-element read widened to double, by declared element type. */
  def get(arr: String, i: String, et: DataType): String = et match {
    case FloatType => s"((double) $arr.getFloat($i))"
    case _ => s"$arr.getDouble($i)"
  }

  def getEval(arr: ArrayData, i: Int, float: Boolean): Double =
    if (float) arr.getFloat(i).toDouble else arr.getDouble(i)

  def floatElems(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def elemsNullable(dt: DataType): Boolean = dt match {
    case ArrayType(_, n) => n
    case _ => false
  }

  def vecType(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
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
        s"dot_product requires two array<float|double> inputs, " +
          s"got ${left.dataType} and ${right.dataType}")
    }

  @transient private lazy val lFloat = VecGen.floatElems(left.dataType)
  @transient private lazy val rFloat = VecGen.floatElems(right.dataType)
  @transient private lazy val anyElemNullable =
    VecGen.elemsNullable(left.dataType) || VecGen.elemsNullable(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (anyElemNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += VecGen.getEval(x, i, lFloat) * VecGen.getEval(y, i, rFloat)
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += ${VecGen.get(a, i, left.dataType match { case ArrayType(et, _) => et; case _ => DoubleType })}
         |      * ${VecGen.get(b, i, right.dataType match { case ArrayType(et, _) => et; case _ => DoubleType })};
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Sum of squared elements (squared L2 norm) of an array<float|double>. */
case class SquaredNorm(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecGen.vecType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"squared_norm requires an array<float|double> input, got ${child.dataType}")

  @transient private lazy val isFloat = VecGen.floatElems(child.dataType)
  @transient private lazy val elemNullable = VecGen.elemsNullable(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (elemNullable && x.isNullAt(i)) return null
      val v = VecGen.getEval(x, i, isFloat)
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
      val et = child.dataType match { case ArrayType(t, _) => t; case _ => DoubleType }
      val nullCheck = if (elemNullable) {
        s"""if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      } else ""
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $v = ${VecGen.get(a, i, et)};
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SquaredNorm =
    copy(child = newChild)
}

object VectorFunctions {
  private def e(c: Column): Expression = ColumnShim.expression(c)

  /** Column API for [[DotProduct]] — inputs array<float|double>. */
  def dot(a: Column, b: Column): Column = ColumnShim.column(DotProduct(e(a), e(b)))

  /** Column API for [[SquaredNorm]]. */
  def squaredNorm(a: Column): Column = ColumnShim.column(SquaredNorm(e(a)))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(squaredNorm(a))
}
