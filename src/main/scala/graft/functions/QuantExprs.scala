package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Symmetric per-vector int8 quantization for embedding columns: 4x less
 * storage/cache/shuffle bandwidth than float32 on the 100 TB ANN path.
 * `scale = max|x| / 127`, `q_i = round(x_i / scale)` in [-127, 127];
 * reconstruction error per element is bounded by `scale / 2`.
 *
 * COSINE similarity of two quantized vectors needs no scale at all —
 * the per-vector scales multiply numerator and denominator alike and
 * cancel: `cos_q8(a, b) = dot(qa, qb) / (||qa|| * ||qb||)` — so the hot
 * scoring loop runs entirely on tinyint arrays through the same
 * [[DotProduct]]/[[SquaredNorm]] kernels (which read integral arrays
 * natively). The scale is carried only for reconstruction.
 *
 * One pass, codegen'd: quantizing a 100 TB corpus is itself a full
 * corpus map, so the two-sweep (max, then round) runs fused per row —
 * no interpreted higher-order functions.
 *
 * Contract: vectors containing NaN or +-Infinity quantize to NULL (like
 * null elements and length mismatches in the other kernels) — NaN never
 * updates the amax pass and rounds to byte 0, so without the check a
 * malformed vector would quantize to a PLAUSIBLE value and keep scoring,
 * while the exact float path propagates NaN and drops the row.
 */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with ArrayKernel {

  override protected def acceptedElementTypes: Seq[DataType] = Seq(DoubleType, FloatType)
  override protected def kernelName: String = prettyName
  override def prettyName: String = "quantize_int8"

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (elemNullable) {
      var j = 0
      while (j < n) { if (arr.isNullAt(j)) return null; j += 1 }
    }
    var amax = 0.0
    var i = 0
    while (i < n) {
      val x = numGetEval(arr, i)
      // NaN/Infinity would otherwise quantize to a PLAUSIBLE byte (NaN
      // never updates amax and rounds to 0) and keep scoring silently,
      // while the exact float path propagates NaN and drops the row —
      // null out here, consistent with the null-element/length contracts
      if (x.isNaN || x.isInfinite) return null
      val v = math.abs(x)
      if (v > amax) amax = v
      i += 1
    }
    val scale = if (amax == 0.0) 1.0 else amax / 127.0
    val q = new Array[Byte](n)
    i = 0
    while (i < n) { q(i) = math.round(numGetEval(arr, i) / scale).toByte; i += 1 }
    new GenericInternalRow(Array[Any](scale, UnsafeArrayData.fromPrimitiveArray(q)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val amax = ctx.freshName("amax")
      val scale = ctx.freshName("scale")
      val q = ctx.freshName("q")
      val rowCls = classOf[GenericInternalRow].getName
      val nullGuard = if (elemNullable) {
        s"""for (int $j = 0; $j < $n; $j++) {
           |  if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
           |}""".stripMargin
      } else ""
      s"""
         |int $n = $a.numElements();
         |$nullGuard
         |double $amax = 0.0;
         |if (!${ev.isNull}) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = java.lang.Math.abs(${numGet(a, i)});
         |    // NaN/Infinity must null out, not quantize to a plausible byte
         |    if (Double.isNaN($v) || Double.isInfinite($v)) { ${ev.isNull} = true; break; }
         |    if ($v > $amax) $amax = $v;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  double $scale = ($amax == 0.0) ? 1.0 : $amax / 127.0;
         |  byte[] $q = new byte[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $q[$i] = (byte) java.lang.Math.round(${numGet(a, i)} / $scale);
         |  }
         |  ${ev.value} = new $rowCls(new Object[] {
         |    $scale,
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($q)
         |  });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantFunctions {
  /** Column API for [[QuantizeInt8]]: array<float|double> ->
    * struct<scale double, q array<tinyint>>. */
  def quantizeInt8(vec: Column): Column =
    ColumnShim.column(QuantizeInt8(ColumnShim.expression(vec)))

  /** Reconstruct approximate doubles (`q_i * scale`). Interpreted HOF —
    * reconstruction is a debugging/re-ranking aid, never the hot loop
    * (cosine on quantized vectors needs no reconstruction at all). */
  def dequantizeInt8(quant: Column): Column =
    transform(quant.getField("q"), b => b.cast("double") * quant.getField("scale"))
}
