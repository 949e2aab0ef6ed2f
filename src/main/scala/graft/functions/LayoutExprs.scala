package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Z-order (Morton) bit interleave over `d` pre-normalized cell
 * coordinates — the multi-dimensional clustering key behind data-skipping
 * file layouts (Delta/Iceberg `OPTIMIZE ZORDER BY` use exactly this
 * device). Input: `array<bigint>` of length `d`, each element already
 * normalized to `[0, 2^bitsPer)` where `bitsPer = 63 / d`; output: the
 * long whose bit `i*d + j` is bit `i` of coordinate `j`. Sorting rows by
 * this key places points that are close in ALL dimensions into the same
 * file, so per-file min/max statistics prune scans on ANY prefix-free
 * combination of the dimensions — a lexicographic sort only ever prunes
 * its leading column. Out-of-range coordinates are masked to the low
 * `bitsPer` bits; a wrong-length or null-element array nulls out (the
 * normalization in [[graft.sources.Layout]] produces neither).
 */
case class InterleaveBits(child: Expression, d: Int)
    extends UnaryExpression with ArrayKernel {

  require(d >= 1 && d <= 8, s"interleave_bits supports 1-8 dimensions, got $d")

  private val bitsPer = 63 / d
  private val mask = (1L << bitsPer) - 1

  override protected def acceptedElementTypes: Seq[DataType] = Seq(LongType)
  override protected def kernelName: String = prettyName
  override def prettyName: String = "interleave_bits"
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != d) return null
    var out = 0L
    var j = 0
    while (j < d) {
      if (elemNullable && arr.isNullAt(j)) return null
      val x = arr.getLong(j) & mask
      var i = 0
      while (i < bitsPer) {
        out |= ((x >>> i) & 1L) << (i * d + j)
        i += 1
      }
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nullGuard = if (elemNullable) {
        s"if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }"
      } else ""
      s"""
         |if ($a.numElements() != $d) { ${ev.isNull} = true; } else {
         |  long $out = 0L;
         |  for (int $j = 0; $j < $d; $j++) {
         |    $nullGuard
         |    long $x = $a.getLong($j) & ${mask}L;
         |    for (int $i = 0; $i < $bitsPer; $i++) {
         |      $out |= (($x >>> $i) & 1L) << ($i * $d + $j);
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $out; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): InterleaveBits =
    copy(child = newChild)
}

object LayoutFunctions {
  /** Column API for [[InterleaveBits]] — input `array<bigint>` of length
    * `d`, elements in `[0, 2^(63/d))`. */
  def interleaveBits(a: Column, d: Int): Column =
    ColumnShim.column(InterleaveBits(ColumnShim.expression(a), d))
}
