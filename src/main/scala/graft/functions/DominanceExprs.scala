package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/**
 * Dominance-count kernels for the join-based k-skyband
 * ([[graft.operators.SkylineOps]] `kSkybandJoin`) — per-row tight loops
 * over a DRIVER-BOUNDED reference point set carried as a referenced
 * object (the [[CentroidDistances]] pattern: identical codegen source
 * regardless of the reference values, no literal blowup).
 *
 * Dominance is evaluated on ORIENTED (all-MIN) doubles with plain Java
 * comparison semantics: `r dominates p` iff every `r[j] <= p[j]` and
 * some `r[j] < p[j]`. Java semantics matter — any comparison with NaN
 * is false, so NaN-carrying points neither dominate nor get dominated
 * (count 0; skyband members by incomparability), exactly the core
 * library's treatment ([[graft.core.SkylineCore]]); a SQL join
 * formulation would instead inherit Spark's NaN total ordering
 * (NaN = NaN, NaN greater than everything) and silently disagree.
 */

/** min(number of `refs` strictly dominating the input point, `k`) —
  * early exit at `k`, since skyband membership only needs "fewer than
  * k". Input must be an array<double|float> of length exactly `dim`
  * (others → null, the shared kernel length contract). */
case class DominatorCountUpTo(
    child: Expression, refsFlat: Array[Double], nref: Int, dim: Int, k: Int)
    extends UnaryExpression with ArrayKernel {

  require(refsFlat.length == nref * dim, "reference shape mismatch")
  require(k >= 1, s"k must be >= 1, got $k")

  override protected def acceptedElementTypes: Seq[DataType] = Seq(DoubleType, FloatType)
  override protected def kernelName: String = prettyName
  override def prettyName: String = "dominator_count_up_to"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    if (elemNullable) {
      var j = 0
      while (j < dim) { if (arr.isNullAt(j)) return null; j += 1 }
    }
    val p = new Array[Double](dim)
    var j = 0
    while (j < dim) { p(j) = numGetEval(arr, j); j += 1 }
    var cnt = 0
    var r = 0
    while (r < nref && cnt < k) {
      val base = r * dim
      var allLe = true
      var oneLt = false
      var i = 0
      while (i < dim && allLe) {
        val v = refsFlat(base + i)
        if (!(v <= p(i))) allLe = false
        else if (v < p(i)) oneLt = true
        i += 1
      }
      if (allLe && oneLt) cnt += 1
      r += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refs = ctx.addReferenceObj("refs", refsFlat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("p")
      val cnt = ctx.freshName("cnt")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      val allLe = ctx.freshName("allLe")
      val oneLt = ctx.freshName("oneLt")
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
         |  double[] $p = new double[$dim];
         |  for (int $j = 0; $j < $dim; $j++) { $p[$j] = ${numGet(a, j)}; }
         |  int $cnt = 0;
         |  for (int $r = 0; $r < $nref && $cnt < $k; $r++) {
         |    int $base = $r * $dim;
         |    boolean $allLe = true;
         |    boolean $oneLt = false;
         |    for (int $i = 0; $i < $dim && $allLe; $i++) {
         |      double $v = $refs[$base + $i];
         |      if (!($v <= $p[$i])) { $allLe = false; }
         |      else if ($v < $p[$i]) { $oneLt = true; }
         |    }
         |    if ($allLe && $oneLt) { $cnt++; }
         |  }
         |  ${ev.value} = $cnt;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DominatorCountUpTo =
    copy(child = newChild)
}

/** Indices (0-based) of the `cands` points the input point STRICTLY
  * dominates — the reversed direction: the big side streams past the
  * broadcast candidate set, and per-candidate dominator counts fall out
  * of a groupBy(index) count. Emission is bounded by construction when
  * the candidates were pre-pruned to "< k dominators in a sample"
  * (their true dominator populations are small with high probability). */
case class DominatedIndices(
    child: Expression, candsFlat: Array[Double], ncand: Int, dim: Int)
    extends UnaryExpression with ArrayKernel {

  require(candsFlat.length == ncand * dim, "candidate shape mismatch")

  override protected def acceptedElementTypes: Seq[DataType] = Seq(DoubleType, FloatType)
  override protected def kernelName: String = prettyName
  override def prettyName: String = "dominated_indices"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    if (elemNullable) {
      var j = 0
      while (j < dim) { if (arr.isNullAt(j)) return null; j += 1 }
    }
    val p = new Array[Double](dim)
    var j = 0
    while (j < dim) { p(j) = numGetEval(arr, j); j += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Int]
    var c = 0
    while (c < ncand) {
      val base = c * dim
      var allLe = true
      var oneLt = false
      var i = 0
      while (i < dim && allLe) {
        val v = candsFlat(base + i)
        if (!(p(i) <= v)) allLe = false
        else if (p(i) < v) oneLt = true
        i += 1
      }
      if (allLe && oneLt) out += c
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cands = ctx.addReferenceObj("cands", candsFlat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("p")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      val allLe = ctx.freshName("allLe")
      val oneLt = ctx.freshName("oneLt")
      val tmp = ctx.freshName("tmp")
      val cnt = ctx.freshName("cnt")
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
         |  double[] $p = new double[$dim];
         |  for (int $j = 0; $j < $dim; $j++) { $p[$j] = ${numGet(a, j)}; }
         |  int[] $tmp = new int[$ncand];
         |  int $cnt = 0;
         |  for (int $c = 0; $c < $ncand; $c++) {
         |    int $base = $c * $dim;
         |    boolean $allLe = true;
         |    boolean $oneLt = false;
         |    for (int $i = 0; $i < $dim && $allLe; $i++) {
         |      double $v = $cands[$base + $i];
         |      if (!($p[$i] <= $v)) { $allLe = false; }
         |      else if ($p[$i] < $v) { $oneLt = true; }
         |    }
         |    if ($allLe && $oneLt) { $tmp[$cnt++] = $c; }
         |  }
         |  int[] $out = new int[$cnt];
         |  System.arraycopy($tmp, 0, $out, 0, $cnt);
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DominatedIndices =
    copy(child = newChild)
}

object DominanceFunctions {
  private def e(c: Column): Expression = ColumnShim.expression(c)

  /** Column API for [[DominatorCountUpTo]] — oriented all-MIN points.
    * `dim` is passed explicitly so an EMPTY reference set still accepts
    * length-`dim` inputs (count 0) instead of nulling them. */
  def dominatorCountUpTo(point: Column, refs: Array[Array[Double]],
      dim: Int, k: Int): Column =
    ColumnShim.column(DominatorCountUpTo(e(point), refs.flatten, refs.length, dim, k))

  /** Column API for [[DominatedIndices]] — oriented all-MIN points;
    * `dim` explicit for the same empty-set reason. */
  def dominatedIndices(point: Column, cands: Array[Array[Double]], dim: Int): Column =
    ColumnShim.column(DominatedIndices(e(point), cands.flatten, cands.length, dim))
}
