package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Codegen'd two-pointer intersection count over two SORTED ascending
 * `array<long>` columns — the set-overlap hot loop of the Jaccard
 * verification join. `array_intersect` builds a hash set per call
 * (per candidate pair!); this is a single O(m+n) primitive merge with
 * no allocation. Inputs MUST be sorted ascending and duplicate-free
 * (the shingle pipeline guarantees both via array_sort + array_distinct).
 */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires two array<bigint> inputs, got $l and $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0, $j = 0;
         |long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

/**
 * Multiplicity of the most frequent element of an `array<string>` column
 * in one pass — the repetition-filter hot loop (Gopher-style quality
 * heuristics score documents by their most repeated token/n-gram). The
 * built-in alternative (`transform(array_distinct(x), d -> size(filter(
 * x, t -> t = d)))` + array_max) is O(distinct * n) AND interpreted (HOF
 * lambdas); this is one O(n) hash-counting loop per row, map-side, no
 * shuffle. Empty arrays count to null (no "most frequent" exists —
 * callers guard with a size() check, like the other kernels' empty
 * contract); null elements null out the result.
 */
case class TopElementCount(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ArrayKernel {

  override protected def acceptedElementTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override protected def kernelName: String = prettyName
  override def prettyName: String = "top_element_count"
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (elemNullable && arr.isNullAt(i)) return null
      // getUTF8String returns a view into the row buffer — stable for the
      // duration of this eval, which is the map's whole lifetime
      val t = arr.getUTF8String(i)
      val c = counts.merge(t, 1, (x, y) => x + y)
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      val best = ctx.freshName("best")
      val counts = ctx.freshName("counts")
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val nullGuard = if (elemNullable) {
        s"""if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      } else ""
      // Janino erases generics: HashMap.get returns Object and implicit
      // (un)boxing is unreliable, so the map is raw, the cast explicit,
      // and box/unbox spelled out — a generified version compiles under
      // javac but FAILS Janino compile and silently de-optimizes to the
      // interpreted path (caught by the CODEGEN_ONLY spec).
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  java.util.HashMap $counts = new java.util.HashMap($n * 2);
         |  int $best = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullGuard
         |    $utf8 $t = $a.getUTF8String($i);
         |    Object $c = $counts.get($t);
         |    int ${c}i = ($c == null) ? 1 : ((Integer) $c).intValue() + 1;
         |    $counts.put($t, Integer.valueOf(${c}i));
         |    if (${c}i > $best) $best = ${c}i;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = (long) $best; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TopElementCount =
    copy(child = newChild)
}

object ArrayFunctions {
  /** Column API for [[SortedIntersectCount]]. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnShim.column(SortedIntersectCount(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column API for [[TopElementCount]] — input array<string>. */
  def topElementCount(a: Column): Column =
    ColumnShim.column(TopElementCount(ColumnShim.expression(a)))
}
