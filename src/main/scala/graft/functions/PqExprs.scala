package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/**
 * Product-quantization (PQ) kernels — the compressed-index ANN path
 * (Jegou/Douze/Schmid, "Product Quantization for Nearest Neighbor
 * Search", TPAMI 2011). A d-dim vector splits into `m` subspaces of
 * `dsub = d/m` coordinates; each subspace quantizes independently to one
 * of `ksub` codewords, so a vector stores as `m` bytes instead of
 * `4*d` — 16 bytes/vector at d=64, m=16, a 16x compression that is what
 * makes billion-vector indexes fit in memory at all. Scoring is
 * ASYMMETRIC (ADC): the query stays un-quantized, a per-query lookup
 * table of `m*ksub` partial inner products is built once, and each
 * corpus vector scores with `m` table lookups — no reconstruction, no
 * float vector bandwidth on the corpus side.
 *
 * All three kernels follow the library's vector-kernel contracts
 * (see [[ArrayKernel]] / [[DotProduct]]): wrong-length inputs and null
 * elements produce NULL, never a silently-truncated plausible value;
 * codebooks ride along as referenced flat double[] objects (identical
 * codegen source across Lloyd iterations, like
 * [[CentroidDistances]]'s centroids).
 *
 * Codebook layout: `booksFlat[(s*ksub + c)*dsub + j]` = coordinate `j`
 * of codeword `c` of subspace `s`.
 */
case class PqAssignCodes(child: Expression, booksFlat: Array[Double],
    m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression with ArrayKernel {

  require(booksFlat.length == m * ksub * dsub, "codebook shape mismatch")
  require(ksub >= 1 && ksub <= 256, s"ksub=$ksub must fit one byte (1..256)")

  override protected def acceptedElementTypes: Seq[DataType] = Seq(DoubleType, FloatType)
  override protected def kernelName: String = prettyName
  override def prettyName: String = "pq_assign_codes"
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  // Length contract: a vector whose length differs from m*dsub encodes
  // to NULL (it drops out of the index) — a truncated encoding would be
  // a wrong-but-plausible code. Ties break to the LOWER codeword index
  // (strict < when updating the running min), so codes are a pure
  // function of (vector, codebooks).
  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val dim = m * dsub
    if (arr.numElements() != dim) return null
    if (elemNullable) {
      var j = 0
      while (j < dim) { if (arr.isNullAt(j)) return null; j += 1 }
    }
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var dist = 0.0
        var j = 0
        while (j < dsub) {
          val d = numGetEval(arr, s * dsub + j) - booksFlat(base + j)
          dist += d * d
          j += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", booksFlat, "double[]")
    val dim = m * dsub
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val dist = ctx.freshName("dist")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val base = ctx.freshName("base")
      val out = ctx.freshName("out")
      val nullGuard = if (elemNullable) {
        s"""if (!${ev.isNull}) {
           |  for (int $j = 0; $j < $dim; $j++) {
           |    if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
           |  }
           |}""".stripMargin
      } else ""
      val vIdx = s"$s * $dsub + $j"
      s"""
         |if ($a.numElements() != $dim) { ${ev.isNull} = true; }
         |$nullGuard
         |if (!${ev.isNull}) {
         |  byte[] $out = new byte[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $best = 0;
         |    double $bestD = Double.POSITIVE_INFINITY;
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      int $base = ($s * $ksub + $c) * $dsub;
         |      double $dist = 0.0;
         |      for (int $j = 0; $j < $dsub; $j++) {
         |        double $d = ${numGet(a, vIdx)} - $booksRef[$base + $j];
         |        $dist += $d * $d;
         |      }
         |      if ($dist < $bestD) { $bestD = $dist; $best = $c; }
         |    }
         |    $out[$s] = (byte) $best;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssignCodes =
    copy(child = newChild)
}

/**
 * Per-query ADC lookup table: `out[s*ksub + c] = sum_j q[s*dsub+j] *
 * book[s][c][j]` — the partial INNER PRODUCT of the query's subspace
 * slice with each codeword. Scoring a corpus code against this table
 * ([[PqAdcScore]]) sums one entry per subspace, which equals the inner
 * product of the query with the vector's PQ reconstruction; on
 * unit-normalized vectors that is the (approximate) cosine. Computed
 * once per query row, map-side; `m*ksub` doubles per query (4 KiB at
 * m=16, ksub=32) broadcast with the query side.
 */
case class PqAdcTable(child: Expression, booksFlat: Array[Double],
    m: Int, ksub: Int, dsub: Int)
    extends UnaryExpression with ArrayKernel {

  require(booksFlat.length == m * ksub * dsub, "codebook shape mismatch")

  override protected def acceptedElementTypes: Seq[DataType] = Seq(DoubleType, FloatType)
  override protected def kernelName: String = prettyName
  override def prettyName: String = "pq_adc_table"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val dim = m * dsub
    if (arr.numElements() != dim) return null
    if (elemNullable) {
      var j = 0
      while (j < dim) { if (arr.isNullAt(j)) return null; j += 1 }
    }
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var ip = 0.0
        var j = 0
        while (j < dsub) {
          ip += numGetEval(arr, s * dsub + j) * booksFlat(base + j)
          j += 1
        }
        out(s * ksub + c) = ip
        c += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", booksFlat, "double[]")
    val dim = m * dsub
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val ip = ctx.freshName("ip")
      val base = ctx.freshName("base")
      val out = ctx.freshName("out")
      val nullGuard = if (elemNullable) {
        s"""if (!${ev.isNull}) {
           |  for (int $j = 0; $j < $dim; $j++) {
           |    if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
           |  }
           |}""".stripMargin
      } else ""
      val vIdx = s"$s * $dsub + $j"
      s"""
         |if ($a.numElements() != $dim) { ${ev.isNull} = true; }
         |$nullGuard
         |if (!${ev.isNull}) {
         |  double[] $out = new double[$m * $ksub];
         |  for (int $s = 0; $s < $m; $s++) {
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      int $base = ($s * $ksub + $c) * $dsub;
         |      double $ip = 0.0;
         |      for (int $j = 0; $j < $dsub; $j++) {
         |        $ip += ${numGet(a, vIdx)} * $booksRef[$base + $j];
         |      }
         |      $out[$s * $ksub + $c] = $ip;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTable =
    copy(child = newChild)
}

/**
 * ADC score of one corpus code array against one query table:
 * `sum_s table[s*ksub + codes[s]]` — `m` lookups per (query, vector)
 * pair, the whole hot loop of a PQ scan. Codes read unsigned
 * (`& 0xFF`: ksub up to 256 in one byte). NULL on shape mismatch or a
 * code outside [0, ksub) — an index past the table would be a
 * wrong-but-plausible score (or a JVM bounds crash mid-job).
 */
case class PqAdcScore(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_score"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ByteType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score requires (array<tinyint> codes, array<double> table), got $l and $r")
  }

  @transient private lazy val anyElemNullable =
    VecGen.elemsNullable(left.dataType) || VecGen.elemsNullable(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    if (codes.numElements() != m || table.numElements() != m * ksub) return null
    var score = 0.0
    var s = 0
    while (s < m) {
      if (anyElemNullable && codes.isNullAt(s)) return null
      val c = codes.getByte(s) & 0xFF
      if (c >= ksub) return null
      val idx = s * ksub + c
      if (anyElemNullable && table.isNullAt(idx)) return null
      score += table.getDouble(idx)
      s += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      val score = ctx.freshName("score")
      // ordering matters: the code must be bounds-checked BEFORE any
      // table access (isNullAt past the end is a JVM bounds crash)
      val codesNullCheck = if (anyElemNullable) {
        s"""if ($a.isNullAt($s)) { ${ev.isNull} = true; break; }"""
      } else ""
      val tableNullCheck = if (anyElemNullable) {
        s"""if ($b.isNullAt($idx)) { ${ev.isNull} = true; break; }"""
      } else ""
      s"""
         |if ($a.numElements() != $m || $b.numElements() != $m * $ksub) { ${ev.isNull} = true; }
         |double $score = 0.0;
         |if (!${ev.isNull}) {
         |  for (int $s = 0; $s < $m; $s++) {
         |    $codesNullCheck
         |    int $c = $a.getByte($s) & 0xFF;
         |    if ($c >= $ksub) { ${ev.isNull} = true; break; }
         |    int $idx = $s * $ksub + $c;
         |    $tableNullCheck
         |    $score += $b.getDouble($idx);
         |  }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $score; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

/**
 * Per-row centroid subtraction: `out[j] = v[j] - cents[cell][j]` — the
 * RESIDUAL computation of IVFPQ encoding (Jegou et al. TPAMI'11 §IV):
 * quantizing `v - centroid[cell]` instead of `v` concentrates the
 * codebook's resolution on the within-cell differences that actually
 * rank neighbors — the global-codebook alternative collapses on
 * clustered corpora because the cell center dominates every code
 * (measured: recall@10 0.25 at n=1M clustered, ANNBENCH_r9). The
 * centroid matrix rides along as a referenced flat double[] like
 * [[CentroidDistances]]. NULL on length mismatch, null elements, or a
 * cell index outside [0, ncent) — an out-of-range read would be a
 * wrong-but-plausible residual or a JVM crash.
 */
case class CentroidSubtract(left: Expression, right: Expression,
    centsFlat: Array[Double], ncent: Int, dim: Int)
    extends BinaryExpression {

  require(centsFlat.length == ncent * dim, "centroid shape mismatch")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_subtract"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType | FloatType, _), IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"centroid_subtract requires (array<double|float> vec, int cell), got $l and $r")
  }

  @transient private lazy val eType = VecGen.elemType(left.dataType)
  @transient private lazy val elemNullable = VecGen.elemsNullable(left.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val cell = b.asInstanceOf[Int]
    if (arr.numElements() != dim || cell < 0 || cell >= ncent) return null
    if (elemNullable) {
      var j = 0
      while (j < dim) { if (arr.isNullAt(j)) return null; j += 1 }
    }
    val out = new Array[Double](dim)
    val base = cell * dim
    var j = 0
    while (j < dim) {
      out(j) = VecGen.getEval(arr, j, eType) - centsFlat(base + j)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centsFlat, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
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
         |if ($a.numElements() != $dim || $b < 0 || $b >= $ncent) { ${ev.isNull} = true; }
         |$nullGuard
         |if (!${ev.isNull}) {
         |  double[] $out = new double[$dim];
         |  int $base = $b * $dim;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    $out[$j] = ${VecGen.get(a, j, eType)} - $centsRef[$base + $j];
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidSubtract =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  private def e(c: Column): Expression = ColumnShim.expression(c)

  private def flat(books: Array[Array[Array[Double]]]): (Array[Double], Int, Int, Int) = {
    val m = books.length
    val ksub = books.head.length
    val dsub = books.head.head.length
    (books.flatten.flatten, m, ksub, dsub)
  }

  /** Column API for [[PqAssignCodes]] — input array<float|double> of
    * length exactly m*dsub (others encode to null). */
  def pqAssignCodes(vec: Column, books: Array[Array[Array[Double]]]): Column = {
    val (f, m, ksub, dsub) = flat(books)
    ColumnShim.column(PqAssignCodes(e(vec), f, m, ksub, dsub))
  }

  /** Column API for [[PqAdcTable]]. */
  def pqAdcTable(vec: Column, books: Array[Array[Array[Double]]]): Column = {
    val (f, m, ksub, dsub) = flat(books)
    ColumnShim.column(PqAdcTable(e(vec), f, m, ksub, dsub))
  }

  /** Column API for [[PqAdcScore]]. */
  def pqAdcScore(codes: Column, table: Column, m: Int, ksub: Int): Column =
    ColumnShim.column(PqAdcScore(e(codes), e(table), m, ksub))

  /** Column API for [[CentroidSubtract]] — (vec, cell int) against a
    * referenced centroid matrix. */
  def centroidSubtract(vec: Column, cell: Column,
      centroids: Array[Array[Double]]): Column =
    ColumnShim.column(CentroidSubtract(e(vec), e(cell),
      centroids.flatten, centroids.length, centroids.head.length))
}
