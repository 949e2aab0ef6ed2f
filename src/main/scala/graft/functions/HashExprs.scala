package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/**
 * Fused hash/sketch kernels for the dedup and similarity operators.
 *
 * The direct DataFrame formulations of MinHash / SimHash / hyperplane-LSH
 * need one aggregate or signature sub-expression PER permutation/bit —
 * 64-wide expression trees that (a) explode the whole-stage-codegen unit
 * (multi-second janino compiles per query) and (b) for the hash sketches
 * force an explode + wide groupBy shuffle. Each kernel below is a single
 * unary expression evaluating the whole sketch in one tight primitive
 * loop per row: map-side only, tiny codegen unit, no shuffle at all.
 *
 * Hash compatibility: [[MinHashSignature]] reproduces the built-in
 * `xxhash64(lit(i), s)` chain bit-for-bit (seed 42, then each child value
 * hashed with the running result as seed — see Spark's XxHash64), and
 * [[SimHash64]] reproduces `xxhash64(token)`; the fused kernels are
 * drop-in equal to the expression trees they replace.
 */
private[graft] trait ArrayKernel { self: UnaryExpression =>
  override def nullable: Boolean = true

  protected def acceptedElementTypes: Seq[DataType]
  protected def kernelName: String

  /** Whether the input type admits null ELEMENTS. When it does, every
    * kernel emits a per-element guard that nulls out the whole result —
    * silently reading a null slot as 0/garbage would corrupt
    * signatures/distances with no signal. The guard costs nothing when
    * the schema says containsNull = false. */
  @transient protected lazy val elemNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  @transient private lazy val numElemType: DataType = VecGen.elemType(child.dataType)

  /** Per-element numeric read widened to double (codegen form; shared
    * with the dot/norm kernels via [[VecGen]]). */
  protected def numGet(arr: String, i: String): String = VecGen.get(arr, i, numElemType)

  /** Per-element numeric read widened to double (interpreted form). */
  protected def numGetEval(arr: ArrayData, i: Int): Double =
    VecGen.getEval(arr, i, numElemType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if acceptedElementTypes.contains(et) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$kernelName requires array<${acceptedElementTypes.map(_.simpleString).mkString("|")}> " +
        s"input, got $other")
  }
}

/**
 * All `numPerm` min-hash values of a shingle set in one pass:
 * `out[p] = min over s in set of xxhash64(lit(p), s)`. Empty sets hash
 * to null (a shingle-less doc has no signature — callers filter).
 */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression with ArrayKernel {

  override protected def acceptedElementTypes: Seq[DataType] = Seq(LongType)
  override protected def kernelName: String = prettyName
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // xxhash64(lit(p), s) == hashLong(s, hashInt(p, 42)); the per-permutation
  // seeds are the constant prefix of that chain.
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numPerm)(p => XXH64.hashInt(p, 42L))

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (elemNullable && arr.isNullAt(i)) return null
      val s = arr.getLong(i)
      var p = 0
      while (p < numPerm) {
        val h = XXH64.hashLong(s, seeds(p))
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      val nullGuard = if (elemNullable) {
        s"""if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      } else ""
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $mins = new long[$numPerm];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullGuard
         |    long $s = $a.getLong($i);
         |    for (int $p = 0; $p < $numPerm; $p++) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($s, $seedsRef[$p]);
         |      if ($h < $mins[$p]) $mins[$p] = $h;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/**
 * 64-bit SimHash of a token set (Charikar, STOC'02) in one pass: bit k of
 * the result is the sign of the sum over tokens of +-1 votes from bit k
 * of `xxhash64(token)`. Token-less docs hash to null.
 */
case class SimHash64(child: Expression)
    extends UnaryExpression with ArrayKernel {

  override protected def acceptedElementTypes: Seq[DataType] = Seq(StringType)
  override protected def kernelName: String = prettyName
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (elemNullable && arr.isNullAt(i)) return null
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var sim = 0L
    var k = 0
    while (k < 64) { if (votes(k) > 0) sim |= (1L << k); k += 1 }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val sim = ctx.freshName("sim")
      val nullGuard = if (elemNullable) {
        s"""if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      } else ""
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  int[] $votes = new int[64];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullGuard
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
         |      $a.getUTF8String($i), 42L);
         |    for (int $k = 0; $k < 64; $k++) {
         |      if ((($h >>> $k) & 1L) == 1L) $votes[$k]++; else $votes[$k]--;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    long $sim = 0L;
         |    for (int $k = 0; $k < 64; $k++) { if ($votes[$k] > 0) $sim |= (1L << $k); }
         |    ${ev.value} = $sim;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/**
 * All `tables` random-hyperplane sign signatures of a vector in one pass
 * (Charikar, STOC'02): bit k of signature t is `1` iff
 * `dot(v, plane[t][k]) >= 0`. Planes are flattened to one driver-side
 * double[] of length tables*bits*dim. Accepts `array<float|double>`.
 *
 * Length contract: a vector whose length differs from `dim` signatures
 * to NULL (so it drops out of the bucket join) rather than silently
 * truncating or zero-padding the dot products — a wrong-but-plausible
 * signature would poison buckets with no signal. Null elements null out
 * the result for the same reason.
 */
case class HyperplaneSignatures(
    child: Expression, planesFlat: Array[Double], tables: Int, bits: Int, dim: Int)
    extends UnaryExpression with ArrayKernel {

  require(planesFlat.length == tables * bits * dim, "planes shape mismatch")

  override protected def acceptedElementTypes: Seq[DataType] = Seq(DoubleType, FloatType)
  override protected def kernelName: String = prettyName
  override def prettyName: String = "hyperplane_signatures"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    if (elemNullable) {
      var j = 0
      while (j < dim) { if (arr.isNullAt(j)) return null; j += 1 }
    }
    val sigs = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var k = 0
      while (k < bits) {
        val base = (t * bits + k) * dim
        var s = 0.0
        var j = 0
        while (j < dim) { s += planesFlat(base + j) * numGetEval(arr, j); j += 1 }
        if (s >= 0) sig |= (1L << k)
        k += 1
      }
      sigs(t) = sig
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planesFlat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val t = ctx.freshName("t")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val sig = ctx.freshName("sig")
      val sigs = ctx.freshName("sigs")
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
         |  long[] $sigs = new long[$tables];
         |  for (int $t = 0; $t < $tables; $t++) {
         |    long $sig = 0L;
         |    for (int $k = 0; $k < $bits; $k++) {
         |      int $base = ($t * $bits + $k) * $dim;
         |      double $s = 0.0;
         |      for (int $j = 0; $j < $dim; $j++) { $s += $planesRef[$base + $j] * ${numGet(a, j)}; }
         |      if ($s >= 0) $sig |= (1L << $k);
         |    }
         |    $sigs[$t] = $sig;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sigs);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatures =
    copy(child = newChild)
}

/**
 * Squared L2 distances from a vector to each of `centroids` in one pass:
 * `out[c] = sum_j (v[j] - centroid[c][j])^2`. Used by IVF assignment
 * (argmin) and probe ranking; centroids are a flattened driver-side
 * double[] so successive Lloyd iterations generate IDENTICAL codegen
 * source (the new centroids ride along as a referenced object — no
 * recompile per iteration).
 */
case class CentroidDistances(child: Expression, centsFlat: Array[Double], ncent: Int, dim: Int)
    extends UnaryExpression with ArrayKernel {

  require(centsFlat.length == ncent * dim, "centroid shape mismatch")

  override protected def acceptedElementTypes: Seq[DataType] = Seq(DoubleType, FloatType)
  override protected def kernelName: String = prettyName
  override def prettyName: String = "centroid_distances"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // Length contract: like HyperplaneSignatures, a vector whose length
  // differs from `dim` gets NULL distances (it drops out of assignment)
  // instead of a silently-truncated distance. Null elements -> null.
  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    if (elemNullable) {
      var j = 0
      while (j < dim) { if (arr.isNullAt(j)) return null; j += 1 }
    }
    val out = new Array[Double](ncent)
    var c = 0
    while (c < ncent) {
      val base = c * dim
      var s = 0.0
      var j = 0
      while (j < dim) { val d = numGetEval(arr, j) - centsFlat(base + j); s += d * d; j += 1 }
      out(c) = s
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centsFlat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
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
         |  double[] $out = new double[$ncent];
         |  for (int $c = 0; $c < $ncent; $c++) {
         |    int $base = $c * $dim;
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      double $d = ${numGet(a, j)} - $centsRef[$base + $j];
         |      $s += $d * $d;
         |    }
         |    $out[$c] = $s;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidDistances =
    copy(child = newChild)
}

/**
 * Nearest-centroid ARGMIN in one pass — the assignment form of
 * [[CentroidDistances]]. Semantically identical to
 * `array_position(d, array_min(d)) - 1` over that kernel's output
 * (strictly-less update = ties to the lower index; comparisons via
 * `java.lang.Double.compare` = Spark's double ordering, NaN largest;
 * wrong length / null element -> null), but it never MATERIALIZES the
 * distance array: the r12 encode profile measured the materializing
 * form at 66 s for one 10M x nlist=790 assignment pass — a 6 KB
 * `UnsafeArrayData` allocation per row plus two generic array scans —
 * where this kernel allocates nothing and EARLY-EXITS each centroid's
 * accumulation once the partial sum reaches the current best (squared
 * distances grow monotonically, so the argmin is unchanged — on
 * clustered data most centroids exit within a few dimensions).
 */
case class NearestCentroid(child: Expression, centsFlat: Array[Double], ncent: Int, dim: Int)
    extends UnaryExpression with ArrayKernel {

  require(centsFlat.length == ncent * dim, "centroid shape mismatch")
  require(ncent >= 1, "need at least one centroid")

  override protected def acceptedElementTypes: Seq[DataType] = Seq(DoubleType, FloatType)
  override protected def kernelName: String = prettyName
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    if (elemNullable) {
      var j = 0
      while (j < dim) { if (arr.isNullAt(j)) return null; j += 1 }
    }
    var best = 0
    var bestS = Double.NaN // sentinel: first centroid always installs below
    var c = 0
    while (c < ncent) {
      val base = c * dim
      var s = 0.0
      var j = 0
      while (j < dim && !(s >= bestS)) { // NaN bestS compares false -> full sum
        val d = numGetEval(arr, j) - centsFlat(base + j)
        s += d * d
        j += 1
      }
      if (c == 0 || java.lang.Double.compare(s, bestS) < 0) { bestS = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centsFlat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
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
         |  int $best = 0;
         |  double $bestS = Double.NaN;
         |  for (int $c = 0; $c < $ncent; $c++) {
         |    int $base = $c * $dim;
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $dim && !($s >= $bestS); $j++) {
         |      double $d = ${numGet(a, j)} - $centsRef[$base + $j];
         |      $s += $d * $d;
         |    }
         |    if ($c == 0 || java.lang.Double.compare($s, $bestS) < 0) { $bestS = $s; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/**
 * TWO-LEVEL nearest-centroid assignment — the hierarchical coarse
 * quantizer billion-scale IVF actually runs (the FAISS IMI / two-level
 * residual-quantizer shape): argmin over `nsuper` SUPERGROUP centers
 * first (O(nsuper*dim)), then an exact argmin over only the chosen
 * group's SPILLED member list (each centroid belongs to its `spill`
 * nearest supergroups, so boundary centroids are reachable from every
 * nearby group). Per-row cost is O((nsuper + spill*ncent/nsuper)*dim)
 * instead of [[NearestCentroid]]'s O(ncent*dim) — at nlist=790 with
 * nsuper=29/spill=4 that is ~5.6x fewer multiply-adds, and on
 * STRUCTURELESS (uniform) data, where the flat kernel's early-exit has
 * nothing to prune, it is the difference between the assignment pass
 * dominating the build and it not mattering. At nlist=65536 (the
 * [[graft.operators.Similarity.autoNlist]] cap) the flat scan is
 * hopeless and this shape is the only one that works.
 *
 * APPROXIMATE by design: a row whose true nearest centroid is not in
 * its chosen group's member list lands in a near-tied neighboring cell.
 * IVF tolerates exactly this (probe recall is MEASURED downstream — the
 * calibration estimator assigns its sample with this same rule, so the
 * calibrated width reflects the real layout), and `spill = nsuper`
 * makes every member list complete — spec-gated equal to the flat
 * argmin including tie order. Null/length contracts and tie-breaks
 * match [[NearestCentroid]]: member lists are ascending by global
 * index and the update is strictly-less, so ties go to the lower
 * global index WITHIN the list.
 */
case class NearestCentroidTwoLevel(child: Expression,
    superFlat: Array[Double], nsuper: Int,
    memberOff: Array[Int], memberIdx: Array[Int],
    centsFlat: Array[Double], ncent: Int, dim: Int)
    extends UnaryExpression with ArrayKernel {

  require(superFlat.length == nsuper * dim, "supergroup shape mismatch")
  require(centsFlat.length == ncent * dim, "centroid shape mismatch")
  require(memberOff.length == nsuper + 1 && memberOff(0) == 0 &&
    memberOff(nsuper) == memberIdx.length, "member offset table malformed")
  require((0 until nsuper).forall(g => memberOff(g + 1) > memberOff(g)),
    "every supergroup needs a non-empty member list")
  require(nsuper >= 1 && ncent >= 1, "need at least one center per level")

  override protected def acceptedElementTypes: Seq[DataType] = Seq(DoubleType, FloatType)
  override protected def kernelName: String = prettyName
  override def prettyName: String = "nearest_centroid_two_level"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    if (elemNullable) {
      var j = 0
      while (j < dim) { if (arr.isNullAt(j)) return null; j += 1 }
    }
    // level 1: nearest supergroup (same early-exit + tie semantics as
    // NearestCentroid)
    var bestG = 0
    var bestGS = Double.NaN
    var g = 0
    while (g < nsuper) {
      val base = g * dim
      var s = 0.0
      var j = 0
      while (j < dim && !(s >= bestGS)) {
        val d = numGetEval(arr, j) - superFlat(base + j)
        s += d * d
        j += 1
      }
      if (g == 0 || java.lang.Double.compare(s, bestGS) < 0) { bestGS = s; bestG = g }
      g += 1
    }
    // level 2: exact argmin over the chosen group's member list
    var best = memberIdx(memberOff(bestG))
    var bestS = Double.NaN
    var p = memberOff(bestG)
    while (p < memberOff(bestG + 1)) {
      val ci = memberIdx(p)
      val base = ci * dim
      var s = 0.0
      var j = 0
      while (j < dim && !(s >= bestS)) {
        val d = numGetEval(arr, j) - centsFlat(base + j)
        s += d * d
        j += 1
      }
      if (p == memberOff(bestG) || java.lang.Double.compare(s, bestS) < 0) {
        bestS = s; best = ci
      }
      p += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val supRef = ctx.addReferenceObj("supers", superFlat, "double[]")
    val offRef = ctx.addReferenceObj("memberOff", memberOff, "int[]")
    val idxRef = ctx.addReferenceObj("memberIdx", memberIdx, "int[]")
    val centsRef = ctx.addReferenceObj("cents", centsFlat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val g = ctx.freshName("g")
      val p = ctx.freshName("p")
      val ci = ctx.freshName("ci")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      val bestG = ctx.freshName("bestG")
      val bestGS = ctx.freshName("bestGS")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
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
         |  int $bestG = 0;
         |  double $bestGS = Double.NaN;
         |  for (int $g = 0; $g < $nsuper; $g++) {
         |    int $base = $g * $dim;
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $dim && !($s >= $bestGS); $j++) {
         |      double $d = ${numGet(a, j)} - $supRef[$base + $j];
         |      $s += $d * $d;
         |    }
         |    if ($g == 0 || java.lang.Double.compare($s, $bestGS) < 0) { $bestGS = $s; $bestG = $g; }
         |  }
         |  int $best = $idxRef[$offRef[$bestG]];
         |  double $bestS = Double.NaN;
         |  for (int $p = $offRef[$bestG]; $p < $offRef[$bestG + 1]; $p++) {
         |    int $ci = $idxRef[$p];
         |    int $base = $ci * $dim;
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $dim && !($s >= $bestS); $j++) {
         |      double $d = ${numGet(a, j)} - $centsRef[$base + $j];
         |      $s += $d * $d;
         |    }
         |    if ($p == $offRef[$bestG] || java.lang.Double.compare($s, $bestS) < 0) {
         |      $bestS = $s; $best = $ci;
         |    }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidTwoLevel =
    copy(child = newChild)
}

/**
 * Sign bits of a vector packed into longs: bit `i` of word `w` is set
 * iff `v[64*w + i] >= 0` — binary quantization (1 bit/dimension, 8
 * bytes at d=64 vs 256 float bytes, a 32x compression). The Hamming
 * distance between two sign patterns estimates the angle between the
 * vectors (E[ham] = d * theta / pi — the same estimator hyperplane LSH
 * samples, here with the coordinate axes as the planes), so a
 * Hamming-ranked shortlist + exact re-rank is the cheapest
 * compressed-scan ANN path of all. O(d) per row — no dot products.
 * Length contract as everywhere: wrong-length vectors get NULL.
 */
case class SignBits(child: Expression, dim: Int)
    extends UnaryExpression with ArrayKernel {

  private val words: Int = (dim + 63) / 64

  override protected def acceptedElementTypes: Seq[DataType] = Seq(DoubleType, FloatType)
  override protected def kernelName: String = prettyName
  override def prettyName: String = "sign_bits"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    if (elemNullable) {
      var j = 0
      while (j < dim) { if (arr.isNullAt(j)) return null; j += 1 }
    }
    val out = new Array[Long](words)
    var j = 0
    while (j < dim) {
      if (numGetEval(arr, j) >= 0) out(j >> 6) |= (1L << (j & 63))
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
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
         |  long[] $out = new long[$words];
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if (${numGet(a, j)} >= 0) $out[$j >> 6] |= (1L << ($j & 63));
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
}

/**
 * Hamming distance between two packed bit patterns (array<long>, as
 * produced by [[SignBits]]): `sum over words of bitCount(a ^ b)`. NULL
 * on length mismatch (distances between different-width signatures are
 * meaningless) and on null elements — the standard contracts.
 */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hamming_distance"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"hamming_distance requires two array<bigint> inputs, got $l and $r")
  }

  @transient private lazy val anyElemNullable =
    VecGen.elemsNullable(left.dataType) || VecGen.elemsNullable(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var ham = 0
    var i = 0
    while (i < n) {
      if (anyElemNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      ham += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    ham
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ham = ctx.freshName("ham")
      val nullCheck = if (anyElemNullable) {
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      } else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |int $ham = 0;
         |if (!${ev.isNull}) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $ham += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $ham; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HashFunctions {
  private def e(c: Column): Expression = ColumnShim.expression(c)

  /** Column API for [[MinHashSignature]] — input array<long> shingle set. */
  def minhashSignature(sh: Column, numPerm: Int): Column =
    ColumnShim.column(MinHashSignature(e(sh), numPerm))

  /** Column API for [[SimHash64]] — input array<string> token set. */
  def simhash64(tokens: Column): Column =
    ColumnShim.column(SimHash64(e(tokens)))

  /** Column API for [[HyperplaneSignatures]] — input array<float|double>
    * of length exactly dim (others signature to null; see the kernel's
    * length contract). */
  def hyperplaneSignatures(vec: Column, planes: Array[Array[Array[Double]]]): Column = {
    val tables = planes.length
    val bits = planes.head.length
    val dim = planes.head.head.length
    ColumnShim.column(HyperplaneSignatures(e(vec), planes.flatten.flatten, tables, bits, dim))
  }

  /** Column API for [[CentroidDistances]] — input array<float|double> of
    * length exactly dim (others get null distances; see the kernel's
    * length contract). */
  def centroidDistances(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnShim.column(CentroidDistances(
      e(vec), centroids.flatten, centroids.length, centroids.head.length))

  /** Column API for [[NearestCentroid]] — the allocation-free argmin
    * form of [[centroidDistances]] (assignment paths; probe ranking
    * still needs the full distance array). */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnShim.column(NearestCentroid(
      e(vec), centroids.flatten, centroids.length, centroids.head.length))

  /** Column API for [[NearestCentroidTwoLevel]] — hierarchical
    * assignment over `supers` (level 1) and the spilled `members` lists
    * (level 2, global centroid indices per supergroup, ascending). */
  def nearestCentroidTwoLevel(vec: Column, supers: Array[Array[Double]],
      members: Array[Array[Int]], centroids: Array[Array[Double]]): Column = {
    val off = members.scanLeft(0)(_ + _.length)
    ColumnShim.column(NearestCentroidTwoLevel(
      e(vec), supers.flatten, supers.length, off, members.flatten,
      centroids.flatten, centroids.length, centroids.head.length))
  }

  /** Column API for [[SignBits]] — input array<float|double> of length
    * exactly dim (others get a null signature). */
  def signBits(vec: Column, dim: Int): Column =
    ColumnShim.column(SignBits(e(vec), dim))

  /** Column API for [[HammingDistance]] — two array<bigint> bit
    * patterns of equal width. */
  def hammingDistance(a: Column, b: Column): Column =
    ColumnShim.column(HammingDistance(e(a), e(b)))
}
