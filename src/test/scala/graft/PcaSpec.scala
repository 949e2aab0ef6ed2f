package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/**
 * PCA fit/project ([[Similarity.pcaFit]]/[[Similarity.pcaProject]]):
 * the Jacobi eigensolver against hand-computable cases, the standard
 * PCA invariants (orthonormality, eigen-residual, variance
 * decomposition), and the distributed projection against a driver-side
 * reference.
 */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("jacobiEigen solves hand-computable symmetric matrices") {
    // [[2,1],[1,2]] has eigenvalues 3 (vector (1,1)/sqrt2) and 1
    val (ev, vecs) = Similarity.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < 1e-12 && math.abs(ev(1) - 1.0) < 1e-12)
    assert(math.abs(math.abs(vecs(0)(0)) - math.sqrt(0.5)) < 1e-9)
    assert(math.abs(vecs(0)(0) - vecs(0)(1)) < 1e-9, "eigenvector of 3 is along (1,1)")
    // diagonal matrix: eigenvalues are the diagonal, sorted descending
    val (ev2, _) = Similarity.jacobiEigen(
      Array(Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(ev2.toSeq == Seq(5.0, 3.0, 1.0))
  }

  test("jacobiEigen invariants on random symmetric matrices: A v = lambda v, orthonormal") {
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 3; d <- Seq(3, 8, 16)) {
      val a = Array.ofDim[Double](d, d)
      for (i <- 0 until d; j <- i until d) {
        val x = rnd.nextGaussian(); a(i)(j) = x; a(j)(i) = x
      }
      val (ev, vecs) = Similarity.jacobiEigen(a)
      assert(ev.toSeq == ev.toSeq.sortBy(-_), "descending order")
      for (q <- 0 until d) {
        val v = vecs(q)
        // residual ||A v - lambda v||
        val res = (0 until d).map { i =>
          val av = (0 until d).map(j => a(i)(j) * v(j)).sum
          val r = av - ev(q) * v(i); r * r
        }.sum
        assert(math.sqrt(res) < 1e-8, s"trial=$trial d=$d residual ${math.sqrt(res)}")
        for (p <- q until d) {
          val dot = (0 until d).map(i => vecs(p)(i) * vecs(q)(i)).sum
          val want = if (p == q) 1.0 else 0.0
          assert(math.abs(dot - want) < 1e-9, s"orthonormality p=$p q=$q")
        }
      }
    }
  }

  test("pcaFit finds the planted principal axis; projection matches driver reference") {
    import spark.implicits._
    // points along direction (0.6, 0.8) with small orthogonal noise, so
    // the top component is +-(0.6, 0.8) and captures almost all variance
    val rnd = new scala.util.Random(7L)
    val pts = Vector.fill(400) {
      val tmain = rnd.nextGaussian() * 10
      val tnoise = rnd.nextGaussian() * 0.1
      Array(0.6 * tmain - 0.8 * tnoise + 5.0, 0.8 * tmain + 0.6 * tnoise - 2.0)
    }
    val df = pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "vec")
    val model = Similarity.pcaFit(df, "vec", k = 2)
    assert(model.nRows == 400 && model.dim == 2)
    val c0 = model.components(0)
    assert(math.abs(math.abs(c0(0)) - 0.6) < 0.02 &&
      math.abs(math.abs(c0(1)) - 0.8) < 0.02, s"top axis ${c0.toSeq}")
    assert(model.eigenvalues(0) / model.totalVariance > 0.99,
      "planted axis captures almost all variance")
    // sign fix: largest-|entry| positive
    assert(model.components.forall(v => v(v.map(math.abs).zipWithIndex.maxBy(_._1)._2) > 0))
    // distributed projection == driver-side reference projection
    val got = Similarity.pcaProject(df, "id", "vec", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    pts.zipWithIndex.foreach { case (p, i) =>
      val centered = p.zip(model.mean).map { case (a, b) => a - b }
      val want = model.components.map(c => c.zip(centered).map { case (a, b) => a * b }.sum)
      val g = got(i.toLong)
      want.indices.foreach(j =>
        assert(math.abs(g(j) - want(j)) < 1e-9, s"row $i coord $j"))
    }
  }

  test("matrixProject interpreted path agrees with codegen (and with a driver fold)") {
    import spark.implicits._
    import graft.functions.VectorFunctions.matrixProject
    val mat = Array(Array(1.0, 2.0, -1.0), Array(0.5, 0.0, 3.0))
    val off = Array(0.25, -2.0)
    val rows = Seq(
      Array(1.0, 1.0, 1.0),
      Array(-2.0, 0.5, 4.0),
      Array(9.0),                        // wrong width -> null
      null.asInstanceOf[Array[Double]])  // null vector -> null
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    def run(): Map[Long, Option[Seq[Double]]] =
      df.select(col("id"), matrixProject(col("v"), mat, off).as("p"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getSeq[Double](1).toSeq))).toMap
    val cg = run()
    rows.take(2).zipWithIndex.foreach { case (v, i) =>
      val want = mat.zip(off).map { case (row, o) =>
        row.zip(v).map { case (a, b) => a * b }.sum - o }
      assert(cg(i.toLong).get == want.toSeq, s"row $i")
    }
    assert(cg(2L).isEmpty && cg(3L).isEmpty, "length contract")
    val conf = spark.conf
    val oldWs = conf.get("spark.sql.codegen.wholeStage")
    val oldFm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == cg, "interpreted == codegen")
    finally {
      conf.set("spark.sql.codegen.wholeStage", oldWs)
      conf.set("spark.sql.codegen.factoryMode", oldFm)
    }
  }

  test("pcaWhiten: identity covariance, zero mean, rank-deficiency rejection") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    // anisotropic cloud: axis variances differ by 100x, so whitening has
    // real work to do
    val pts = Vector.fill(300)(Array(
      rnd.nextGaussian() * 10 + 3.0, rnd.nextGaussian() * 1 - 1.0,
      rnd.nextGaussian() * 0.5))
    val df = pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "vec")
    val model = Similarity.pcaFit(df, "vec", k = 3)
    val rows = Similarity.pcaWhiten(df, "id", "vec", model)
      .collect().map(r => r.getSeq[Double](1).toArray)
    val n = rows.length
    val k = 3
    // population covariance of the whitened output == identity
    val mean = Array.tabulate(k)(j => rows.map(_(j)).sum / n)
    for (i <- 0 until k; j <- 0 until k) {
      val c = rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(c - want) < 1e-9, s"cov($i,$j)=$c")
    }
    mean.foreach(m => assert(math.abs(m) < 1e-9, "whitened mean is zero"))
    // rank-deficient data (a constant third axis) must be rejected loudly
    val flat = Vector.fill(50)(Array(rnd.nextGaussian(), rnd.nextGaussian(), 7.0))
    val fdf = flat.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "vec")
    val fmodel = Similarity.pcaFit(fdf, "vec", k = 3)
    val ex = intercept[IllegalArgumentException] {
      Similarity.pcaWhiten(fdf, "id", "vec", fmodel)
    }
    assert(ex.getMessage.contains("rank-deficient"))
    // ...but whitening within the effective rank is fine
    Similarity.pcaWhiten(fdf, "id", "vec",
      Similarity.pcaFit(fdf, "vec", k = 2)).collect()
  }

  test("float vectors, null handling, and malformed-length rows") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(2.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f)),
      (4L, null.asInstanceOf[Array[Float]]), // skipped in fit, null proj
      (5L, Array(9.0f))) // ragged: would throw in fit if included
    val clean = rows.take(4).toDF("id", "vec")
    val model = Similarity.pcaFit(clean, "vec", k = 2)
    assert(model.nRows == 3)
    val proj = Similarity.pcaProject(rows.toDF("id", "vec"), "id", "vec", model)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(proj(4L).isEmpty, "null vector projects to null")
    assert(proj(5L).isEmpty, "wrong-width vector projects to null (length contract)")
    assert(proj(1L).nonEmpty && proj(2L).nonEmpty)
    // projected variance equals eigenvalues (population), the q_pca_embed gate device
    val pv = Similarity.pcaProject(clean.filter(col("id") <= 3), "id", "vec", model)
      .select(var_pop(element_at(col("proj"), 1)).as("v0"),
        var_pop(element_at(col("proj"), 2)).as("v1")).head()
    assert(math.abs(pv.getDouble(0) - model.eigenvalues(0)) < 1e-9)
    assert(math.abs(pv.getDouble(1) - model.eigenvalues(1)) < 1e-9)
    // ragged widths fail loudly (wrapped by Spark's task failure)
    def mentionsRagged(t: Throwable): Boolean =
      t != null && (t.toString.contains("ragged") || mentionsRagged(t.getCause))
    val ex = intercept[Exception] {
      Similarity.pcaFit(rows.toDF("id", "vec"), "vec", k = 1)
    }
    assert(mentionsRagged(ex), s"expected the ragged-dimension error, got $ex")
  }
}
