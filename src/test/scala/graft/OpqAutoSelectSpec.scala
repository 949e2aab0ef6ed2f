package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/**
 * Round 15 (VERDICT r14 item 5): `opqIters=auto` — the residual-
 * spectrum anisotropy probe that decides whether the conf path learns
 * an OPQ rotation. The probe must be ROTATION-INVARIANT (a Hadamard-
 * mixed anisotropic corpus has equal per-dimension variances, so any
 * per-dim measure reads it isotropic), and isotropic corpora must
 * resolve to opqIters=0 BIT-IDENTICALLY to the old default so every
 * existing small-SF gate stays byte-stable.
 */
class OpqAutoSelectSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private def embs = spark.read.parquet(s"$dir/embeddings.parquet")

  test("participationRatio: flat spectrum -> d, single mode -> 1, decay matches closed form") {
    assert(Similarity.participationRatio(Array.fill(64)(3.0)) === 64.0)
    assert(Similarity.participationRatio(
      Array(5.0) ++ Array.fill(63)(0.0)) === 1.0)
    // geometric decay r^j: PR = (sum r^j)^2 / sum r^2j
    val r = 0.7071
    val l = Array.tabulate(64)(j => math.pow(r, j))
    val want = math.pow(l.sum, 2) / l.map(x => x * x).sum
    assert(math.abs(Similarity.participationRatio(l) - want) < 1e-9)
    // negative numerical-noise eigenvalues are clamped, not squared into
    // a fake mass
    assert(Similarity.participationRatio(Array(4.0, -1e-12)) === 1.0)
  }

  test("anisotropy probe is rotation-invariant: Hadamard-mixed decaying scales read anisotropic") {
    import spark.implicits._
    val d = 16
    def sign(i: Int, j: Int): Int = Integer.bitCount(i & j) % 2 * -2 + 1
    val had = Array.tabulate(d, d)((i, j) => sign(i, j) / math.sqrt(d))
    val rnd = new scala.util.Random(7)
    def mix(z: Array[Double]): Seq[Double] =
      had.map(row => row.zip(z).map { case (a, b) => a * b }.sum).toSeq
    // latent: per-dim scale 0.5^(j/2) — strongly anisotropic
    val aniso = (0 until 2000).map { i =>
      (i.toLong, mix(Array.tabulate(d)(j =>
        rnd.nextGaussian() * math.pow(0.5, j / 2.0))))
    }.toDF("id", "u")
    // isotropic control: same generator, flat scales
    val iso = (0 until 2000).map { i =>
      (i.toLong, mix(Array.tabulate(d)(_ => rnd.nextGaussian())))
    }.toDF("id", "u")
    val prAniso = Similarity.participationRatio(
      Similarity.pcaFit(aniso, "u", d).eigenvalues)
    val prIso = Similarity.participationRatio(
      Similarity.pcaFit(iso, "u", d).eigenvalues)
    // the mixed aniso corpus has near-EQUAL per-dim variances (what a
    // per-dim probe sees) yet a collapsed spectrum (what this probe
    // sees); the iso control stays near d
    assert(prAniso < d * Similarity.OpqAutoParticipationFrac,
      s"aniso PR $prAniso must fall under the ${d * 0.5} threshold")
    assert(prIso > d * 0.8, s"iso PR $prIso must stay near d=$d")
  }

  test("opqIters default-auto resolves to 0 on isotropic embeddings — conf gates stay byte-stable") {
    val e = embs
    val q = e.filter(col("vec_id") < 20)
    val conf = spark.conf
    val keys = Seq("algo", "nlist", "nprobe", "tppc", "shortlist", "opqIters")
    def run(explicitZero: Boolean): Seq[Seq[Any]] =
      try {
        conf.set("spark.graft.ann.algo", "ivfpq")
        Seq("nlist", "nprobe", "tppc", "shortlist")
          .foreach(k => conf.set(s"spark.graft.ann.$k", "auto"))
        if (explicitZero) conf.set("spark.graft.ann.opqIters", "0")
        Similarity.annTopK(e, q, "vec_id", "embedding", k = 5, dim = 64)
          .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
      } finally keys.foreach(k => conf.unset(s"spark.graft.ann.$k"))
    val auto = run(explicitZero = false)
    val zero = run(explicitZero = true)
    assert(auto.nonEmpty && auto == zero,
      "default-auto OPQ must be bit-identical to opqIters=0 on isotropic data")
  }

  test("EnvProbe: effective cores in (0, nproc]; spin positive") {
    val nproc = Runtime.getRuntime.availableProcessors()
    val eff = EnvProbe.effectiveCores()
    assert(eff > 0 && eff <= nproc, s"eff_cores $eff out of (0, $nproc]")
    val snap = EnvProbe.snapshotJson("start")
    assert(snap.contains("\"spin_start_s\":") &&
      snap.contains("\"eff_cores_start\":") && snap.contains("\"load_start\":"))
  }
}
