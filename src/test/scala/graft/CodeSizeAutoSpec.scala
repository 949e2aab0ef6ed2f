package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Round 16 (VERDICT r15 item 2 fold-in): `m`/`ksub` = auto on the
  * conf-driven IVFPQ path resolves the residual code size from the
  * measured worst-cell occupancy — 16x32 (the documented default,
  * byte-stable for every existing gate) below the density threshold,
  * 32x256 above it (the regime where the r16 100M tier measured
  * 16-byte codes losing recall to ADC quantization noise). */
class CodeSizeAutoSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def corpus(n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def confAuto[T](extra: (String, String)*)(f: => T): T = {
    val keys = Seq("algo", "nlist", "nprobe", "tppc", "shortlist") ++
      extra.map(_._1)
    try {
      spark.conf.set("spark.graft.ann.algo", "ivfpq")
      Seq("nlist", "nprobe", "tppc", "shortlist")
        .foreach(k => spark.conf.set(s"spark.graft.ann.$k", "auto"))
      extra.foreach { case (k, v) => spark.conf.set(s"spark.graft.ann.$k", v) }
      f
    } finally keys.foreach(k => spark.conf.unset(s"spark.graft.ann.$k"))
  }

  test("m/ksub auto resolves to the 16x32 default below the density threshold") {
    val c = corpus(600)
    confAuto() {
      val (idx, _, _) = Similarity.annBuildIvfPq(c, "vec_id", "embedding", 64)
      try {
        assert(idx.model.m == 16 && idx.model.ksub == 32,
          s"sparse-regime auto must keep the documented default, got " +
            s"${idx.model.m}x${idx.model.ksub}")
      } finally idx.unpersist()
    }
  }

  test("m/ksub auto doubles the code size when a cell crosses the density threshold") {
    // 600 rows with nlist=4 -> worst cell well above a threshold of 64
    val c = corpus(600)
    confAuto("nlist" -> "4", "denseCellThreshold" -> "64") {
      val (idx, _, _) = Similarity.annBuildIvfPq(c, "vec_id", "embedding", 64)
      try {
        assert(idx.model.m == 32 && idx.model.ksub == 256,
          s"dense-regime auto must pick 32x256, got " +
            s"${idx.model.m}x${idx.model.ksub}")
      } finally idx.unpersist()
    }
  }

  test("explicit m/ksub pin regardless of density") {
    val c = corpus(600)
    confAuto("nlist" -> "4", "denseCellThreshold" -> "64",
      "m" -> "16", "ksub" -> "32") {
      val (idx, _, _) = Similarity.annBuildIvfPq(c, "vec_id", "embedding", 64)
      try assert(idx.model.m == 16 && idx.model.ksub == 32)
      finally idx.unpersist()
    }
  }

  // ADVICE r16: one explicit knob + one auto knob must resolve
  // coherently — the probe fills ONLY the auto one (the r16 shape
  // passed the -1 sentinel straight into pqTrain when m was explicit
  // and ksub auto, and silently discarded an explicit ksub when m was
  // auto).
  test("explicit m with ksub=auto keeps m and fills ksub from the probe") {
    val c = corpus(600)
    confAuto("nlist" -> "4", "denseCellThreshold" -> "64", "m" -> "16") {
      val (idx, _, _) = Similarity.annBuildIvfPq(c, "vec_id", "embedding", 64)
      try assert(idx.model.m == 16 && idx.model.ksub == 256,
        s"expected pinned m=16 with probed ksub=256, got " +
          s"${idx.model.m}x${idx.model.ksub}")
      finally idx.unpersist()
    }
  }

  test("explicit ksub with m=auto keeps ksub and fills m from the probe") {
    val c = corpus(600)
    confAuto("nlist" -> "4", "denseCellThreshold" -> "64", "ksub" -> "32") {
      val (idx, _, _) = Similarity.annBuildIvfPq(c, "vec_id", "embedding", 64)
      try assert(idx.model.m == 32 && idx.model.ksub == 32,
        s"expected probed m=32 with pinned ksub=32, got " +
          s"${idx.model.m}x${idx.model.ksub}")
      finally idx.unpersist()
    }
  }

  // ADVICE r16: a dense-regime pick on a width not divisible by 32
  // (e.g. d=48) must downgrade to the largest divisor instead of
  // crashing pqTrain's require(dim % m == 0).
  test("dense pick downgrades m to the largest divisor of a non-32-divisible dim") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val c = (0 until 600).map { i =>
      (i.toLong, Array.fill(48)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
    confAuto("nlist" -> "4", "denseCellThreshold" -> "64") {
      val (idx, _, _) = Similarity.annBuildIvfPq(c, "vec_id", "embedding", 48)
      try assert(idx.model.m == 24 && idx.model.ksub == 256,
        s"expected downgraded m=24 (largest divisor of 48 <= 32) with " +
          s"ksub=256, got ${idx.model.m}x${idx.model.ksub}")
      finally idx.unpersist()
    }
  }

  // Round 17: the code-size probe's calibration width transfers to the
  // built index's memo — a probe-time nprobe=auto must not re-run the
  // calibration scan on a fresh auto build.
  test("auto build seeds the calibration memo (no probe-time rescan)") {
    val c = corpus(600)
    confAuto() {
      val (idx, np, _) = Similarity.annBuildIvfPq(c, "vec_id", "embedding", 64)
      try {
        assert(np >= 1)
        assert(idx.calibrationScans == 0,
          s"nprobe=auto after an auto build must hit the seeded memo, " +
            s"ran ${idx.calibrationScans} scan(s)")
      } finally idx.unpersist()
    }
  }
}
