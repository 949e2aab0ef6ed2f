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
}
