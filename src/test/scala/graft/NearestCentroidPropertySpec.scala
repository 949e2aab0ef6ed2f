package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.NearestCentroid

/**
 * Property gate for the allocation-free argmin kernel (round 12): the
 * interpreted eval against a reference argmin that always computes FULL
 * sums — so any early-exit bug (the kernel abandons a centroid's
 * accumulation once the partial sum reaches the current best) shows up
 * as a wrong winner. Small integer domains force exact distance ties
 * (must break to the LOWER centroid index, matching
 * array_position(array_min) semantics); NaN coordinates exercise the
 * java.lang.Double.compare ordering (NaN largest, like Spark's sort).
 * Codegen parity with the materializing form is covered in
 * FunctionsSpec over a Spark session.
 */
object NearestCentroidPropertySpec extends Properties("nearest_centroid") {

  private def referenceArgmin(v: Array[Double], cents: Seq[Array[Double]]): Int = {
    val sums = cents.map { c =>
      var s = 0.0
      var j = 0
      while (j < v.length) { val d = v(j) - c(j); s += d * d; j += 1 }
      s
    }
    // first index of the minimum under Spark's double ordering
    var best = 0
    var i = 1
    while (i < sums.length) {
      if (java.lang.Double.compare(sums(i), sums(best)) < 0) best = i
      i += 1
    }
    best
  }

  private def eval(v: Array[Double], cents: Seq[Array[Double]]): Any = {
    val dim = cents.head.length
    NearestCentroid(
      Literal.create(v, ArrayType(DoubleType, containsNull = false)),
      cents.flatten.toArray, cents.length, dim).eval(null)
  }

  private val coord: Gen[Double] = Gen.frequency(
    8 -> Gen.choose(0, 4).map(_.toDouble), // tiny int domain -> exact ties
    2 -> Gen.choose(-1.0, 1.0))

  private def shape: Gen[(Int, Int)] =
    for { d <- Gen.choose(1, 8); nc <- Gen.choose(1, 12) } yield (d, nc)

  property("argmin == full-sum reference, ties to the lower index") =
    forAll(shape.flatMap { case (d, nc) =>
      for {
        cents <- Gen.listOfN(nc, Gen.listOfN(d, coord).map(_.toArray))
        v <- Gen.listOfN(d, coord).map(_.toArray)
      } yield (v, cents)
    }) { case (v, cents) =>
      eval(v, cents) == referenceArgmin(v, cents)
    }

  property("NaN coordinates: kernel matches the reference's compare ordering") =
    forAll(shape.flatMap { case (d, nc) =>
      for {
        cents <- Gen.listOfN(nc, Gen.listOfN(d, coord).map(_.toArray))
        v <- Gen.listOfN(d, Gen.frequency(9 -> coord, 1 -> Gen.const(Double.NaN)))
          .map(_.toArray)
      } yield (v, cents)
    }) { case (v, cents) =>
      eval(v, cents) == referenceArgmin(v, cents)
    }

  property("wrong-length vectors evaluate to null") =
    forAll(Gen.choose(2, 6)) { d =>
      val cents = Seq(Array.fill(d)(0.0))
      eval(Array.fill(d + 1)(1.0), cents) == null &&
        eval(Array.fill(d - 1)(1.0), cents) == null
    }
}
