package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{NearestCentroid, NearestCentroidTwoLevel}

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

  // ------------------------------------------------------------------
  // Two-level assignment kernel (round 13)
  // ------------------------------------------------------------------

  private def evalTwoLevel(v: Array[Double], supers: Seq[Array[Double]],
      members: Seq[Array[Int]], cents: Seq[Array[Double]]): Any = {
    val dim = cents.head.length
    val off = members.scanLeft(0)(_ + _.length).toArray
    NearestCentroidTwoLevel(
      Literal.create(v, ArrayType(DoubleType, containsNull = false)),
      supers.flatten.toArray, supers.length, off, members.flatten.toArray,
      cents.flatten.toArray, cents.length, dim).eval(null)
  }

  property("two-level with COMPLETE member lists == flat argmin (any supers)") =
    forAll(shape.flatMap { case (d, nc) =>
      for {
        cents <- Gen.listOfN(nc, Gen.listOfN(d, coord).map(_.toArray))
        ns <- Gen.choose(1, 4)
        supers <- Gen.listOfN(ns, Gen.listOfN(d, coord).map(_.toArray))
        v <- Gen.listOfN(d, Gen.frequency(9 -> coord, 1 -> Gen.const(Double.NaN)))
          .map(_.toArray)
      } yield (v, supers, cents)
    }) { case (v, supers, cents) =>
      // every group's member list is the full ascending index set, so
      // the level-1 choice is irrelevant and the result must equal the
      // flat argmin INCLUDING tie order
      val all = cents.indices.toArray
      evalTwoLevel(v, supers, Seq.fill(supers.length)(all), cents) ==
        referenceArgmin(v, cents)
    }

  property("two-level == reference argmin restricted to the chosen group's list") =
    forAll(shape.flatMap { case (d, nc) =>
      for {
        cents <- Gen.listOfN(nc, Gen.listOfN(d, coord).map(_.toArray))
        spill <- Gen.choose(1, 4)
        v <- Gen.listOfN(d, coord).map(_.toArray)
      } yield (v, cents, spill)
    }) { case (v, cents, spill) =>
      // the production structure: the kernel must pick exactly the
      // full-sum argmin over the member list of the reference-chosen
      // supergroup (validating both levels against independent math)
      val (supers, members) =
        graft.operators.Similarity.superStructure(cents.toArray, spill)
      val g = referenceArgmin(v, supers.toIndexedSeq)
      val list = members(g)
      val want = list(referenceArgmin(v, list.map(cents(_)).toIndexedSeq))
      evalTwoLevel(v, supers.toIndexedSeq, members.toIndexedSeq, cents) == want
    }

  property("superStructure: spill >= nsuper makes every list complete -> flat parity") =
    forAll(shape.suchThat(_._2 >= 2).flatMap { case (d, nc) =>
      for {
        cents <- Gen.listOfN(nc, Gen.listOfN(d, coord).map(_.toArray))
        v <- Gen.listOfN(d, coord).map(_.toArray)
      } yield (v, cents)
    }) { case (v, cents) =>
      val (supers, members) =
        graft.operators.Similarity.superStructure(cents.toArray, spill = cents.length)
      members.forall(_.length == cents.length) &&
        evalTwoLevel(v, supers.toIndexedSeq, members.toIndexedSeq, cents) ==
          referenceArgmin(v, cents)
    }

  property("two-level: wrong-length vectors evaluate to null") =
    forAll(Gen.choose(2, 6)) { d =>
      val cents = Seq(Array.fill(d)(0.0), Array.fill(d)(1.0))
      val (supers, members) =
        graft.operators.Similarity.superStructure(cents.toArray, 2)
      evalTwoLevel(Array.fill(d + 1)(1.0), supers.toIndexedSeq,
        members.toIndexedSeq, cents) == null &&
        evalTwoLevel(Array.fill(d - 1)(1.0), supers.toIndexedSeq,
          members.toIndexedSeq, cents) == null
    }
}
