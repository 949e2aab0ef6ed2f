package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.core.SkylineCore

/**
 * Property-based tests (SURVEY.md §5.2): the incremental skyline against
 * a brute-force O(n^2) oracle, plus the standard skyline invariants.
 * Raw ScalaCheck `Properties` — sbt runs these through ScalaCheck's own
 * test framework.
 */
object SkylinePropertySpec extends Properties("skyline") {

  private def brute(points: Seq[Array[Double]], minDir: Array[Boolean]): Set[Seq[Double]] = {
    val distinct = points.map(_.toSeq).distinct.map(_.toArray)
    distinct
      .filter(p => !distinct.exists(q => SkylineCore.dominates(q, p, minDir)))
      .map(_.toSeq)
      .toSet
  }

  private def sky(points: Seq[Array[Double]], minDir: Array[Boolean]): Set[Seq[Double]] =
    SkylineCore.skylineOf(points, minDir).map(_.toSeq).toSet

  // small integer domain to force duplicates and per-dimension ties
  private def pointsGen(d: Int): Gen[List[Array[Double]]] =
    Gen.listOf(Gen.listOfN(d, Gen.choose(0, 8)).map(_.map(_.toDouble).toArray))

  private def dirGen(d: Int): Gen[Array[Boolean]] =
    Gen.listOfN(d, Gen.oneOf(true, false)).map(_.toArray)

  for (d <- 2 to 4)
    property(s"matches brute-force oracle d=$d") =
      forAll(pointsGen(d), dirGen(d)) { (pts, dirs) =>
        sky(pts, dirs) == brute(pts, dirs)
      }

  property("subset + non-dominated + covering") =
    forAll(pointsGen(3), dirGen(3)) { (pts, dirs) =>
      val s = sky(pts, dirs)
      val inSet = pts.map(_.toSeq).toSet
      s.subsetOf(inSet) &&
      s.forall(m => !pts.exists(q => SkylineCore.dominates(q, m.toArray, dirs))) &&
      inSet.forall(p =>
        s.contains(p) || s.exists(m => SkylineCore.dominates(m.toArray, p.toArray, dirs)))
    }

  property("invariant under permutation and duplication") =
    forAll(pointsGen(2), dirGen(2), Gen.long) { (pts, dirs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(pts)
      val base = sky(pts, dirs)
      sky(shuffled, dirs) == base && sky(pts ++ pts, dirs) == base
    }

  property("MIN on x == MAX on -x") =
    forAll(pointsGen(3)) { pts =>
      val neg = pts.map(_.map(-_))
      sky(neg, Array.fill(3)(false)).map(_.map(-_)) == sky(pts, Array.fill(3)(true))
    }

  property("merge of partial skylines == skyline of union") =
    forAll(pointsGen(3), pointsGen(3), dirGen(3)) { (a, b, dirs) =>
      val merged = SkylineCore.merge(
        SkylineCore.skylineOf(a, dirs),
        SkylineCore.skylineOf(b, dirs),
        dirs)
      merged.map(_.toSeq).toSet == sky(a ++ b, dirs)
    }

  property("occupancy grid prune is safe: skyline points never land in pruned cells") =
    forAll(pointsGen(2), dirGen(2), Gen.choose(2, 5)) { (pts, dirs, b) =>
      val bounds = Array((0.0, 8.0), (0.0, 8.0))
      def cell(p: Array[Double]) =
        SkylineCore.gridKey(b, SkylineCore.gridDigits(b, bounds, p))
      val occupied = pts.map(cell).distinct.map(_.toLong)
      val kept = SkylineCore.keptOccupiedKeys(dirs, b, occupied).toSet
      sky(pts, dirs).forall(p => kept.contains(cell(p.toArray)))
    }

  // The reference's geometric best-cell prune (functions.py:177-192) is
  // unsound on sparse data — pin the counterexample so the deviation stays
  // documented: (5,5) is in the true skyline but its cell is pruned.
  property("reference geometric prune drops a skyline point on sparse data") = {
    val dirs = Array(true, true)
    val bounds = Array((0.0, 8.0), (0.0, 8.0))
    val pts = Seq(Array(0.0, 8.0), Array(8.0, 0.0), Array(5.0, 5.0))
    val keptRef = SkylineCore.keptGridKeys(dirs, 2).toSet
    val cellOf55 = SkylineCore.gridKey(2, SkylineCore.gridDigits(2, bounds, Array(5.0, 5.0)))
    val inTrueSkyline = sky(pts, dirs).contains(Seq(5.0, 5.0))
    Prop(inTrueSkyline && !keptRef.contains(cellOf55) &&
      SkylineCore.keptOccupiedKeys(dirs, 2, pts.map(p =>
        SkylineCore.gridKey(2, SkylineCore.gridDigits(2, bounds, p)).toLong).distinct)
        .contains(cellOf55.toLong))
  }

  property("angle keys partition: every point gets a key in [0, p^(d-1))") =
    forAll(Gen.listOf(Gen.listOfN(3, Gen.choose(0, 1000)).map(_.map(_.toDouble).toArray)),
      Gen.choose(2, 6)) { (pts, p) =>
      pts.forall { x =>
        val k = SkylineCore.angleKey(p, x)
        k >= 0 && k < p * p
      }
    }
}
