package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** The ed-join prefix filter claims to be LOSSLESS — every spec here is
  * brute-force equality, so a filter that drops a true pair fails. */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0)
      dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  private def brute(left: Seq[(Long, String)], right: Seq[(Long, String)],
      d: Int): Set[(Long, Long, Int)] =
    (for {
      (i1, t1) <- left; (i2, t2) <- right
      dist = lev(t1, t2) if dist <= d
    } yield (i1, i2, dist)).toSet

  private def run(left: Seq[(Long, String)], right: Seq[(Long, String)],
      d: Int, q: Int): Set[(Long, Long, Int)] = {
    import spark.implicits._
    FuzzyJoin.edJoin(
      left.toDF("id", "t"), right.toDF("id", "t"), "id", "t", "id", "t", d, q)
      .as[(Long, Long, Int)].collect().toSet
  }

  test("edJoin equals brute force on a hand-built catalog (delete/sub/swap edits)") {
    val left = Seq(1L -> "small ring", 2L -> "red widget", 3L -> "blue bolt",
      4L -> "hot gear", 5L -> "small gizmo")
    val right = Seq(11L -> "small ringg", 12L -> "rd widget", 13L -> "blue blot",
      14L -> "hot gera", 15L -> "large gizmo", 16L -> "unrelated name",
      17L -> "red widgets", 18L -> "smallring")
    for (d <- 0 to 3; q <- Seq(2, 3)) {
      assert(run(left, right, d, q) == brute(left, right, d), s"d=$d q=$q")
    }
  }

  test("edJoin equals brute force on random strings incl. short ones") {
    val alphabet = "abcde "
    for (seed <- 1 to 4) {
      val rnd = new Random(seed)
      def randStr(): String =
        (0 until (1 + rnd.nextInt(14))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val left = (1L to 60L).map(i => i -> randStr())
      val right = (101L to 180L).map(i => i -> randStr())
      for (d <- Seq(1, 2)) {
        assert(run(left, right, d, 2) == brute(left, right, d), s"seed=$seed d=$d")
      }
    }
  }

  test("edJoin: null and sub-q-length strings handled, nulls never match") {
    import spark.implicits._
    val left = Seq((1L, "ab"), (2L, "a"), (3L, null: String), (4L, "abcdefgh"))
    val right = Seq((11L, "ab"), (12L, "b"), (13L, null: String), (14L, "abcdefxh"))
    val got = FuzzyJoin.edJoin(left.toDF("id", "t"), right.toDF("id", "t"),
      "id", "t", "id", "t", maxDistance = 1, q = 2)
      .as[(Long, Long, Int)].collect().toSet
    val want = brute(left.filter(_._2 != null), right.filter(_._2 != null), 1)
    assert(got == want)
  }

  test("edJoin: short-sliver cap trips loudly on a mostly-short corpus") {
    import spark.implicits._
    val left = (1L to 30L).map(i => i -> "ab")
    val right = (101L to 130L).map(i => i -> "ba")
    assertThrows[IllegalArgumentException] {
      FuzzyJoin.edJoin(left.toDF("id", "t"), right.toDF("id", "t"),
        "id", "t", "id", "t", maxDistance = 2, q = 3, shortPairCap = 100L)
    }
  }

  test("edJoin on the real part catalog matches brute force") {
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    import spark.implicits._
    val rows = part.select(col("p_partkey").cast("long"), col("p_name"))
      .as[(Long, String)].collect().toSeq
    val left = rows.filter(_._1 % 10 == 0)
    val got = run(left, rows, 2, 2)
    assert(got == brute(left, rows, 2))
    assert(got.nonEmpty)
  }
}
