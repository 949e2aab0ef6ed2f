package graft

import scala.io.Source
import scala.util.Using

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Direction
import graft.core.Direction.{Max, Min}
import graft.operators.{AngleHint, DimHint, GridHint, NoHint, PartitionHint}
import graft.operators.SkylineOps._

/**
 * Golden-output replay (SURVEY.md §5.3): the reference ships manually
 * verified skylines for `points_D_2_N_100_000.csv` under all four
 * direction combinations (`/root/reference/data/expected_skyline_output
 * .txt:11-29`). Replay them through the Spark engine; compare as
 * order-insensitive point sets.
 */
class GoldenReplaySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val goldenPath = "/root/reference/data/expected_skyline_output.txt"
  private val csvPath = "/root/reference/data/points_D_2_N_100_000.csv"

  /** Parse the golden file: section per input file, blocks of
    * "----SKYLINE OF ...----" followed by "[{a, b}, ...]". */
  private def goldenCases(file: String): Map[String, Set[(Long, Long)]] = {
    val text = Using.resource(Source.fromFile(goldenPath))(_.mkString)
    // The file's section runs from its header (skipping the header line's
    // own trailing '#'s) to the next "################ points_..." header.
    val idx = text.indexOf(file)
    require(idx >= 0, s"$file not found in golden file")
    val after = text.substring(idx + file.length)
    val end = after.indexOf("################ points")
    val body = if (end >= 0) after.substring(0, end) else after
    val block = raw"-+\s*(SKYLINE OF[^-]+?)-+\s*\n\s*\n?\s*(\[[^\]]*\])".r
    block.findAllMatchIn(body).map { m =>
      val q = m.group(1).trim
      val pts = raw"\{\s*(\d+)\s*,\s*(\d+)\s*\}".r
        .findAllMatchIn(m.group(2))
        .map(p => (p.group(1).toLong, p.group(2).toLong)).toSet
      q -> pts
    }.toMap
  }

  test("D=3 reference corpus: Spark engine agrees with the pure-Scala core") {
    // no golden output exists for D=3 ("Too big to paste here") — gate the
    // distributed path against the independently-tested pure core instead.
    val schema = StructType(Seq("x1", "x2", "x3").map(StructField(_, LongType)))
    val df = spark.read.schema(schema)
      .csv("/root/reference/data/points_D_3_N_100_000.csv").cache()
    val got = df.skyline(Seq("x1" -> Min, "x2" -> Min, "x3" -> Min))
      .collect().map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pts = df.collect().map(r =>
      Array(r.getLong(0).toDouble, r.getLong(1).toDouble, r.getLong(2).toDouble))
    val want = graft.core.SkylineCore.skylineOf(pts, Array(true, true, true))
      .map(_.map(_.toLong).toSeq).toSet
    df.unpersist()
    assert(got == want && got.nonEmpty)
  }

  // The reference's D=5/7/10 N=1M/10M corpora and goldens were stripped
  // from the mirror (`/root/reference/.MISSING_LARGE_BLOBS`), so replay
  // coverage there has a hole. Synthesize fixtures with the REFERENCE'S
  // distribution — i.i.d. uniform integers in [0, 10^9]
  // (configurations.py:17-18 bounds, the generator behind the shipped
  // D=2/D=3 CSVs) — at a spec-sized N=100k, oracle them against the
  // independently-tested pure-Scala core, and require every hint
  // variant (the reference's MR_DIM / MR_GRID / MR_ANGLE schemes) to
  // produce the SAME point set. Hint fan-outs are sized per d so grid /
  // angle key cardinality stays in the thousands, as a sane user would.
  for ((d, gridB, angleP) <- Seq((5, 4, 3), (7, 3, 2), (10, 2, 2))) {
    test(s"high-d synthetic replay (reference distribution, D=$d N=100k): " +
        "all hint variants set-equal to the core oracle") {
      import org.apache.spark.sql.functions._
      val n = 100000L
      val df = spark.range(n).select((0 until d).map(j =>
          pmod(xxhash64(col("id"), lit(j)), lit(1000000000L)).as(s"x${j + 1}")): _*)
        .cache()
      val dims: Seq[(String, Direction)] = (1 to d).map(j => s"x$j" -> (Min: Direction))
      val pts = df.collect().map(r => Array.tabulate(d)(j => r.getLong(j).toDouble))
      val want = graft.core.SkylineCore.skylineOf(pts, Array.fill(d)(true))
        .map(_.map(_.toLong).toSeq).toSet
      assert(want.nonEmpty && want.size < n)
      def got(hint: PartitionHint): Set[Seq[Long]] =
        df.skyline(dims, hint).collect()
          .map(r => (0 until d).map(r.getLong).toSeq: Seq[Long]).toSet
      for (h <- Seq[PartitionHint](NoHint, DimHint(12), GridHint(gridB),
          AngleHint(angleP))) {
        val g = got(h)
        assert(g == want, s"$h mismatch at d=$d: missing=${(want -- g).size} " +
          s"extra=${(g -- want).size} (skyline ${want.size} points)")
      }
      df.unpersist()
    }
  }

  test("replay reference golden skylines on points_D_2_N_100_000.csv") {
    val cases = goldenCases("points_D_2_N_100_000.csv")
    assert(cases.size == 4, s"expected 4 golden direction combos, parsed: ${cases.keys}")

    val schema = StructType(Seq(StructField("x1", LongType), StructField("x2", LongType)))
    val df = spark.read.schema(schema).csv(csvPath).cache()
    for ((query, want) <- cases) {
      val dims: Seq[(String, Direction)] = graft.core.SkylineQuery.parse(query)
      val got = df.skyline(dims)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want,
        s"golden mismatch for '$query': missing=${want -- got} extra=${got -- want}")
    }
    df.unpersist()
  }
}
