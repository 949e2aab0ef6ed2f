package graft

import scala.io.Source
import scala.util.Using

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Direction
import graft.core.Direction.{Max, Min}
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
