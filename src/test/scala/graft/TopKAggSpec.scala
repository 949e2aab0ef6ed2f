package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopKFunctions

/** The bounded top-k heap aggregate must reproduce the window-ranking
  * shape it replaced EXACTLY — same selection, same order, same
  * tie-breaks — while aggregating incrementally across partitions. */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** (group, score, id) rows with deliberate score ties within groups. */
  private def sample(seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = for {
      g <- 0 until 7
      i <- 0 until 200
    } yield (g, math.floor(rnd.nextDouble() * 20) / 10.0, // coarse grid -> many ties
      rnd.nextLong().abs % 10000)
    // distinct ids per group (ties on (score, id) would make rank order
    // between identical entries ambiguous in BOTH implementations)
    rows.toDF("g", "score", "id").dropDuplicates("g", "id")
      .repartition(13) // force multi-partition partial aggregation + merge
  }

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int, largest: Boolean) = {
    val ord = if (largest) Seq(col("score").desc, col("id").asc)
              else Seq(col("score").asc, col("id").asc)
    df.withColumn("rank", row_number().over(Window.partitionBy("g").orderBy(ord: _*)))
      .filter(col("rank") <= k)
      .select("g", "id", "rank", "score")
  }

  private def viaHeap(df: org.apache.spark.sql.DataFrame, k: Int, largest: Boolean) =
    df.groupBy("g")
      .agg(TopKFunctions.topKByScore(col("score"), col("id"), k, largest).as("_top"))
      .select(col("g"), posexplode(col("_top")).as(Seq("_r", "_t")))
      .select(col("g"), col("_t.id").as("id"), (col("_r") + lit(1)).as("rank"),
        col("_t.score").as("score"))

  test("heap top-k == window row_number top-k, ties and all (largest)") {
    for (seed <- Seq(1, 2, 3)) {
      val df = sample(seed).cache()
      val w = viaWindow(df, 10, largest = true).collect().map(_.toSeq).toSet
      val h = viaHeap(df, 10, largest = true).collect().map(_.toSeq).toSet
      assert(h == w, s"seed $seed")
      df.unpersist()
    }
  }

  test("heap top-k == window row_number top-k (smallest)") {
    val df = sample(7).cache()
    val w = viaWindow(df, 5, largest = false).collect().map(_.toSeq).toSet
    val h = viaHeap(df, 5, largest = false).collect().map(_.toSeq).toSet
    assert(h == w)
    df.unpersist()
  }

  test("k larger than the group returns the whole group, ranked") {
    import spark.implicits._
    val df = Seq((0, 1.0, 5L), (0, 2.0, 3L), (0, 2.0, 4L)).toDF("g", "score", "id")
    val got = viaHeap(df, 10, largest = true).collect()
      .map(r => (r.getLong(1), r.getInt(2))).sortBy(_._2)
    assert(got.toSeq == Seq((3L, 1), (4L, 2), (5L, 3)))
  }

  test("null scores and null ids are skipped, not ranked") {
    import spark.implicits._
    val df = Seq[(Int, java.lang.Double, java.lang.Long)](
      (0, 3.0, 1L), (0, null, 2L), (0, 1.0, null), (0, 2.0, 4L))
      .toDF("g", "score", "id")
    val got = viaHeap(df, 10, largest = true).collect()
      .map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 1), (4L, 2)))
  }
}
