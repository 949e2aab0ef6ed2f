package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Direction.{Max, Min}
import graft.operators._
import graft.operators.SkylineOps._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    t(spark, "/root/testdata/sf0.001", "lineitem")
      .skyline(Seq("l_extendedprice" -> Min, "l_discount" -> Min))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- skyline operator (SURVEY §2.1 D1-D12) ------------------------
    "sky_li_2d" -> ((s, dir) =>
      t(s, dir, "lineitem").skyline("SKYLINE OF l_extendedprice MIN, l_discount MIN")),
    "sky_part_minmax" -> ((s, dir) =>
      t(s, dir, "part").skyline(Seq("p_retailprice" -> Min, "p_size" -> Max))),
    "sky_orders_maxmin" -> ((s, dir) =>
      t(s, dir, "orders").skyline(Seq("o_totalprice" -> Max, "o_orderdate" -> Min))),
    "sky_events_2d" -> ((s, dir) =>
      t(s, dir, "events").skyline(Seq("value" -> Max, "user_id" -> Min))),
    "sky_li_3d" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
        .skyline(Seq("l_quantity" -> Min, "l_extendedprice" -> Min, "l_discount" -> Min))),
    // Partitioning-scheme hints (MR_DIM / MR_GRID / MR_ANGLE): same result
    // as sky_li_2d by the partitioning-invariance property — same oracle.
    "sky_hint_dim" -> ((s, dir) =>
      t(s, dir, "lineitem").skyline(
        SkylineQueryDims.li2d, hint = DimHint(12))),
    "sky_hint_grid" -> ((s, dir) =>
      t(s, dir, "lineitem").skyline(
        SkylineQueryDims.li2d, hint = GridHint(4))),
    "sky_hint_angle" -> ((s, dir) =>
      t(s, dir, "lineitem").skyline(
        SkylineQueryDims.li2d, hint = AngleHint(8))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {

    /** O(n log n) exact 2-D skyline oracle: sort by dim1 (best first), a
      * point survives iff its dim2 strictly beats the best dim2 seen among
      * all preceding rows. `asc1`/`asc2` encode MIN (asc) / MAX (desc). */
    def sky2d(table: String, c1: String, c2: String, min1: Boolean, min2: Boolean,
              where: String = ""): String = {
      val ord1 = if (min1) "ASC" else "DESC"
      val ord2 = if (min2) "ASC" else "DESC"
      val agg = if (min2) "min" else "max"
      val cmp = if (min2) "<" else ">"
      s"""WITH d AS (SELECT DISTINCT $c1, $c2 FROM $table $where),
         |m AS (SELECT $c1, $c2,
         |        $agg($c2) OVER (ORDER BY $c1 $ord1, $c2 $ord2
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
         |      FROM d)
         |SELECT $c1, $c2 FROM m WHERE prev IS NULL OR $c2 $cmp prev""".stripMargin
    }

    val li2dOracle = sky2d("lineitem", "l_extendedprice", "l_discount", min1 = true, min2 = true)

    Map(
      "sky_li_2d" -> li2dOracle,
      "sky_hint_dim" -> li2dOracle,
      "sky_hint_grid" -> li2dOracle,
      "sky_hint_angle" -> li2dOracle,
      "sky_part_minmax" -> sky2d("part", "p_retailprice", "p_size", min1 = true, min2 = false),
      "sky_orders_maxmin" -> sky2d("orders", "o_totalprice", "o_orderdate", min1 = false, min2 = true),
      "sky_events_2d" -> sky2d("events", "value", "user_id", min1 = false, min2 = true),
      "sky_li_3d" ->
        """WITH d AS (SELECT DISTINCT l_quantity, l_extendedprice, l_discount
          |           FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01')
          |SELECT l_quantity, l_extendedprice, l_discount FROM d p
          |WHERE NOT EXISTS (SELECT 1 FROM d q
          |  WHERE q.l_quantity <= p.l_quantity
          |    AND q.l_extendedprice <= p.l_extendedprice
          |    AND q.l_discount <= p.l_discount
          |    AND (q.l_quantity < p.l_quantity
          |      OR q.l_extendedprice < p.l_extendedprice
          |      OR q.l_discount < p.l_discount))""".stripMargin,
    )
  }
}

/** Shared dimension specs reused across hint-variant queries. */
object SkylineQueryDims {
  import graft.core.Direction
  val li2d: Seq[(String, Direction)] =
    Seq("l_extendedprice" -> Direction.Min, "l_discount" -> Direction.Min)
}
