package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.StringType

import graft.core.Direction

/**
 * SQL-surface registration: exposes the skyline aggregate to
 * `spark.sql(...)` so the whole engine is reachable without the Scala
 * DSL:
 *
 * {{{
 *   GraftFunctions.register(spark)
 *   spark.sql("""
 *     SELECT p._1 AS price, p._2 AS discount
 *     FROM (SELECT explode(skyline_agg('min,min', l_extendedprice, l_discount)) AS p
 *           FROM lineitem)
 *   """)
 * }}}
 *
 * `skyline_agg(<directions literal>, dim1, dim2, ...)` — the first
 * argument is a foldable comma-separated min/max list, one entry per
 * dimension column; returns array<array<double>> (the sorted skyline).
 */
object GraftFunctions {

  private def buildSkylineAgg(exprs: Seq[Expression]): Expression = {
    require(exprs.length >= 2,
      "skyline_agg(directions, dim1, ...) needs a directions literal and at least one dimension")
    val minDir = exprs.head match {
      case Literal(s, StringType) if s != null =>
        s.toString.split(",").map(_.trim.toLowerCase).map {
          case "min" => true
          case "max" => false
          case other => throw new IllegalArgumentException(
            s"skyline_agg direction must be min or max, got '$other'")
        }
      case other => throw new IllegalArgumentException(
        s"skyline_agg's first argument must be a string literal of directions, got $other")
    }
    require(minDir.length == exprs.length - 1,
      s"skyline_agg: ${minDir.length} directions for ${exprs.length - 1} dimension columns")
    SkylineAggExpr(exprs.tail, minDir).toAggregateExpression()
  }

  /** Register graft's SQL functions on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = org.apache.spark.sql.graft.FunctionRegistration
    reg.registerAggregate(spark, "skyline_agg", buildSkylineAgg)
    reg.registerAggregate(spark, "graft_dot",
      exprs => graft.functions.DotProduct(exprs(0), exprs(1)))
    reg.registerAggregate(spark, "graft_squared_norm",
      exprs => graft.functions.SquaredNorm(exprs.head))
    reg.registerAggregate(spark, "graft_sorted_intersect_count",
      exprs => graft.functions.SortedIntersectCount(exprs(0), exprs(1)))
  }
}
