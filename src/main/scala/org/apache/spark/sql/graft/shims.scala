package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Access shim for `private[sql]` Column <-> Expression conversion —
 * the standard pattern for Spark extension libraries that define custom
 * Catalyst expressions (cf. Sedona/Delta shim objects). Spark 4 removed
 * the public `Column(expr)`/`col.expr` accessors in the Connect
 * refactor; `classic.ExpressionUtils` is the blessed internal API.
 */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Access shim for the `private[sql]` session function registry, used to
  * expose graft's functions (scalar and aggregate) to `spark.sql(...)`. */
object FunctionRegistration {
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
