package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * Cluster-wide installation entry point — the standard Spark extension
 * mechanism (the same one Delta/Sedona/Iceberg use). Lets an operator
 * enable the whole graft SQL surface on every session of a deployment
 * with configuration only, no code:
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 * }}}
 *
 * or in code:
 *
 * {{{
 *   SparkSession.builder()
 *     .config("spark.sql.extensions", "graft.GraftExtensions")
 *     .getOrCreate()
 * }}}
 *
 * Functions injected here live in the session's catalog from analysis
 * onward (visible to `spark.sql`, SQL views, thriftserver clients),
 * whereas [[graft.operators.GraftFunctions.register]] is the per-session
 * programmatic form of the same registry — both consume the single
 * builder list in `GraftFunctions.builders`, so the two surfaces cannot
 * drift.
 *
 * The reference has no SQL surface at all (queries are CLI strings fed
 * to a Python driver, `/root/reference/src/jobs/batch_job.py:25`); this
 * is the idiomatic-Spark packaging of the same capability.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.operators.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
  }
}
