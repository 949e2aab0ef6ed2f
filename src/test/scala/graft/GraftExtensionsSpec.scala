package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The config-only installation path: with
  * `spark.sql.extensions=graft.GraftExtensions` on the context's conf
  * (set by the context-creating builder — it is a STATIC conf, exactly
  * how a cluster deploys it via spark-submit --conf), every session built
  * on that context exposes the whole SQL surface with no programmatic
  * registration call. The spec builds a FRESH session and never calls
  * `GraftFunctions.register`, so resolution can only come through the
  * injected extension. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions injects the SQL surface") {
    val base = SparkTestSession.spark // creates the context carrying the conf
    assert(base.sparkContext.getConf.get("spark.sql.extensions") ==
      classOf[GraftExtensions].getName)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(ext ne base, "expected a fresh session for the extensions test")
      import ext.implicits._

      Seq((1.0, 2.0), (2.0, 1.0), (3.0, 3.0)).toDF("a", "b")
        .createOrReplaceTempView("pts")
      val sky = ext.sql(
        """SELECT p[0] AS a, p[1] AS b
          |FROM (SELECT explode(skyline_agg('min,min', a, b)) AS p FROM pts)""".stripMargin)
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
      assert(sky == Set((1.0, 2.0), (2.0, 1.0)))

      val dot = ext.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(dot == 11.0)

      Seq((1L, 0.5), (2L, 0.9), (3L, 0.1), (4L, 0.7)).toDF("id", "score")
        .createOrReplaceTempView("scored")
      val top = ext.sql(
        """SELECT e.id FROM (
          |  SELECT explode(topk_agg(score, id, 2)) AS e FROM scored)""".stripMargin)
        .collect().map(_.getLong(0)).toSeq
      assert(top == Seq(2L, 4L))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
