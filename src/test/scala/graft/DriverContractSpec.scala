package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pin the driver contract: entry() smoke (t1), every query runs at
  * sf0.001, and every oracle key refers to an existing query. */
class DriverContractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("entry() returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle entries without queries: $dangling")
  }

  test("all queries execute at sf0.001 (schema + plan sanity, count >= 0)") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.toString.take(150)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
