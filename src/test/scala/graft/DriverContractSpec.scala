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

  test("q_sketch_distinct: HLL estimates stay inside the rsd bound of exact") {
    import org.apache.spark.sql.functions._
    // the sketch query has no SQL oracle (HLL registers are
    // engine-specific); this 3-sigma tolerance gate vs the exact
    // distinct count is its correctness contract (default rsd = 0.05)
    val rows = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("approx").toDouble
      val e = r.getAs[Long]("exact").toDouble
      assert(math.abs(a - e) / e <= 0.15,
        s"${r.get(0)}: approx $a vs exact $e exceeds 3*rsd")
    }
  }
}
