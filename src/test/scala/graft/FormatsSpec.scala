package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Direction.Min
import graft.operators.SkylineOps._

/** Source/sink format breadth (SURVEY §2.3): the engine's results write
  * and read back identically through parquet, ORC, CSV, and JSON —
  * Spark built-in formats the reference never exercised. */
class FormatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("skyline result round-trips through parquet, orc, csv, json") {
    val dir = "/root/testdata/sf0.001"
    val sky = spark.read.parquet(s"$dir/lineitem.parquet")
      .skyline(Seq("l_extendedprice" -> Min, "l_discount" -> Min))
    val want = sky.collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    val tmp = Files.createTempDirectory("graft-formats").toFile.getAbsolutePath

    sky.write.mode("overwrite").parquet(s"$tmp/p")
    assert(spark.read.parquet(s"$tmp/p").collect().map(_.toSeq).toSet == want)

    sky.write.mode("overwrite").orc(s"$tmp/o")
    assert(spark.read.orc(s"$tmp/o").collect().map(_.toSeq).toSet == want)

    sky.write.mode("overwrite").option("header", "true").csv(s"$tmp/c")
    val csvBack = spark.read.option("header", "true").schema(sky.schema).csv(s"$tmp/c")
    assert(csvBack.collect().map(_.toSeq).toSet == want)

    sky.write.mode("overwrite").json(s"$tmp/j")
    val jsonBack = spark.read.schema(sky.schema).json(s"$tmp/j")
    assert(jsonBack.collect().map(_.toSeq).toSet == want)
  }
}
