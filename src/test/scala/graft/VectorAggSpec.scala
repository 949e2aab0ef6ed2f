package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorAggFunctions.vectorAvg

/** vector_avg aggregate: brute-force parity, null contract, merge path. */
class VectorAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("vectorAvg equals brute-force mean per group, across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map { i =>
      (i % 7, Array.fill(16)(rnd.nextFloat()))
    }
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      g -> Array.tabulate(16)(d => vs.map(_._2(d).toDouble).sum / vs.size)
    }
    for (parts <- Seq(1, 13)) {
      val got = rows.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(vectorAvg(col("v")).as("m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      assert(got.keySet == expected.keySet)
      for (g <- got.keySet; d <- 0 until 16)
        assert(math.abs(got(g)(d) - expected(g)(d)) < 1e-12,
          s"group $g dim $d: ${got(g)(d)} vs ${expected(g)(d)} at $parts partitions")
    }
  }

  test("vectorAvg skips null vectors and vectors with null elements") {
    import spark.implicits._
    val df = Seq(
      (0, Some(Seq[Option[Double]](Some(2.0), Some(4.0)))),
      (0, None),
      (0, Some(Seq[Option[Double]](Some(100.0), None))),
      (1, None)).toDF("g", "v")
      .select(col("g"), col("v").cast("array<double>").as("v"))
    val got = df.groupBy("g").agg(vectorAvg(col("v")).as("m"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(got(0) == Seq(2.0, 4.0), "null-element vector must not contribute")
    assert(got(1) == null, "all-null group yields null")
  }

  test("vectorAvg fails loudly on ragged dimensions") {
    import spark.implicits._
    val df = Seq((0, Seq(1.0, 2.0)), (0, Seq(1.0, 2.0, 3.0))).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(vectorAvg(col("v"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("SQL surface: vector_avg aggregates like the Column API") {
    import spark.implicits._
    graft.operators.GraftFunctions.register(spark)
    Seq((0, Seq(1.0, 3.0)), (0, Seq(3.0, 5.0)), (1, Seq(7.0, 9.0)))
      .toDF("g", "v").createOrReplaceTempView("vec_in")
    val rows = spark.sql("SELECT g, vector_avg(v) AS m FROM vec_in GROUP BY g")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(rows == Map(0 -> Seq(2.0, 4.0), 1 -> Seq(7.0, 9.0)))
  }

  test("SQL surface: vector_gram returns the one-pass covariance sufficient statistics") {
    import spark.implicits._
    graft.operators.GraftFunctions.register(spark)
    Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).toDF("v").createOrReplaceTempView("gram_in")
    val r = spark.sql("SELECT vector_gram(v) AS g FROM gram_in").head().getStruct(0)
    assert(r.getLong(0) == 2L)
    assert(r.getSeq[Double](1) == Seq(4.0, 6.0))
    // upper triangle row-major: [1*1+3*3, 1*2+3*4, 2*2+4*4]
    assert(r.getSeq[Double](2) == Seq(10.0, 14.0, 20.0))
  }

  test("vectorAvg reads float arrays natively (the embeddings column type)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = e.groupBy("label").agg(vectorAvg(col("embedding")).as("m"))
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getSeq[Double](1).length == 64))
  }
}
