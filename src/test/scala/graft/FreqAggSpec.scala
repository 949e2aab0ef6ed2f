package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FreqFunctions, MisraGriesBuffer, PipelineOps}

/** Misra-Gries summary + exact heavy hitters: the MG superset guarantee
  * is what makes [[PipelineOps.heavyHitters]] exact, so it is enforced
  * here both on the raw buffer (with adversarial merges) and on the
  * distributed aggregate end-to-end. */
class FreqAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** Every key with true count > N/(capacity+1) must be in the summary. */
  private def checkGuarantee(
      truth: Map[String, Long], kept: Set[String], capacity: Int): Unit = {
    val n = truth.values.sum
    val mustKeep = truth.filter { case (_, c) => c * (capacity + 1) > n }.keySet
    val missing = mustKeep -- kept
    assert(missing.isEmpty,
      s"MG lost guaranteed keys $missing (n=$n capacity=$capacity)")
  }

  test("MisraGriesBuffer: single-stream guarantee on skewed random data") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      // zipf-ish: key k drawn with weight 1/(k+1)
      val keys = (0 until 200).map(i => s"k$i")
      val weights = keys.indices.map(i => 1.0 / (i + 1))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      val stream = (0 until 20000).map { _ =>
        val x = rnd.nextDouble() * total
        keys(cum.indexWhere(x <= _))
      }
      val buf = new MisraGriesBuffer(32)
      stream.foreach(buf.add(_, 1L))
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      checkGuarantee(truth, buf.sorted.map(_._1).toSet, 32)
      // stored counts never overcount
      buf.sorted.foreach { case (k, c) => assert(c <= truth(k)) }
    }
  }

  test("MisraGriesBuffer: merge preserves the guarantee over the union") {
    for (seed <- 10 to 14) {
      val rnd = new Random(seed)
      val keys = (0 until 100).map(i => s"t$i")
      // 8 partitions with DIFFERENT hot keys per partition — the
      // adversarial merge case (a key hot globally but spread thin, and
      // keys hot locally but rare globally)
      val parts = (0 until 8).map { p =>
        (0 until 3000).map { _ =>
          val r = rnd.nextInt(10)
          if (r < 4) "global_hot"
          else if (r < 7) s"local_hot_$p"
          else keys(rnd.nextInt(keys.length))
        }
      }
      val bufs = parts.map { part =>
        val b = new MisraGriesBuffer(24)
        part.foreach(b.add(_, 1L))
        b
      }
      // merge in a tree (the shape Spark's partial/final merge takes)
      val merged = bufs.reduce { (a, b) => a.mergeIn(b); a }
      val truth = parts.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      checkGuarantee(truth, merged.sorted.map(_._1).toSet, 24)
      merged.sorted.foreach { case (k, c) => assert(c <= truth(k)) }
      assert(merged.counts.size <= 24)
    }
  }

  test("misraGries aggregate: distributed candidates cover exact hitters") {
    import spark.implicits._
    val rnd = new Random(42)
    val rows = (0 until 50000).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 20) "the" else if (r < 30) "and" else if (r < 35) "of"
      else s"w${rnd.nextInt(2000)}"
    }
    val df = rows.toDF("token").repartition(16)
    val mg = df.agg(FreqFunctions.misraGries(col("token"), 64)).head()
      .getSeq[org.apache.spark.sql.Row](0)
    val kept = mg.map(_.getString(0)).toSet
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    checkGuarantee(truth, kept, 64)
    // output is sorted (count desc, token asc) and bounded
    assert(mg.size <= 64)
    val pairs = mg.map(r => (r.getString(0), r.getLong(1)))
    assert(pairs == pairs.sortBy { case (t, c) => (-c, t) })
  }

  test("heavyHitters: exact equality with brute force, including threshold edge") {
    import spark.implicits._
    // engineered counts around the threshold: N = 1000, denom = 10 ->
    // keep iff cnt >= 100; "edge" sits exactly at 100
    val data =
      Seq.fill(300)("alpha") ++ Seq.fill(100)("edge") ++ Seq.fill(99)("below") ++
        (0 until 501).map(i => s"tail$i")
    assert(data.size == 1000)
    val df = data.toDF("token").repartition(8)
    val got = PipelineOps.heavyHitters(df, "token", supportDenom = 10, capacity = 16)
      .as[(String, Long)].collect().toSet
    assert(got == Set(("alpha", 300L), ("edge", 100L)))
  }

  test("heavyHitters: random-data equality with groupBy counts") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val rows = (0 until 30000).map { _ =>
        val r = rnd.nextInt(1000)
        if (r < 150) "h1" else if (r < 250) "h2" else if (r < 300) "h3"
        else s"r${rnd.nextInt(5000)}"
      }
      val df = rows.toDF("token").repartition(16)
      val brute = df.groupBy("token").agg(count(lit(1)).as("cnt"))
        .crossJoin(df.agg(count(lit(1)).as("n")))
        .filter(col("cnt") * 50 >= col("n"))
        .select("token", "cnt").as[(String, Long)].collect().toSet
      val got = PipelineOps.heavyHitters(df, "token", supportDenom = 50, capacity = 64)
        .as[(String, Long)].collect().toSet
      assert(got == brute, s"seed=$seed")
    }
  }

  test("heavyHitters: rejects capacity below the guarantee bound") {
    import spark.implicits._
    val df = Seq("a", "b").toDF("token")
    assertThrows[IllegalArgumentException] {
      PipelineOps.heavyHitters(df, "token", supportDenom = 100, capacity = 50)
    }
  }

  test("heavyHitters: caller columns named _n (or anything else) cannot collide") {
    import spark.implicits._
    // regression (ADVICE r7): the internal total-count column was named
    // "_n"; a caller frame already carrying "_n" made the post-join
    // aggregate ambiguous and the plan failed to analyze
    val df = (Seq.fill(30)("hot") ++ (0 until 20).map(i => s"t$i"))
      .toDF("token")
      .withColumn("_n", lit(99))
      .withColumn("__hh_n", lit(-1)) // and the replacement name itself
    val got = PipelineOps.heavyHitters(df, "token", supportDenom = 2, capacity = 8)
      .as[(String, Long)].collect().toSet
    assert(got == Set(("hot", 30L)))
  }
}
