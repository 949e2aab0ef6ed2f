package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.functions.HashFunctions

/** Binary-quantization gates: sign-bit packing against hand-computed
  * patterns (including the multi-word case), Hamming kernel contracts,
  * recall of the re-ranked probe vs the exact ranking, and totality on
  * zero-norm vectors. */
class BqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private def embs = spark.read.parquet(s"$dir/embeddings.parquet")

  test("signBits: hand-computed packing, >=0 convention, multi-word, length contract") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, -1.0, 0.0, -0.5)),  // bits 0 and 2 set (0.0 >= 0)
      (2L, Seq(-1.0, -1.0, -1.0, -1.0)),
      (3L, Seq(0.5, 0.5, 0.5))          // wrong length -> null
    ).toDF("id", "v")
    val got = df.select(col("id"), HashFunctions.signBits(col("v"), 4).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(got(1L) == Seq(5L), "bits 0 and 2: 1.0 and 0.0 are >= 0")
    assert(got(2L) == Seq(0L))
    assert(got(3L) == null, "wrong-length vector gets a null signature")
    // 70 dims -> two words; bit 69 lands in word 1 bit 5
    val wide = Seq(Tuple1(Seq.tabulate(70)(j => if (j == 69) 1.0 else -1.0)))
      .toDF("v").select(HashFunctions.signBits(col("v"), 70))
      .head().getSeq[Long](0)
    assert(wide == Seq(0L, 1L << 5))
  }

  test("hammingDistance: popcount of xor, width mismatch is null") {
    import spark.implicits._
    val df = Seq(
      (Seq(0L, 0L), Seq(-1L, 0L), 64),      // one word all-ones apart
      (Seq(5L), Seq(6L), 2),                // 101 vs 110 -> 2 bits
      (Seq(7L), Seq(7L), 0)
    ).toDF("a", "b", "want")
    assert(df.select(HashFunctions.hammingDistance(col("a"), col("b")) === col("want"))
      .collect().forall(_.getBoolean(0)))
    val bad = Seq((Seq(1L), Seq(1L, 2L))).toDF("a", "b")
    assert(bad.select(HashFunctions.hammingDistance(col("a"), col("b")))
      .head().isNullAt(0), "different-width signatures have no distance")
  }

  test("bqTopK re-ranked: recall@10 vs the exact ranking earns the gate on real embeddings") {
    val q = embs.filter(col("vec_id") < 50)
    val exact = Similarity.topK(embs, q, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bq = Similarity.bqTopK(embs, q, "vec_id", "embedding", k = 10,
      dim = 64, shortlist = 400)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bq & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"re-ranked BQ recall@10 = $recall (want >= 0.9 at sf0.001)")
    assert(bq.size == exact.size, "exactly k rows per query")
  }

  test("bqTopK: zero-norm rows pair with nothing (all-zeros sign pattern is NOT a signature)") {
    import spark.implicits._
    val withZero = embs.select(col("vec_id"), col("embedding"))
      .unionByName(Seq((9999L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val q = withZero.filter(col("vec_id") < 3 || col("vec_id") === 9999L)
    val out = Similarity.bqTopK(withZero, q, "vec_id", "embedding", k = 5,
      dim = 64, shortlist = 20)
    val rows = out.collect()
    assert(rows.nonEmpty, "the zero vector must not abort the job")
    assert(!rows.exists(_.getLong(0) == 9999L), "zero-norm query ranks nothing")
    assert(!rows.exists(_.getLong(1) == 9999L), "zero-norm corpus row is never a neighbor")
  }

  test("bqTopK guards: shortlist < k trips loudly") {
    val e = intercept[IllegalArgumentException] {
      Similarity.bqTopK(embs, embs.limit(1), "vec_id", "embedding", k = 10,
        dim = 64, shortlist = 5)
    }
    assert(e.getMessage.contains("shortlist"))
  }
}
