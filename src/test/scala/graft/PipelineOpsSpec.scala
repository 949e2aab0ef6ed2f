package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelineOps

/** Reproducible-sampling and sequence-packing invariants. */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hashSample is deterministic, partition-independent, and near the target fraction") {
    val a = PipelineOps.hashSample(docs, "doc_id", 0.3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = PipelineOps.hashSample(docs.repartition(7), "doc_id", 0.3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on partitioning or run")
    val n = docs.count()
    assert(math.abs(a.size.toDouble / n - 0.3) < 0.1, s"${a.size}/$n far from 0.3")
    // fraction edges
    assert(PipelineOps.hashSample(docs, "doc_id", 1.0).count() == n)
    assert(PipelineOps.hashSample(docs, "doc_id", 0.0).count() == 0)
  }

  test("different salts draw (near-)independent samples") {
    val a = PipelineOps.hashSample(docs, "doc_id", 0.5, salt = "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = PipelineOps.hashSample(docs, "doc_id", 0.5, salt = "valid")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val overlap = a.intersect(b).size.toDouble / math.max(a.size, 1)
    assert(math.abs(overlap - 0.5) < 0.15, s"salted samples should overlap ~50%, got $overlap")
  }

  test("hashSampleBy applies per-stratum fractions (1.0 keeps every row)") {
    val kept = PipelineOps.hashSampleBy(docs, "doc_id", "source",
      fractions = Map("src0" -> 1.0, "src1" -> 0.0), defaultFraction = 0.5)
    val bySource = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("src0") == total("src0"), "fraction 1.0 must keep all rows")
    assert(!bySource.contains("src1"), "fraction 0.0 must drop all rows")
  }

  test("packSequences: offsets are exclusive prefix sums; chunk ids follow offsets") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 500L), ("a", 4L, 100L),
      ("b", 1L, 1200L), ("b", 2L, 10L)).toDF("src", "id", "tok")
    val got = PipelineOps.packSequences(df, "src", "id", "tok", maxTokens = 512)
      .select("src", "id", "seq_offset", "seq_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("a", 1L, 0L, 0L),    // starts at 0 -> chunk 0
      ("a", 2L, 300L, 0L),  // straddles 512 but STARTS in chunk 0
      ("a", 3L, 600L, 1L),
      ("a", 4L, 1100L, 2L),
      ("b", 1L, 0L, 0L),    // streams pack independently
      ("b", 2L, 1200L, 2L)))
  }

  test("chunkDocuments: overlapping windows tile the token stream exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // shorter than one chunk
      (3L, "   "))                                    // token-less -> no chunks
      .toDF("doc_id", "text")
    val got = PipelineOps.chunkDocuments(df, "text", chunkTokens = 4, overlapTokens = 1)
      .select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3))).toSet
    // step 3: starts 0,3,6 for 10 tokens — a start at 9 would yield
    // "w10", fully contained in the chunk at 6 (the start cap ends the
    // sequence at tokens - overlap - 1 = 8)
    assert(got == Set(
      (1L, 0, "w1 w2 w3 w4", 4),
      (1L, 1, "w4 w5 w6 w7", 4),
      (1L, 2, "w7 w8 w9 w10", 4),
      (2L, 0, "a b", 2)))
  }

  test("contamination flags exactly the docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),          // shares "quick brown fox"
      (2L, "completely unrelated text here now"), // clean
      (3L, "quick brown fox quick brown fox"))    // same shared trigram, appears once distinct
      .toDF("doc_id", "text")
    val bench = Seq((100L, "a quick brown fox ran")).toDF("doc_id", "text")
    // bench trigrams: {"a quick brown", "quick brown fox", "brown fox ran"};
    // docs 1 and 3 each share exactly {"quick brown fox"}; doc 2 is clean
    val got = PipelineOps.contamination(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 3L -> 1L), s"got $got")
  }

  test("stripBoilerplate removes cross-doc frequent segments, keeps order, keeps all docs") {
    import spark.implicits._
    // segment size 2: "b1 b2" is shared by docs 1,2,3 (boilerplate at
    // minDocFreq=2); "u1 u2" repeats WITHIN doc 4 only (not boilerplate);
    // doc 5 is entirely boilerplate; doc 6 is empty
    val docs = Seq(
      (1L, "a1 a2 b1 b2 c1 c2"),
      (2L, "b1 b2 d1 d2"),
      (3L, "e1 e2 b1 b2"),
      (4L, "u1 u2 u1 u2 f1"),
      (5L, "b1 b2"),
      (6L, "")).toDF("doc_id", "text")
    val out = PipelineOps.stripBoilerplate(docs, "doc_id", "text",
        segmentTokens = 2, minDocFreq = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("a1 a2 c1 c2", 2L, 1L)), s"got ${out(1L)}")
    assert(out(2L) == (("d1 d2", 1L, 1L)))
    assert(out(3L) == (("e1 e2", 1L, 1L)))
    // within-doc repetition survives; trailing partial segment kept
    assert(out(4L) == (("u1 u2 u1 u2 f1", 3L, 0L)))
    assert(out(5L) == (("", 0L, 1L)), "fully-boilerplate doc stays, empty")
    assert(out(6L) == (("", 0L, 0L)), "empty doc stays")
    intercept[IllegalArgumentException] {
      PipelineOps.stripBoilerplate(docs, "doc_id", "text", 2, minDocFreq = 1)
    }
  }

  test("SQL surface: topk_agg ranks per group like the Column API") {
    import spark.implicits._
    graft.operators.GraftFunctions.register(spark)
    Seq((0, 1.0, 10L), (0, 3.0, 11L), (0, 2.0, 12L), (1, 5.0, 13L))
      .toDF("g", "score", "id").createOrReplaceTempView("topk_in")
    val rows = spark.sql(
      """SELECT g, t.id, t.score FROM
        |  (SELECT g, explode(topk_agg(score, id, 2)) AS t FROM topk_in GROUP BY g)""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set((0, 11L, 3.0), (0, 12L, 2.0), (1, 13L, 5.0)))
  }
}
