package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LayoutFunctions
import graft.sources.Layout

/** Physical-layout invariants: Morton-key math, z-order locality, and
  * the shuffle-free bucketed join. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("InterleaveBits: hand-computed vectors, null/length contracts") {
    import spark.implicits._
    val out = Seq(
      (Seq(3L, 0L)), (Seq(0L, 3L)), (Seq(2L, 1L)), (Seq(0L, 0L)))
      .toDF("a")
      .select(LayoutFunctions.interleaveBits(col("a"), 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // bit i of coord j lands at position i*2 + j
    assert(out == Seq(5L, 10L, 6L, 0L))

    val d3 = Seq(Seq(1L, 1L, 1L)).toDF("a")
      .select(LayoutFunctions.interleaveBits(col("a"), 3).as("z"))
      .collect().head.getLong(0)
    assert(d3 == 7L) // bits 0,1,2

    // d=1 degenerates to the identity — and the zorderKey binning must
    // not collapse to one cell (1L << 63 would go negative)
    val d1 = Seq((0), (5), (9)).toDF("x")
      .select(Layout.zorderKey(Seq(col("x")), Seq((0.0, 9.0))).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(d1.distinct.size == 3 && d1 == d1.sorted,
      s"d=1 z-keys must be distinct and order-preserving, got $d1")

    val bad = Seq(Seq(1L, 2L, 3L)).toDF("a")
      .select(LayoutFunctions.interleaveBits(col("a"), 2).as("z"))
      .collect().head
    assert(bad.isNullAt(0), "wrong-length array must null out")
    val withNull = Seq(Seq(Some(1L), None)).toDF("a")
      .select(LayoutFunctions.interleaveBits(col("a"), 2).as("z"))
      .collect().head
    assert(withNull.isNullAt(0), "null element must null out")
  }

  test("Morton keys preserve componentwise dominance (z-order is dominance-monotone)") {
    import spark.implicits._
    // if a <= b on EVERY dimension then z(a) <= z(b) — the property that
    // makes z-range pruning sound (a box query's corners bound its keys)
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(500) {
      val a = Array.fill(3)(rnd.nextInt(1 << 20).toLong)
      val b = a.map(v => v + rnd.nextInt(1 << 10))
      (a.toSeq, b.toSeq)
    }
    val viol = pairs.toDF("a", "b")
      .select(
        LayoutFunctions.interleaveBits(col("a"), 3).as("za"),
        LayoutFunctions.interleaveBits(col("b"), 3).as("zb"))
      .filter(col("za") > col("zb")).count()
    assert(viol == 0, s"$viol dominated pairs had a LARGER z-key")
  }

  test("z-order chunks are spatially tighter than row-major chunks") {
    import spark.implicits._
    // 32x32 grid; split the 1024 points into 64 contiguous chunks of 16
    // under each ordering and compare total bounding-box perimeter
    val pts = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y)).toDF("x", "y")
    def chunkCost(ordered: org.apache.spark.sql.DataFrame): Long = {
      val rows = ordered.collect().map(r => (r.getInt(0), r.getInt(1)))
      rows.grouped(16).map { g =>
        val xs = g.map(_._1); val ys = g.map(_._2)
        (xs.max - xs.min).toLong + (ys.max - ys.min).toLong
      }.sum
    }
    val z = chunkCost(pts
      .withColumn("z", Layout.zorderKey(Seq(col("x"), col("y")),
        Seq((0.0, 31.0), (0.0, 31.0))))
      .orderBy("z").select("x", "y"))
    val rowMajor = chunkCost(pts.orderBy("x", "y").select("x", "y"))
    // 16-point z chunks are 4x4 blocks (cost 6); row-major chunks are
    // half-columns (cost 15+)
    assert(z < rowMajor / 2, s"z-order cost $z not << row-major $rowMajor")
  }

  test("clusterByZOrder: lossless, and every partition is spatially tight") {
    import spark.implicits._
    val pts = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y)).toDF("x", "y")
    val clustered = Layout.clusterByZOrder(pts, Seq("x", "y"), numFiles = 16)
    assert(clustered.columns.toSeq == Seq("x", "y"), "zkey must not leak")
    val spans = clustered
      .groupBy(spark_partition_id().as("p"))
      .agg((max("x") - min("x") + max("y") - min("y")).as("span"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.map(_.getAs[Long]("n")).sum == 1024, "rows lost or duplicated")
    // ~64 points per range-partition ~ an 8x8 block (span 14); boundaries
    // are sampled so a partition may straddle two adjacent blocks (span
    // up to ~30) — but never a row-major 2x32 stripe layout (span 33+ on
    // every partition)
    val worst = spans.map(_.getAs[Int]("span")).max
    assert(worst <= 30, s"a z partition spans $worst — not spatially tight")
  }

  test("rangeShard: per-partition score bands are non-overlapping and cover every row") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sharded = Layout.rangeShard(docs, "n_chars", numFiles = 8,
      tieBreak = Seq("doc_id"))
    val bands = sharded
      .groupBy(spark_partition_id().as("p"))
      .agg(min("n_chars").as("lo"), max("n_chars").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Int]("p"), r.getAs[Long]("lo"),
        r.getAs[Long]("hi"), r.getAs[Long]("n")))
      .sortBy(_._2)
    assert(bands.map(_._4).sum == docs.count(), "rows lost or duplicated")
    assert(bands.length > 1, "expected multiple shards")
    // contiguous non-overlapping bands: each shard's min must be >= the
    // previous shard's max (ties on the boundary value may touch) — the
    // property that makes footer-stats pruning and in-order curriculum
    // consumption work
    bands.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) =>
        assert(lo2 >= hi1, s"overlapping shard bands: $bands")
      case _ =>
    }
    intercept[IllegalArgumentException] {
      Layout.rangeShard(docs, "n_chars", numFiles = 0)
    }
    intercept[IllegalArgumentException] {
      Layout.rangeShard(docs, "n_chars", 4, tieBreak = Seq("n_chars"))
    }
  }

  test("bucketed tables join with no shuffle exchange and the exact plain-join result") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    Layout.writeBucketed(orders, "b_orders", Seq("o_custkey"), buckets = 8,
      sortCols = Seq("o_custkey"))
    Layout.writeBucketed(customer, "b_customer", Seq("c_custkey"), buckets = 8,
      sortCols = Seq("c_custkey"))
    val broadcastThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path so the assertion is about bucketing,
      // not about the small side broadcasting
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // assert on the bare join (a downstream aggregation would add its
      // own legitimate exchange on the grouping key)
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_mktsegment")
      val got = joined.collect().map(_.toSeq).sortBy(_.toString()).toSeq
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      val want = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_mktsegment")
        .collect().map(_.toSeq).sortBy(_.toString()).toSeq
      assert(got == want && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
