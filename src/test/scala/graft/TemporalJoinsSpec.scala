package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** As-of and range join semantics, gated against brute-force oracles. */
class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  import scala.util.Random

  // deterministic synthetic (key, time, id) fixtures
  private def mkRows(n: Int, keys: Int, seed: Int): Seq[(Long, Long, Long)] = {
    val rnd = new Random(seed)
    (0 until n).map(i => (rnd.nextInt(keys).toLong, rnd.nextInt(1000).toLong, i.toLong))
  }

  /** Brute-force as-of: per left row, best right row by direction. */
  private def bruteAsof(
      left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)],
      backward: Boolean, tol: Option[Long]): Map[Long, Option[Long]] =
    left.map { case (k, t, id) =>
      val cands = right.filter { case (rk, rt, _) =>
        rk == k && (if (backward) rt <= t else rt >= t) &&
          tol.forall(b => math.abs(rt - t) <= b)
      }
      // nearest in time; ties broken by id DESC to mirror an arbitrary-but
      // -unique pick — fixtures keep (key, time) unique so ties cannot occur
      val best = if (cands.isEmpty) None
        else Some(cands.maxBy { case (_, rt, rid) =>
          (if (backward) rt else -rt, rid) }._3)
      id -> best
    }.toMap

  private def uniqueByKeyTime(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq

  test("asofJoin backward equals brute force (unique right timestamps)") {
    import spark.implicits._
    val lrows = mkRows(300, 8, seed = 1)
    val rrows = uniqueByKeyTime(mkRows(200, 8, seed = 2))
    val l = lrows.toDF("k", "t", "lid")
    val r = rrows.toDF("k", "rt", "rid")
      .select(col("k"), col("rt"), col("rid").as("matched_rid"))
    val out = TemporalJoins.asofJoin(l, r, "t", "rt", Seq("k"),
      rightValueCols = Seq("matched_rid"))
    val got = out.select("lid", "matched_rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got == bruteAsof(lrows, rrows, backward = true, tol = None))
  }

  test("asofJoin forward equals brute force") {
    import spark.implicits._
    val lrows = mkRows(300, 5, seed = 3)
    val rrows = uniqueByKeyTime(mkRows(150, 5, seed = 4))
    val l = lrows.toDF("k", "t", "lid")
    val r = rrows.toDF("k", "rt", "rid")
      .select(col("k"), col("rt"), col("rid").as("matched_rid"))
    val out = TemporalJoins.asofJoin(l, r, "t", "rt", Seq("k"),
      rightValueCols = Seq("matched_rid"), direction = "forward")
    val got = out.select("lid", "matched_rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got == bruteAsof(lrows, rrows, backward = false, tol = None))
  }

  test("asofJoin tolerance nulls matches beyond the bound, keeps left rows") {
    import spark.implicits._
    val lrows = mkRows(200, 6, seed = 5)
    val rrows = uniqueByKeyTime(mkRows(100, 6, seed = 6))
    val l = lrows.toDF("k", "t", "lid")
    val r = rrows.toDF("k", "rt", "rid")
      .select(col("k"), col("rt"), col("rid").as("matched_rid"))
    val out = TemporalJoins.asofJoin(l, r, "t", "rt", Seq("k"),
      rightValueCols = Seq("matched_rid"), tolerance = Some(50L))
    assert(out.count() == lrows.size, "left-outer: every left row survives")
    val got = out.select("lid", "matched_rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got == bruteAsof(lrows, rrows, backward = true, tol = Some(50L)))
  }

  test("asofJoin matches at equal timestamps (ties included) both directions") {
    import spark.implicits._
    val l = Seq((1L, 100L, 10L)).toDF("k", "t", "lid")
    val r = Seq((1L, 100L, 77L)).toDF("k", "rt", "rid")
      .select(col("k"), col("rt"), col("rid").as("matched_rid"))
    for (dir <- Seq("backward", "forward")) {
      val out = TemporalJoins.asofJoin(l, r, "t", "rt", Seq("k"),
        rightValueCols = Seq("matched_rid"), direction = dir)
      assert(out.select("matched_rid").head.getLong(0) == 77L,
        s"equal-timestamp right row must match in $dir mode")
    }
  }

  test("asofJoin result is partition-independent") {
    import spark.implicits._
    val lrows = mkRows(300, 8, seed = 7)
    val rrows = uniqueByKeyTime(mkRows(200, 8, seed = 8))
    def run(lParts: Int, rParts: Int) = {
      val l = lrows.toDF("k", "t", "lid").repartition(lParts)
      val r = rrows.toDF("k", "rt", "rid").repartition(rParts)
        .select(col("k"), col("rt"), col("rid").as("matched_rid"))
      TemporalJoins.asofJoin(l, r, "t", "rt", Seq("k"), Seq("matched_rid"))
        .select("lid", "matched_rid").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    }
    assert(run(1, 1) == run(13, 7))
  }

  test("asofJoin rejects empty keys, bad direction, colliding value columns") {
    import spark.implicits._
    val l = Seq((1L, 1L, 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, 1L, 1L)).toDF("k", "rt", "rid")
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(l, r, "t", "rt", Seq.empty, Seq("rid"))
    }
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(l, r, "t", "rt", Seq("k"), Seq("rid"), direction = "nearest")
    }
    intercept[IllegalArgumentException] {
      // "lid" exists on the left — carrying a right column of the same
      // name must fail loudly instead of silently shadowing
      TemporalJoins.asofJoin(l, r.select(col("k"), col("rt"), col("rid").as("lid")),
        "t", "rt", Seq("k"), Seq("lid"))
    }
  }

  test("rangeJoinPoints equals the naive inequality join, pairs exactly once") {
    import spark.implicits._
    val rnd = new Random(11)
    // points across positive and negative coordinates
    val pts = (0 until 400).map(i => (i.toLong, rnd.nextLong() % 10000))
    val ivs = (0 until 60).map { i =>
      val lo = rnd.nextLong() % 9000
      (1000L + i, lo, lo + rnd.nextInt(700)) // spans up to ~3 buckets at width 256
    }
    val p = pts.toDF("pid", "x")
    val iv = ivs.toDF("iid", "lo", "hi")
    val got = TemporalJoins.rangeJoinPoints(p, iv, "x", "lo", "hi", bucketWidth = 256)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = for {
      (pid, x) <- pts; (iid, lo, hi) <- ivs if x >= lo && x <= hi
    } yield (pid, iid)
    assert(got.sorted == expected.sorted)
    assert(got.distinct.size == got.size, "each qualifying pair appears exactly once")
  }

  test("rangeJoinPoints drops inverted intervals and validates inputs") {
    import spark.implicits._
    val p = Seq((1L, 50L)).toDF("pid", "x")
    val iv = Seq((1L, 100L, 0L)).toDF("iid", "lo", "hi") // hi < lo
    assert(TemporalJoins.rangeJoinPoints(p, iv, "x", "lo", "hi", 10L).count() == 0)
    intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoinPoints(p, iv, "x", "lo", "hi", 0L)
    }
    intercept[IllegalArgumentException] {
      // shared column name across sides must be rejected
      TemporalJoins.rangeJoinPoints(p, iv.withColumnRenamed("iid", "pid"),
        "x", "lo", "hi", 10L)
    }
  }

  test("asofJoin on real events: every purchase sees its latest prior view/click") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("vu"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val out = TemporalJoins.asofJoin(
      purchases, views.withColumnRenamed("vu", "user_id"),
      "ts", "view_ts", Seq("user_id"), Seq("view_id", "view_ts"))
    assert(out.count() == purchases.count())
    // spot-check the as-of invariant: matched view never after the purchase,
    // and no closer view exists (verified via a window-free anti condition)
    val bad = out.filter(col("view_ts").isNotNull && col("view_ts") > col("ts"))
    assert(bad.count() == 0, "matched view must be at-or-before the purchase")
    val closer = out.filter(col("view_ts").isNotNull)
      .join(views, out("user_id") === views("vu") &&
        views("view_ts") <= out("ts") && views("view_ts") > out("view_ts"))
    assert(closer.count() == 0, "no strictly closer prior view may exist")
  }
}
