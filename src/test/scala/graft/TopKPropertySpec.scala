package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.TopKBuffer

/** ScalaCheck properties for the bounded top-k heap: any sequence of
  * inserts, split into any partitioning and merged in any order, must
  * equal sort-take-k with the exact window-rank tie-break (score
  * desc/asc, id asc). Pure JVM — no Spark session. */
object TopKPropertySpec extends Properties("topk-buffer") {

  private val entryGen: Gen[(Double, Long)] = for {
    // coarse score grid forces plenty of ties; occasional NaN
    s <- Gen.frequency(
      9 -> Gen.choose(0, 30).map(_ / 10.0),
      1 -> Gen.const(Double.NaN))
    id <- Gen.choose(0L, 500L)
  } yield (s, id)

  /** distinct ids (the aggregate's per-group contract) */
  private val entriesGen: Gen[List[(Double, Long)]] =
    Gen.listOf(entryGen).map(_.distinctBy(_._2))

  private def oracle(
      xs: List[(Double, Long)], k: Int, largest: Boolean): List[(Double, Long)] = {
    val ord: Ordering[(Double, Long)] = (a, b) => {
      val c = java.lang.Double.compare(a._1, b._1)
      val sc = if (largest) -c else c // best first
      if (sc != 0) sc else java.lang.Long.compare(a._2, b._2)
    }
    xs.sorted(ord).take(k)
  }

  private def viaBuffer(
      xs: List[(Double, Long)], k: Int, largest: Boolean,
      splits: Int): List[(Double, Long)] = {
    // partition the stream, build per-partition heaps, merge pairwise —
    // the partial-aggregation shape
    val parts = if (splits <= 1) List(xs)
      else xs.grouped(math.max(1, (xs.size + splits - 1) / splits)).toList
    val bufs = parts.map { p =>
      val b = new TopKBuffer(k, largest)
      p.foreach { case (s, id) => b.insert(s, id) }
      b
    }
    val merged = bufs.reduceOption { (a, b) =>
      var i = 0
      while (i < b.size) { a.insert(b.scores(i), b.ids(i)); i += 1 }
      a
    }.getOrElse(new TopKBuffer(k, largest))
    merged.sortedBestFirst.toList.map { case (s, id) => (s, id) }
  }

  property("insert+merge == sort-take-k, ties and NaN included") =
    Prop.forAll(entriesGen, Gen.choose(1, 12), Gen.choose(1, 7), Gen.oneOf(true, false)) {
      (xs, k, splits, largest) =>
        val got = viaBuffer(xs, k, largest, splits)
        val want = oracle(xs, k, largest)
        // compare by (score-bits, id) so NaN == NaN
        def key(e: (Double, Long)) = (java.lang.Double.doubleToLongBits(e._1), e._2)
        got.map(key) == want.map(key)
    }

  property("buffer never exceeds k entries") =
    Prop.forAll(entriesGen, Gen.choose(1, 8)) { (xs, k) =>
      val b = new TopKBuffer(k, largest = true)
      xs.forall { case (s, id) => b.insert(s, id); b.size <= k }
    }
}
