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

  test("psiDrift: zero on identical snapshots, positive under a planted shift, bins partition") {
    import spark.implicits._
    val rnd = new scala.util.Random(5L)
    val aVals = Seq.fill(2000)(rnd.nextGaussian() * 10 + 100.0)
    val bSame = aVals.map(identity)
    val bShift = aVals.map(_ + 8.0) // ~0.8 sigma shift: clearly drifted
    def df(xs: Seq[Double]) = xs.toDF("v")
    val same = PipelineOps.psiDrift(df(aVals), df(bSame), "v")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(same.length == 10 && same.map(_._1).sorted.toSeq == (0 until 10))
    assert(same.map(_._2).sum == 2000 && same.map(_._3).sum == 2000,
      "bins partition both snapshots")
    // identical snapshots: every term ~0 (only the eps regularizer moves it)
    assert(math.abs(same.map(_._4).sum) < 1e-4)
    // baseline deciles: A's mass is ~uniform per bin by construction
    assert(same.forall(t => t._2 >= 150 && t._2 <= 250), same.map(_._2).toSeq.toString)
    val drift = PipelineOps.psiDrift(df(aVals), df(bShift), "v")
      .collect().map(_.getDouble(3)).sum
    assert(drift > 0.2, s"a 0.8-sigma shift must exceed the conventional 0.2 threshold, got $drift")
  }

  test("round6HalfAwayFromZero matches SQL round-on-double semantics (DuckDB-verified vectors)") {
    // vectors cross-checked against DuckDB round(v::DOUBLE, 6): ties on
    // the SCALED double go away from zero (incl. negatives), non-ties
    // are correctly-rounded nearest — NOT rint (half-to-even: would give
    // 0.0 for 5e-7) and NOT decimal-exact rounding (BigDecimal HALF_UP
    // sees 4.9999…e-7 and would also give 0.0)
    val cases = Seq(
      5e-7 -> 1e-6, -5e-7 -> -1e-6,
      1.5e-6 -> 2e-6, -1.5e-6 -> -2e-6, 2.5e-6 -> 3e-6,
      1.0000005 -> 1.000001, 0.1234565 -> 0.123457,
      2.5 -> 2.5, 123456.5 -> 123456.5, 0.0 -> 0.0)
    cases.foreach { case (in, want) =>
      val got = PipelineOps.round6HalfAwayFromZero(in)
      assert(got == want, s"round6($in): got $got want $want")
    }
    assert(PipelineOps.round6HalfAwayFromZero(Double.NaN).isNaN)
    assert(PipelineOps.round6HalfAwayFromZero(Double.PositiveInfinity).isPosInfinity)
  }

  test("robustOutliers: matches driver-computed median/MAD flags; immune to the outlier itself") {
    import spark.implicits._
    // group a: tight cluster + one wild point; group b: no outliers
    val a = Seq(10.0, 11.0, 12.0, 10.5, 11.5, 1000.0).map(("a", _))
    val b = Seq(5.0, 6.0, 7.0, 8.0).map(("b", _))
    val df = (a ++ b).toDF("g", "v")
    val got = PipelineOps.robustOutliers(df, "v", "g", k = 3.0)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    def medOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    for ((g, xs) <- Seq("a" -> a.map(_._2), "b" -> b.map(_._2))) {
      val m = medOf(xs)
      val mad = medOf(xs.map(x => math.abs(x - m)))
      val nOut = xs.count(x => math.abs(x - m) > mad * (3.0 * 1.4826))
      val (gm, gmad, gn, gout) = got(g)
      assert(math.abs(gm - m) < 1e-12 && math.abs(gmad - mad) < 1e-12)
      assert(gn == xs.size && gout == nOut, s"group $g: $gout vs $nOut")
    }
    // the defining property: the 1000.0 point is flagged, and a
    // mean/stddev rule would NOT flag it here (it drags sigma so far
    // that |1000 - mean| < 3 sigma) — the reason MAD exists
    assert(got("a")._4 == 1L && got("b")._4 == 0L)
    val xs = a.map(_._2)
    val mean = xs.sum / xs.size
    val sigma = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.size)
    assert(math.abs(1000.0 - mean) < 3 * sigma,
      "sanity: the classic z-score misses this outlier")
  }

  test("sampleKPerStratum: exactly k per stratum, matches the window-rank reference") {
    import org.apache.spark.sql.expressions.Window
    val k = 7
    val got = PipelineOps.sampleKPerStratum(docs, "doc_id", "source", k)
      .select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // reference: the row_number-window form over the SAME hex priority —
    // the shape the operator exists to avoid at scale, exact at test scale
    val pr = substring(md5(concat(col("doc_id").cast("string"), lit(":graft"))
      .cast("binary")), 1, 13)
    val want = docs.withColumn("_p", pr)
      .withColumn("_rn", row_number().over(
        Window.partitionBy("source").orderBy(col("_p"), col("doc_id"))))
      .filter(col("_rn") <= k).select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
    val strata = docs.select("source").distinct().count()
    assert(got.size == strata * k, s"exactly $k rows per each of $strata strata")
    // partition-independent (deterministic across layouts)
    val again = PipelineOps.sampleKPerStratum(docs.repartition(7), "doc_id", "source", k)
      .select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == got)
    // independent redraw under a different salt
    val other = PipelineOps.sampleKPerStratum(docs, "doc_id", "source", k, salt = "eval2")
      .select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(other.size == got.size && other != got)
    // non-integral key rejected loudly
    val ex = intercept[IllegalArgumentException] {
      PipelineOps.sampleKPerStratum(docs, "text", "source", 3)
    }
    assert(ex.getMessage.contains("integral"))
    // k larger than every stratum: the whole corpus comes back
    val n = docs.count()
    assert(PipelineOps.sampleKPerStratum(docs, "doc_id", "source",
      k = n.toInt + 10).count() == n)
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

  test("dedupSegments keeps only the corpus-first occurrence of each segment") {
    import spark.implicits._
    // segment size 2: "b1 b2" appears in docs 1,2,3 — survives only at its
    // (doc_id, position)-first copy in doc 1; "u1 u2" repeats WITHIN doc 4,
    // so its second copy drops too (the within-doc case stripBoilerplate
    // deliberately keeps); doc 5 loses its only segment; doc 6 is empty
    val docs = Seq(
      (1L, "a1 a2 b1 b2 c1 c2"),
      (2L, "b1 b2 d1 d2"),
      (3L, "e1 e2 b1 b2"),
      (4L, "u1 u2 u1 u2 f1"),
      (5L, "b1 b2"),
      (6L, "")).toDF("doc_id", "text")
    val out = PipelineOps.dedupSegments(docs, "doc_id", "text", segmentTokens = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("a1 a2 b1 b2 c1 c2", 3L, 0L)), s"got ${out(1L)}")
    assert(out(2L) == (("d1 d2", 1L, 1L)))
    assert(out(3L) == (("e1 e2", 1L, 1L)))
    assert(out(4L) == (("u1 u2 f1", 2L, 1L)), "within-doc repeat deduped")
    assert(out(5L) == (("", 0L, 1L)), "doc of only-repeats stays, empty")
    assert(out(6L) == (("", 0L, 0L)), "empty doc stays")
    intercept[IllegalArgumentException] {
      PipelineOps.dedupSegments(docs, "_s", "text", 2)
    }
  }

  test("assignSplits: exhaustive, deterministic, proportional, leakage-free growth") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("id")
    val splits = Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1)
    val got = PipelineOps.assignSplits(ids, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 2000, "every row assigned exactly one split")
    val frac = got.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05 &&
      math.abs(frac("validation") - 0.1) < 0.03 &&
      math.abs(frac("test") - 0.1) < 0.03, s"got $frac")
    // leakage-free growth: assignments are per-id pure — a larger corpus
    // leaves existing ids' splits untouched
    val small = PipelineOps.assignSplits((0L until 100L).toDF("id"), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small.forall { case (k, v) => got(k) == v })
    // a different salt redraws; a single split is total
    val redrawn = PipelineOps.assignSplits(ids, "id", splits, salt = "other")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(redrawn != got)
    assert(PipelineOps.assignSplits(ids, "id", Seq("all" -> 1.0))
      .filter(col("split") === "all").count() == 2000)
    intercept[IllegalArgumentException] {
      PipelineOps.assignSplits(ids, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      PipelineOps.assignSplits(ids, "id", Seq("a" -> 0.5, "a" -> 0.5))
    }
  }

  test("lmCrossEntropy: hand-computed bigram NLLs, short-doc null, count parity") {
    import spark.implicits._
    // corpus bigrams: (a,b) (b,c) from doc 1, (a,c) from doc 2 ->
    // c(a,b)=c(b,c)=c(a,c)=1, c(a,.)=2, c(b,.)=1
    // doc1 = (-ln(1/2) - ln(1/1)) / 2 = ln(2)/2; doc2 = -ln(1/2) = ln(2)
    val docs = Seq((1L, "a b c"), (2L, "a c"), (3L, "x")).toDF("doc_id", "text")
    val got = PipelineOps.lmCrossEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    def r4(x: Double) = // Spark round() semantics: HALF_UP on BigDecimal
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((2L, Some(r4(math.log(2.0) / 2)))), s"got ${got(1L)}")
    assert(got(2L) == ((1L, Some(r4(math.log(2.0))))), s"got ${got(2L)}")
    assert(got(3L) == ((0L, None)), "single-token doc has no bigrams")
    intercept[IllegalArgumentException] {
      PipelineOps.lmCrossEntropy(docs, "_p", "text")
    }
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val prev = Seq((1L, "same"), (2L, "old text"), (4L, "gone")).toDF("id", "body")
    val cur = Seq((1L, "same"), (2L, "new text"), (3L, "fresh")).toDF("id", "body")
    val got = PipelineOps.snapshotDiff(prev, cur, "id", "body")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "added", 4L -> "removed"), s"got $got")
  }

  test("bpeTrain matches a reference BPE trainer merge-for-merge") {
    import spark.implicits._
    // reference implementation: overlapping pair counts weighted by word
    // freq, argmax with (freq desc, left asc, right asc) ties, greedy
    // leftmost adjacent merge — the standard (Sennrich) algorithm
    def refBpe(wordFreq: Map[String, Long], rounds: Int,
        minFreq: Long): Seq[(String, String, Long)] = {
      var words = wordFreq.map { case (w, f) => (w.split("").toVector, f) }.toVector
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var done = false
      for (_ <- 1 to rounds if !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- words; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
        val best = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.headOption
        best match {
          case Some(((l, r), c)) if c >= minFreq =>
            out += ((l, r, c))
            words = words.map { case (syms, f) =>
              val b = Vector.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                  b += (l + r); i += 2
                } else { b += syms(i); i += 1 }
              }
              (b.result(), f)
            }
          case _ => done = true
        }
      }
      out.toSeq
    }
    val corpus = Seq(
      "low low low lower lower lowest",
      "new newer newest new new",
      "low new wide wider")
      .toDF("text")
    val wordFreq = corpus
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refBpe(wordFreq, rounds = 12, minFreq = 2L)
    val got = PipelineOps.bpeTrain(corpus, "text", numMerges = 12, minPairFreq = 2L)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq == want, s"\ngot:  ${got.toSeq}\nwant: $want")
    assert(want.size >= 4, "corpus must be rich enough to learn several merges")
    // learned merges must include the shared stems
    assert(got.map(m => m._1 + m._2).exists(Set("lo", "low", "ne", "new")),
      s"expected a stem merge in ${got.toSeq}")
    intercept[IllegalArgumentException] {
      PipelineOps.bpeTrain(corpus, "text", numMerges = 0)
    }
  }

  test("bpeTrain: driver-local finishing path equals the distributed loop merge-for-merge") {
    import spark.implicits._
    // a random corpus rich in repeated stems so many rounds have real
    // tie-break pressure; 40 merges exercises incremental count
    // maintenance well past the first trivial rounds
    val rnd = new scala.util.Random(13L)
    val stems = Seq("lo", "new", "wide", "high", "ab", "abc", "zz")
    val sufs = Seq("", "w", "er", "est", "s", "aa")
    val corpus = Seq.fill(120)(
      Seq.fill(1 + rnd.nextInt(8))(
        stems(rnd.nextInt(stems.length)) + sufs(rnd.nextInt(sufs.length)))
        .mkString(" ")).toDF("text")
    def table(vocabCap: Long) =
      PipelineOps.bpeTrain(corpus, "text", numMerges = 40, minPairFreq = 2L,
          driverVocabCap = vocabCap)
        .orderBy("rank").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
    val local = table(vocabCap = 4000000L) // driver-local finish
    val dist = table(vocabCap = 0L)        // distributed loop forced
    assert(local.nonEmpty && local.size > 10, s"expected many merges, got ${local.size}")
    assert(local == dist,
      s"driver-local vs distributed diverged:\nlocal: $local\ndist:  $dist")
  }

  test("bpeTrain/trainBpeLocal edges: empty corpus, single-char words, minPairFreq cutoff") {
    import spark.implicits._
    // empty corpus: vocab is empty -> empty merge table, right schema
    val empty = PipelineOps.bpeTrain(Seq("", "   ").toDF("text"), "text",
      numMerges = 5)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("rank", "left", "right", "merged", "pair_freq"))
    // single-char words: no adjacent pairs anywhere -> no merges
    assert(PipelineOps.trainBpeLocal(
      Array((Array("a"), 10L), (Array("b"), 3L)), 5, 1L).isEmpty)
    // minPairFreq cutoff stops training even with merges left
    val cut = PipelineOps.trainBpeLocal(
      Array((Array("a", "b"), 3L), (Array("c", "d"), 1L)), 5, 2L)
    assert(cut == Seq((1, "a", "b", 3L)), s"got $cut")
    // exhaustion: every word collapses to one symbol, then training stops
    val full = PipelineOps.trainBpeLocal(Array((Array("x", "y", "z"), 2L)), 99, 1L)
    assert(full.map(m => (m._2, m._3)) == Seq(("x", "y"), ("xy", "z")), s"got $full")
  }

  test("profileNumeric: one-scan per-column stats with nulls, hand-computed") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Long)](
      (1.0, 10L), (2.0, 10L), (2.0, null), (null, 30L), (3.0, 30L))
      .toDF("a", "b")
    val got = PipelineOps.profileNumeric(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("a") == ((5L, 1L, 3L, 1.0, 3.0)))
    assert(got("b") == ((5L, 1L, 2L, 10.0, 30.0)))
    // sketch mode agrees on tiny cardinalities
    val approx = PipelineOps.profileNumeric(df, Seq("a", "b"), exactDistinct = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(approx("a") == 3L && approx("b") == 2L)
    intercept[IllegalArgumentException] {
      PipelineOps.profileNumeric(df.withColumn("s", lit("x")), Seq("s"))
    }
  }

  test("assignSplitsByCluster: near-dup clusters never straddle splits") {
    import spark.implicits._
    // 30 singleton docs + one 3-member near-dup cluster + one exact pair
    val base = (1 to 30).map(i =>
      (i.toLong, s"unique document number $i with content token$i alpha beta gamma"))
    val nd = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again and again today"),
      (102L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (103L, "the quick brown fox jumps over the lazy dog again and again"))
    val ex = Seq(
      (201L, "identical text body here for the pair check"),
      (202L, "identical text body here for the pair check"))
    val df = (base ++ nd ++ ex).toDF("doc_id", "text")
    val got = PipelineOps.assignSplitsByCluster(df, "doc_id", "text",
      Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1), n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length == 35)
    // every cluster maps to exactly one split — the leak-free property
    got.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $c straddles splits: ${members.toSeq}")
    }
    // the planted near-dups actually form one cluster (101 reaches 103)
    val ndClusters = got.filter(r => Set(101L, 102L, 103L)(r._1)).map(_._2).distinct
    assert(ndClusters.length == 1, s"planted near-dups split into $ndClusters")
    assert(got.filter(r => Set(201L, 202L)(r._1)).map(_._2).distinct.length == 1)
    // singleton clusters get the plain per-id assignment (same device)
    val singles = got.filter(r => r._1 <= 30 && r._2 == r._1)
    val plain = PipelineOps.assignSplits(
      df.filter(col("doc_id") <= 30), "doc_id",
      Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    singles.foreach { case (id, _, s) => assert(plain(id) == s) }
  }

  test("winsorizeBy clamps to per-group interpolated percentiles; sketch mode agrees") {
    import spark.implicits._
    // group a: 1..100 -> p10/p90 interpolate to 10.9 and 90.1
    // group b: constant except one huge outlier -> outlier clamps to hi
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 99).map(_ => ("b", 5.0)) :+ ("b", 1e9)).toDF("k", "v")
    val got = PipelineOps.winsorizeBy(df, "k", "v", 0.1, 0.9, exact = true)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // read the interpolated cuts from the same aggregate the operator
    // uses (p90 of 1..100 is 90.1 up to float representation — asserting
    // a decimal literal would test the printer, not the clamp)
    val Array(loA, hiA) = df.filter(col("k") === "a")
      .agg(percentile(col("v"), lit(0.1)), percentile(col("v"), lit(0.9)))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(loA - 10.9) < 1e-9 && math.abs(hiA - 90.1) < 1e-9)
    val a = got.filter(_._1 == "a")
    assert(a.forall { case (_, v, w) => w == math.min(math.max(v, loA), hiA) })
    assert(a.count(_._3 == loA) == 10 && a.count(_._3 == hiA) == 10)
    val b = got.filter(_._1 == "b")
    // p90 of 99x5.0 + 1e9 interpolates between 5 and 5 -> 5.0; the
    // outlier clamps down to it, everything else is untouched
    assert(b.forall(_._3 == 5.0))
    // original column is untouched
    assert(got.count(_._2 == 1e9) == 1)
    // sketch mode (the 100 TB path): approx_percentile returns an
    // OBSERVED value at the rank, not an interpolation — read its cuts
    // the same way and assert the identical clamp semantics around them
    val Array(loS, hiS) = df.filter(col("k") === "a")
      .agg(approx_percentile(col("v"), lit(0.1), lit(10000)),
        approx_percentile(col("v"), lit(0.9), lit(10000)))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(loS - 10.9) <= 1.0 && math.abs(hiS - 90.1) <= 1.0,
      s"sketch cuts ($loS, $hiS) should land within one observation of exact")
    val approx = PipelineOps.winsorizeBy(df, "k", "v", 0.1, 0.9)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(approx.filter(_._1 == "a").forall { case (_, v, w) =>
      w == math.min(math.max(v, loS), hiS) })
    assert(approx.filter(_._1 == "b").forall(_._3 == 5.0))
    intercept[IllegalArgumentException] {
      PipelineOps.winsorizeBy(df, "k", "v", 0.9, 0.1)
    }
  }

  test("bpeEncode applies merges leftmost-greedy like the reference encoder") {
    import spark.implicits._
    // reference apply: the same greedy loop the trainer spec uses —
    // per rule in order, leftmost-first, non-overlapping
    def refApply(w: String, merges: Seq[(String, String)]): Vector[String] = {
      var syms = w.split("").toVector
      for ((l, r) <- merges) {
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            b += (l + r); i += 2
          } else { b += syms(i); i += 1 }
        }
        syms = b.result()
      }
      syms
    }
    // run-overlap cases (aaa/aaaa/aaaaa with a+a then aa+a), chained
    // merges (t+h -> th+e), and single-char words
    val merges = Seq("a" -> "a", "aa" -> "a", "t" -> "h", "th" -> "e", "e" -> "r")
    val texts = Seq(
      1L -> "aaa aaaa aaaaa the ther there thethe a",
      2L -> "aa the her x")
    val corpus = texts.toDF("id", "text")
    val got = PipelineOps.bpeEncode(corpus, "id", "text", merges)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getString(3), r.getLong(4))))
      .toMap
    for ((id, text) <- texts; (w, i) <- text.split(" ").zipWithIndex) {
      val want = refApply(w, merges)
      val (gw, genc, gn) = got((id, i))
      assert(gw == w)
      assert(genc == want.mkString(" "), s"word '$w': got '$genc', want '${want.mkString(" ")}'")
      assert(gn == want.size.toLong, s"word '$w' token count")
    }
    assert(got.size == texts.map(_._2.split(" ").length).sum)
    intercept[IllegalArgumentException] {
      PipelineOps.bpeEncode(corpus, "id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      PipelineOps.bpeEncode(corpus, "id", "text", Seq("a" -> "b c"))
    }
  }

  test("bpeEncode equals the reference encoder on random words and random merge lists") {
    import spark.implicits._
    // adversarial alphabet {a,b}: maximizes run-overlap and
    // chained-merge interactions (aa, ab, aab...); merge lists are built
    // progressively so later rules can reference earlier merged symbols,
    // like real trained tables
    def refApply(w: String, merges: Seq[(String, String)]): Vector[String] = {
      var syms = w.split("").toVector
      for ((l, r) <- merges) {
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            b += (l + r); i += 2
          } else { b += syms(i); i += 1 }
        }
        syms = b.result()
      }
      syms
    }
    for (seed <- Seq(11L, 23L, 47L)) {
      val rnd = new scala.util.Random(seed)
      val words = Vector.fill(60)(
        (1 to (1 + rnd.nextInt(10))).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString)
      var symbols = Vector("a", "b")
      val merges = Vector.newBuilder[(String, String)]
      for (_ <- 1 to 6) {
        val l = symbols(rnd.nextInt(symbols.length))
        val r = symbols(rnd.nextInt(symbols.length))
        merges += ((l, r))
        symbols :+= (l + r)
      }
      val m = merges.result()
      val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
      val got = PipelineOps.bpeEncode(df, "id", "text", m)
        .collect().map(r => r.getLong(0) -> ((r.getString(3), r.getLong(4)))).toMap
      words.zipWithIndex.foreach { case (w, i) =>
        val want = refApply(w, m)
        assert(got(i.toLong)._1 == want.mkString(" "),
          s"seed=$seed word='$w' merges=$m: got '${got(i.toLong)._1}', want '${want.mkString(" ")}'")
        assert(got(i.toLong)._2 == want.size.toLong)
      }
    }
  }

  test("bpeEncode loop path (past literalMergeCap) equals the literal path") {
    import spark.implicits._
    // force the non-codegen loop encoder with literalMergeCap = 0 and
    // assert byte-identical output vs the literal replace-chain path on
    // the adversarial {a,b} harness
    for (seed <- Seq(5L, 17L)) {
      val rnd = new scala.util.Random(seed)
      val words = Vector.fill(50)(
        (1 to (1 + rnd.nextInt(12))).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString)
      var symbols = Vector("a", "b")
      val merges = Vector.newBuilder[(String, String)]
      for (_ <- 1 to 8) {
        val l = symbols(rnd.nextInt(symbols.length))
        val r = symbols(rnd.nextInt(symbols.length))
        merges += ((l, r))
        symbols :+= (l + r)
      }
      val m = merges.result()
      val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
      def run(cap: Int) = PipelineOps.bpeEncode(df, "id", "text", m, literalMergeCap = cap)
        .collect().map(r => r.getLong(0) -> ((r.getString(3), r.getLong(4)))).toMap
      assert(run(0) == run(512), s"seed=$seed: loop path diverged from literal path")
    }
  }

  test("bpeEncode loop path at 1k merges matches an independent String.replace reference") {
    import spark.implicits._
    // production-size merge table: 1000 progressively-built rules — far
    // past any literal-chain codegen budget — applied on the loop path.
    // The reference is java.lang.String#replace over the same delimited
    // symbol string the literal SQL path uses (identical leftmost-scan,
    // resume-after-replacement semantics), computed driver-side: a
    // genuinely independent implementation of the merge chain.
    def refEncode(word: String, merges: Seq[(String, String)]): String = {
      var s = word.map(c => "\u0002" + c + "\u0003").mkString
      for ((l, r) <- merges)
        s = s.replace("\u0002" + l + "\u0003\u0002" + r + "\u0003",
          "\u0002" + l + r + "\u0003")
      s.replace("\u0003\u0002", " ").replace("\u0002", "").replace("\u0003", "")
    }
    val rnd = new scala.util.Random(101L)
    val words = Vector.fill(80)(
      (1 to (2 + rnd.nextInt(14))).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString)
    var symbols = Vector("a", "b")
    val merges = Vector.newBuilder[(String, String)]
    for (_ <- 1 to 1000) {
      val l = symbols(rnd.nextInt(symbols.length))
      val r = symbols(rnd.nextInt(symbols.length))
      merges += ((l, r))
      symbols :+= (l + r)
    }
    val m = merges.result()
    assert(m.size == 1000)
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val got = PipelineOps.bpeEncode(df, "id", "text", m) // auto-dispatch: 1000 > 512
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) == refEncode(w, m),
        s"word='$w': got '${got(i.toLong)}', want '${refEncode(w, m)}'")
    }
  }

  test("bpeEncode with trained merges reproduces the trainer's next pick (closure)") {
    import spark.implicits._
    // train k merges, encode the corpus with them, and the weighted top
    // adjacent pair of the ENCODED corpus must equal the (k+1)-th merge
    // the trainer itself picks — encode-side state == trainer-side state.
    val corpus = Seq(
      "low low low lower lower lowest",
      "new newer newest new new",
      "low new wide wider").toDF("text")
      .withColumn("id", monotonically_increasing_id())
    val trained = PipelineOps.bpeTrain(corpus, "text", numMerges = 12, minPairFreq = 2L)
      .orderBy("rank").collect()
    assert(trained.length >= 4, "corpus must learn at least 4 merges")
    val k = 3
    val firstK = trained.take(k).map(r => (r.getString(1), r.getString(2))).toSeq
    assert(PipelineOps.collectMerges(
      PipelineOps.bpeTrain(corpus, "text", numMerges = k, minPairFreq = 2L))
      == firstK, "collectMerges round-trips the trained table in rank order")
    val enc = PipelineOps.bpeEncode(corpus, "id", "text", firstK)
    val top = enc.select(split(col("enc"), " ").as("syms"))
      .select(explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("l").asc, col("r").asc)
      .limit(1).collect()(0)
    assert((top.getString(0), top.getString(1)) ==
      ((trained(k).getString(1), trained(k).getString(2))),
      s"encoded-state top pair ${(top.getString(0), top.getString(1))} != " +
        s"trainer merge ${k + 1} ${(trained(k).getString(1), trained(k).getString(2))}")
  }

  test("noveltyScore: hand-computed novelty, short docs absent, partition-independent") {
    import spark.implicits._
    // doc 1: shingles {a b c, b c d}; doc 2 repeats {a b c} and adds
    // {c d e, d e f}; doc 3 is all-repeat; doc 4 too short for a trigram
    val corpus = Seq(
      (1L, "a b c d"), (2L, "a b c d e f"), (3L, "a b c"), (4L, "x y"))
      .toDF("doc_id", "text")
    val got = PipelineOps.noveltyScore(corpus, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // doc 2 shingles: abc(first=1), bcd(first=1), cde, def -> 2/4 novel
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((4L, 2L, 0.5)))
    assert(got(3L) == ((1L, 0L, 0.0)), "an all-repeat doc scores zero")
    assert(!got.contains(4L), "docs with no shingle must be absent")
    val reparted = PipelineOps.noveltyScore(corpus.repartition(5), "doc_id",
        "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(reparted == got, "novelty must not depend on partitioning")
  }

  test("mixToBudget: per-source caps near allocation, unlisted strata dropped, deterministic") {
    val budget = 10000L
    val weights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val kept = PipelineOps.mixToBudget(docs, "doc_id", "source", "n_chars",
      budget, weights)
    val bySource = kept.groupBy("source")
      .agg(sum(col("n_chars")).as("u"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.keySet == weights.keySet,
      s"only the weighted sources may survive: $bySource")
    // Bernoulli sampling on ~25 docs/source is noisy; the kept units must
    // still land in the right regime: nonzero, and under ~2x allocation
    weights.foreach { case (s, w) =>
      val alloc = budget * w
      assert(bySource(s) > 0, s"$s lost every doc")
      assert(bySource(s) < 2.2 * alloc,
        s"$s kept ${bySource(s)} units vs allocation $alloc")
    }
    val rerun = PipelineOps.mixToBudget(docs.repartition(7), "doc_id", "source",
        "n_chars", budget, weights)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rerun == kept.select("doc_id").collect().map(_.getLong(0)).toSet,
      "mix must be a pure function of (key, salt, totals)")
    // a stratum smaller than its allocation keeps everything (cap, not upsample)
    val all = PipelineOps.mixToBudget(docs, "doc_id", "source", "n_chars",
      budgetUnits = 100000000L, weights = Map("src0" -> 1.0))
    assert(all.count() == docs.filter(col("source") === "src0").count())
    intercept[IllegalArgumentException] {
      PipelineOps.mixToBudget(docs, "doc_id", "source", "n_chars",
        budget, Map("src0" -> 0.5, "src1" -> 0.2)) // sums to 0.7
    }
    intercept[IllegalArgumentException] {
      PipelineOps.mixToBudget(docs, "doc_id", "source", "n_chars",
        0L, Map("src0" -> 1.0))
    }
  }

  test("quantileBuckets: bucket is monotone in the value (sorting by value never decreases bucket)") {
    val rows = PipelineOps.quantileBuckets(docs, "doc_id", "n_chars",
        k = 8, exact = true)
      .select("n_chars", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    rows.sliding(2).foreach {
      case Array((v1, b1), (v2, b2)) =>
        assert(b1 <= b2, s"bucket decreased: ($v1,$b1) -> ($v2,$b2)")
        assert(v1 != v2 || b1 == b2, "equal values must share a bucket")
      case _ =>
    }
  }

  test("quantileBuckets: near-uniform depths, sketch mode tracks exact, guards") {
    val exact = PipelineOps.quantileBuckets(docs, "doc_id", "n_chars",
      k = 8, exact = true)
    val n = docs.count()
    val depths = exact.groupBy("bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(depths.keySet.subsetOf((0 until 8).toSet), s"bucket out of range: $depths")
    // equi-depth: every bucket within 2x of the ideal n/k (ties distort)
    depths.values.foreach(d =>
      assert(d <= 2 * n / 8 + 1, s"bucket too deep: $depths"))
    assert(depths.values.sum == n, "every row must land in exactly one bucket")
    // the sketch path must agree with exact for nearly every row at a
    // tight accuracy (it only disagrees within the rank-error band)
    val approx = PipelineOps.quantileBuckets(docs, "doc_id", "n_chars",
      k = 8, exact = false, accuracy = 10000)
    val joined = exact.select(col("doc_id"), col("bucket").as("be"))
      .join(approx.select(col("doc_id"), col("bucket").as("ba")), "doc_id")
    val disagree = joined.filter(col("be") =!= col("ba")).count()
    assert(disagree <= n / 100, s"$disagree/$n rows moved bucket under the sketch")
    intercept[IllegalArgumentException] {
      PipelineOps.quantileBuckets(docs, "doc_id", "n_chars", k = 1)
    }
    intercept[IllegalArgumentException] {
      PipelineOps.quantileBuckets(docs.withColumnRenamed("source", "bucket"),
        "doc_id", "n_chars", k = 4)
    }
  }

  test("bm25Score: hand-computed Lucene BM25, non-matching docs absent, partition-independent") {
    import spark.implicits._
    val corpus = Seq((1L, "a b a c"), (2L, "a d"), (3L, "d d d"))
      .toDF("doc_id", "text")
    val got = PipelineOps.bm25Score(corpus, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // N=3, dl = 4/2/3, avgdl = 3; df(a)=2, df(b)=1
    val idfA = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    val idfB = math.log(1 + (3 - 1 + 0.5) / (1 + 0.5))
    def w(idf: Double, tf: Long, dl: Long): Double =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    def r4(v: Double): Double = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((r4(w(idfA, 2, 4) + w(idfB, 1, 4)), 2L)))
    assert(got(2L) == ((r4(w(idfA, 1, 2)), 1L)))
    assert(!got.contains(3L), "a doc matching no query term must be absent")
    val reparted = PipelineOps.bm25Score(corpus.repartition(5), "doc_id", "text",
      Seq("a", "b")).collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(reparted == got, "bm25 must not depend on partitioning")
    intercept[IllegalArgumentException] {
      PipelineOps.bm25Score(corpus, "doc_id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      PipelineOps.bm25Score(corpus, "doc_id", "text", Seq("a", "a"))
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

  test("saltedJoin equals the plain equi-join (inner and left, multiset)") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).sorted(
        Ordering.by((s: Seq[String]) => s.mkString("\u0000"))).toSeq

    val plainInner = multiset(
      orders.join(customer, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_mktsegment"))
    val saltedInner = multiset(
      PipelineOps.saltedJoin(orders, customer, "o_custkey", "c_custkey", salt = 4)
        .select("o_orderkey", "c_custkey", "c_mktsegment"))
    assert(saltedInner == plainInner && plainInner.nonEmpty)

    // left join from the big side: customers without orders appear exactly
    // once, null-padded — not once per salt value
    val plainLeft = multiset(
      customer.join(orders, col("c_custkey") === col("o_custkey"), "left")
        .select("c_custkey", "o_orderkey"))
    val saltedLeft = multiset(
      PipelineOps.saltedJoin(customer, orders, "c_custkey", "o_custkey",
          salt = 4, joinType = "left")
        .select("c_custkey", "o_orderkey"))
    assert(saltedLeft == plainLeft)

    intercept[IllegalArgumentException] {
      PipelineOps.saltedJoin(orders, customer, "o_custkey", "c_custkey",
        salt = 4, joinType = "full")
    }
  }

  test("capPerGroup: bounded survivors matching the window formulation, partition-independent") {
    import org.apache.spark.sql.expressions.Window
    val capped = PipelineOps.capPerGroup(docs, "source", "doc_id", maxRows = 3)
    val perGroup = capped.groupBy("source").count().collect()
    assert(perGroup.forall(_.getLong(1) <= 3), "a group exceeded the cap")

    // the row_number-window formulation is the semantic oracle (the heap
    // aggregate exists because this window shape single-task-sorts hot
    // groups at scale)
    val pri = substring(md5(concat(col("doc_id").cast("string"),
      lit(":graft")).cast("binary")), 1, 13)
    val want = docs.withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(pri.asc, col("doc_id").asc)))
      .filter(col("rn") <= 3).select("source", "doc_id")
      .collect().map(_.toSeq).toSet
    val got = capped.collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)

    val repartitioned = PipelineOps.capPerGroup(
        docs.repartition(7), "source", "doc_id", maxRows = 3)
      .collect().map(_.toSeq).toSet
    assert(repartitioned == got, "survivors must not depend on partitioning")
  }

  test("bloomSemiJoin equals the plain semi join, even under forced false positives") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val big = (1 to 5000).map(i => (rnd.nextInt(800).toLong, i))
      .toDF("k", "payload")
      .union(Seq((-1L, -1)).toDF("k", "payload")
        .select(lit(null).cast("long").as("k"), col("payload")))
    val small = (1 to 300).map(_ => rnd.nextInt(1200).toLong).toDF("sk")
      .union(Seq(Tuple1[java.lang.Long](null)).toDF("sk"))
    val want = big.join(small, col("k") === col("sk"), "left_semi")
      .collect().map(_.toSeq).toSet
    val got = PipelineOps.bloomSemiJoin(big, small, "k", "sk")
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
    // 64 bloom bits for ~300 keys: almost every probe is a false
    // positive, and the trailing semi join must still remove them all
    val fp = PipelineOps.bloomSemiJoin(big, small, "k", "sk", maxNumBits = 64)
      .collect().map(_.toSeq).toSet
    assert(fp == want, "false positives must never reach the result")
    // pre-sized (caller-supplied cardinality) path
    val sized = PipelineOps.bloomSemiJoin(big, small, "k", "sk",
      expectedItems = 301).collect().map(_.toSeq).toSet
    assert(sized == want)
    // empty and all-null key sets -> empty result, big schema preserved
    val empty = PipelineOps.bloomSemiJoin(big, small.filter(lit(false)), "k", "sk")
    assert(empty.count() == 0 && empty.columns.sameElements(big.columns))
    val allNull = PipelineOps.bloomSemiJoin(
      big, small.filter(col("sk").isNull), "k", "sk")
    assert(allNull.count() == 0)
  }

  test("bloomAntiJoin equals the plain anti join: null keys kept, false positives settled") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val big = (1 to 5000).map(i => (rnd.nextInt(800).toLong, i))
      .toDF("k", "payload")
      .union(Seq((-1L, -1)).toDF("k", "payload")
        .select(lit(null).cast("long").as("k"), col("payload")))
    val small = (1 to 300).map(_ => rnd.nextInt(1200).toLong).toDF("sk")
      .union(Seq(Tuple1[java.lang.Long](null)).toDF("sk"))
    val want = big.join(small, col("k") === col("sk"), "left_anti")
      .collect().map(_.toSeq).toSet
    val got = PipelineOps.bloomAntiJoin(big, small, "k", "sk")
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
    assert(want.exists(_.head == null), "the null-key row must survive the anti join")
    // 64 bloom bits: nearly everything is a might-contain false positive
    // and must be settled by the real anti join, not dropped
    val fp = PipelineOps.bloomAntiJoin(big, small, "k", "sk", maxNumBits = 64)
      .collect().map(_.toSeq).toSet
    assert(fp == want, "false positives must be settled, never dropped")
    // empty blocklist removes nothing
    val none = PipelineOps.bloomAntiJoin(big, small.filter(lit(false)), "k", "sk")
    assert(none.count() == big.count())
  }

  test("bloomSemiJoin plan: might_contain filters the big side below the join") {
    // parquet scans, not local relations — Catalyst constant-folds a
    // filter over a LocalRelation away, which would hide the assertion
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val hot = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_totalprice") > 400000)
    val plan = PipelineOps.bloomSemiJoin(li, hot, "l_orderkey", "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a bloom might_contain pre-filter in the plan:\n$plan")
  }
}
