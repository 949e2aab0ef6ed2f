package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/**
 * Round-16 index-lifecycle hardening (ADVICE r15, all three items):
 *
 *  1. delete-then-reinsert (upsert): an append must clear the appended
 *     ids' tombstones — without that the probe anti-join suppresses the
 *     FRESH row and the next compaction permanently deletes it (silent
 *     data loss on the natural upsert pattern).
 *  2. crash-safe compaction: the per-cell delete+rename swap has crash
 *     windows in which a cell's SURVIVING rows are missing from the
 *     layout; the manifest protocol makes every window either a clean
 *     rollback (uncommitted — no manifest) or a completed swap
 *     (committed — manifest present), recovered at the next entry
 *     point.
 *  3. tombstone-aware estimators: the re-earned calibration width, the
 *     auto shortlist depth, and the width diagnostic must reflect the
 *     SURVIVING corpus, not the raw layout.
 */
class AnnLifecycleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private def embs = spark.read.parquet(s"$dir/embeddings.parquet")

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def tombstoneIds(path: String): Set[Long] =
    try spark.read.parquet(s"$path/tombstones")
      .collect().map(_.getAs[Number]("id").longValue()).toSet
    catch { case _: org.apache.spark.sql.AnalysisException => Set.empty }

  test("upsert: re-appending a deleted id clears its tombstone and the new row is served (IVF)") {
    val path = java.nio.file.Files.createTempDirectory("ivf-upsert-").toString
    val built = Similarity.buildIvf(embs, "vec_id", "embedding",
      dim = 64, nlist = 16, iters = 3)
    built.save(path)
    built.unpersist()
    val doomed = embs.filter(col("vec_id") % 7 === 3)
    val nDoomed = doomed.count()
    assert(Similarity.deleteFromIndex(spark, path,
      doomed.select("vec_id"), "vec_id") == nDoomed)
    assert(tombstoneIds(path).size == nDoomed)

    // re-insert the deleted rows (the upsert pattern: a takedown
    // reversed, a corrected document re-ingested)
    assert(Similarity.appendToIvf(spark, path, doomed,
      "vec_id", "embedding") == nDoomed)
    assert(tombstoneIds(path).isEmpty,
      "append must clear the appended ids' tombstones")

    // the re-appended rows are served again
    val queries = embs.filter(col("vec_id") < 20)
    val probe = pairsOf(Similarity.loadIvf(spark, path)
      .topK(queries, "vec_id", "embedding", k = 5, nprobe = 16))
    assert(probe.exists(_._2 % 7 == 3),
      "re-appended ids must be reachable again")

    // and compaction must NOT destroy them (the pre-fix data loss:
    // tombstone still present -> compaction deletes the fresh row,
    // then clears the tombstone)
    assert(Similarity.compactIndex(spark, path) == 0L)
    val layoutIds = spark.read.parquet(s"$path/layout")
      .select(col("id").cast("long")).collect().map(_.getLong(0)).toSet
    assert(doomed.select(col("vec_id").cast("long")).collect()
      .map(_.getLong(0)).forall(layoutIds.contains),
      "compaction after upsert must keep every re-appended row")
  }

  test("upsert: partial re-append keeps the OTHER tombstones live (IVFPQ)") {
    val path = java.nio.file.Files.createTempDirectory("ivfpq-upsert-").toString
    val built = Similarity.buildIvfPq(embs, "vec_id", "embedding", dim = 64,
      nlist = 16, ivfIters = 3, m = 16, ksub = 32, pqIters = 3)
    built.save(path)
    built.unpersist()
    val doomed = embs.filter(col("vec_id") % 5 === 1)
    assert(Similarity.deleteFromIndex(spark, path,
      doomed.select("vec_id"), "vec_id") == doomed.count())
    // re-insert only the % 10 == 1 half of the deleted set
    val back = doomed.filter(col("vec_id") % 10 === 1)
    assert(Similarity.appendToIvfPq(spark, path, back,
      "vec_id", "embedding") == back.count())
    val tombs = tombstoneIds(path)
    assert(tombs.nonEmpty && tombs.forall(_ % 10 == 6),
      s"only the still-deleted half (% 10 == 6) may stay tombstoned: " +
        s"${tombs.take(5)}")
    val queries = embs.filter(col("vec_id") < 20)
    val probe = pairsOf(Similarity.loadIvfPq(spark, path)
      .topK(queries, "vec_id", "embedding", k = 5, nprobe = 16,
        shortlist = 4000, corpus = embs))
    assert(!probe.exists(_._2 % 10 == 6),
      "still-deleted ids must stay unreachable after the partial upsert")
    assert(probe.exists(_._2 % 10 == 1),
      "re-appended ids must be reachable after the partial upsert")
  }

  test("crash recovery: an UNCOMMITTED compaction (no manifest) is discarded, state untouched") {
    val path = java.nio.file.Files.createTempDirectory("ivf-crash-un-").toString
    val built = Similarity.buildIvf(embs, "vec_id", "embedding",
      dim = 64, nlist = 16, iters = 3)
    built.save(path)
    built.unpersist()
    val doomed = embs.filter(col("vec_id") % 7 === 3).select("vec_id")
    Similarity.deleteFromIndex(spark, path, doomed, "vec_id")
    val queries = embs.filter(col("vec_id") < 20)
    val want = pairsOf(Similarity.loadIvf(spark, path)
      .topK(queries, "vec_id", "embedding", k = 5, nprobe = 16))
    val tombsBefore = tombstoneIds(path)

    // simulate a compaction that died while writing its survivors:
    // tmp dir with partial data, NO manifest
    val tmp = new java.io.File(s"$path/layout_compacting/c=0")
    assert(tmp.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/layout_compacting/c=0/part-junk.parquet"),
      "junk".getBytes("UTF-8"))

    val probe = pairsOf(Similarity.loadIvf(spark, path)
      .topK(queries, "vec_id", "embedding", k = 5, nprobe = 16))
    assert(probe == want, "discarding an uncommitted compaction must not change answers")
    assert(!new java.io.File(s"$path/layout_compacting").exists(),
      "the uncommitted tmp dir must be discarded")
    assert(tombstoneIds(path) == tombsBefore,
      "tombstones must survive an uncommitted compaction")
  }

  test("crash recovery: a COMMITTED compaction crashed mid-swap is completed at the next load") {
    val path = java.nio.file.Files.createTempDirectory("ivf-crash-mid-").toString
    val built = Similarity.buildIvf(embs, "vec_id", "embedding",
      dim = 64, nlist = 16, iters = 3)
    built.save(path)
    built.unpersist()
    val layout = spark.read.parquet(s"$path/layout")
      .select(col("id").cast("long").as("id"), col("c"))
    // cell A: delete SOME members (survivors exist); cell B: delete ALL
    val bySize = layout.groupBy("c").count().orderBy(col("count").desc)
      .collect().map(_.getInt(0))
    val (cellA, cellB) = (bySize(0), bySize(1))
    val delA = layout.filter(col("c") === cellA).select("id").limit(3)
      .collect().map(_.getLong(0))
    val delB = layout.filter(col("c") === cellB).select("id")
      .collect().map(_.getLong(0))
    import spark.implicits._
    val removeIds = (delA ++ delB).toSeq.toDF("vec_id")
    Similarity.deleteFromIndex(spark, path, removeIds, "vec_id")
    val survivorsWant = layout.filter(
      !col("id").isin((delA ++ delB).map(Long.box): _*))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

    // build the crashed-mid-swap state BY HAND, exactly as compactWith
    // would have left it at its worst window (ADVICE r15): survivors
    // durably in tmp, manifest committed, cell A's dst DELETED but the
    // rename not yet run — without recovery, cell A's surviving rows
    // are simply gone from the layout
    val tmpDir = s"$path/layout_compacting"
    spark.read.parquet(s"$path/layout")
      .filter(col("c") === cellA &&
        !col("id").cast("long").isin(delA.map(Long.box): _*))
      .repartition(1)
      .write.partitionBy("c").parquet(tmpDir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmpDir/_MANIFEST"),
      s"$cellA 1\n$cellB 0".getBytes("UTF-8"))
    // the crash window: dst of cell A deleted, rename pending; cell B
    // untouched (its dst delete also pending)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    rmrf(new java.io.File(s"$path/layout/c=$cellA"))

    // next load completes the swap: cell A's survivors back in place,
    // cell B gone, tombstones cleared
    val probe = Similarity.loadIvf(spark, path)
    val after = spark.read.parquet(s"$path/layout")
      .select(col("id").cast("long"), col("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after == survivorsWant,
      s"recovered layout must hold exactly the survivors " +
        s"(${after.size} vs ${survivorsWant.size})")
    assert(!new java.io.File(tmpDir).exists(), "recovery must remove the tmp dir")
    assert(tombstoneIds(path).isEmpty,
      "recovery of a committed compaction must clear the tombstones")
    // and a re-run of recovery/compaction is a no-op
    assert(Similarity.compactIndex(spark, path) == 0L)
    val queries = embs.filter(col("vec_id") < 20)
    assert(pairsOf(probe.topK(queries, "vec_id", "embedding",
      k = 5, nprobe = 16)).nonEmpty)
  }

  test("estimators see the SURVIVING corpus: calibration pool, autoShortlist, topWidths") {
    val path = java.nio.file.Files.createTempDirectory("ivfpq-estim-").toString
    val built = Similarity.buildIvfPq(embs, "vec_id", "embedding", dim = 64,
      nlist = 16, ivfIters = 3, m = 16, ksub = 32, pqIters = 3)
    built.save(path)
    built.unpersist()
    val total = embs.count()
    val pre = Similarity.loadIvfPq(spark, path)
    // nprobe=16 probes every cell, so worstScan = the full layout and
    // (at this corpus size, between the 200 floor and the heap ceiling)
    // the auto depth IS the scanned row count — directly observable
    assert(pre.autoShortlist(10, 16) == total)

    // tombstone half the corpus: the auto depth must now be the
    // SURVIVOR count, not the raw layout count
    Similarity.deleteFromIndex(spark, path,
      embs.filter(col("vec_id") % 2 === 0).select("vec_id"), "vec_id")
    val idx = Similarity.loadIvfPq(spark, path)
    val nSurv = embs.filter(col("vec_id") % 2 =!= 0).count()
    assert(idx.autoShortlist(10, 16) == nSurv,
      "autoShortlist must size against surviving rows only")

    // tombstone EVERYTHING: the calibration pool anti-join leaves an
    // empty pool, which must hit the documented empty-pool fallback
    // (nlist/4) instead of calibrating against deleted rows — the
    // crisp observable that the pool excludes tombstones (the corpus
    // frame passed in still holds every row)
    Similarity.deleteFromIndex(spark, path, embs.select("vec_id"), "vec_id")
    val gone = Similarity.loadIvfPq(spark, path)
    assert(gone.calibrateNprobe(embs, "vec_id", "embedding",
      targetCellRecall = 1.0) == 4,
      "an all-tombstoned index must calibrate on the EMPTY pool fallback")

    // IVF mirror: topWidths and the calibration pool over `indexed`
    val path2 = java.nio.file.Files.createTempDirectory("ivf-estim-").toString
    val built2 = Similarity.buildIvf(embs, "vec_id", "embedding",
      dim = 64, nlist = 16, iters = 3)
    built2.save(path2)
    built2.unpersist()
    val pre2 = Similarity.loadIvf(spark, path2)
    val w0 = pre2.topWidths(16).sum
    assert(w0 == total)
    Similarity.deleteFromIndex(spark, path2,
      embs.filter(col("vec_id") % 2 === 0).select("vec_id"), "vec_id")
    val idx2 = Similarity.loadIvf(spark, path2)
    assert(idx2.topWidths(16).sum == nSurv,
      "topWidths must count surviving rows only")
    Similarity.deleteFromIndex(spark, path2, embs.select("vec_id"), "vec_id")
    assert(Similarity.loadIvf(spark, path2).calibrateNprobe(1.0) == 4,
      "an all-tombstoned IVF index must calibrate on the EMPTY pool fallback")
  }

  // ADVICE r16 / VERDICT r16 item 3: the layout-id-type memo must be
  // EVICTED when a snapshot at the same path is re-saved — a stale
  // entry would cast delete ids to the OLD type (overflowing casts
  // become null and are silently dropped).
  test("re-saving a snapshot with a different id type evicts the stale type memo") {
    val path = java.nio.file.Files.createTempDirectory("ivf-retype-").toString
    // first life: LONG ids — and a delete so the memo is populated
    val longIds = embs.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding"))
    val b1 = Similarity.buildIvf(longIds, "vec_id", "embedding",
      dim = 64, nlist = 4, iters = 2)
    b1.save(path); b1.unpersist()
    assert(Similarity.deleteFromIndex(spark, path,
      longIds.filter(col("vec_id") === 1).select("vec_id"), "vec_id") == 1L)
    assert(spark.read.parquet(s"$path/tombstones").schema("id").dataType ==
      org.apache.spark.sql.types.LongType)

    // second life: the SAME path re-saved with INT ids
    val intIds = embs.select(col("vec_id").cast("int").as("vec_id"),
      col("embedding"))
    val b2 = Similarity.buildIvf(intIds, "vec_id", "embedding",
      dim = 64, nlist = 4, iters = 2)
    b2.save(path); b2.unpersist()
    assert(Similarity.deleteFromIndex(spark, path,
      intIds.filter(col("vec_id") === 2).select("vec_id"), "vec_id") == 1L)
    // a stale memo would have written LONG tombstones against the INT
    // layout; the eviction makes the delete re-read the fresh type —
    // and the re-save must have cleared the PREVIOUS life's tombstones
    // (left in place they would silently delete the new index's rows)
    assert(spark.read.parquet(s"$path/tombstones").schema("id").dataType ==
      org.apache.spark.sql.types.IntegerType,
      "delete after a re-typed re-save must use the NEW layout id type")
    assert(tombstoneIds(path) == Set(2L),
      "re-save must reset the previous life's tombstones")
  }
}
