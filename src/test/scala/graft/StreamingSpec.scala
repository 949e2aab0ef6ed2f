package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Direction.Min
import graft.operators.SkylineOps._
import graft.sources.EventTime
import graft.streaming.SkylineStreaming

/** Structured-Streaming parity tests (reference batch_job/stream_job
  * shapes): one-shot drain == batch result; incremental micro-batches
  * refine the complete-mode skyline monotonically; the CSV wire format
  * decodes like the reference's Kafka payload. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val dims = Seq("l_extendedprice" -> Min, "l_discount" -> Min)

  test("one-shot streaming skyline equals batch skyline (trigger-once parity)") {
    val dir = "/root/testdata/sf0.001"
    val batchDf = spark.read.parquet(s"$dir/lineitem.parquet")
    val stream = spark.readStream.schema(batchDf.schema)
      .option("pathGlobFilter", "lineitem.parquet").parquet(dir)
    val got = SkylineStreaming.runOnce(
      SkylineStreaming.skylineStream(stream, dims), "stream_once_test")
      .collect().map(_.toSeq).toSet
    val want = batchDf.skyline(dims).collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("flagNearDupsAgainst: streaming drain equals the batch probe; matches verify exactly") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val index = Dedup.buildMinhashIndex(
      d.filter(col("doc_id") % 2 === 0), "doc_id", "text", n = 3)
    try {
      val batch = Dedup.flagNearDupsAgainst(
          index, d.filter(col("doc_id") % 2 === 1), "doc_id", "text", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val stream = spark.readStream.schema(d.schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .filter(col("doc_id") % 2 === 1)
      val streamed = SkylineStreaming.runOnce(
          Dedup.flagNearDupsAgainst(index, stream, "doc_id", "text", 0.5),
          "flag_neardups_test", statePartitions = Some(8))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch && batch.nonEmpty,
        s"stream/batch parity: ${streamed.size} vs ${batch.size}")
      // precision is structural: every flagged pair verifies exactly
      val texts = d.select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      def shingles(t: String): Set[Seq[String]] =
        t.split("\\s+").filter(_.nonEmpty).toSeq.sliding(3).filter(_.size == 3).map(_.toSeq).toSet
      batch.foreach { case (id, ref, j) =>
        val (a, b) = (shingles(texts(id)), shingles(texts(ref)))
        val exact = a.intersect(b).size.toDouble / a.union(b).size
        assert(math.abs(j - exact) < 5e-5 && exact >= 0.5, s"pair ($id,$ref): $j vs $exact")
      }
      // snapshot round-trip: a reloaded index probes identically
      val snap = Files.createTempDirectory("graft-mhidx").toString
      index.save(snap)
      val reloaded = graft.operators.Dedup.loadMinhashIndex(spark, snap)
      try {
        assert((reloaded.n, reloaded.numPerm, reloaded.bands) ==
          (index.n, index.numPerm, index.bands), "params travel with the snapshot")
        val reprobed = Dedup.flagNearDupsAgainst(
            reloaded, d.filter(col("doc_id") % 2 === 1), "doc_id", "text", 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(reprobed == batch)
      } finally reloaded.unpersist()
    } finally index.unpersist()
  }

  test("incremental micro-batches: complete-mode skyline refines to the union") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-stream-in").toFile
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toFile

    // batch 1: CSV lines in the reference's wire format
    Files.write(new java.io.File(inDir, "b1.csv").toPath,
      "5,5\n3,7\n9,9\n".getBytes)
    val raw = spark.readStream.text(inDir.getAbsolutePath)
    val pts = SkylineStreaming.fromCsvPayload(raw, "x1 INT, x2 INT")
    val sky = SkylineStreaming.skylineStream(pts, Seq("x1" -> Min, "x2" -> Min))
    val q = sky.writeStream.format("memory").queryName("stream_inc_test")
      .outputMode("complete")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("stream_inc_test").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(after1 == Set((5, 5), (3, 7)))

      // batch 2 arrives: (4,4) dominates (5,5); (1,9) extends the frontier
      Files.write(new java.io.File(inDir, "b2.csv").toPath,
        "4,4\n1,9\n7,7\n".getBytes)
      q.processAllAvailable()
      val after2 = spark.table("stream_inc_test").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(after2 == Set((4, 4), (3, 7), (1, 9)))
    } finally q.stop()
  }

  test("streaming dedup variant (stream_job parity) yields the same skyline") {
    val dir = "/root/testdata/sf0.001"
    val batchDf = spark.read.parquet(s"$dir/lineitem.parquet")
    val stream = spark.readStream.schema(batchDf.schema)
      .option("pathGlobFilter", "lineitem.parquet").parquet(dir)
    val got = SkylineStreaming.runOnce(
      SkylineStreaming.skylineStream(stream, dims, dedup = true), "stream_dedup_test")
      .collect().map(_.toSeq).toSet
    val want = batchDf.skyline(dims).collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("toJsonPayload/fromJsonSkylinePayload round-trip the wire format") {
    import spark.implicits._
    val pts = Seq((1, 2), (3, 4)).toDF("x1", "x2")
    val payload = SkylineStreaming.toJsonPayload(pts)
    assert(payload.columns.toSeq == Seq("value"))
    val json = payload.collect().map(_.getString(0)).toSet
    assert(json == Set("""{"x1":1,"x2":2}""", """{"x1":3,"x2":4}"""))
  }

  test("array payload round-trip: toJsonSkylineArrayPayload <-> fromJsonSkylinePayload") {
    import spark.implicits._
    val pts = Seq((1, 2), (3, 4), (5, 6)).toDF("x1", "x2")
    val payload = SkylineStreaming.toJsonSkylineArrayPayload(pts)
    val back = SkylineStreaming.fromJsonSkylinePayload(payload, "x1 INT, x2 INT")
      .collect().map(_.toSeq).toSet
    assert(back == Set(Seq(1, 2), Seq(3, 4), Seq(5, 6)))
  }

  test("JSON skyline-relay payload decodes like the reference stage-2 input") {
    import spark.implicits._
    val raw = Seq("""[{"x1":1,"x2":2},{"x1":3,"x2":4}]""").toDF("value")
    val got = SkylineStreaming.fromJsonSkylinePayload(raw, "x1 INT, x2 INT")
      .collect().map(_.toSeq).toSet
    assert(got == Set(Seq(1, 2), Seq(3, 4)))
  }

  test("two-job relay parity: per-key local skylines -> payload transport -> global merge == direct skyline") {
    // The reference's full two-job topology (batch_job.py:96-205): job 1
    // partitions the points, computes per-key LOCAL skylines, and ships
    // each key's frontier as ONE JSON-array payload over the transport;
    // job 2 drains the transport, decodes, and merges globally. The
    // transport here is a directory of payload files standing in for the
    // Kafka topic — the wire format and both decode/encode codecs are
    // exactly the ones the Kafka wrappers use, so this exercises the
    // COMPOSITION end-to-end, not just the codecs.
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")

    // stage 1: spatial partitioning stand-in (any key works — locality
    // only affects local-skyline sizes, not correctness), local
    // frontiers, one array payload per key
    val keyed = li.select(pmod(col("l_orderkey"), lit(8)).as("k"),
      col("l_extendedprice"), col("l_discount"))
    val local = keyed.skylineBy(Seq("k"), dims)
    val payloads = SkylineStreaming.toJsonSkylineArrayPayload(local, keyCols = Seq("k"))
    val transport = Files.createTempDirectory("graft-relay-topic").toFile
    payloads.select("value").write.mode("overwrite").text(transport.getAbsolutePath)

    // stage 2: drain the transport as a stream, decode the relay format,
    // global skyline merge, once-trigger
    val raw = spark.readStream.text(transport.getAbsolutePath)
    val decoded = SkylineStreaming.fromJsonSkylinePayload(
      raw, "l_extendedprice DOUBLE, l_discount DOUBLE")
    val got = SkylineStreaming.runOnce(
      SkylineStreaming.skylineStream(decoded, dims), "relay_parity_test")
      .collect().map(_.toSeq).toSet

    val want = li.skyline(dims).collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("skylineByKeyStream accepts date/boolean/decimal keys (lossless string round-trip)") {
    val inDir = Files.createTempDirectory("graft-keytype-ok-in").toFile
    Files.write(new java.io.File(inDir, "b1.csv").toPath,
      "2026-01-01,true,1.50,5,5\n2026-01-01,true,1.50,3,7\n2026-01-02,false,2.25,1,1\n".getBytes)
    val raw = spark.readStream.text(inDir.getAbsolutePath)
    val pts = SkylineStreaming.fromCsvPayload(raw,
      "d DATE, b BOOLEAN, m DECIMAL(5,2), x1 INT, x2 INT")
    for (key <- Seq("d", "b", "m")) {
      val ckpt = Files.createTempDirectory(s"graft-keytype-ok-$key").toFile
      val q = SkylineStreaming.skylineByKeyStream(pts, key, Seq("x1" -> Min, "x2" -> Min))
        .writeStream.format("memory").queryName(s"keytype_ok_$key")
        .outputMode("update")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .start()
      try {
        q.processAllAvailable()
        val rows = spark.table(s"keytype_ok_$key").collect()
        assert(rows.nonEmpty, s"key=$key")
        // the key column must come back in its ORIGINAL type
        val kt = spark.table(s"keytype_ok_$key").schema(key).dataType
        assert(kt == pts.schema(key).dataType, s"key=$key type $kt")
      } finally q.stop()
    }
  }

  test("mapGroupsWithState per-key skylines refine across micro-batches") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-state-in").toFile
    val ckpt = Files.createTempDirectory("graft-state-ckpt").toFile
    Files.write(new java.io.File(inDir, "b1.csv").toPath,
      "a,5,5\na,3,7\nb,1,1\n".getBytes)
    val raw = spark.readStream.text(inDir.getAbsolutePath)
    val pts = SkylineStreaming.fromCsvPayload(raw, "k STRING, x1 INT, x2 INT")
    val byKey = SkylineStreaming.skylineByKeyStream(pts, "k",
      Seq("x1" -> Min, "x2" -> Min))
    val q = byKey.writeStream.format("memory").queryName("state_sky_test")
      .outputMode("update")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      def current(): Map[String, Set[Seq[Double]]] =
        spark.table("state_sky_test").collect()
          .groupBy(_.getString(0))
          // update mode appends re-emissions; the latest row per key wins
          .map { case (k, rows) =>
            k -> rows.last.getSeq[scala.collection.Seq[Double]](1).map(_.toSeq).toSet
          }
      val s1 = current()
      assert(s1("a") == Set(Seq(5.0, 5.0), Seq(3.0, 7.0)))
      assert(s1("b") == Set(Seq(1.0, 1.0)))

      // batch 2: (4,4) evicts (5,5) from a's STATE; b unchanged
      Files.write(new java.io.File(inDir, "b2.csv").toPath, "a,4,4\n".getBytes)
      q.processAllAvailable()
      val s2 = current()
      assert(s2("a") == Set(Seq(4.0, 4.0), Seq(3.0, 7.0)))
    } finally q.stop()
  }

  test("skylineByKeyStream idle-timeout evicts state: a re-appearing key restarts empty") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-ttl-in").toFile
    val ckpt = Files.createTempDirectory("graft-ttl-ckpt").toFile
    Files.write(new java.io.File(inDir, "b1.csv").toPath, "a,1,1\n".getBytes)
    val raw = spark.readStream.text(inDir.getAbsolutePath)
    val pts = SkylineStreaming.fromCsvPayload(raw, "k STRING, x1 INT, x2 INT")
    val byKey = SkylineStreaming.skylineByKeyStream(pts, "k",
      Seq("x1" -> Min, "x2" -> Min), idleTimeout = Some("1 millisecond"))
    // With ProcessingTimeTimeout every executed batch "requires another
    // batch" (future timeouts may come due), so noNewData is NEVER set
    // and processAllAvailable would hang forever — and the default
    // trigger would busy-spin no-data batches. A paced trigger plus
    // deadline-polling of the sink is the only correct harness here.
    val q = byKey.writeStream.format("memory").queryName("ttl_sky_test")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    def awaitEmitted(want: Set[Seq[Double]]): Boolean = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var seen = false
      while (!seen && System.nanoTime() < deadline) {
        Thread.sleep(100)
        seen = spark.table("ttl_sky_test").collect()
          .filter(_.getString(0) == "a")
          .exists(_.getSeq[scala.collection.Seq[Double]](1).map(_.toSeq).toSet == want)
      }
      seen
    }
    try {
      assert(awaitEmitted(Set(Seq(1.0, 1.0))), "initial skyline must be emitted")
      // OBSERVE the eviction rather than sleeping for it: the timeout
      // branch re-emits (a, [[1,1]]) once, so the sink shows a SECOND
      // 'a' row when the timeout batch has actually run — only then is
      // writing b2 race-free on a loaded machine
      val evDeadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var evicted = false
      while (!evicted && System.nanoTime() < evDeadline) {
        Thread.sleep(100)
        evicted = spark.table("ttl_sky_test").collect().count(_.getString(0) == "a") >= 2
      }
      assert(evicted, "timeout batch must re-emit the evicted key's final skyline")
      // 'a' re-appears with a point its evicted skyline {(1,1)} DOMINATES
      // — with live state (5,5) would never be emitted, so seeing it
      // proves the state restarted empty
      Files.write(new java.io.File(inDir, "b2.csv").toPath, "a,5,5\n".getBytes)
      assert(awaitEmitted(Set(Seq(5.0, 5.0))),
        "dominated point must be re-emitted after state eviction")
    } finally q.stop()
  }

  test("skylineByKeyStream rejects key types that don't round-trip through string") {
    val inDir = Files.createTempDirectory("graft-keytype-in").toFile
    val raw = spark.readStream.text(inDir.getAbsolutePath)
    // double key: "1.0" and "1.00" would collapse / shift through the cast
    val pts = SkylineStreaming.fromCsvPayload(raw, "k DOUBLE, x1 INT, x2 INT")
    val ex = intercept[IllegalArgumentException] {
      SkylineStreaming.skylineByKeyStream(pts, "k", Seq("x1" -> Min, "x2" -> Min))
    }
    assert(ex.getMessage.contains("round-trip"))
  }

  test("event-time window + watermark: late data beyond the watermark is dropped") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-wm-in").toFile
    Files.write(new java.io.File(inDir, "b1.csv").toPath,
      "2026-01-01 10:01:00,a\n2026-01-01 10:03:00,a\n2026-01-01 10:58:00,b\n".getBytes)
    val raw = spark.readStream.text(inDir.getAbsolutePath)
    val events = SkylineStreaming.fromCsvPayload(raw, "ts STRING, k STRING")
      .select(col("ts").cast("timestamp").as("ts"), col("k"))
    val agg = graft.streaming.EventStreams.windowedAgg(
        events, "ts", watermarkDelay = "10 minutes", windowDuration = "5 minutes",
        keyCols = Seq("k"), aggs = Seq(count(lit(1)).as("n")))
      .select(col("window.start").cast("string").as("ws"), col("k"), col("n"))
    val ckpt = Files.createTempDirectory("graft-wm-ckpt").toFile
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      // batch 2: one on-time event and one far-late event (before the
      // 10:48 watermark) that must be dropped
      Files.write(new java.io.File(inDir, "b2.csv").toPath,
        "2026-01-01 10:59:00,b\n2026-01-01 10:02:00,a\n".getBytes)
      q.processAllAvailable()
      // batch 3 advances the watermark past the 10:55-11:00 window so it emits
      Files.write(new java.io.File(inDir, "b3.csv").toPath,
        "2026-01-01 11:30:00,c\n".getBytes)
      q.processAllAvailable()
      val rows = spark.table("wm_test").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // the 10:00-10:05 'a' window closed with ONLY the two on-time events
      // (the late 10:02 arrival was dropped by the watermark), and the
      // 10:55-11:00 'b' window saw both b events
      assert(rows.contains(("2026-01-01 10:00:00", "a", 2L)), s"got $rows")
      assert(rows.contains(("2026-01-01 10:55:00", "b", 2L)), s"got $rows")
    } finally q.stop()
  }

  test("windowedAgg complete-mode drain equals the batch window rollup") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventTime.withTsUtc(spark.read.parquet(s"$dir/events.parquet"))
    val stream = EventTime.withTsUtc(spark.readStream.schema(
        spark.read.parquet(s"$dir/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir))
    val agg = graft.streaming.EventStreams.windowedAgg(
      stream, "ts_utc", watermarkDelay = "1 hour", windowDuration = "1 hour",
      keyCols = Seq("event_type"), aggs = Seq(count(lit(1)).as("n")))
    val got = SkylineStreaming.runOnce(agg, "stream_window_parity")
      .select(col("window.start").cast("string"), col("event_type"), col("n"))
      .collect().map(_.toSeq).toSet
    val want = batch
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string"), col("event_type"), col("n"))
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("dedupStream: bounded-state dedup drops re-arrivals within the watermark, readmits after eviction") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-dds-in").toFile
    val ckpt = Files.createTempDirectory("graft-dds-ckpt").toFile
    Files.write(new java.io.File(inDir, "b1.csv").toPath,
      "2026-01-01 10:00:00,k1\n2026-01-01 10:00:30,k1\n2026-01-01 10:01:00,k2\n".getBytes)
    val raw = spark.readStream.text(inDir.getAbsolutePath)
    val events = SkylineStreaming.fromCsvPayload(raw, "ts STRING, k STRING")
      .select(col("ts").cast("timestamp").as("ts"), col("k"))
    val dd = graft.streaming.EventStreams.dedupStream(
      events, keyCols = Seq("k"), tsCol = "ts", watermarkDelay = "1 minute")
    val q = dd.select(col("k")).writeStream.format("memory")
      .queryName("dds_test").outputMode("append")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      def counts() = spark.table("dds_test").groupBy("k").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // in-batch duplicate collapsed
      assert(counts() == Map("k1" -> 1L, "k2" -> 1L))
      // k1 re-arrives while its state is alive -> dropped; k3 advances
      // the watermark far past k1's horizon, evicting its state
      Files.write(new java.io.File(inDir, "b2.csv").toPath,
        "2026-01-01 10:01:30,k1\n2026-01-01 10:30:00,k3\n".getBytes)
      q.processAllAvailable()
      assert(counts() == Map("k1" -> 1L, "k2" -> 1L, "k3" -> 1L))
      // after eviction the key is readmitted — exactly-once per key per
      // watermark horizon, not per stream lifetime
      Files.write(new java.io.File(inDir, "b3.csv").toPath,
        "2026-01-01 10:31:00,k1\n".getBytes)
      q.processAllAvailable()
      assert(counts() == Map("k1" -> 2L, "k2" -> 1L, "k3" -> 1L))
    } finally q.stop()
  }

  test("sessionizeStream merges sessions across micro-batches, splits at the gap") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-sess-in").toFile
    val ckpt = Files.createTempDirectory("graft-sess-ckpt").toFile
    // batch 1: u1 has two events 10 min apart (one session)
    Files.write(new java.io.File(inDir, "b1.csv").toPath,
      "2026-01-01 10:00:00,u1\n2026-01-01 10:10:00,u1\n".getBytes)
    val raw = spark.readStream.text(inDir.getAbsolutePath)
    val events = SkylineStreaming.fromCsvPayload(raw, "ts STRING, u STRING")
      .select(col("ts").cast("timestamp").as("ts"), col("u"))
    val sess = graft.streaming.EventStreams.sessionizeStream(
        events, "ts", watermarkDelay = "2 hours", gap = "30 minutes",
        keyCols = Seq("u"), aggs = Seq(count(lit(1)).as("n")))
      .select(col("u"), col("session.start").cast("string").as("st"), col("n"))
    val q = sess.writeStream.format("memory").queryName("sess_test")
      .outputMode("complete")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      def current() = spark.table("sess_test").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(current() == Set(("u1", "2026-01-01 10:00:00", 2L)))
      // batch 2: an event 20 min after u1's last EXTENDS the open session
      // (cross-batch merge through state); one 30+ min later starts a new
      // session; a second user sessionizes independently
      Files.write(new java.io.File(inDir, "b2.csv").toPath,
        "2026-01-01 10:30:00,u1\n2026-01-01 11:30:00,u1\n2026-01-01 10:05:00,u2\n".getBytes)
      q.processAllAvailable()
      assert(current() == Set(
        ("u1", "2026-01-01 10:00:00", 3L),
        ("u1", "2026-01-01 11:30:00", 1L),
        ("u2", "2026-01-01 10:05:00", 1L)))
    } finally q.stop()
  }

  test("sessionizeStream gap boundary: exactly-gap spacing starts a new session") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-sessb-in").toFile
    Files.write(new java.io.File(inDir, "b1.csv").toPath,
      "2026-01-01 10:00:00,u1\n2026-01-01 10:30:00,u1\n2026-01-01 10:59:59,u1\n".getBytes)
    val raw = spark.readStream.text(inDir.getAbsolutePath)
    val events = SkylineStreaming.fromCsvPayload(raw, "ts STRING, u STRING")
      .select(col("ts").cast("timestamp").as("ts"), col("u"))
    val sess = graft.streaming.EventStreams.sessionizeStream(
        events, "ts", watermarkDelay = "2 hours", gap = "30 minutes",
        keyCols = Seq("u"), aggs = Seq(count(lit(1)).as("n")))
      .select(col("session.start").cast("string").as("st"), col("n"))
    val got = SkylineStreaming.runOnce(sess, "sess_boundary_test")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // 10:30 is exactly gap after 10:00 and MERGES: Spark joins adjacent
    // [t, t+gap) windows, so a new session needs diff STRICTLY > gap —
    // the same boundary as the batch lag formulation (q_sessionize)
    assert(got == Set(("2026-01-01 10:00:00", 3L)))
  }

  test("windowedAgg sliding windows place each event in window/slide buckets") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-slide-in").toFile
    Files.write(new java.io.File(inDir, "b1.csv").toPath,
      "2026-01-01 10:07:00,a\n".getBytes)
    val raw = spark.readStream.text(inDir.getAbsolutePath)
    val events = SkylineStreaming.fromCsvPayload(raw, "ts STRING, k STRING")
      .select(col("ts").cast("timestamp").as("ts"), col("k"))
    val agg = graft.streaming.EventStreams.windowedAgg(
        events, "ts", watermarkDelay = "10 minutes", windowDuration = "10 minutes",
        slideDuration = Some("5 minutes"), keyCols = Seq("k"),
        aggs = Seq(count(lit(1)).as("n")))
      .select(col("window.start").cast("string").as("ws"), col("k"), col("n"))
    val got = SkylineStreaming.runOnce(agg, "stream_slide_test")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // a 10:07 event lands in the two sliding windows covering it
    assert(got == Set(
      ("2026-01-01 10:00:00", "a", 1L),
      ("2026-01-01 10:05:00", "a", 1L)))
  }

  test("parquet file sink: append-mode windowed agg lands closed windows as files") {
    import java.nio.file.Files
    val inDir = Files.createTempDirectory("graft-fsink-in").toFile
    val outDir = Files.createTempDirectory("graft-fsink-out").toFile
    val ckpt = Files.createTempDirectory("graft-fsink-ckpt").toFile
    Files.write(new java.io.File(inDir, "b1.csv").toPath,
      "2026-01-01 10:01:00,a\n2026-01-01 10:02:00,a\n2026-01-01 10:12:00,b\n".getBytes)
    val raw = spark.readStream.text(inDir.getAbsolutePath)
    val events = SkylineStreaming.fromCsvPayload(raw, "ts STRING, k STRING")
      .select(col("ts").cast("timestamp").as("ts"), col("k"))
    val agg = graft.streaming.EventStreams.windowedAgg(
        events, "ts", watermarkDelay = "5 minutes", windowDuration = "5 minutes",
        keyCols = Seq("k"), aggs = Seq(count(lit(1)).as("n")))
      .select(col("window.start").cast("string").as("ws"), col("k"), col("n"))
    // the real production sink: append-only parquet files + checkpoint
    // (exactly-once via the sink's commit log), not a memory table
    val q = agg.writeStream.format("parquet")
      .option("path", outDir.getAbsolutePath)
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // advance the watermark past both earlier windows so they emit
      Files.write(new java.io.File(inDir, "b2.csv").toPath,
        "2026-01-01 10:30:00,c\n".getBytes)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(outDir.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(
      ("2026-01-01 10:00:00", "a", 2L),
      ("2026-01-01 10:10:00", "b", 1L)), s"got $rows")
  }

  test("intervalJoin: bounded stream-stream drain equals the batch interval join") {
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    def src = EventTime.withTsUtc(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir))
    def shape(ev: org.apache.spark.sql.DataFrame) = (
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_utc").as("p_ts")),
      ev.filter(col("event_type").isin("view", "click"))
        .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
          col("ts_utc").as("v_ts")))

    val (sp, sv) = shape(src)
    val joined = graft.streaming.EventStreams.intervalJoin(
      sp, sv, "p_ts", "v_ts", leftDelay = "1 hour", rightDelay = "1 hour",
      keyPairs = Seq(("user_id", "v_user")),
      lookBehind = "1 hour", lookAhead = "0 seconds")
    val got = SkylineStreaming.runOnce(joined, "ssj_parity", outputMode = "append")
      .select("purchase_id", "view_id").collect().map(_.toSeq).toSet

    val ev = EventTime.withTsUtc(spark.read.parquet(s"$dir/events.parquet"))
    val (bp, bv) = shape(ev)
    val want = bp.join(bv, bp("user_id") === bv("v_user")
        && bv("v_ts") >= bp("p_ts") - expr("INTERVAL 1 hour")
        && bv("v_ts") <= bp("p_ts"))
      .select("purchase_id", "view_id").collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("bloomAntiJoin stream-static: bounded drain equals the batch anti join") {
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val blocked = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_custkey").as("blocked_id"))
    val clean = graft.operators.PipelineOps.bloomAntiJoin(
      stream, blocked, "user_id", "blocked_id")
    val got = SkylineStreaming.runOnce(clean, "blk_parity", outputMode = "append")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val want = ev.join(blocked, ev("user_id") === blocked("blocked_id"), "left_anti")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty, "drain == batch anti join")
    assert(got.size < ev.count(), "the blocklist actually removed events")
  }

  test("intervalJoin left_outer: null-padded rows emit only after the watermark closes the window") {
    import java.nio.file.Files
    val lDir = Files.createTempDirectory("graft-ssjl-l").toFile
    val rDir = Files.createTempDirectory("graft-ssjl-r").toFile
    val ckpt = Files.createTempDirectory("graft-ssjl-ckpt").toFile
    def decode(dir: java.io.File, ts: String, k: String, id: String) =
      SkylineStreaming.fromCsvPayload(
          spark.readStream.text(dir.getAbsolutePath), "ts STRING, k STRING, id STRING")
        .select(col("ts").cast("timestamp").as(ts), col("k").as(k), col("id").as(id))
    // batch 1: L1 has a match (R1 within +-5 min), L2 does not
    Files.write(new java.io.File(lDir, "b1.csv").toPath,
      "2026-01-01 10:00:00,a,L1\n2026-01-01 10:05:00,b,L2\n".getBytes)
    Files.write(new java.io.File(rDir, "b1.csv").toPath,
      "2026-01-01 10:01:00,a,R1\n".getBytes)
    val joined = graft.streaming.EventStreams.intervalJoin(
      decode(lDir, "lts", "lk", "lid"), decode(rDir, "rts", "rk", "rid"),
      "lts", "rts", leftDelay = "10 minutes", rightDelay = "10 minutes",
      keyPairs = Seq(("lk", "rk")),
      lookBehind = "5 minutes", lookAhead = "5 minutes", joinType = "left_outer")
    val q = joined.select(col("lid"), col("rid"))
      .writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      val early = spark.table("ssj_outer").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
      assert(early == Set(("L1", Some("R1"))),
        s"inner match emits eagerly, unmatched L2 must WAIT for the watermark; got $early")
      // advance BOTH watermarks (the join uses the min) past L2's window
      Files.write(new java.io.File(lDir, "b2.csv").toPath,
        "2026-01-01 12:00:00,z,L9\n".getBytes)
      Files.write(new java.io.File(rDir, "b2.csv").toPath,
        "2026-01-01 12:00:00,z,R9\n".getBytes)
      q.processAllAvailable()
      val late = spark.table("ssj_outer").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
      assert(late.contains(("L2", None)),
        s"watermark passed L2's window — its null-padded row must emit; got $late")
    } finally q.stop()
  }

  test("intervalJoin rejects keyless, overlapping-name, and unsupported-type joins") {
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    def src = EventTime.withTsUtc(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir))
    val l = src.select(col("event_id").as("lid"), col("user_id").as("lu"),
      col("ts_utc").as("lts"))
    val r = src.select(col("event_id").as("rid"), col("user_id").as("ru"),
      col("ts_utc").as("rts"))
    intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.intervalJoin(l, r, "lts", "rts",
        "1 hour", "1 hour", Nil, "1 hour", "0 seconds")
    }
    intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.intervalJoin(l,
        src.select(col("event_id").as("lid"), col("user_id").as("ru"),
          col("ts_utc").as("rts")),
        "lts", "rts", "1 hour", "1 hour", Seq(("lu", "ru")), "1 hour", "0 seconds")
    }
    intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.intervalJoin(l, r, "lts", "rts",
        "1 hour", "1 hour", Seq(("lu", "ru")), "1 hour", "0 seconds",
        joinType = "full_outer")
    }
  }

  // Round 17 (guide §2.6): a batch side materialized WHILE the drain
  // runs must change neither the drained rows nor the side's rows, and
  // the drain must keep its pinned state width (the stream clones the
  // session conf at start(), so the restore-before-side cannot leak
  // into the running query).
  test("runOnceOverlapping: drained rows and side rows equal the sequential shape") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    def agg = {
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      stream.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }
    def side = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val seqDrained = graft.streaming.SkylineStreaming
      .runOnce(agg, "ovl_seq_mem", statePartitions = Some(4))
      .collect().map(_.toSeq).toSet
    val seqSide = side.collect().map(_.toSeq).toSet
    val (d, sd) = graft.streaming.SkylineStreaming
      .runOnceOverlapping(agg, "ovl_par_mem", statePartitions = Some(4))(side)
    assert(d.collect().map(_.toSeq).toSet == seqDrained)
    assert(sd.collect().map(_.toSeq).toSet == seqSide)
  }

}
