package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pin the driver contract: entry() smoke (t1), every query runs at
  * sf0.001, and every oracle key refers to an existing query. */
class DriverContractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("entry() returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle entries without queries: $dangling")
  }

  test("families: covers queries exactly; family group maps are disjoint") {
    assert(SparkEntry.families.keySet == SparkEntry.queries.keySet,
      "families must label every query and nothing else")
    // ++ of the group maps would silently drop a name duplicated across
    // groups — the concatenated size must equal the sum of group sizes
    assert(SparkEntry.familyGroupSizes.sum == SparkEntry.queries.size,
      "a query name is duplicated across family groups")
    // every stream_-prefixed query reports the stream family regardless
    // of which group map it lives in
    val misfiled = SparkEntry.families.filter { case (n, f) =>
      n.startsWith("stream_") && f != "stream" }
    assert(misfiled.isEmpty, s"stream_ queries not labeled stream: $misfiled")
    val counts = SparkEntry.families.groupBy(_._2).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("sky", "relational", "text", "dedup", "ann",
      "pipeline", "stream", "multimodal", "scoring"))
  }

  test("every opOnly / compositeDerived key has a matching queries entry") {
    val danglingOp = SparkEntry.opOnly.keySet -- SparkEntry.queries.keySet
    assert(danglingOp.isEmpty, s"opOnly entries without queries: $danglingOp")
    val danglingDerived = SparkEntry.compositeDerived -- SparkEntry.queries.keySet
    assert(danglingDerived.isEmpty,
      s"compositeDerived entries without queries: $danglingDerived")
  }

  test("opOnly thunks run at sf0.001 and return the operator's shape") {
    val failures = SparkEntry.opOnly.flatMap { case (name, mk) =>
      try { mk(spark, "/root/testdata/sf0.001")().count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.toString.take(150)}") }
      finally spark.catalog.clearCache()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("all queries execute at sf0.001 (schema + plan sanity, count >= 0)") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.toString.take(150)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("testdata schema drift: every table reads with the expected columns and types") {
    // The driver regenerated /root/testdata once already (round 5:
    // events.ts flipped TIMESTAMP(NANOS)-as-long -> timestamp[us]) and
    // silently broke 8 queries at analysis time. This guard makes the
    // NEXT regeneration fail ONE named test with a readable diff instead.
    // Time columns accept the known encoding variants, which
    // graft.sources.EventTime absorbs; everything else must match exactly.
    import org.apache.spark.sql.types._
    val ts: Set[DataType] = Set(LongType, TimestampType, TimestampNTZType)
    // Only events.ts has a normalization choke point (graft.sources.EventTime)
    // that absorbs a long<->timestamp encoding flip; o_orderdate/l_shipdate
    // are consumed as timestamps directly, so a regeneration to int64 must
    // FAIL here rather than pass the guard and break queries downstream.
    val tsStrict: Set[DataType] = Set(TimestampType, TimestampNTZType)
    def exact(t: DataType): Set[DataType] = Set(t)
    val expected: Map[String, Seq[(String, Set[DataType])]] = Map(
      "region" -> Seq("r_regionkey" -> exact(IntegerType), "r_name" -> exact(StringType)),
      "nation" -> Seq("n_nationkey" -> exact(IntegerType), "n_name" -> exact(StringType),
        "n_regionkey" -> exact(IntegerType)),
      "customer" -> Seq("c_custkey" -> exact(LongType), "c_name" -> exact(StringType),
        "c_nationkey" -> exact(IntegerType), "c_acctbal" -> exact(DoubleType),
        "c_mktsegment" -> exact(StringType)),
      "supplier" -> Seq("s_suppkey" -> exact(LongType), "s_name" -> exact(StringType),
        "s_nationkey" -> exact(IntegerType), "s_acctbal" -> exact(DoubleType)),
      "part" -> Seq("p_partkey" -> exact(LongType), "p_name" -> exact(StringType),
        "p_brand" -> exact(StringType), "p_type" -> exact(StringType),
        "p_size" -> exact(IntegerType), "p_retailprice" -> exact(DoubleType)),
      "orders" -> Seq("o_orderkey" -> exact(LongType), "o_custkey" -> exact(LongType),
        "o_orderstatus" -> exact(StringType), "o_totalprice" -> exact(DoubleType),
        "o_orderdate" -> tsStrict, "o_orderpriority" -> exact(StringType)),
      "lineitem" -> Seq("l_orderkey" -> exact(LongType), "l_partkey" -> exact(LongType),
        "l_suppkey" -> exact(LongType), "l_linenumber" -> exact(IntegerType),
        "l_quantity" -> exact(DoubleType), "l_extendedprice" -> exact(DoubleType),
        "l_discount" -> exact(DoubleType), "l_tax" -> exact(DoubleType),
        "l_returnflag" -> exact(StringType), "l_linestatus" -> exact(StringType),
        "l_shipdate" -> tsStrict),
      "events" -> Seq("event_id" -> exact(LongType), "ts" -> ts,
        "user_id" -> exact(LongType), "event_type" -> exact(StringType),
        "value" -> exact(DoubleType), "props" -> exact(StringType)),
      "documents" -> Seq("doc_id" -> exact(LongType), "text" -> exact(StringType),
        "lang" -> exact(StringType), "source" -> exact(StringType),
        "n_chars" -> exact(LongType)),
      "embeddings" -> Seq("vec_id" -> exact(LongType),
        "embedding" -> Set[DataType](ArrayType(FloatType), ArrayType(FloatType, true),
          ArrayType(FloatType, false)),
        "label" -> exact(IntegerType)))
    val drift = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val got = spark.read.parquet(s"/root/testdata/sf0.001/$table.parquet")
        .schema.fields.map(f => f.name -> f.dataType).toSeq
      if (got.map(_._1) != cols.map(_._1))
        Seq(s"$table: columns ${got.map(_._1).mkString(",")} != expected ${cols.map(_._1).mkString(",")}")
      else got.zip(cols).collect {
        case ((n, t), (_, allowed)) if !allowed.contains(t) =>
          s"$table.$n: read as $t, expected one of ${allowed.mkString("/")}"
      }
    }
    assert(drift.isEmpty,
      "testdata schema drifted — update EventTime/the affected queries AND " +
        "their DuckDB oracles in lockstep:\n" + drift.mkString("\n"))
  }

  test("testdata drift: documents.text is pure ASCII (mm_features oracle assumption)") {
    import org.apache.spark.sql.functions._
    // The mm_features DuckDB oracle equates characters with bytes
    // (string_split + ascii(c) % 8, n = octet_length) — valid ONLY while
    // documents.text is pure ASCII (char count == byte count, code point
    // == byte). A testdata regeneration introducing non-ASCII text would
    // silently diverge; fail loudly here instead.
    val nonAscii = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(length(col("text")) =!= octet_length(col("text")) ||
        col("text").rlike("[^\\x00-\\x7F]"))
      .count()
    assert(nonAscii == 0,
      s"$nonAscii documents contain non-ASCII text — the mm_features oracle " +
        "(bytes==chars) and byte_entropy DuckDB fold must be rewritten over " +
        "encode(text) bytes before trusting hash compares")
  }

  test("probabilistic-operator gate queries: every gate boolean is earned (true)") {
    // These 8 queries emit deterministic (count, boolean-gate) rows whose
    // DuckDB oracles expect constant `true` — assert here that the Spark
    // side actually earns them at sf0.001, so a recall regression fails
    // this suite before it ever reaches the driver's hash compare.
    val gated = Seq("dedup_minhash", "dedup_simhash", "dedup_semantic",
      "dedup_cross", "sim_pairs_lsh", "q_ingest_admit", "ann_ivf", "ann_topk_q8",
      "q_sketch_distinct", "stream_sketch_users", "q_pca_embed",
      "q_whiten_embed", "stream_dedup_ingest", "stream_heavy_hitters")
    val failures = gated.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val boolCols = df.schema.fields.collect {
        case f if f.dataType == org.apache.spark.sql.types.BooleanType => f.name
      }
      assert(boolCols.nonEmpty, s"$name: gate query has no boolean gate columns")
      df.collect().toSeq.flatMap(r => boolCols.toSeq.collect {
        case c if !r.getAs[Boolean](c) => s"$name.$c is false (row $r)"
      })
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("q_sketch_distinct: HLL estimates stay inside the rsd bound of exact") {
    import org.apache.spark.sql.functions._
    // the sketch query has no SQL oracle (HLL registers are
    // engine-specific); this 3-sigma tolerance gate vs the exact
    // distinct count is its correctness contract (default rsd = 0.05)
    val rows = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("approx").toDouble
      val e = r.getAs[Long]("exact").toDouble
      assert(math.abs(a - e) / e <= 0.15,
        s"${r.get(0)}: approx $a vs exact $e exceeds 3*rsd")
    }
  }
}
