package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{dot, l2Norm}

/**
 * Vector-similarity search over an embedding column (`array<float>`):
 * exact brute-force cosine top-k / threshold pairs as the baseline, and
 * LSH (random hyperplanes) + IVF (inverted-file, kmeans-bucketed)
 * variants as the 100 TB scale path. The per-pair hot loop is the
 * codegen'd [[graft.functions.DotProduct]] expression over
 * `array<double>` (Spark's higher-order functions evaluate lambdas
 * interpreted — ~30x slower here); per-vector norms are computed once
 * per side BEFORE the join, never per pair.
 */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double.
    * Convenience form; the pairwise operators below precompute the norms
    * per side instead of evaluating them per pair. */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (l2Norm(ad) * l2Norm(bd))
  }

  /** Project (id, v: array<double>, n: L2 norm) — norms computed once per
    * row, before any join replicates the vectors. */
  private def prepped(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vAs: String, nAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).cast("array<double>").as(vAs))
      .withColumn(nAs, l2Norm(col(vAs)))

  /**
   * Exact top-k cosine neighbors for each query vector: broadcast the
   * (small) query side against the full corpus, rank per query.
   * Deterministic tie-break on neighbor id.
   */
  def topK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = prepped(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val q = prepped(queries, idCol, vecCol, "query_id", "qv", "qn")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cos"), 4).as("cos"))
  }

  /** Exact all-pairs with cosine >= threshold (brute-force block join —
    * the small-corpus baseline; use [[lshPairs]] at scale). */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = prepped(df, idCol, vecCol, "id1", "v1", "n1")
    val b = prepped(df, idCol, vecCol, "id2", "v2", "n2")
    a.crossJoin(b).filter(col("id1") < col("id2"))
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
  }

  /** Deterministic pseudo-random unit hyperplanes (seeded). */
  private def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  private def signature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, k) =>
      when(dot(vec, lit(p)) >= 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }.reduce(_ + _)

  /**
   * Random-hyperplane LSH near-neighbor pairs (Charikar, STOC'02):
   * `tables` independent `bits`-bit sign signatures; pairs colliding in
   * any table are candidates, verified with exact cosine. Probabilistic
   * recall (P[bit match] = 1 - angle/pi), exact precision. The bucket
   * join replaces the O(n^2) block join at scale.
   */
  def lshPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      dim: Int, tables: Int = 8, bits: Int = 8, seed: Long = 42L): DataFrame = {
    val hp = hyperplanes(tables, bits, dim, seed)
    val vd = col(vecCol).cast("array<double>")
    val sigs = df.select(col(idCol).as("id"), posexplode(
      array(hp.map(planes => signature(vd, planes)): _*)).as(Seq("table", "sig")))
    val cands = sigs.as("a").join(sigs.as("b"), Seq("table", "sig"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
    val v1 = prepped(df, idCol, vecCol, "id1", "v1", "n1")
    val v2 = prepped(df, idCol, vecCol, "id2", "v2", "n2")
    // no wide distinct on raw candidates: the verify joins broadcast and
    // the codegen'd dot is cheap, so dedup happens on the tiny qualifying
    // set after the threshold filter instead
    cands.join(v1, "id1").join(v2, "id2")
      .withColumn("cos", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
      .distinct()
  }

  /**
   * IVF (inverted-file) approximate top-k: kmeans-lite centroids
   * (deterministic seeded init on the lowest-id vectors, a few Lloyd
   * iterations as DataFrame jobs), then each query probes only the
   * `nprobe` nearest centroid cells. The standard
   * billion-scale ANN layout: the corpus is partitioned by centroid id,
   * so a query touches nprobe/nlist of the data.
   */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, nlist: Int = 16, nprobe: Int = 4, iters: Int = 3): DataFrame = {
    // Lloyd iterations re-scan the corpus; cache the projected vectors for
    // the duration of training (the canonical iterative-ML pattern — at
    // cluster scale this is a MEMORY_AND_DISK persist of the same shape).
    val data = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .cache()

    // ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2 with the codegen'd dot; the
    // ||v||^2 term is constant per row and irrelevant to the argmin but
    // kept so probe distances stay true distances.
    def dist2(vec: Column, c: Array[Double]): Column = {
      val c2 = c.map(x => x * x).sum
      graft.functions.VectorFunctions.squaredNorm(vec) - lit(2.0) * dot(vec, lit(c)) + lit(c2)
    }

    // argmin via array_min over (dist, idx) structs — struct ordering is
    // lexicographic so ties break on the lower index. A when/otherwise
    // reduce would duplicate subtrees exponentially (2^nlist plan blowup).
    def assignExpr(vec: Column, cents: Array[Array[Double]]): Column =
      array_min(array(cents.zipWithIndex.map { case (c, i) =>
        struct(dist2(vec, c).as("d"), lit(i).as("i"))
      }: _*)).getField("i")

    // deterministic init: the nlist lowest-id vectors. A corpus smaller
    // than nlist yields fewer centroids — every loop below runs over
    // centroids.length, never the requested nlist.
    var centroids: Array[Array[Double]] = data.orderBy("id").limit(nlist)
      .collect().map(_.getSeq[Double](1).toArray)
    require(centroids.nonEmpty, "ivfTopK: empty corpus")

    for (_ <- 1 to iters) {
      val assigned = data.withColumn("c", assignExpr(col("v"), centroids))
      val means = assigned
        .select(col("c"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("c", "pos").agg(avg(col("x").cast("double")).as("m"))
        .groupBy("c").agg(map_from_arrays(
          collect_list(col("pos")), collect_list(col("m"))).as("mm"))
        .collect()
      val updated = centroids.clone()
      means.foreach { row =>
        val c = row.getInt(0)
        val mm = row.getMap[Int, Double](1)
        updated(c) = Array.tabulate(dim)(i => mm.getOrElse(i, 0.0))
      }
      centroids = updated
    }

    // Training is over (the collect loops above materialized the cache);
    // release it so repeated calls in a long-lived session don't pin
    // blocks. The final probe job below recomputes `data` from source —
    // one extra scan, no leak.
    data.unpersist(blocking = false)

    val indexed = data.withColumn("c", assignExpr(col("v"), centroids))
    // nprobe nearest cells per query (by centroid distance)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val probed = q.withColumn("c", explode(array(
      centroids.indices.map(i => struct(dist2(col("qv"), centroids(i)).as("d"), lit(i).as("i"))): _*)))
      .withColumn("pr", row_number().over(
        Window.partitionBy("query_id").orderBy(col("c.d").asc, col("c.i").asc)))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qv"), l2Norm(col("qv")).as("qn"), col("c.i").as("c"))
    // norms once per side before the probe join replicates rows
    val indexedN = indexed.withColumn("vn", l2Norm(col("v")))
    probed.join(indexedN, "c")
      .filter(col("query_id") =!= col("id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("vn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }
}
