package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Vector-similarity search over an embedding column (`array<float>`):
 * exact brute-force cosine top-k / threshold pairs as the baseline, and
 * LSH (random hyperplanes) + IVF (inverted-file, kmeans-bucketed)
 * variants as the 100 TB scale path. Dot products are native
 * `zip_with`/`aggregate` expressions in double precision — codegen'd,
 * no UDFs.
 */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

  /**
   * Exact top-k cosine neighbors for each query vector: broadcast the
   * (small) query side against the full corpus, rank per query.
   * Deterministic tie-break on neighbor id.
   */
  def topK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("cos"), 4).as("cos"))
  }

  /** Exact all-pairs with cosine >= threshold (brute-force block join —
    * the small-corpus baseline; use [[lshPairs]] at scale). */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val b = df.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    a.crossJoin(b).filter(col("id1") < col("id2"))
      .withColumn("cos", cosine(col("v1"), col("v2")))
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
      val dot = aggregate(
        zip_with(vec, lit(p), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
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
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("v"), posexplode(
      array(hp.map(planes => signature(col(vecCol), planes)): _*)).as(Seq("table", "sig")))
    val cands = sigs.as("a").join(sigs.as("b"), Seq("table", "sig"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    val v1 = df.select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val v2 = df.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    cands.join(v1, "id1").join(v2, "id2")
      .withColumn("cos", cosine(col("v1"), col("v2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
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
    val data = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))

    def dist2(vec: Column, c: Array[Double]): Column =
      aggregate(zip_with(vec, lit(c), (x, w) => (x.cast("double") - w) * (x.cast("double") - w)),
        lit(0.0), (acc, v) => acc + v)

    // argmin via array_min over (dist, idx) structs — struct ordering is
    // lexicographic so ties break on the lower index. A when/otherwise
    // reduce would duplicate subtrees exponentially (2^nlist plan blowup).
    def assignExpr(vec: Column, cents: Array[Array[Double]]): Column =
      array_min(array(cents.zipWithIndex.map { case (c, i) =>
        struct(dist2(vec, c).as("d"), lit(i).as("i"))
      }: _*)).getField("i")

    // deterministic init: the nlist lowest-id vectors
    var centroids: Array[Array[Double]] = data.orderBy("id").limit(nlist)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)

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

    val indexed = data.withColumn("c", assignExpr(col("v"), centroids))
    // nprobe nearest cells per query (by centroid distance)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probed = q.withColumn("c", explode(array(
      (0 until nlist).map(i => struct(dist2(col("qv"), centroids(i)).as("d"), lit(i).as("i"))): _*)))
      .withColumn("pr", row_number().over(
        Window.partitionBy("query_id").orderBy(col("c.d").asc, col("c.i").asc)))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("c.i").as("c"))
    probed.join(indexed, "c")
      .filter(col("query_id") =!= col("id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }
}
