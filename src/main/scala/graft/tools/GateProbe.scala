package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Scratch probe: measure approximate-operator recall vs exact
  * counterparts at small SFs to ground the CORRECTNESS gate thresholds.
  * Not part of the driver contract. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      println(s"== $sf docs=${docs.count()} emb=${emb.count()} ==")

      def pairSet(df: DataFrame): Set[(Long, Long)] =
        df.select(col("id1").cast("long"), col("id2").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // minhash vs exact jaccard
      val exactJ = pairSet(Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5))
      val mh = pairSet(Dedup.minhashPairs(docs, "doc_id", "text", n = 3, threshold = 0.5))
      println(s"minhash: exact=${exactJ.size} mh=${mh.size} subset=${mh.subsetOf(exactJ)} " +
        s"recall=${if (exactJ.isEmpty) 1.0 else mh.intersect(exactJ).size.toDouble / exactJ.size}")

      // cross-corpus: exact side = full-corpus exact pairs with mixed
      // parity, normalized to unordered
      val exCross = exactJ.filter { case (a, b) => (a % 2) != (b % 2) }
      val mhCross = pairSet(Dedup.minhashPairsAgainst(
        docs.filter(col("doc_id") % 2 === 1), docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", n = 3, threshold = 0.5))
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      println(s"cross: exact=${exCross.size} mh=${mhCross.size} subset=${mhCross.subsetOf(exCross)} " +
        s"recall=${if (exCross.isEmpty) 1.0 else mhCross.intersect(exCross).size.toDouble / exCross.size}")

      // simhash banded vs brute-force hamming over signatures
      val sig = Dedup.simhash(docs, "doc_id", "text").cache()
      val brute = pairSet(sig.as("a").join(sig.as("b"),
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2"),
          bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("h"))
        .filter(col("h") <= 3))
      val banded = pairSet(Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3))
      println(s"simhash: brute=${brute.size} banded=${banded.size} equal=${banded == brute}")
      sig.unpersist()

      // lsh vs exact cosine pairs (threshold 0.3)
      val exactC = pairSet(Similarity.cosinePairs(emb, "vec_id", "embedding", threshold = 0.3))
      val lsh = pairSet(Similarity.lshPairs(emb, "vec_id", "embedding",
        threshold = 0.3, dim = 64, tables = 16, targetBucketRows = 256))
      println(s"lsh t=16: exact=${exactC.size} lsh=${lsh.size} subset=${lsh.subsetOf(exactC)} " +
        s"recall=${if (exactC.isEmpty) 1.0 else lsh.intersect(exactC).size.toDouble / exactC.size}")
      val lshMp = pairSet(Similarity.lshPairs(emb, "vec_id", "embedding",
        threshold = 0.3, dim = 64, tables = 16, targetBucketRows = 256, multiProbe = true))
      println(s"lsh mp : lsh=${lshMp.size} recall=${if (exactC.isEmpty) 1.0 else lshMp.intersect(exactC).size.toDouble / exactC.size}")

      // semantic pairs at various thresholds vs exact
      for (th <- Seq(0.3, 0.7, 0.8, 0.9)) {
        val ex = pairSet(Similarity.cosinePairs(emb, "vec_id", "embedding", threshold = th))
        val sem = pairSet(Dedup.semanticPairs(emb, "vec_id", "embedding",
          dim = 64, threshold = th, nlist = 16))
        println(s"semantic th=$th: exact=${ex.size} sem=${sem.size} subset=${sem.subsetOf(ex)} " +
          s"recall=${if (ex.isEmpty) 1.0 else sem.intersect(ex).size.toDouble / ex.size}")
      }

      // ann: ivf + q8 vs exact topK
      def topSet(df: DataFrame): Set[(Long, Long)] =
        df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val q = emb.filter(col("vec_id") < 50)
      val exactT = topSet(Similarity.topK(emb, q, "vec_id", "embedding", k = 10))
      for (np <- Seq(4, 6, 8)) {
        val ivf = topSet(Similarity.ivfTopK(emb, q, "vec_id", "embedding",
          k = 10, dim = 64, nlist = 16, nprobe = np))
        println(s"ivf np=$np: recall=${ivf.intersect(exactT).size.toDouble / exactT.size}")
      }
      val q8 = topSet(Similarity.topKInt8(emb, q, "vec_id", "embedding", k = 10))
      println(s"q8: recall=${q8.intersect(exactT).size.toDouble / exactT.size}")

      // sketch tolerance
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("ap"),
          countDistinct(col("l_partkey")).as("ep"),
          approx_count_distinct(col("l_suppkey")).as("as_"),
          countDistinct(col("l_suppkey")).as("es"))
        .collect().foreach { r =>
          val (ap, ep2, as2, es) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
          println(f"sketch ${r.get(0)}: parts $ap/$ep2 (${math.abs(ap - ep2).toDouble / ep2}%.4f) " +
            f"supps $as2/$es (${math.abs(as2 - es).toDouble / es}%.4f)")
        }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
