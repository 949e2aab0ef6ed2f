package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object LshTune {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val exact = Similarity.cosinePairs(emb, "vec_id", "embedding", threshold = 0.3)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (tables <- Seq(6, 8, 12, 16)) {
        val t0 = System.nanoTime()
        val lsh = Similarity.lshPairs(emb, "vec_id", "embedding", threshold = 0.3,
          dim = 64, tables = tables, targetBucketRows = 256, multiProbe = true)
        val pairs = lsh.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$sf tables=$tables mp: recall=${pairs.intersect(exact).size.toDouble / math.max(exact.size, 1)}%.4f time=$dt%.2f")
        lsh.unpersist()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
