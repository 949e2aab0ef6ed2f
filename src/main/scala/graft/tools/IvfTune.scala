package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object IvfTune {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val q = emb.filter(col("vec_id") < 50)
      def s(df: org.apache.spark.sql.DataFrame) =
        df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = s(Similarity.topK(emb, q, "vec_id", "embedding", k = 10))
      for (np <- Seq(8, 10, 12)) {
        val t0 = System.nanoTime()
        val ivf = s(Similarity.ivfTopK(emb, q, "vec_id", "embedding",
          k = 10, dim = 64, nlist = 16, nprobe = np))
        println(f"$sf np=$np recall=${ivf.intersect(exact).size.toDouble / exact.size}%.3f time=${(System.nanoTime()-t0)/1e9}%.2f")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
