package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Ad-hoc stage profiler for the dedup hot paths (dev tool, not part of
  * the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = docs0
      .select(col("doc_id").as("id"), TextFunctions.tokens(col("text")).as("_toks"))
      .select(col("id"), TextFunctions.shingleSetFromTokens(col("_toks"), 3).as("sh"))
    time("shingleSet count")(docs.count())
    val ex = docs.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("s"))
    time("explode count")(ex.count())
    val freq = ex.groupBy("s").agg(count(lit(1)).as("df"))
    time("freq count")(freq.count())
    val ranked = ex.join(freq, "s").withColumn("rn", row_number().over(
      Window.partitionBy("id").orderBy(col("df").asc, col("s").asc)))
    val prefix = ranked.filter(col("rn") <= col("sz") - ceil(lit(0.5) * col("sz")) + lit(1))
      .select("id", "s")
    time("prefix count")(prefix.count())
    val cands = prefix.as("a").join(prefix.as("b"), Seq("s"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
    time("cands count")(cands.count())
    val d1 = docs.select(col("id").as("id1"), col("sh").as("sh1"))
    val d2 = docs.select(col("id").as("id2"), col("sh").as("sh2"))
    val verified = cands.join(d1, "id1").join(d2, "id2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("jaccard", col("inter") / (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("jaccard") >= 0.5)
    time("verify count")(verified.count())

    // minhash stages
    val numPerm = 64
    val ex2 = docs.select(col("id"), explode(col("sh")).as("s"))
    val mh = ex2.groupBy("id").agg(
      array((0 until numPerm).map(i => min(xxhash64(lit(i), col("s")))): _*).as("mh"))
    time("minhash agg count")(mh.count())
    val buckets = mh.select(col("id"), posexplode(
      array((0 until 16).map(j =>
        xxhash64(lit(j) +: (0 until 4).map(k => element_at(col("mh"), j * 4 + k + 1)): _*)): _*)
    ).as(Seq("band", "bh")))
    val cands2 = buckets.as("a").join(buckets.as("b"), Seq("band", "bh"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
    time("mh cands count")(cands2.count())
    spark.stop()
  }
}
