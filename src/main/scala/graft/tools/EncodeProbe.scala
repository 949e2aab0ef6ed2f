package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-breakdown of the IVFPQ encode pass (round 12): is the 204 s
  * fused encode dominated by the columnar-cache array decode, the
  * assignment kernel, or the PQ kernel? Times each layer over the same
  * 10M cached unitized frame. */
object EncodeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = args.headOption.getOrElse(
      "/tmp/annbench/clustered_10000000_d64_v2s1.parquet")
    val nlist = args.lift(1).map(_.toInt).getOrElse(790)
    val corpus = spark.read.parquet(path)
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[encodeprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($r rows)")
    }
    // the exact cache shape buildIvfCached holds: (id, v double[], _wf)
    val data = corpus.select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double") /
          nullif(graft.functions.VectorFunctions.l2Norm(col("embedding")), lit(0.0))).as("v"))
      .withColumn("_wf", size(col("v")) === lit(64) && !exists(col("v"), _.isNull))
      .cache()
    timed("cache fill (parquet + unitize HOF + wf)")(data.count())
    timed("cache re-read, boolean only")(data.filter(col("_wf")).count())
    timed("cache re-read + l2Norm kernel")(
      data.filter(col("_wf")).select(sum(graft.functions.VectorFunctions.l2Norm(col("v")))).count())
    // assignment kernel over the cache
    val cents = data.filter(col("_wf")).orderBy("id").limit(nlist)
      .collect().map(_.getSeq[Number](1).map(_.doubleValue()).toArray)
    val d = graft.functions.HashFunctions.centroidDistances(col("v"), cents)
    timed(s"cache re-read + assignment kernel (nlist=$nlist)")(
      data.filter(col("_wf"))
        .select((array_position(d, array_min(d)) - lit(1L)).cast("int").as("c"))
        .filter(col("c").isNotNull).count())
    spark.stop()
  }
}
