package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.PipelineOps

/** Timing probe for production-size BPE training: args = [sfDir]
  * [numMerges] [driverVocabCap]. The driver-local finishing path should
  * put a 4k-merge train in minutes where the job-per-merge distributed
  * loop would launch 4k sequential Spark jobs. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val merges = if (args.length > 1) args(1).toInt else 4000
    val cap = if (args.length > 2) args(2).toLong else 4000000L
    val minFreq = if (args.length > 3) args(3).toLong else 2L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the bundled testdata has a 31-word synthetic vocabulary (training
    // exhausts after ~89 merges); `synthetic` generates a 200k-word
    // vocabulary so a production-size merge budget actually trains
    val docs =
      if (sfDir == "synthetic")
        spark.range(200000).selectExpr("md5(cast(id as string)) as text")
      else spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val table = PipelineOps.bpeTrain(docs, "text", numMerges = merges,
      minPairFreq = minFreq, driverVocabCap = cap)
    val n = table.count()
    println(f"[bpe] sf=$sfDir merges=$merges cap=$cap learned=$n " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
