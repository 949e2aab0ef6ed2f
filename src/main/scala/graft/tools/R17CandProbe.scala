package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-17 evidence probe: candidate-pair counts of the exact-Jaccard
  * AllPairs prefix join WITH and WITHOUT the PPJoin positional filter
  * (the r17 addition to Dedup.jaccardPairsOfShingled), plus the
  * qualifying-pair count — committed proof that the filter only drops
  * non-qualifying candidates while shrinking the verify join's input.
  *
  * usage: runMain graft.tools.R17CandProbe [sfDir] [n] [threshold]
  */
object R17CandProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 3
    val threshold = if (args.length > 2) args(2).toDouble else 0.5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // mirror shingledHashed + the prefix machinery (private in Dedup)
    val df = spark.read.parquet(s"$dir/documents.parquet")
    val docs = df.select(col("doc_id").as("id"),
        graft.functions.TextFunctions.tokens(col("text")).as("_toks"))
      .select(col("id"),
        graft.functions.TextFunctions.shingleSetFromTokens(col("_toks"), n).as("shw"))
      .select(col("id"),
        array_sort(array_distinct(transform(col("shw"), s => xxhash64(s)))).as("sh"))
      .cache()
    val ex = docs.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("s"))
    val freq = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val ranked = ex.join(freq, "s")
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("df").asc, col("s").asc)))
    val prefix = ranked
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + lit(1))
      .select("id", "sz", "s", "rn").cache()
    val base = prefix.as("a").join(prefix.as("b"),
      col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
        col("a.sz") >= ceil(lit(threshold) * col("b.sz")) &&
        col("b.sz") >= ceil(lit(threshold) * col("a.sz")))
    val nOcc = base.count()
    val nPairs = base.select(col("a.id"), col("b.id")).distinct().count()
    val pos = base.filter(
      lit(1) + least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn")) >=
        ceil(lit(threshold) / (1 + threshold) * (col("a.sz") + col("b.sz"))))
    val nOccP = pos.count()
    val nPairsP = pos.select(col("a.id"), col("b.id")).distinct().count()
    val qual = graft.operators.Dedup.jaccardPairs(df, "doc_id", "text", n, threshold)
    val nQual = qual.count()
    println(s"""{"probe":"ppjoin","sf":"$dir","n":$n,"t":$threshold,""" +
      s""""cand_occurrences_before":$nOcc,"cand_pairs_before":$nPairs,""" +
      s""""cand_occurrences_after":$nOccP,"cand_pairs_after":$nPairsP,""" +
      s""""qualifying_pairs":$nQual}""")
    spark.stop()
  }
}
