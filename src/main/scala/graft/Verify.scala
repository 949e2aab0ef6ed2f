package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS) which Spark cannot read
      // natively; surface it as nanos-since-epoch LongType instead.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local iteration aid (same contract as Bench): run only the named
    // queries, and dump only their oracle rows so the compare stays 1:1
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    // A failing query must surface as an explicit `err` row in the
    // driver's CORRECTNESS artifact, never as a silently missing one —
    // collect per-query errors and dump them as errors.json below.
    val verbose = sys.env.contains("SPARK_GRAFT_VERBOSE")
    val errors = SparkEntry.queries.filter(kv => keep(kv._1)).toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        try {
          if (verbose) System.err.println(s"[verify] running $name")
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          None
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name FAILED: ${e.toString.take(300)}")
          Some(name -> e.toString.take(500))
        } finally {
          // queries like q_bm25/q_tfidf/q_novelty pin persisted slivers by
          // design; drop them between queries (as Bench does) so the ~92-query
          // session doesn't accumulate cache pressure at larger SFs
          spark.catalog.clearCache()
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // registry self-documentation (round 11): query name -> operator
    // family, so correctness artifacts read as per-family coverage
    val famJson = SparkEntry.families.filter(kv => keep(kv._1)).toSeq.sorted
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/families.json"), famJson)
    spark.stop()
  }
}
