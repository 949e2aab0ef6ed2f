package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.core.SkylineQuery
import graft.operators._
import graft.operators.SkylineOps._

/**
 * CLI entry point mirroring the reference's job invocation
 * (`/root/reference/README.md:79-122`):
 *
 *   batch_job.py  "SKYLINE OF x1 MIN, x2 MAX" MR_GRID 4
 *   spark-graft:  SkylineJob "SKYLINE OF x1 MIN, x2 MAX" MR_GRID 4 <in> [out]
 *
 * `<in>` is a CSV file of d comma-separated integers (columns named
 * x1..xd as in the reference) or a parquet file with named columns.
 * Output goes to stdout, or to `[out]` as parquet when given. Algorithms:
 * NONE (plain aggregate), MR_DIM, MR_GRID, MR_ANGLE — same rejection
 * rules as the reference's handle_input (unknown algo, MR_ANGLE + MAX),
 * but with errors instead of a silent exit.
 */
object SkylineJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: SkylineJob <QUERY> <ALGO: NONE|MR_DIM|MR_GRID|MR_ANGLE> <PARAM> <input> [output]")
    val Array(query, algo, param, input) = args.take(4)
    val dims = SkylineQuery.parse(query)
    val hint: PartitionHint = algo.toUpperCase match {
      case "NONE"     => NoHint
      case "MR_DIM"   => DimHint(param.toInt)
      case "MR_GRID"  => GridHint(param.toInt)
      case "MR_ANGLE" => AngleHint(param.toInt)
      case other      => throw new IllegalArgumentException(s"unknown algorithm '$other'")
    }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df: DataFrame =
      if (input.endsWith(".parquet")) spark.read.parquet(input)
      else {
        // Headerless CSV binds schema fields POSITIONALLY. The reference
        // writes columns x1..xd in order, so when every queried dim is
        // x<i>-shaped, build the FULL x1..xmax schema (covering gaps —
        // "SKYLINE OF x1 MIN, x3 MIN" must not bind x3 to the second
        // column) and let the skyline projection pick the queried subset.
        // Non-x<i> names on a headerless file are ambiguous -> reject.
        val idx = dims.map(_._1).map { name =>
          require(name.matches("x\\d+"),
            s"headerless CSV needs x<i>-style dimension names, got '$name'")
          name.drop(1).toInt
        }
        val schema = StructType((1 to idx.max).map(i => StructField(s"x$i", LongType)))
        spark.read.schema(schema).csv(input)
      }
    val sky = df.skyline(dims, hint)
    args.lift(4) match {
      case Some(out) => sky.write.mode("overwrite").parquet(out)
      case None      => sky.show(1000, truncate = false)
    }
    spark.stop()
  }
}
