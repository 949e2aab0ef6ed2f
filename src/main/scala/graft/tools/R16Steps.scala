package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Step-level timing for the round-16 optimization targets (dev tool):
  * replicates the expensive SparkEntry queries' internal sequence with a
  * bracket timer per step, so the bench seconds can be attributed to
  * build / save / delete / probe / compact / exact / gate phases. Run
  * twice; read the second (warm) block. */
object R16Steps {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = if (args.nonEmpty) args(0) else "delete"

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[step] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    (1 to 2).foreach { pass =>
      println(s"======== pass $pass ($which) ========")
      which match {
        case "delete" =>
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
          val q = e.filter(col("vec_id") < 50)
          val path = java.nio.file.Files
            .createTempDirectory("graft-r16steps-").toString
          val idx = time("buildIvf") {
            val i = Similarity.buildIvf(e, "vec_id", "embedding",
              dim = 64, nlist = 16, iters = 3)
            i
          }
          time("save")(idx.save(path))
          idx.unpersist()
          time("deleteFromIndex") {
            Similarity.deleteFromIndex(spark, path,
              e.filter(col("vec_id") % 7 === 3).select("vec_id"), "vec_id")
          }
          def probe(tag: String): DataFrame = {
            val loaded = time(s"loadIvf[$tag]")(Similarity.loadIvf(spark, path))
            time(s"probe[$tag]") {
              loaded.topK(q, "vec_id", "embedding", k = 10, nprobe = 12)
                .select(col("query_id").cast("long").as("query_id"),
                  col("neighbor_id").cast("long").as("neighbor_id"))
                .localCheckpoint()
            }
          }
          val probeDel = probe("tombstoned")
          time("compactIndex")(Similarity.compactIndex(spark, path))
          val probeCompact = probe("compacted")
          val survivors = e.filter(col("vec_id") % 7 =!= 3)
          val exact = time("exact topK survivors") {
            Similarity.topK(survivors, q, "vec_id", "embedding", k = 10)
              .select(col("query_id").cast("long").as("query_id"),
                col("neighbor_id").cast("long").as("neighbor_id"))
              .localCheckpoint()
          }
          time("gate aggregates") {
            val nQ = q.agg(count(lit(1)).as("n_queries"))
            val nE = exact.agg(count(lit(1)).as("n_exact_rows"))
            val nI = probeCompact.join(exact, Seq("query_id", "neighbor_id"))
              .agg(count(lit(1)).as("_ni"))
            val nDel = probeDel.unionAll(probeCompact)
              .filter(col("neighbor_id") % 7 === 3).agg(count(lit(1)).as("_nd"))
            val dAB = probeDel.join(probeCompact,
              Seq("query_id", "neighbor_id"), "left_anti").agg(count(lit(1)).as("_dab"))
            val dBA = probeCompact.join(probeDel,
              Seq("query_id", "neighbor_id"), "left_anti").agg(count(lit(1)).as("_dba"))
            nQ.crossJoin(nE).crossJoin(nI).crossJoin(nDel).crossJoin(dAB).crossJoin(dBA)
              .select(col("n_queries")).count()
          }

        case "ivfpq" =>
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
          val q = e.filter(col("vec_id") < 50)
          val exact = time("exact topK")(
            Similarity.topK(e, q, "vec_id", "embedding", k = 10).localCheckpoint())
          val approx = time("ivfPqTopK full")(
            Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 10,
              dim = 64, nlist = 16, nprobe = 12, m = 16, ksub = 32,
              shortlist = 200).localCheckpoint())
          time("gate aggregates") {
            val nQ = q.agg(count(lit(1)).as("n_queries"))
            val nE = exact.agg(count(lit(1)).as("n_exact_rows"))
            val nI = approx.select(col("query_id").cast("long").as("query_id"),
                col("neighbor_id").cast("long").as("neighbor_id"))
              .join(exact.select(col("query_id").cast("long").as("query_id"),
                col("neighbor_id").cast("long").as("neighbor_id")),
                Seq("query_id", "neighbor_id"))
              .agg(count(lit(1)).as("_ni"))
            nQ.crossJoin(nE).crossJoin(nI).select(col("n_queries")).count()
          }

        case "confauto" =>
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
          val q = e.filter(col("vec_id") < 50)
          val conf = spark.conf
          val keys = Seq("algo", "nlist", "nprobe", "tppc", "shortlist")
          time("annTopK conf-auto") {
            try {
              conf.set("spark.graft.ann.algo", "ivfpq")
              keys.drop(1).foreach(k => conf.set(s"spark.graft.ann.$k", "auto"))
              Similarity.annTopK(e, q, "vec_id", "embedding", k = 10, dim = 64)
                .localCheckpoint()
            } finally keys.foreach(k => conf.unset(s"spark.graft.ann.$k"))
          }

        case "buildpq" =>
          val e = spark.read.parquet(s"$dir/embeddings.parquet")
          val idx = time("buildIvfPq(defaults)")(
            Similarity.buildIvfPq(e, "vec_id", "embedding", dim = 64))
          time("probe")(
            idx.topK(e.filter(col("vec_id") < 50), "vec_id", "embedding",
              10, 12, 200, e).localCheckpoint())
          idx.unpersist()
          val idx2 = time("buildIvfPq(opq4)")(
            Similarity.buildIvfPq(e, "vec_id", "embedding", dim = 64,
              nlist = 16, ivfIters = 3, m = 16, ksub = 32, pqIters = 3,
              opqIters = 4))
          time("probe(auto-depth)")(
            idx2.topK(e.filter(col("vec_id") < 50), "vec_id", "embedding",
              10, 12, -1, e).localCheckpoint())
          idx2.unpersist()
      }
    }
    spark.stop()
  }
}
