package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.LayoutFunctions

/**
 * Physical-layout operators: how data lands on storage decides what a
 * 100 TB query has to READ. Two levers:
 *
 *  - **Bucketed tables** ([[writeBucketed]]): pre-shuffle a table by its
 *    join/aggregation key at write time. Two tables bucketed on the same
 *    key with the same bucket count join with NO exchange on either side
 *    — the shuffle is paid once at ingest instead of on every query.
 *    This is the materialized form of the co-located join the skyline
 *    hints build per-query.
 *
 *  - **Z-order clustering** ([[clusterByZOrder]]): totally order rows by
 *    the Morton interleave of several columns before writing, so
 *    per-file min/max statistics stay tight on ALL of them; a filter on
 *    any of the z-columns then skips most files at scan time. A
 *    lexicographic sort only prunes its leading column.
 */
object Layout {

  /**
   * Write `df` as a bucketed parquet table (bucket-pruned, shuffle-free
   * joins/aggs on `bucketCols` for every subsequent reader). Optional
   * `sortCols` sorts within each bucket file, enabling sort-merge joins
   * without a per-query sort. Spark bucketing requires the catalog
   * (`saveAsTable`) — plain `parquet(path)` writes carry no bucket
   * metadata.
   */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int, sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed needs at least one bucket column")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /**
   * Z-order key from raw numeric columns and their value bounds: each
   * column is linearly binned into `2^(63/d)` cells over `[lo, hi]`
   * (values outside clamp to the edge cells, constant columns bin to 0),
   * and the cells interleave via [[graft.functions.InterleaveBits]].
   */
  def zorderKey(cols: Seq[Column], bounds: Seq[(Double, Double)]): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(cols.length == bounds.length,
      s"${cols.length} columns but ${bounds.length} bounds")
    require(cols.length <= 8, s"zorderKey supports 1-8 dimensions, got ${cols.length}")
    val d = cols.length
    // cap at 62 bits: d=1 would otherwise shift into the sign bit
    // (1L << 63 < 0) and clamp every row to cell 0
    val cells = 1L << math.min(63 / d, 62)
    val normalized = cols.zip(bounds).map { case (c, (lo, hi)) =>
      require(!lo.isNaN && !hi.isNaN && lo <= hi, s"invalid bounds ($lo, $hi)")
      if (hi == lo) lit(0L)
      else least(
        greatest(
          floor((c.cast("double") - lit(lo)) / lit(hi - lo) * cells).cast("long"),
          lit(0L)),
        lit(cells - 1))
    }
    LayoutFunctions.interleaveBits(array(normalized: _*), d)
  }

  /**
   * Cluster `df` into `numFiles` write-ready partitions by the z-order of
   * `colNames`: range-partition on the key (contiguous key ranges →
   * contiguous space-filling-curve segments → spatially tight files),
   * sort within each, drop the key. Bounds come from one min/max
   * aggregate over the input — a driver-side collect of 2·d doubles.
   * Follow with `.write.parquet(...)`; every file then carries tight
   * min/max stats on ALL of `colNames`.
   */
  def clusterByZOrder(df: DataFrame, colNames: Seq[String],
      numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"_lo_$c"), max(col(c).cast("double")).as(s"_hi_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val bounds = colNames.indices.map { i =>
      // an empty (or all-null) input aggregates to null bounds — any
      // constant works, every row bins to cell 0
      if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) (0.0, 0.0)
      else (row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
    df.withColumn("_zkey", zorderKey(colNames.map(col), bounds))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
  }

  /**
   * Range-sharding by a score column — the curriculum/difficulty layout:
   * rows range-partition into `numFiles` contiguous score bands (Spark's
   * sampled RangePartitioner) and sort within each, so per-file min/max
   * on the score are tight and NON-OVERLAPPING across files. Two reads
   * this layout buys at 100 TB: a score-band filter prunes to its shard
   * files from footer stats alone, and a curriculum trainer streams
   * shards in difficulty order without a global sort at train time.
   * `tieBreak` columns make the within-file order total (deterministic
   * replay); rows sharing one score value may still straddle two
   * adjacent shards (the partitioner splits ties — stats stay tight
   * regardless).
   */
  def rangeShard(df: DataFrame, scoreCol: String, numFiles: Int,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(!tieBreak.contains(scoreCol), "tieBreak must not repeat scoreCol")
    val keys = col(scoreCol) +: tieBreak.map(col)
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
  }
}
