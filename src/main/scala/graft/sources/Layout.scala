package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

/** Warehouse layout management: physical clustering for scan pruning.
  *
  * At 100 TB the fastest row is the one never read. Partition dirs
  * (`partitionBy`) prune at partition granularity, but WITHIN a
  * partition, row-group min/max stats only help when the writer
  * clustered the data — under Spark's default shuffle placement, every
  * row group spans nearly the full value range of every column and a
  * pushed predicate prunes nothing.
  *
  * `writeRangeClustered` is the layout half of that contract:
  * `repartitionByRange` puts disjoint key ranges in separate files
  * (file-level pruning via footer stats) and `sortWithinPartitions`
  * makes each row group's min/max tight (row-group-level pruning).
  * SinkLayoutSuite measures the effect: a time-range filter over the
  * events fixture reads 100% of rows on a shuffle-placed layout vs ~8%
  * on the clustered one — same files-count, same data, same query.
  *
  * One-time layout cost: the range shuffle (plus its sampling pass) —
  * the same trade as [[graft.operators.Joins.writeBucketed]], paid at
  * write time, repaid on every scan. Clustering key choice follows the
  * dominant predicate column (event time for append-mostly fact
  * tables).
  */
object Layout {

  /** Write `df` as parquet range-clustered on `key`: `numFiles` files
    * covering disjoint key ranges, rows sorted by `key` within each.
    *
    * Timestamp stats caveat: Spark's default parquet timestamp encoding
    * is INT96, which writes NO usable min/max stats — clustering a ts
    * key would then buy nothing. Parquet has no per-write option for
    * this, so the write runs on a FRESH session (isolated SQLConf, same
    * shared context/catalog) with `outputTimestampType=TIMESTAMP_MICROS`
    * set there; the caller's session conf is never touched, so a
    * concurrent parquet write on the shared session — notably the
    * t2-oracle dumps whose hash canonicalization depends on the INT96
    * default — can never observe the micros setting. */
  def writeRangeClustered(df: DataFrame, path: String, key: Column,
                          numFiles: Int): Unit = {
    val fresh = org.apache.spark.sql.graftbridge.SessionBridge.onFreshSession(df)
    fresh.sparkSession.conf
      .set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    fresh.repartitionByRange(numFiles, key)
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)
  }

  /** Morton (Z-order) code over `cols`: each column is rank-bucketed
    * into 2^bitsPerDim quantile buckets (ntile over a window ordered by
    * the column THEN the remaining cluster columns — deterministic up
    * to rows whose whole cluster tuple is identical, which are
    * interchangeable for layout purposes) and the bucket bits are
    * interleaved. Exposed for the writer below and its test.
    *
    * Why ntile instead of raw value bits: Z-order only prunes when
    * every dimension's bits carry uniform selectivity; raw skewed
    * values waste high bits on empty regions. Rank-bucketing is the
    * standard fix (what table formats' OPTIMIZE ZORDER does via range
    * boundaries). */
  private[graft] def mortonCode(df: DataFrame, cols: Seq[Column],
                                bitsPerDim: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(cols.size >= 2, "z-ordering needs at least 2 dimensions")
    require(bitsPerDim >= 1 && bitsPerDim * cols.size <= 62,
      s"bitsPerDim x dims must fit a long, got $bitsPerDim x ${cols.size}")
    val buckets = 1 << bitsPerDim
    val bucketed = cols.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      val tieBroken = c +: cols.filterNot(_ == c)
      acc.withColumn(s"__zb$i",
        (ntile(buckets).over(Window.orderBy(tieBroken: _*)) - 1).cast("long"))
    }
    val z = (0 until bitsPerDim).foldLeft(lit(0L)) { (acc, bit) =>
      cols.indices.foldLeft(acc) { (a, dim) =>
        // bit `bit` of dim `dim` lands at interleaved position
        // bit*dims + dim
        a.bitwiseOR(
          shiftleft(shiftright(col(s"__zb$dim"), bit).bitwiseAND(lit(1L)),
            bit * cols.size + dim))
      }
    }
    bucketed.withColumn("__z", z)
      .drop(cols.indices.map(i => s"__zb$i"): _*)
  }

  /** Write `df` parquet Z-ORDER clustered on `cols` (2+ dimensions):
    * rows are ordered by the Morton interleave of per-dimension
    * quantile-bucket ranks, so a predicate on ANY clustered dimension
    * touches a small band of files/row-groups — the multi-dimensional
    * generalization of [[writeRangeClustered]], which favors exactly
    * one key. Same fresh-session micros-timestamp isolation.
    *
    * Scale caveat (documented, deliberate): the exact ntile ranks run
    * through one unpartitioned window per dimension at write time —
    * fine for layout jobs up to the hundreds of millions of rows a
    * single compaction handles; past that, swap the rank source for
    * approxQuantile-derived range boundaries (same interleave, sampled
    * buckets) — the read-side contract is identical. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[Column],
                    numFiles: Int, bitsPerDim: Int = 8,
                    writeOptions: Map[String, String] = Map.empty): Unit = {
    import org.apache.spark.sql.functions.col
    val fresh = org.apache.spark.sql.graftbridge.SessionBridge.onFreshSession(df)
    fresh.sparkSession.conf
      .set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    mortonCode(fresh, cols, bitsPerDim)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").options(writeOptions).parquet(path)
  }
}
