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

  /** Morton (Z-order) code over `cols`: each column is bucketed into
    * up to 2^bitsPerDim quantile buckets via approxQuantile-sampled
    * range boundaries (one stat pass over ALL dimensions at once,
    * boundaries broadcast as literals into a scan-side comparison —
    * no window, no single-task funnel) and the bucket bits are
    * interleaved. Exposed for the writer below and its test.
    *
    * Why quantile buckets instead of raw value bits: Z-order only
    * prunes when every dimension's bits carry uniform selectivity; raw
    * skewed values waste high bits on empty regions. Range-boundary
    * bucketing is the standard fix (what table formats' OPTIMIZE
    * ZORDER does). Rows equal to a sampled boundary share its bucket;
    * NULLs land in bucket 0 — both interchangeable for layout.
    *
    * `relativeError` is the approxQuantile rank error; the default
    * (quarter of a bucket width) keeps boundaries within a quarter
    * bucket of exact at any scale with a bounded sketch. Pass 0 only
    * on small frames (exact sketch retains every value). */
  private[graft] def mortonCode(df: DataFrame, cols: Seq[Column],
                                bitsPerDim: Int,
                                relativeError: Double = -1.0): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    require(cols.size >= 2, "z-ordering needs at least 2 dimensions")
    require(bitsPerDim >= 1 && bitsPerDim * cols.size <= 62,
      s"bitsPerDim x dims must fit a long, got $bitsPerDim x ${cols.size}")
    val buckets = 1 << bitsPerDim
    graft.operators.Joins.requireFreeColumns("writeZOrdered", df.columns,
      ("__z" +: cols.indices.flatMap(i => Seq(s"__zb$i", s"__zq$i"))): _*)
    val err = if (relativeError >= 0) relativeError else 0.25 / buckets
    // Order-preserving double proxy per dimension so one approxQuantile
    // pass covers every supported type. Strings collapse to their first
    // 6 bytes (48 bits — exact in a double); ties past that share a
    // bucket, which only costs layout tightness, never correctness.
    def proxy(c: Column, dt: DataType): Column = dt match {
      case _: NumericType => c.cast("double")
      case DateType       => unix_date(c).cast("double")
      case _: TimestampType | TimestampNTZType =>
        unix_micros(c.cast("timestamp")).cast("double")
      case StringType =>
        conv(rpad(substring(hex(c.cast("binary")), 1, 12), 12, "0"), 16, 10)
          .cast("double")
      case other => throw new IllegalArgumentException(
        s"writeZOrdered: unsupported cluster-column type $other")
    }
    val dims = cols.zipWithIndex.map { case (c, i) =>
      (i, proxy(c, df.select(c).schema.head.dataType))
    }
    val proxied = dims.foldLeft(df) { case (acc, (i, p)) =>
      acc.withColumn(s"__zq$i", p)
    }
    // ONE sampling pass for all dimensions: interior quantile cuts,
    // broadcast back as literal arrays (empty on an all-null/empty dim).
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = proxied.stat.approxQuantile(
      cols.indices.map(i => s"__zq$i").toArray, probs, err)
    val bucketed = cols.indices.foldLeft(proxied) { (acc, i) =>
      val bs = bounds(i).distinct.sorted
      val b =
        if (bs.isEmpty) lit(0L)
        else size(filter(lit(bs), x => acc(s"__zq$i") > x)).cast("long")
      acc.withColumn(s"__zb$i", b)
    }.drop(cols.indices.map(i => s"__zq$i"): _*)
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
    * Scale posture: bucket ranks come from approxQuantile-sampled
    * boundaries broadcast into the scan (see [[mortonCode]]) — the
    * write plan carries no window and no single-partition funnel, so
    * the layout job parallelizes like any shuffle write; cost is one
    * extra bounded-sketch stat pass over the clustered columns. */
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
