package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Partitioned-ORC warehouse sink (SURVEY §2.1 S6-S9), the Spark-native
  * re-expression of the reference's 465-line `HiveOrcSink.java` +
  * `RowTimeBucketer.scala:12-19`:
  *
  *  - Hive `field=value` partition dirs  → `partitionBy(partitionCol)`
  *  - per-bucket writer multiplexing (HiveOrcSink.java:97,108-116)
  *    → dynamic partition insert (built in)
  *  - size-based file rolling (HiveOrcSink.java:39,215-218; ~5 MB target)
  *    → `maxRecordsPerFile`, but sized for 128-512 MB files — the
  *    reference's 5 MB roll is a small-files antipattern at 100 TB
  *    (BASELINE.md design note)
  *  - tmp → pending → final rename commit (HiveOrcSink.java:321-345,448-455)
  *    → batch `FileCommitProtocol` / streaming `_spark_metadata` log,
  *    which also closes the reference's crash-window caveat (SURVEY §3.3)
  *  - in-heap replay buffer (HiveOrcSink.java:271,287) → deliberately not
  *    reproduced; Structured Streaming replays from source offsets.
  */
object OrcTableSink {

  /** Batch write: `warehouse/table/partitionCol=value/part-*.orc`. */
  def writeBatch(df: DataFrame, warehouse: String, table: String,
                 partitionCol: String, maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.write.format("orc").mode("append").partitionBy(partitionCol)
    val w2 = if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile) else w
    w2.save(s"$warehouse/$table")
  }

  /** S7 with the reference's *byte* roll semantics (`HiveOrcSink.java:39,
    * 215-218` rolls at batchSize×10 bytes): Spark's knob is rows
    * (`maxRecordsPerFile`), so a byte target needs a rows-per-target-bytes
    * estimate. A bounded sample is written once as ORC and measured —
    * encoded bytes, so compression/dictionary effects are in the estimate
    * — then the real write rolls at `targetFileBytes / bytesPerRow` rows.
    * Default target 256 MB per SCALE.md (the reference's 5 MB is a
    * small-files antipattern at 100 TB). Returns the derived
    * maxRecordsPerFile. Small-sample ORC overhead (footer/dictionary)
    * biases bytesPerRow high → files come out at-or-under target, the
    * safe side. */
  def writeBatchTargetBytes(df: DataFrame, warehouse: String, table: String,
                            partitionCol: String,
                            targetFileBytes: Long = 256L * 1024 * 1024,
                            sampleRows: Int = 10000): Long = {
    require(targetFileBytes > 0 && sampleRows > 0)
    val bytesPerRow = estimateOrcBytesPerRow(df, sampleRows, s"$warehouse/$table")
    val maxRecords = math.max(1L, (targetFileBytes / bytesPerRow).toLong)
    writeBatch(df, warehouse, table, partitionCol, maxRecords)
    maxRecords
  }

  /** Encoded-ORC bytes per row, measured from a `sampleRows`-row probe
    * file (one small extra job; only runs when a byte target is asked
    * for). The probe lands under `destDir` in an underscore-named,
    * applicationId-keyed subdir so it (a) shares the destination's
    * FILESYSTEM — a driver-local `java.io` temp dir would be written
    * remotely when `fs.defaultFS` is hdfs://|s3a:// and read back as 0
    * bytes, collapsing bytesPerRow to ~0 and maxRecords to unbounded —
    * (b) is invisible to readers (underscore prefix), and (c) is
    * disjoint across concurrent writers sharing a warehouse. Listing
    * and cleanup go through the destination's Hadoop FileSystem, never
    * `java.io.File`. */
  private[graft] def estimateOrcBytesPerRow(df: DataFrame, sampleRows: Int,
                                            destDir: String): Double = {
    val appId = df.sparkSession.sparkContext.applicationId
    CorpusExport.estimateBytesPerRow(df, sampleRows, "orc",
      s"$destDir/_size_probe_$appId")
  }

  /** S12: register the warehouse directory as a catalog table (the
    * reference's implicit Hive-metastore registration of
    * `warehouse/tableName`, HiveOrcSink.java:57,66-71) and discover its
    * `field=value` partitions — the `MSCK REPAIR` equivalent.
    *
    * Schema-less CREATE: Spark infers data + partition schema from the
    * location once at creation and persists it to the catalog. This is
    * deliberate — handing CREATE TABLE an explicit schema over a dir that
    * carries a streaming `_spark_metadata` log makes Spark treat the
    * user schema as overlapped data+partition columns, and the table
    * lands in HMS unpartitioned (RECOVER PARTITIONS then throws
    * NOT_A_PARTITIONED_TABLE). Inference handles batch and streaming
    * sink outputs identically. `partitionCol` stays in the signature as
    * a post-registration contract check.
    *
    * Exactly-once caveat closed AT REGISTRATION TIME only: catalog
    * reads LIST files from partition directories, bypassing the
    * `_spark_metadata` log that path-based reads filter through — so an
    * orphan file from a crashed, uncommitted streaming batch would
    * become visible (a duplicate) through the table even though
    * `spark.read.orc(path)` hides it (the reference's rename protocol
    * likewise exposes only committed files to Hive,
    * HiveOrcSink.java:321-345). When the dir carries a `_spark_metadata`
    * log, registration therefore reconciles the on-disk data files
    * against the log's committed set and refuses to register while
    * orphans exist (clean AvailableNow/stop termination never leaves
    * any; a crash mid-batch can).
    *
    * The guarantee does NOT extend past this call: unlike the
    * reference's continuous rename protocol, a stream that keeps
    * running — or restarts and crashes — AFTER registration can leave
    * new orphans that catalog reads will serve. Operate the table in
    * one of two regimes: (a) register only after stream termination
    * (the tested composition, HiveMetastoreSuite), or (b) if a stream
    * keeps writing to a registered table, audit with
    * [[uncommittedDataFiles]] before trusting catalog reads after any
    * non-clean shutdown. */
  def registerTable(spark: SparkSession, warehouse: String, table: String,
                    partitionCol: String): Unit = {
    val location = s"$warehouse/$table"
    val orphans = uncommittedFiles(spark, location)
    require(orphans.isEmpty,
      s"dir $location has ${orphans.size} data file(s) absent from its " +
        s"_spark_metadata commit log (crashed uncommitted batch?): " +
        s"${orphans.take(5).mkString(", ")} — remove them (or rerun the " +
        "stream to completion) before registering, else catalog reads " +
        "would see uncommitted duplicates")
    spark.sql(s"CREATE TABLE IF NOT EXISTS `$table` USING ORC LOCATION '$location'")
    val parts = spark.catalog.listColumns(table)
      .filter(_.isPartition).collect().map(_.name).toSeq
    require(parts == Seq(partitionCol),
      s"expected table `$table` partitioned by $partitionCol, got $parts")
    spark.catalog.recoverPartitions(table)
  }

  /** Public reconcile audit for an already-registered streaming table:
    * data files under `warehouse/table` that the `_spark_metadata`
    * commit log does not cover (empty for batch-written dirs, which
    * commit via FileCommitProtocol rename and can't orphan). Call after
    * a non-clean stream shutdown, before trusting catalog reads —
    * non-empty means those files are uncommitted duplicates that
    * catalog (file-listing) reads would serve; remove them or rerun the
    * stream to completion. [[registerTable]] runs this check once at
    * registration; it cannot see orphans created later. */
  def uncommittedDataFiles(spark: SparkSession, warehouse: String,
                           table: String): Seq[String] =
    uncommittedFiles(spark, s"$warehouse/$table")

  /** Data files under `location` that a path-based read would NOT serve:
    * empty unless the dir has a streaming `_spark_metadata` log (batch
    * dirs are committed via FileCommitProtocol rename — nothing to
    * reconcile). Committed set = `spark.read.orc(location).inputFiles`,
    * which resolves through MetadataLogFileIndex when the log exists;
    * on-disk set = recursive Hadoop-FS listing of non-hidden files. */
  private[graft] def uncommittedFiles(spark: SparkSession,
                                      location: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(location)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(root, "_spark_metadata"))) return Seq.empty
    // a crash before the FIRST batch commits leaves the log dir present
    // but with zero committed files — the metadata-filtered read then
    // can't infer a schema and throws. That's still a valid audit state:
    // committed set is empty, every data file on disk is an orphan.
    val committed = scala.util.Try {
      spark.read.orc(location).inputFiles
        .map(f => new Path(f).toUri.getPath).toSet
    }.getOrElse(Set.empty[String])
    val onDisk = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      val name = st.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        if (st.isDirectory) walk(st.getPath)
        else onDisk += st.getPath.toUri.getPath
      }
    }
    walk(root)
    onDisk.toSeq.filterNot(committed.contains).sorted
  }

  /** Streaming write with exactly-once file visibility via the
    * `_spark_metadata` commit log (replaces §3.3's rename state machine). */
  def streamWriter(df: DataFrame, warehouse: String, table: String,
                   partitionCol: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("orc")
      .partitionBy(partitionCol)
      .option("path", s"$warehouse/$table")
      .option("checkpointLocation", checkpoint)
}
