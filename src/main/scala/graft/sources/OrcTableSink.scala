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

  /** S12: register the warehouse directory as a catalog table (the
    * reference's implicit Hive-metastore registration of
    * `warehouse/tableName`, HiveOrcSink.java:57,66-71) and discover its
    * `field=value` partitions — the `MSCK REPAIR` equivalent. */
  def registerTable(spark: SparkSession, warehouse: String, table: String,
                    partitionCol: String): Unit = {
    val df = spark.read.orc(s"$warehouse/$table")
    val dataCols = df.schema.fields
      .filterNot(_.name == partitionCol)
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    val partType = df.schema(partitionCol).dataType.sql
    spark.sql(s"""CREATE TABLE IF NOT EXISTS `$table` ($dataCols,
      `$partitionCol` $partType) USING ORC PARTITIONED BY (`$partitionCol`)
      LOCATION '$warehouse/$table'""")
    spark.catalog.recoverPartitions(table)
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
