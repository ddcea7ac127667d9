package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.ChangeData

/** Streaming latest-wins snapshot maintenance: fold a CDC change stream
  * into a continuously-queryable keyed snapshot store — the
  * materialized-view half of the reference's Kafka→CDC→warehouse
  * pipeline (HiveOrcSink.java:34-465 lands the raw change records;
  * this job maintains the "current state" table consumers actually
  * query).
  *
  * Store design for 100 TB:
  *  - The store is parquet partitioned by `__bucket =
  *    pmod(xxhash64(key), nBuckets)`. A micro-batch only ever touches
  *    the buckets its keys hash into, so each merge reads and rewrites
  *    `min(nBuckets, |batch keys|)` partitions — NEVER the whole store.
  *    Size `nBuckets` so one bucket ≈ a comfortable task input
  *    (store size / nBuckets ≲ 1 GB).
  *  - Tombstones are KEPT in the store (`keepTombstones = true`) and
  *    filtered at read time: a store that forgets deletions resurrects
  *    a key the moment one late pre-delete update replays.
  *  - The merge is [[ChangeData.latestSnapshot]] over (existing bucket
  *    rows ∪ batch) — max_by over the total (ts, tie) order. A replayed
  *    batch merges to the identical store (idempotent recovery), and an
  *    out-of-order batch can't regress a newer stored version.
  *  - Writes use dynamic partition overwrite, so only affected buckets
  *    are replaced and a crashed write replays cleanly.
  */
object CdcSnapshotJob {

  /** `changes` columns must be keyCols ++ payload with tsCol/tieCol/
    * opCol among them; (ts, tie) unique per key — the
    * [[ChangeData.latestSnapshot]] totality contract. */
  final case class Config(keyCols: Seq[String], tsCol: String = "ts",
                          tieCol: String = "event_id",
                          opCol: String = "op", deleteOp: String = "d",
                          nBuckets: Int = 64)

  private def bucketed(df: DataFrame, cfg: Config) =
    df.withColumn("__bucket",
      pmod(xxhash64(cfg.keyCols.map(col): _*), lit(cfg.nBuckets))
        .cast("int"))

  /** One merge step: fold `batch` into the store at `storeDir`.
    * Reads only the buckets the batch touches (partition-pruned scan),
    * merges latest-wins with tombstone retention, overwrites only those
    * buckets. Exposed for direct testing; [[runStreaming]] calls it per
    * micro-batch. */
  private[graft] def mergeBatch(storeDir: String, batch: DataFrame,
                                cfg: Config): Unit = {
    val spark = batch.sparkSession
    graft.operators.Joins.requireFreeColumns("CdcSnapshotJob",
      batch.columns, "__bucket", "__r")
    val b = bucketed(batch, cfg).localCheckpoint()
    // ≤ nBuckets ints — a bounded driver collect by construction
    val touched = b.select("__bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    val existing = scala.util.Try(
      spark.read.parquet(storeDir)
        .where(col("__bucket").isin(touched.map(Integer.valueOf): _*))
        .select(b.columns.map(col): _*)).toOption
    val merged = ChangeData.latestSnapshot(
      existing.fold(b)(_.unionByName(b)),
      cfg.keyCols, cfg.tsCol, cfg.tieCol, cfg.opCol, cfg.deleteOp,
      keepTombstones = true)
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket")
      .parquet(storeDir)
  }

  /** The live query: one foreachBatch [[mergeBatch]] per micro-batch. */
  def runStreaming(changes: DataFrame, storeDir: String,
                   checkpoint: String, cfg: Config,
                   trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, _: Long) =>
        mergeBatch(storeDir, batch, cfg))
      .start()

  /** The consumer view: live rows only (tombstones filtered), bucket
    * column dropped. Point lookups by key still prune: the caller can
    * re-derive `__bucket` from the key expression if bucket pruning
    * matters for the access path. */
  def readSnapshot(spark: SparkSession, storeDir: String,
                   cfg: Config): DataFrame =
    spark.read.parquet(storeDir)
      .where(col(cfg.opCol) =!= cfg.deleteOp)
      .drop("__bucket")
}
