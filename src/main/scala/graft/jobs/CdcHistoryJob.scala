package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.ChangeData

/** Streaming SCD type-2 history maintenance: fold a CDC change stream
  * into a continuously-growing validity-interval table — the audit-trail
  * companion of [[CdcSnapshotJob]] (which keeps only each key's latest
  * row; this job keeps every version with its [valid_from, valid_to)
  * interval).
  *
  * Same store design ([[CdcSnapshotJob]]'s scale rationale): parquet
  * bucket-partitioned by key hash, each micro-batch reads and rewrites
  * ONLY the buckets its keys touch, merged with
  * [[ChangeData.mergeScd2]] — never a full-history rebuild.
  *
  * Idempotence vs the strictly-newer contract: a replayed batch is not
  * "newer" than the history it already landed in, so events already
  * present — same (key, ts, tie) — are dropped by an anti-join BEFORE
  * the merge; a full replay reduces to a no-op and a partial (crashed
  * mid-write) replay applies exactly the remainder. Genuinely NEW
  * out-of-order events still raise through mergeScd2's in-plan guard:
  * silently splicing late history would corrupt closed intervals. */
object CdcHistoryJob {

  private val markers = Seq("valid_from", "valid_to", "is_current")

  private def bucketed(df: DataFrame, cfg: CdcSnapshotJob.Config) =
    df.withColumn("__bucket",
      pmod(xxhash64(cfg.keyCols.map(col): _*), lit(cfg.nBuckets))
        .cast("int"))

  /** One merge step; exposed for direct testing. */
  private[graft] def mergeBatch(storeDir: String, batch: DataFrame,
                                cfg: CdcSnapshotJob.Config): Unit = {
    val spark = batch.sparkSession
    graft.operators.Joins.requireFreeColumns("CdcHistoryJob",
      batch.columns, "__bucket" +: markers: _*)
    val b = bucketed(batch, cfg).localCheckpoint()
    val touched = b.select("__bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    val logCols = b.columns.toSeq
    val existing = scala.util.Try(
      spark.read.parquet(storeDir)
        .where(col("__bucket").isin(touched.map(Integer.valueOf): _*))
        .select((logCols ++ markers).map(col): _*)
        .localCheckpoint()).toOption
    val merged = existing match {
      case None => ChangeData.scd2History(b, cfg.keyCols, cfg.tsCol,
        cfg.tieCol, cfg.opCol, cfg.deleteOp)
      case Some(hist) =>
        // drop already-landed events (replay) before the merge: an
        // event is identified by (key, ts, tie) — but history rows for
        // DELETES don't exist, so tombstone replays are detected by the
        // interval they closed instead: a delete at ts T left some row
        // with valid_to = T. Check both. Consequence: any NEW event at
        // an already-seen (key, ts) is treated as a replay and dropped
        // — it would violate the strictly-newer contract anyway, and
        // dedup-by-event-time is the standard CDC reading.
        val eventKey = cfg.keyCols :+ cfg.tsCol :+ cfg.tieCol
        val seenEvents = hist
          .select(eventKey.map(col): _*)
        val seenDeletes = hist
          .select((cfg.keyCols.map(col) :+
            col("valid_to").as(cfg.tsCol)): _*)
          .where(col(cfg.tsCol).isNotNull)
        val fresh = b
          .join(seenEvents, eventKey, "left_anti")
          .join(seenDeletes, cfg.keyCols :+ cfg.tsCol, "left_anti")
          .localCheckpoint()
        if (fresh.isEmpty) return
        ChangeData.mergeScd2(hist, fresh, cfg.keyCols, cfg.tsCol,
          cfg.tieCol, cfg.opCol, cfg.deleteOp)
    }
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket")
      .parquet(storeDir)
  }

  /** The live query: one foreachBatch [[mergeBatch]] per micro-batch. */
  def runStreaming(changes: DataFrame, storeDir: String,
                   checkpoint: String, cfg: CdcSnapshotJob.Config,
                   trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, _: Long) =>
        mergeBatch(storeDir, batch, cfg))
      .start()

  /** The consumer view: the full validity history, bucket column
    * dropped. */
  def readHistory(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir).drop("__bucket")

  /** Time travel: the snapshot as of `asOf` — the versions whose
    * validity interval covers the instant (valid_from <= asOf <
    * valid_to, open intervals qualify). Deletes need no extra handling:
    * a tombstone emitted no row and closed its predecessor, so a
    * deleted key simply has no covering interval. */
  def asOfSnapshot(spark: SparkSession, storeDir: String,
                   asOf: org.apache.spark.sql.Column): DataFrame =
    readHistory(spark, storeDir)
      .where(col("valid_from") <= asOf &&
        (col("valid_to").isNull || col("valid_to") > asOf))
      .drop(markers: _*)
}
