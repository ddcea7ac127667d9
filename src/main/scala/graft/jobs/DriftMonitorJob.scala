package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Pipelines

/** Streaming distribution-drift monitor: score every micro-batch of an
  * ingest stream against a STATIC reference distribution with
  * [[Pipelines.psiDrift]] and emit one PSI row per (batch, column) to
  * a metrics table — the live counterpart of the batch PSI/KS audits,
  * and the wire that catches an upstream re-scale, unit change, or
  * population shift in the very batch it starts (the scorecard
  * thresholds: PSI ≳ 0.1 watch, ≳ 0.25 act).
  *
  * The reference frame is captured ONCE at job start (localCheckpoint —
  * re-reading a mutable reference table per batch would let the
  * reference drift under the monitor). Per batch and column, psiDrift's
  * cost is two bin groupBys over reference + batch and a ≤ bins-row
  * fold; the metrics table grows by |columns| rows per batch —
  * dashboard-sized forever. The report never throws on drift: the
  * consumer alerts on the `psi` column.
  *
  * Write contract — idempotent, one file per batch: foreachBatch is
  * at-least-once (a crash mid-batch or a post-restart replay re-runs
  * the batch), so the |columns| PSI rows are unioned into ONE job,
  * coalesced to one file, and written with dynamic partition overwrite
  * on `batch_id` — a replayed batch atomically replaces exactly its
  * own partition, never appends duplicates, and can never persist a
  * partial column subset. File count stays ∝ batches, not
  * batches × columns.
  *
  * Output schema: (col_name, n_ref, n_cur, psi) partitioned by
  * batch_id. Readers note: `batch_id` is a PARTITION column, so
  * read-back type comes from partition inference (int for ids < 2³¹) —
  * cast it on read. Do not point this job at a metrics dir written by
  * a pre-partitioned (flat-append) deployment: the old files carry
  * batch_id as a data column and the mix would conflict on read —
  * start a fresh outDir (the table is dashboard-sized; re-deriving
  * history is one backfill run). */
object DriftMonitorJob {

  def runStreaming(stream: DataFrame, reference: DataFrame,
                   cols: Seq[String], outDir: String, checkpoint: String,
                   bins: Int = 16,
                   trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery = {
    require(cols.nonEmpty, "DriftMonitorJob needs at least one column")
    // fail fast on a metrics dir written by the pre-partitioned
    // (flat-append) deployment: those part files carry batch_id as a
    // DATA column at the dir root, and mixing them with batch_id=*
    // partition dirs fails confusingly at read time. Fresh dirs and
    // already-partitioned dirs pass untouched.
    val rootFiles = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
    require(!rootFiles.exists(f => f.isFile && f.getName.startsWith("part-")),
      s"DriftMonitorJob: $outDir holds non-partitioned part files (a " +
        "flat-append layout from an old deployment) — start a fresh " +
        "outDir; the metrics table is dashboard-sized, one backfill " +
        "re-derives history")
    val ref = reference.select(cols.map(col): _*).localCheckpoint()
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        cols.map { c =>
            Pipelines.psiDrift(ref.select(c), batch.select(c), c, bins)
              .select(lit(c).as("col_name"), col("n_ref"), col("n_cur"),
                col("psi"))
          }
          .reduce(_ unionByName _)
          .withColumn("batch_id", lit(batchId))
          .coalesce(1)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outDir)
        ()
      }
      .start()
  }
}
