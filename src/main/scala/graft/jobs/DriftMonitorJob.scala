package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Pipelines

/** Streaming distribution-drift monitor: score every micro-batch of an
  * ingest stream against a STATIC reference distribution with
  * [[Pipelines.psiDrift]] and append one PSI row per (batch, column) to
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
  * Output schema: (col_name, n_ref, n_cur, psi, batch_id). */
object DriftMonitorJob {

  def runStreaming(stream: DataFrame, reference: DataFrame,
                   cols: Seq[String], outDir: String, checkpoint: String,
                   bins: Int = 16,
                   trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery = {
    require(cols.nonEmpty, "DriftMonitorJob needs at least one column")
    val ref = reference.select(cols.map(col): _*).localCheckpoint()
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        cols.foreach { c =>
          Pipelines.psiDrift(ref.select(c), batch.select(c), c, bins)
            .select(lit(c).as("col_name"), col("n_ref"), col("n_cur"),
              col("psi"), lit(batchId).as("batch_id"))
            .write.mode("append").parquet(outDir)
        }
        ()
      }
      .start()
  }
}
