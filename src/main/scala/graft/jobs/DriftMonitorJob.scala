package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Pipelines
import graft.sources.CdcIngest

/** Streaming distribution-drift monitor: score every micro-batch of an
  * ingest stream against a STATIC reference and emit one metric row
  * per (batch, column, metric) to a metrics table — the live
  * counterpart of the batch audits, and the wire that catches an
  * upstream re-scale, mix shift, or schema change in the very batch it
  * starts. Three watch surfaces, each optional:
  *
  *  - numeric `cols` → [[Pipelines.psiDrift]] rows (metric `psi`; the
  *    scorecard thresholds: PSI ≳ 0.1 watch, ≳ 0.25 act);
  *  - categorical `catCols` → [[Pipelines.categoricalDrift]] rows
  *    (metric `js_cat`, bounded by ln 2 ≈ 0.693 — a new enum value or
  *    a shifted source mix moves it the batch it happens);
  *  - a CDC `envelopeCol` → metric `unknown_key_rate`, the fraction of
  *    decodable envelopes carrying `value.after` fields outside the
  *    declared schema ([[CdcIngest.unknownAfterKeys]] — the batch-side
  *    schema-drift dead-letter, wired into the live alarm; n_ref is 0,
  *    there is no reference distribution for novelty).
  *
  * The reference frame is captured ONCE at job start (localCheckpoint —
  * re-reading a mutable reference table per batch would let the
  * reference drift under the monitor). Per batch the cost is two bin/
  * category groupBys per watched column plus one projection for the
  * envelope rate; the metrics table grows by |columns| rows per batch —
  * dashboard-sized forever. The report never throws on drift: the
  * consumer alerts on the `value` column per `metric`.
  *
  * Write contract — idempotent, one file per batch: foreachBatch is
  * at-least-once (a crash mid-batch or a post-restart replay re-runs
  * the batch), so ALL metric rows union into ONE job, coalesced to one
  * file, written with dynamic partition overwrite on `batch_id` — a
  * replayed batch atomically replaces exactly its own partition, never
  * appends duplicates, and can never persist a partial metric subset.
  * File count stays ∝ batches, not batches × columns.
  *
  * Output schema: (col_name, metric, n_ref, n_cur, value) partitioned
  * by batch_id. Readers note: `batch_id` is a PARTITION column, so
  * read-back type comes from partition inference (int for ids < 2³¹) —
  * cast it on read. Do not point this job at a metrics dir written by
  * a pre-partitioned (flat-append) deployment — the startup guard
  * refuses root-level part files loudly. */
object DriftMonitorJob {

  def runStreaming(stream: DataFrame, reference: DataFrame,
                   cols: Seq[String], outDir: String, checkpoint: String,
                   bins: Int = 16,
                   trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
                   catCols: Seq[String] = Nil,
                   envelopeCol: Option[String] = None)
      : StreamingQuery = {
    require(cols.nonEmpty || catCols.nonEmpty || envelopeCol.nonEmpty,
      "DriftMonitorJob needs at least one watch surface")
    // fail fast on a metrics dir written by the pre-partitioned
    // (flat-append) deployment: those part files carry batch_id as a
    // DATA column at the dir root, and mixing them with batch_id=*
    // partition dirs fails confusingly at read time. Fresh dirs and
    // already-partitioned dirs pass untouched. The probe resolves
    // through the Hadoop FileSystem of outDir — a java.io.File listing
    // of an hdfs://|s3a:// dir reads empty and defeats the guard.
    val rootP = new org.apache.hadoop.fs.Path(outDir)
    val rootFs = rootP.getFileSystem(
      stream.sparkSession.sparkContext.hadoopConfiguration)
    val rootFiles =
      if (rootFs.exists(rootP)) rootFs.listStatus(rootP).toSeq
      else Seq.empty[org.apache.hadoop.fs.FileStatus]
    require(!rootFiles.exists(st =>
        st.isFile && st.getPath.getName.startsWith("part-")),
      s"DriftMonitorJob: $outDir holds non-partitioned part files (a " +
        "flat-append layout from an old deployment) — start a fresh " +
        "outDir; the metrics table is dashboard-sized, one backfill " +
        "re-derives history")
    val watched = (cols ++ catCols).distinct
    val ref =
      if (watched.nonEmpty) reference.select(watched.map(col): _*)
        .localCheckpoint()
      else reference.limit(0).localCheckpoint()
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val psiRows = cols.map { c =>
          Pipelines.psiDrift(ref.select(c), batch.select(c), c, bins)
            .select(lit(c).as("col_name"), lit("psi").as("metric"),
              col("n_ref"), col("n_cur"), col("psi").as("value"))
        }
        val catRows = catCols.map { c =>
          Pipelines.categoricalDrift(ref.select(c), batch.select(c), c)
            .select(lit(c).as("col_name"), lit("js_cat").as("metric"),
              col("n_ref"), col("n_cur"), col("js").as("value"))
        }
        val envRows = envelopeCol.toSeq.map { c =>
          // denominator = DECODABLE envelopes only (unknownAfterKeys is
          // null for undecodable rows — corruptRecords territory, not
          // drift): a steady corrupt-row fraction must not dilute the
          // schema alarm. n_cur reports the decodable count.
          batch.select(
              CdcIngest.unknownAfterKeys(c).as("__unk"))
            .agg(count(col("__unk")).as("n_cur"),
              count(when(size(col("__unk")) > 0, lit(1))).as("__novel"))
            .select(lit(c).as("col_name"),
              lit("unknown_key_rate").as("metric"),
              lit(0L).as("n_ref"), col("n_cur"),
              when(col("n_cur") > 0,
                round(col("__novel").cast("double") /
                  col("n_cur").cast("double"), 6)).as("value"))
        }
        (psiRows ++ catRows ++ envRows)
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
