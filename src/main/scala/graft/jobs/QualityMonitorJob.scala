package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Pipelines

/** Streaming data-quality monitor: evaluate a fixed
  * [[Pipelines.Expectation]] rule set against every micro-batch of an
  * ingest stream and append the verdicts to a metrics table — the live
  * counterpart of the batch [[Pipelines.checkExpectations]] gate, and
  * the alarm wire a 100 TB ingest runs next to its landing job (a
  * schema drift or an upstream null-flood shows up as a failing rule in
  * the very batch it starts).
  *
  * Scale shape: per batch, ONE aggregation pass however many rules
  * (inherited from checkExpectations) producing |rules| report rows;
  * the metrics table grows by |rules| per batch — dashboard-sized
  * forever. Append-mode parquet: each batch's report lands exactly once
  * per delivered batch; the report never throws, so a failing rule
  * can't kill the monitor (the consumer alerts on `passed = false`).
  *
  * Output schema: (rule, col_name, metric, threshold, passed) +
  * batch_id. */
object QualityMonitorJob {

  def runStreaming(stream: DataFrame, rules: Seq[Pipelines.Expectation],
                   outDir: String, checkpoint: String,
                   trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery = {
    require(rules.nonEmpty, "QualityMonitorJob needs at least one rule")
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Pipelines.checkExpectations(batch, rules)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
  }
}
