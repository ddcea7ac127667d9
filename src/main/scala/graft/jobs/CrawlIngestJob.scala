package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.CorpusExport

/** Streaming crawl-ingest pipeline — the continuous-corpus composition
  * of this library's pieces, per micro-batch:
  *
  *   quality gate (Gopher flags) → within-batch exact dedup →
  *   exact dedup vs the ALREADY-LANDED corpus (bloom-pruned) →
  *   land the survivors as export generation = batch id
  *   ([[CorpusExport.exportShardsIncremental]]).
  *
  * The landed corpus IS the dedup state — no side ledger to drift out
  * of sync with the data: each batch reads the generations already on
  * disk (hash projection only; the bloom front means definite-new rows
  * never shuffle) and appends exactly its novel survivors.
  *
  * Exactly-once: foreachBatch is at-least-once, and the export's
  * dynamic partition overwrite on (split, gen = batchId) makes a
  * replayed batch atomically replace exactly its own partitions — the
  * CdcToOrcJob / DriftMonitorJob idempotency contract. Crucially the
  * seen-side read EXCLUDES the current batch's own generation: a
  * replayed batch would otherwise see its crashed predecessor's rows
  * as "already landed", dedup itself to nothing, and replace its
  * generation with an empty one — silent data loss on the exact path
  * replay exists to protect.
  *
  * Batches whose survivors are empty land nothing (their generation id
  * is simply skipped — generations are monotone, not dense).
  *
  * Scale shape per batch: the quality gate and hashing are map-only;
  * the only corpus-sized work is one hash projection over the landed
  * generations to build the seen bloom — at a 100 TB landed corpus,
  * persist the hash set bucketed instead (the documented
  * [[Dedup.incrementalExactDedup]] cluster posture) and raise
  * `expectedSeen` accordingly. */
object CrawlIngestJob {

  def runStreaming(stream: DataFrame, idCol: String, textCol: String,
                   contentCols: Seq[String], outDir: String,
                   checkpoint: String,
                   minWords: Int = 20,
                   targetShardBytes: Long = 256L * 1024 * 1024,
                   expectedSeen: Long = 1L << 20,
                   trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery = {
    require(contentCols.nonEmpty, "CrawlIngestJob needs contentCols")
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // the gate returns (id, metrics, passes) — semi-join the pass
        // set back onto the batch to keep every original column
        val quality = batch.join(
          TextAnalysis
            .gopherQualityFlags(batch, idCol, textCol, minWords = minWords)
            .where(col("passes")).select(col(idCol)),
          Seq(idCol), "left_semi")
        val inBatch = Dedup.exactDedup(quality, textCol, idCol)
        // the landed corpus is the seen set — minus THIS generation,
        // so a replay never deduplicates against its own crashed write
        val hasLanded = Option(new java.io.File(outDir).listFiles())
          .exists(_.exists(f => f.isDirectory &&
            f.getName.startsWith("split=")))
        val novel =
          if (!hasLanded) inBatch
          else Dedup.incrementalExactDedup(
            inBatch,
            spark.read.parquet(outDir)
              .where(col("gen").cast("long") =!= batchId)
              .select(textCol),
            textCol, textCol, expectedSeen = expectedSeen)
        // stage the (batch-sized) survivors once: the export's probe,
        // count, route and write passes re-read THIS, not the
        // gate+dedup pipeline (whose seen-bloom build they would
        // otherwise re-run per action)
        val staged = novel.localCheckpoint()
        if (staged.limit(1).count() > 0) {
          CorpusExport.exportShardsIncremental(staged, idCol, contentCols,
            outDir, generation = batchId,
            targetShardBytes = targetShardBytes)
          ()
        }
        ()
      }
      .start()
  }
}
