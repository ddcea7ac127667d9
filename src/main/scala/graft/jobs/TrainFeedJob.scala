package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Dedup, Pipelines}
import graft.sources.WebDataset

/** Streaming training feed — the trainer-side tail of the continuous
  * corpus pipeline, per micro-batch over the COMMITTED WebDataset
  * generation tars ([[WebDataset.readWebDatasetStream]]):
  *
  *   decode the newly landed shards' `textMember` members →
  *   tokenize with a MOUNTED versioned tokenizer artifact (either
  *   family: `tokenizer = "bpe"` → [[Pipelines.bpeLoad]] +
  *   [[Pipelines.bpeEncodeWith]], `"unigram"` →
  *   [[Pipelines.unigramLoad]] + [[Pipelines.unigramEncodeWith]] —
  *   trained once upstream, never retrained by the feed) →
  *   pack into fixed-`capacity` context windows
  *   ([[Pipelines.packSequences]]) →
  *   land one feed partition per micro-batch.
  *
  * Output schema per doc: (doc_id, shard, n_tokens, gstart, start_bin,
  * end_bin, bin_offset, ids_str) partitioned by batch_id — everything
  * a data loader needs to materialize each context window: which docs
  * touch it, at what offsets, and their token ids.
  *
  * Write contract: foreachBatch is at-least-once; dynamic partition
  * overwrite on batch_id makes a replayed batch replace exactly its
  * own partition, and packing is deterministic (xxhash shard +
  * id-ordered running sum), so a same-data replay reproduces its
  * partition bit-for-bit. Batch IDENTITY follows the file source's
  * arrival cadence (one batch per trigger's newly committed tars): a
  * fresh-checkpoint restart over an already-full corpus sees all tars
  * as one batch — feed consumers should follow one checkpoint lineage,
  * as trainers do.
  *
  * Packing SCOPE is the micro-batch (≈ one landed generation under a
  * one-commit-per-trigger cadence), not the whole corpus — the
  * continuous-training posture where each arriving corpus slice
  * becomes its own pack of training windows. For a one-shot global
  * repack of a frozen corpus, run the batch operators over
  * [[WebDataset.readWebDataset]] directly.
  *
  * Scale shape per batch: work ∝ newly landed bytes — one distributed
  * tar parse, the [[Pipelines.bpeEncodeWith]] plan (encode UDF over
  * DISTINCT words only, broadcast under the cap), one shard-keyed
  * running-sum window. The tokenizer mounts ONCE at job start; the
  * encoded frame is checkpointed for its two readers (pack + ids join)
  * and explicitly unpersisted per batch. */
object TrainFeedJob {

  def runStreaming(spark: SparkSession, corpusDir: String,
                   tokenizerPath: String, outDir: String,
                   checkpoint: String,
                   textMember: String = "text",
                   capacity: Int = 2048, shards: Int = 32,
                   tokenizer: String = "bpe",
                   tokenizerVersion: Option[Long] = None,
                   trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery = {
    require(capacity >= 1, "TrainFeedJob needs capacity >= 1")
    require(shards >= 1, "TrainFeedJob needs shards >= 1")
    require(!textMember.contains("."),
      s"textMember must be a dot-free member suffix, got '$textMember'")
    // both tokenizer families mount through their versioned-artifact
    // seams and share the encode output schema — the feed is
    // tokenizer-agnostic past this point
    val encode: DataFrame => DataFrame = tokenizer match {
      case "bpe" =>
        val (model, _) = Pipelines.bpeLoad(spark, tokenizerPath,
          tokenizerVersion)
        df => Pipelines.bpeEncodeWith(df, "doc_id", "text", model)
      case "unigram" =>
        val (model, _) = Pipelines.unigramLoad(spark, tokenizerPath,
          tokenizerVersion)
        df => Pipelines.unigramEncodeWith(df, "doc_id", "text", model)
      case other => throw new IllegalArgumentException(
        s"TrainFeedJob: unknown tokenizer '$other' (expected bpe | unigram)")
    }
    val suffixLen = textMember.length + 1
    WebDataset.readWebDatasetStream(spark, corpusDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val docs = batch
          .where(col("member").endsWith(s".$textMember"))
          .select(
            expr(s"substring(member, 1, length(member) - $suffixLen)")
              .as("doc_id"),
            col("content").cast("string").as("text"))
        val enc = encode(docs).localCheckpoint()
        try {
          // an empty batch lands nothing (its partition is simply
          // absent). The probe reads the CHECKPOINTED enc, not the
          // pack+join plan — every enc row carries ≥ 1 token (a word
          // encodes to ≥ 1 symbol), so enc-nonempty ⟺ out-nonempty,
          // and probing `out` would evaluate the window+join twice
          // per trigger
          if (enc.limit(1).count() > 0) {
            val packed = Pipelines.packSequences(
              enc.select(col("doc_id"), col("n_tokens").as("nt")),
              "doc_id", "nt", capacity, shards)
            packed
              .join(enc.select(col("doc_id"), col("ids_str")), "doc_id")
              .withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id").parquet(outDir)
            ()
          }
        } finally Dedup.uncheckpoint(enc)
        ()
      }
      .start()
  }
}
