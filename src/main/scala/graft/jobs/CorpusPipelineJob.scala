package graft.jobs

import graft.operators.{Dedup, Pipelines, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation pipeline — the composition the
  * individual operators exist for:
  *
  *   raw docs → exact dedup → near-dup removal (MinHash-LSH) → quality
  *   filter → PII scrub → deterministic split → sharded output frame.
  *
  * Every stage is a DataFrame transform; the whole pipeline is one lazy
  * plan until written. Near-dup removal keeps the lowest doc id of each
  * connected pair (greedy, single LSH pass — the standard first-cut
  * policy; iterate the pass for full transitive closure if needed).
  */
object CorpusPipelineJob {

  case class Config(
      textCol: String = "text",
      idCol: String = "doc_id",
      nearDupTau: Double = 0.8,
      minQuality: Double = 0.5,
      shards: Int = 64)

  def run(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    // min-id representative → deterministic across partitionings
    val exact = Dedup.exactDedup(docs, cfg.textCol, cfg.idCol)

    // drop the higher-id side of every near-dup pair
    val dupIds = Dedup.minHashLshPairs(exact, cfg.idCol, cfg.textCol, cfg.nearDupTau)
      .select(col("d2").as(cfg.idCol)).distinct()
    val nearDeduped = exact.join(dupIds, Seq(cfg.idCol), "left_anti")

    val scored = nearDeduped
      .withColumn("quality", TextAnalysis.qualityScore(col(cfg.textCol)))
      .withColumn("lang_pred", TextAnalysis.langIdGuess(col(cfg.textCol)))
      .where(col("quality") >= cfg.minQuality)

    val scrubbed = scored.withColumn(cfg.textCol,
      Pipelines.scrubPii(col(cfg.textCol)))

    Pipelines.shardForOutput(
      Pipelines.splitByHash(scrubbed, cfg.idCol), cfg.idCol, cfg.shards)
  }
}
