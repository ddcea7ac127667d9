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
      shards: Int = 64,
      // runCurated structural gates (Gopher rules): minimum words for
      // the flag set, and the dup-line/dup-n-gram ceilings a doc may
      // carry before it is dropped as template/boilerplate spam
      gopherMinWords: Int = 20,
      gopherMinStop: Int = 2,
      maxDupLineFrac: Double = 0.5,
      maxDup5CharFrac: Double = 0.5,
      // context-packing stage: tokens per training window (0 = skip)
      packCapacity: Int = 0,
      packShards: Int = 64,
      // statistical gates (0 = skip): corpus-wide length-tail cut at
      // the discrete p-quantile (docs above the threshold drop), and
      // a token-entropy floor (repetitive/templated docs drop)
      lengthTailP: Double = 0.0,
      minTokenEntropy: Double = 0.0,
      // √-temperature re-balancing ("" = skip): stratum column whose
      // observed post-filter sizes derive α=1/2 keep rates
      temperatureStratum: String = "")

  /** The curated variant — same shape, stronger policies at every stage:
    *
    *   raw docs → exact dedup → verified near-dup CLUSTERS (transitive,
    *   not greedy pairs) → keep the BEST-quality copy per cluster →
    *   decontaminate against an eval set (winnow-fingerprint join) →
    *   quality filter → PII scrub → deterministic split → sharded frame.
    *
    * Differences vs [[run]]: (a) cluster-transitive dedup — a dup of a
    * dup is a dup, where the greedy pair drop can leave chains behind;
    * (b) the survivor of each cluster is its highest-quality member
    * ([[Dedup.keepBestPerCluster]]), not the lowest id; (c) any doc
    * sharing ≥ 3 winnow fingerprints with an eval doc is dropped
    * ([[TextAnalysis.decontaminationJoin]]) — benchmark hygiene as a
    * pipeline stage, not an afterthought; (d) structural gates on top
    * of the scalar quality score — the Gopher rule conjunction
    * ([[TextAnalysis.gopherQualityFlags]]) and repetition ceilings
    * ([[TextAnalysis.repetitionStats]]: dup-line and dup-5-gram char
    * fractions) drop template/boilerplate spam that a length/alpha
    * score alone passes; (e) optionally ends with sequence packing
    * ([[Pipelines.packSequences]], `cfg.packCapacity > 0`) so the
    * output frame carries each doc's training-window assignment. */
  def runCurated(docs: DataFrame, evalDocs: Option[DataFrame],
                 cfg: Config = Config()): DataFrame = {
    val exact = Dedup.exactDedup(docs, cfg.textCol, cfg.idCol)
    val scored = exact.withColumn("quality",
      TextAnalysis.qualityScore(col(cfg.textCol)))
    val clusters = Dedup.nearDupClusters(exact, cfg.idCol, cfg.textCol, cfg.nearDupTau)
    val reps = Dedup.keepBestPerCluster(clusters,
      scored.select(col(cfg.idCol), col("quality")), cfg.idCol, "quality")
    val kept = scored.join(
      reps.select(col("rep_id").as(cfg.idCol)), Seq(cfg.idCol))
    val decontaminated = evalDocs match {
      case Some(ev) =>
        val contaminated = TextAnalysis.decontaminationJoin(
            ev, kept, cfg.idCol, cfg.textCol)
          .select(col("corpus_id").as(cfg.idCol)).distinct()
        kept.join(contaminated, Seq(cfg.idCol), "left_anti")
      case None => kept
    }
    // structural gates: Gopher rule conjunction + repetition ceilings —
    // both semi-join prunes on id, so the kept frame's columns are
    // untouched and the gates compose with any upstream schema
    val gopherPass = TextAnalysis.gopherQualityFlags(
        decontaminated, cfg.idCol, cfg.textCol,
        minWords = cfg.gopherMinWords, minStop = cfg.gopherMinStop)
      .where(col("passes")).select(cfg.idCol)
    val repetitionPass = TextAnalysis.repetitionStats(
        decontaminated, cfg.idCol, cfg.textCol)
      .where(col("dup_line_frac") <= cfg.maxDupLineFrac &&
        col("dup5_char_frac") <= cfg.maxDup5CharFrac)
      .select(cfg.idCol)
    // statistical gates (optional): corpus-wide discrete-quantile
    // length-tail cut and token-entropy floor — same semi-join-prune
    // shape as the structural gates
    val lengthPass =
      if (cfg.lengthTailP <= 0) None
      else Some(Pipelines.quantileCut(
          decontaminated.select(col(cfg.idCol), lit("all").as("__g"),
            size(split(col(cfg.textCol), " ")).cast("long").as("__nt")),
          "__g", "__nt", cfg.lengthTailP)
        .where(col("keep")).select(cfg.idCol))
    val entropyPass =
      if (cfg.minTokenEntropy <= 0) None
      else Some(TextAnalysis.tokenEntropy(
          decontaminated, cfg.idCol, cfg.textCol)
        .where(col("entropy") >= cfg.minTokenEntropy).select(cfg.idCol))
    val filtered = Seq(lengthPass, entropyPass).flatten
      .foldLeft(decontaminated
        .where(col("quality") >= cfg.minQuality)
        .join(gopherPass, Seq(cfg.idCol), "left_semi")
        .join(repetitionPass, Seq(cfg.idCol), "left_semi")) {
        (acc, gate) => acc.join(gate, Seq(cfg.idCol), "left_semi")
      }
      .withColumn("lang_pred", TextAnalysis.langIdGuess(col(cfg.textCol)))
    val scrubbed = filtered.withColumn(cfg.textCol,
      Pipelines.scrubPii(col(cfg.textCol)))
    // optional √-temperature re-balance over the SURVIVING corpus (rates
    // from post-filter sizes, so filtering skew doesn't double-count).
    // The rate table collect is strata-sized (languages/sources), never
    // corpus-sized; the sample itself is the Exchange-free md5 filter.
    val tempered =
      if (cfg.temperatureStratum.isEmpty) scrubbed
      else {
        val rates = Pipelines.sqrtTemperatureRates(
            scrubbed, cfg.temperatureStratum)
          .select(col(cfg.temperatureStratum), col("keep256"))
          .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
        Pipelines.mixtureSampleByMd5(scrubbed, cfg.temperatureStratum,
          cfg.idCol, rates, default = 256)
      }
    val out = Pipelines.shardForOutput(
      Pipelines.splitByHash(tempered, cfg.idCol), cfg.idCol, cfg.shards)
    if (cfg.packCapacity <= 0) out
    else {
      // final stage: each surviving doc's context-window assignment —
      // the packed-corpus manifest a trainer consumes. The pack shard
      // key folds in the SPLIT label (shard = splitIdx * packShards +
      // hash-bucket), so each shard's token stream — and therefore
      // every 2^n-token context window cut from it — is split-pure: no
      // window ever straddles a train/eval boundary, preserving the
      // leakage-free posture of the split stage.
      val splitIdx = when(col("split") === "train", 0L)
        .when(col("split") === "val", 1L).otherwise(2L)
      val packed = Pipelines.packSequencesByShard(
        out.select(col(cfg.idCol), col("split"),
            size(split(col(cfg.textCol), " ")).cast("long").as("__nt"))
          .withColumn("__pshard", splitIdx * cfg.packShards +
            pmod(xxhash64(col(cfg.idCol)), lit(cfg.packShards.toLong))),
        cfg.idCol, "__nt", cfg.packCapacity, "__pshard")
      out.join(packed.select(col(cfg.idCol), col("shard").as("pack_shard"),
        col("start_bin"), col("end_bin"), col("bin_offset")), Seq(cfg.idCol))
    }
  }

  /** Micro-batch STREAMING curated ingest — the continuous form of
    * [[run]] for a corpus that arrives as a stream (crawl output, CDC
    * feed): every micro-batch is
    *
    *   in-batch normalized dedup (min-id representative, the batch form
    *   of `StreamOps.normalizedDedup`'s policy) → cross-batch dedup
    *   against everything ALREADY LANDED → quality gate → PII scrub →
    *   idempotent append.
    *
    * Two design points carry the exactly-once semantics without any
    * in-memory state:
    *
    *   - **The landed table IS the seen-corpus state.** Each batch
    *     anti-joins its normalized-content hashes against the output
    *     table's stored `norm_h` column (hash-keyed shuffle — the same
    *     cluster-scale path [[graft.operators.Dedup
    *     .incrementalExactDedupJoin]] takes past the bloom ceiling; at
    *     bounded seen sizes the bloom-prefiltered
    *     `incrementalExactDedup` composes identically). No
    *     deduplication state lives in the stream, so restart recovery
    *     is exactly the sink's own visibility contract.
    *   - **Idempotent landing.** Rows land partitioned by micro-batch id
    *     with dynamic partition overwrite, so a batch replayed after a
    *     crash overwrites ONLY its own partition — and the seen-side
    *     read excludes the current batch id, so a partially-landed
    *     attempt can never shadow its own retry's input.
    *
    * The landed table carries `norm_h` and `_batch_id` as OUTPUT
    * columns — `norm_h` IS the table's seen-state (the next batch's
    * anti-join reads it back), and `_batch_id` is the idempotence
    * partition key. Consumers that want the bare document schema (or
    * want to re-run a batch dedup over the landed corpus, whose
    * operators require `norm_h` free) should `.drop("norm_h",
    * "_batch_id")`.
    *
    * Null text and text that normalizes to empty get a null `norm_h`
    * and ride through undeduped — the [[graft.operators.Dedup
    * .normalizedDedup]] singleton convention, which null join keys
    * implement for free in the anti-join. */
  def runStreaming(docs: DataFrame, outDir: String, checkpoint: String,
                   cfg: Config = Config(),
                   trigger: org.apache.spark.sql.streaming.Trigger =
                     org.apache.spark.sql.streaming.Trigger.ProcessingTime("10 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val step = (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val keepIds = Dedup.normalizedDedup(batch, cfg.idCol, cfg.textCol)
        .where(col("keep")).select(cfg.idCol)
      val norm = Dedup.normalizeText(col(cfg.textCol))
      val hashed = batch.join(keepIds, Seq(cfg.idCol), "left_semi")
        .withColumn("norm_h",
          when(col(cfg.textCol).isNull || norm === "",
            lit(null).cast("string")).otherwise(md5(norm)))
      val seen = scala.util.Try(
        spark.read.orc(outDir)
          .where(col("_batch_id").cast("long") =!= batchId)
          .select("norm_h")).toOption
      val fresh = seen.fold(hashed)(s =>
        hashed.join(s, Seq("norm_h"), "left_anti"))
      fresh
        .withColumn("quality", TextAnalysis.qualityScore(col(cfg.textCol)))
        .where(col("quality") >= cfg.minQuality)
        .withColumn(cfg.textCol, Pipelines.scrubPii(col(cfg.textCol)))
        .withColumn("_batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .orc(outDir)
      ()
    }
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch(step)
      .start()
  }

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
