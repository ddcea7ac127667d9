package graft

import graft.jobs.CorpusPipelineJob
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusPipelineSuite extends AnyFunSuite {
  import TestSpark.{sfDir, spark}
  import spark.implicits._

  test("corpus pipeline: dedups, filters, scrubs, splits, shards") {
    val docs = Tables.documents(spark, sfDir)
    val out = CorpusPipelineJob.run(docs,
      CorpusPipelineJob.Config(nearDupTau = 0.8, minQuality = 0.3, shards = 8))
    val rows = out.cache()
    val n = rows.count()
    assert(n > 0 && n < docs.count(), s"pipeline should drop rows: $n")
    // near-dup free at the configured threshold
    val remainingPairs = graft.operators.Dedup
      .jaccardPairs(rows.toDF(), "doc_id", "text", 0.8).count()
    assert(remainingPairs == 0L, s"$remainingPairs near-dup pairs survived")
    // every row has split + quality + predicted lang
    assert(rows.where(col("split").isNull || col("quality") < 0.3
      || col("lang_pred").isNull).count() == 0)
    assert(rows.rdd.getNumPartitions == 8)
    rows.unpersist()
  }

  test("curated pipeline: cluster-transitive dedup keeps best copy, decontaminates vs eval") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 200)
    // eval set = a few docs verbatim from the corpus → they and their
    // near-identical passages must be dropped from the training output
    val eval = Tables.documents(spark, sfDir)
      .where(col("doc_id").isin(5L, 17L))
      .select(col("doc_id") + 10000L as "doc_id", col("text"))
    val out = CorpusPipelineJob.runCurated(docs, Some(eval),
      CorpusPipelineJob.Config(nearDupTau = 0.8, minQuality = 0.0, shards = 4))
    val rows = out.cache()
    assert(rows.count() > 0)
    // transitive: no near-dup pair at tau survives
    assert(graft.operators.Dedup
      .jaccardPairs(rows.toDF(), "doc_id", "text", 0.8).count() == 0)
    // decontaminated: nothing in the output shares >= 3 winnow fps with eval
    assert(graft.operators.TextAnalysis
      .decontaminationJoin(eval, rows.toDF(), "doc_id", "text").count() == 0)
    // keep-best: every survivor is its cluster's max-quality member —
    // re-cluster the INPUT and check each output id is the argmax
    val scored = docs.withColumn("q",
      graft.operators.TextAnalysis.qualityScore(col("text")))
    val best = graft.operators.Dedup.keepBestPerCluster(
        graft.operators.Dedup.nearDupClusters(docs, "doc_id", "text", 0.8),
        scored.select(col("doc_id"), col("q")), "doc_id", "q")
      .select(col("rep_id"))
    assert(rows.select("doc_id").exceptAll(best).count() == 0)
    rows.unpersist()
  }

  test("pipeline is deterministic across runs") {
    val docs = Tables.documents(spark, sfDir)
    def ids() = CorpusPipelineJob.run(docs).select("doc_id", "split")
      .collect().map(_.toString).sorted.toSeq
    assert(ids() == ids())
  }
}
