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

  test("pipeline is deterministic across runs") {
    val docs = Tables.documents(spark, sfDir)
    def ids() = CorpusPipelineJob.run(docs).select("doc_id", "split")
      .collect().map(_.toString).sorted.toSeq
    assert(ids() == ids())
  }
}
