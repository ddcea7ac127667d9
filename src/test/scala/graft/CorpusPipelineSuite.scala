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
    // gopherMinStop = 1: the synthetic fixture vocabulary carries only
    // one Gopher stop word ("the"), so the published floor of 2 would
    // empty the corpus — exactly the stop-word-poor-register case the
    // knob exists for
    val out = CorpusPipelineJob.runCurated(docs, Some(eval),
      CorpusPipelineJob.Config(nearDupTau = 0.8, minQuality = 0.0,
        shards = 4, gopherMinStop = 1))
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

  test("curated gates: repetition spam and Gopher violators drop; packing stage annotates windows") {
    // base corpus + two crafted violators: a boilerplate-spam doc (one
    // 5-gram repeated — dup5_char_frac ≈ 1) and a two-word doc (fails
    // the Gopher word-count floor); both carry unique ids
    // stopwords ("the", "of") keep it past the Gopher gate so ONLY the
    // repetition ceiling is what drops it
    val spam = (1 to 12).map(_ => "the spam of one two").mkString(" ")
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 100)
      .select("doc_id", "text")
      .unionByName(Seq((8001L, spam), (8002L, "too short"))
        .toDF("doc_id", "text"))
    val cfg = CorpusPipelineJob.Config(nearDupTau = 0.8, minQuality = 0.0,
      shards = 4, gopherMinStop = 1, packCapacity = 64, packShards = 4)
    val out = CorpusPipelineJob.runCurated(docs, None, cfg).cache()
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(8001L), "repetition gate must drop the spam doc")
    assert(!ids.contains(8002L), "Gopher word-count gate must drop it")
    assert(ids.nonEmpty)
    // packing stage: every surviving doc carries a window assignment
    // consistent with its token count
    val packedCols = Set("pack_shard", "start_bin", "end_bin", "bin_offset")
    assert(packedCols.subsetOf(out.columns.toSet))
    out.select(col("doc_id"), size(split(col("text"), " ")).as("nt"),
        col("start_bin"), col("end_bin"), col("bin_offset")).collect()
      .foreach { r =>
        val (nt, sb, eb, off) = (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))
        assert(off >= 0 && off < 64)
        assert(eb >= sb && eb - sb <= nt / 64 + 1)
      }
    // leakage posture: each pack shard's token stream is split-pure, so
    // no context window cut from it can straddle a train/eval boundary
    val mixedShards = out.select(col("pack_shard"), col("split")).distinct()
      .groupBy("pack_shard").count().where(col("count") > 1).count()
    assert(mixedShards === 0L, "pack shards must not mix splits")
    out.unpersist()
  }

  test("temperature stage: tempered output ⊆ untempered; smallest lang keeps all; rates anti-monotone") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 120)
      .select("doc_id", "text", "lang")
    val cfg = CorpusPipelineJob.Config(nearDupTau = 0.8, minQuality = 0.0,
      shards = 4, gopherMinStop = 1, gopherMinWords = 2,
      maxDupLineFrac = 1.0, maxDup5CharFrac = 1.0)
    val plain = CorpusPipelineJob.runCurated(docs, None, cfg)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val tempered = CorpusPipelineJob.runCurated(docs, None,
        cfg.copy(temperatureStratum = "lang"))
      .select("doc_id", "lang").as[(Long, String)].collect()
    // a pure filter on the untempered output
    assert(tempered.map(_._1).toSet.subsetOf(plain.map(_._1).toSet))
    assert(tempered.nonEmpty)
    // the smallest surviving stratum keeps every doc (rate 256)
    val sizes = plain.groupBy(_._2).map { case (l, r) => l -> r.length }
    val keptSizes = tempered.groupBy(_._2).map { case (l, r) => l -> r.length }
      .withDefaultValue(0)
    val smallest = sizes.minBy { case (l, n) => (n, l) }._1
    assert(keptSizes(smallest) == sizes(smallest))
  }

  test("statistical gates: length tail and low-entropy docs drop, thresholds honored") {
    // crafted outliers: a doc far above the corpus length tail, and a
    // zero-entropy doc (one stop word repeated 40×). Repetition
    // ceilings are opened to 1.0 so the entropy floor — not the
    // dup-n-gram gate — is what drops the constant doc.
    val longDoc = (1 to 2000).map(i => s"tok$i").mkString(" ")
    val flat = (1 to 40).map(_ => "the").mkString(" ")
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 100)
      .select("doc_id", "text")
      .unionByName(Seq((9001L, longDoc), (9002L, flat)).toDF("doc_id", "text"))
    val cfg = CorpusPipelineJob.Config(nearDupTau = 0.8, minQuality = 0.0,
      shards = 4, gopherMinStop = 1, gopherMinWords = 2,
      maxDupLineFrac = 1.0, maxDup5CharFrac = 1.0,
      lengthTailP = 0.9, minTokenEntropy = 0.5)
    val out = CorpusPipelineJob.runCurated(docs, None, cfg).cache()
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty)
    assert(!ids.contains(9001L), "length-tail gate must drop the 2000-token doc")
    assert(!ids.contains(9002L), "entropy floor must drop the constant doc")
    // every survivor respects both thresholds against the INPUT-derived
    // corpus-wide quantile and its own entropy
    val ent = graft.operators.TextAnalysis
      .tokenEntropy(out.toDF(), "doc_id", "text")
      .select("doc_id", "entropy").collect()
    assert(ent.forall(_.getDouble(1) >= 0.5))
    out.unpersist()
  }

  test("data card: the assembled datasheet equals the audits it summarizes") {
    import graft.jobs.DataCardJob
    import graft.operators.{Pipelines, TextAnalysis}
    val docs = Tables.documents(spark, sfDir)
    val card = DataCardJob.run(docs, minWords = 20, zipfTopN = 500)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val nDocs = docs.count().toDouble
    // corpus headline ≡ the raw table
    assert(card(("corpus", "n_docs", "all")) == Some(nDocs))
    // funnel raw counts partition the corpus
    assert(card.collect { case (("funnel", "n_raw", _), Some(v)) => v }
      .sum == nDocs)
    // language fractions are a distribution (rounding-tolerant)
    val fracs = card.collect { case (("lang", "frac", _), Some(v)) => v }
    assert(fracs.nonEmpty && math.abs(fracs.sum - 1.0) < 1e-4, fracs.toString)
    // gopher section ≡ the operator run directly
    val flags = TextAnalysis.gopherQualityFlags(
      docs.select("doc_id", "text"), "doc_id", "text", minWords = 20)
    val nPass = flags.where(col("passes")).count().toDouble
    assert(card(("gopher", "n_pass", "all")) == Some(nPass))
    assert(card(("gopher", "pass_rate", "all")) ==
      Some(BigDecimal(nPass / nDocs)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // per-source dup_frac ≡ sourceStats verbatim
    val ss = Pipelines.sourceStats(docs, "source", "text", "lang")
      .select("source", "dup_frac").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    ss.foreach { case (src, v) =>
      assert(card(("source", "dup_frac", src)) == Some(v), src)
    }
    // zipf section ≡ zipfFit verbatim
    val z = TextAnalysis.zipfFit(docs, "text", topN = 500).collect().head
    assert(card(("zipf", "slope", "all")) == Some(z.getDouble(1)))
    assert(card(("zipf", "r2", "all")) == Some(z.getDouble(3)))
    // save round-trips the CONFIGURED card through its artifact file
    val out = java.nio.file.Files
      .createTempDirectory("graft_datacard").toString + "/card"
    val configured = DataCardJob.run(docs.limit(200), minWords = 20,
      zipfTopN = 500)
    val saved = DataCardJob.save(configured, out)
    assert(saved.count() == configured.count() &&
      spark.read.parquet(out).count() == saved.count())
  }
}
