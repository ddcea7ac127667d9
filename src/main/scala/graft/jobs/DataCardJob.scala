package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Pipelines, TextAnalysis}

/** Corpus data card — the one-table datasheet a release review reads:
  * the already-audited numbers (column profile, per-source volume and
  * verbatim-dup fraction, language distribution, Gopher quality pass
  * rates, Zipf naturalness fit, curation-funnel survivors) assembled
  * into a single narrow (section, metric, key, value) artifact by
  * CALLING THE AUDIT OPERATORS THEMSELVES, one pass each — the card can
  * never disagree with the dashboards because it is the same code, not
  * a re-implementation.
  *
  * Scale shape: each section is its sub-operator's documented shape
  * (profile: one wide agg; source/corpus/lang: one map-side-combining
  * groupBy each; gopher: per-row flags → one agg; zipf: TakeOrdered
  * head + one agg; funnel: the x_curation_funnel composition). The
  * union is plan-level only — sections stay independent jobs under AQE,
  * and the output is dashboard-sized (≤ a few rows per column, source,
  * and language) at any corpus size.
  *
  * Output: (section, metric, key, value<double>), ordered. */
object DataCardJob {

  private def melt(df: DataFrame, section: String, key: Column,
                   metrics: Seq[(String, Column)]): DataFrame =
    df.select(explode(array(metrics.map { case (m, c) =>
        struct(lit(section).as("section"), lit(m).as("metric"),
          key.cast("string").as("key"), c.cast("double").as("value"))
      }: _*)).as("__r"))
      .select(col("__r.section"), col("__r.metric"), col("__r.key"),
        col("__r.value"))

  def run(docs: DataFrame, idCol: String = "doc_id",
          textCol: String = "text", langCol: String = "lang",
          srcCol: String = "source",
          profileCols: Seq[String] = Seq("doc_id", "text", "lang",
            "source"),
          minWords: Int = 50, keep256: Int = 192,
          zipfTopN: Int = 1000): DataFrame = {
    val srcMetrics = Seq(
      "n_docs" -> col("n_docs"), "n_tokens" -> col("n_tokens"),
      "avg_tokens" -> col("avg_tokens"), "dup_frac" -> col("dup_frac"),
      "n_langs" -> col("n_langs"))
    val profile = melt(
      Pipelines.profileColumns(docs, profileCols),
      "profile", col("col_name"),
      Seq("n_nulls" -> col("n_nulls"), "n_distinct" -> col("n_distinct")))
    val perSource = melt(
      Pipelines.sourceStats(docs, srcCol, textCol, langCol),
      "source", col(srcCol), srcMetrics)
    // the whole-corpus headline row: the SAME operator over one group
    val corpus = melt(
      Pipelines.sourceStats(docs.withColumn("__all", lit("all")),
        "__all", textCol, langCol),
      "corpus", col("__all"), srcMetrics)
    val total = docs.agg(count(lit(1)).as("__n"))
    val lang = melt(
      docs.groupBy(col(langCol)).agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(total)),
      "lang", col(langCol),
      Seq("n_docs" -> col("n_docs"),
        "frac" -> round(col("n_docs").cast("double") / col("__n"), 6)))
    val gopher = melt(
      TextAnalysis.gopherQualityFlags(
          docs.select(col(idCol), col(textCol)), idCol, textCol,
          minWords = minWords)
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("passes"), lit(1))).as("n_pass"))
        .select(col("n_docs"), col("n_pass"),
          round(col("n_pass").cast("double") / col("n_docs"), 6)
            .as("pass_rate")),
      "gopher", lit("all"),
      Seq("n_docs" -> col("n_docs"), "n_pass" -> col("n_pass"),
        "pass_rate" -> col("pass_rate")))
    val zipf = melt(
      TextAnalysis.zipfFit(docs, textCol, topN = zipfTopN),
      "zipf", lit("all"),
      Seq("n_terms" -> col("n_terms"), "slope" -> col("slope"),
        "intercept" -> col("intercept"), "r2" -> col("r2")))
    val funnel = melt(
      Pipelines.curationFunnel(docs, idCol, textCol, srcCol,
        minWords = minWords, keep256 = keep256),
      "funnel", col(srcCol),
      Seq("n_raw" -> col("n_raw"), "n_quality" -> col("n_quality"),
        "n_dedup" -> col("n_dedup"), "n_sampled" -> col("n_sampled")))
    Seq(profile, perSource, corpus, lang, gopher, zipf, funnel)
      .reduce(_ unionByName _)
      .orderBy("section", "metric", "key")
  }

  /** Persist an already-computed card as one parquet file (it is
    * dashboard-sized by construction) — takes the CARD, not the corpus,
    * so the persisted artifact is exactly the frame the caller
    * configured (a docs-taking overload re-running [[run]] with default
    * parameters would silently disagree with a non-default card). */
  def save(card: DataFrame, outPath: String): DataFrame = {
    card.coalesce(1).write.mode("overwrite").parquet(outPath)
    card.sparkSession.read.parquet(outPath)
  }
}
