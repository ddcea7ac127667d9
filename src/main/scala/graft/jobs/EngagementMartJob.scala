package graft.jobs

import graft.operators.EventAnalytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Daily engagement mart — the composed analytics job the event-side
  * operators exist for: one pass over the raw event log materializes
  * the four tables every growth dashboard reads,
  *
  *   growth     — new/retained/resurrected/churned per day
  *                ([[EventAnalytics.growthAccounting]])
  *   engagement — DAU/WAU/MAU + stickiness per day
  *                ([[EventAnalytics.activeUserRatios]])
  *   funnel     — per-stage conversion counts
  *                ([[EventAnalytics.funnelStages]])
  *   sessions   — per-session rollup ([[EventAnalytics.sessionize]])
  *
  * each written day-partitioned (the funnel unpartitioned — it is
  * stage-count-sized) under `martDir/<table>` with DYNAMIC partition
  * overwrite: re-running a day's load replaces exactly that day's
  * partitions and nothing else, so the job is idempotent under replay
  * and backfill-safe under day filters — the same landing contract as
  * the CDC store jobs.
  *
  * Scale shape: every table derives from operators already audited for
  * the 100 TB posture (per-user windows, coverage expansion, shrinking
  * funnel frames); the job adds only the partitioned writes.
  */
object EngagementMartJob {

  case class Config(
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      funnelStages: Seq[String] = Seq("view", "click", "purchase"),
      funnelGapSec: Long = 172800L,
      sessionGapSec: Long = 21600L,
      wauDays: Int = 7,
      mauDays: Int = 30)

  /** Compute all four mart frames (lazy; nothing runs until written or
    * collected). Exposed for tests and ad-hoc reads. */
  def frames(events: DataFrame, cfg: Config = Config()
            ): Map[String, DataFrame] = Map(
    "growth" -> EventAnalytics
      .growthAccounting(events, cfg.userCol, cfg.tsCol),
    "engagement" -> EventAnalytics
      .activeUserRatios(events, cfg.userCol, cfg.tsCol,
        cfg.wauDays, cfg.mauDays),
    "funnel" -> EventAnalytics
      .funnelStages(events, cfg.userCol, cfg.typeCol, cfg.tsCol,
        cfg.funnelStages, cfg.funnelGapSec),
    "sessions" -> EventAnalytics
      .sessionize(events, cfg.userCol, cfg.tsCol, cfg.tieCol,
        cfg.sessionGapSec)
      .withColumn("day", col("start_ts").cast("date"))
  )

  /** Write the mart under `martDir`, day-partitioned where a day column
    * exists. Dynamic overwrite: replayed days replace themselves. */
  def run(events: DataFrame, martDir: String,
          cfg: Config = Config()): Unit =
    frames(events, cfg).foreach { case (name, df) =>
      val w = df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
      (if (df.columns.contains("day")) w.partitionBy("day") else w)
        .parquet(s"$martDir/$name")
    }
}
