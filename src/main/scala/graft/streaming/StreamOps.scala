package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed/streaming transforms (SURVEY §2.8 T2-T7).
  *
  * Each transform is written against a plain DataFrame so the *same plan*
  * runs in batch (the Q37-39 oracle projections) and under Structured
  * Streaming via `readStream` (the batch-equivalence tests assert the two
  * agree — Structured Streaming's correctness contract). Watermarking is
  * applied by the streaming callers; it is a no-op on batch frames.
  */
object StreamOps {

  /** T2: tumbling event-time window aggregate → (w_start, c, s). */
  def tumblingCounts(events: DataFrame, width: String = "10 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"))
      .agg(count(lit(1)).as("c"), round(sum(col("value")), 4).as("s"))
      .select(col("w.start").as("w_start"), col("c"), col("s"))

  /** T3: sliding window counts → (w_start, c). */
  def slidingCounts(events: DataFrame, width: String = "10 minutes",
                    slide: String = "5 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width, slide).as("w"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("w_start"), col("c"))

  /** T4: session windows (gap-based) → (user_id, sid, c, v) with sid a
    * per-user 1-based session index ordered by session start. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    val s = events.groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("c"), round(sum(col("value")), 4).as("v"))
    s.withColumn("sid",
        row_number().over(Window.partitionBy("user_id").orderBy(col("w.start"))).cast("long"))
      .select(col("user_id"), col("sid"), col("c"), col("v"))
  }

  /** T6: dedup by id; on streams pair with `withWatermark` for state TTL. */
  def dedupByKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** T7: per-key running aggregate (update-mode friendly). */
  def runningTotals(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
}
