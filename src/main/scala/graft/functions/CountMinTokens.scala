package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch over a string column as a typed [[Aggregator]] — the
  * fixed-size frequency sketch a streaming or multi-tenant pipeline
  * keeps where an exact token groupBy would hold the whole vocabulary
  * in state. Completes the engine's sketch family next to HLL
  * (approx_count_distinct, A3) and quantile sketches (percentile_approx,
  * A7): same class of operator, same verification style (error-bound
  * property test; no portable SQL oracle for the seeded hash — the A3
  * exclusion rule).
  *
  * Guarantees (standard CMS, seeded → deterministic): estimate ≥ true
  * count always (only over-counts), and estimate ≤ true + eps·N with
  * probability ≥ confidence, N = total items added. Merge is
  * cell-wise + associative, so Spark's partial aggregation distributes
  * it with no extra shuffle — each partition folds locally, the driver
  * merges d·w longs per partition, independent of vocabulary size.
  */
class CountMinAgg(eps: Double = 0.001, confidence: Double = 0.99,
                  seed: Int = 42)
  extends Aggregator[String, CountMinSketch, CountMinSketch] {
  override def zero: CountMinSketch = CountMinSketch.create(eps, confidence, seed)
  override def reduce(b: CountMinSketch, a: String): CountMinSketch = {
    if (a != null) b.addString(a)
    b
  }
  override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch = {
    b1.mergeInPlace(b2); b1
  }
  override def finish(r: CountMinSketch): CountMinSketch = r
  override def bufferEncoder: Encoder[CountMinSketch] = Encoders.kryo[CountMinSketch]
  override def outputEncoder: Encoder[CountMinSketch] = Encoders.kryo[CountMinSketch]
}

object CountMinTokens {

  /** Build a CMS over every whitespace token of `textCol` (one explode,
    * one partial-agg'd fold to a single sketch on the driver). */
  def tokenSketch(docs: DataFrame, textCol: String,
                  eps: Double = 0.001, confidence: Double = 0.99): CountMinSketch = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(split(col(textCol), " ")).as("t"))
      .as[String]
      .select(udaf(new CountMinAgg(eps, confidence)).apply(col("t")))
      .as[CountMinSketch](Encoders.kryo[CountMinSketch])
      .head()
  }
}
