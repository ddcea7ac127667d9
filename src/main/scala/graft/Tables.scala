package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated fixture tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` with the schema carried by the
  * files (fixed, never inferred from data — mirrors the reference's
  * compile-time schema posture, HiveOrcSink.java:309-314). Column pruning
  * and predicate pushdown reach the scan because every query is a
  * declarative plan over these frames.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts has shipped in two physical encodings across fixture
    * generations: parquet TIMESTAMP(NANOS) (read as INT64 via the
    * nanosAsLong pin in [[Engine.configure]] — session conf, not a loader
    * side effect, to avoid racing concurrent suites) and plain
    * timestamp[us]. The loader adapts on the analyzed schema: a LongType
    * `ts` is nanos and gets truncated to micros — the same truncation every
    * micros-precision engine (incl. the DuckDB oracle) applies to ns data
    * (integer DIV: ns exceeds double's 2^53) — while a timestamp `ts`
    * passes through (NTZ is cast to session-tz TIMESTAMP; the session is
    * pinned UTC in [[Engine.configure]], so the cast is value-identity and
    * keeps every downstream query on one timestamp flavor). Mirrors the
    * reference's reflection-derived per-run schema posture
    * (HiveOrcSink.java:309-314) rather than hard-coding one encoding. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other (expected INT64 nanos or timestamp)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
