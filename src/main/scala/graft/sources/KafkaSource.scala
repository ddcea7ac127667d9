package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka ingestion surface (SURVEY §2.1 S1), mirroring the reference
  * consumer's contract (App.txt:27-37): subscribe one topic, read the
  * payload as a string, start from the earliest offset.
  *
  * The payload column produced here feeds [[CdcIngest.parse]] exactly like
  * the reference's `JsonDeserializationSchema` → map chain. No broker
  * exists in the test environment, so coverage comes from the
  * batch-equivalence path: tests replay the same payloads through
  * `MemoryStream`, which exercises everything downstream of the source
  * boundary (the SURVEY §2.8 oracle strategy).
  */
object KafkaSource {

  /** Streaming read of `topic` → single `payload` string column. */
  def stream(spark: SparkSession, bootstrap: String, topic: String,
             startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      // App.txt:31 setStartFromEarliest
      .option("startingOffsets", startingOffsets)
      .load()
      .selectExpr("CAST(value AS STRING) AS payload")

  /** Batch read of a bounded offset range (backfill path). */
  def batch(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()
      .selectExpr("CAST(value AS STRING) AS payload")
}
