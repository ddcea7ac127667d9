package graft.jobs

import graft.sources.{CdcIngest, KafkaSource, OrcTableSink}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's sample job (App.txt:26-73) end-to-end, Spark-native:
  * Kafka (or any payload stream) → lower-case JSON CDC-envelope parse →
  * typed City projection with UTC+8 date derivation → partitioned-ORC
  * warehouse table with exactly-once file visibility.
  *
  * The reference wires: FlinkKafkaConsumer011 → map(JSON → City) →
  * HiveOrcSink(warehouse, "flink_orc", batchSize, RowTimeBucketer("c_date")).
  * Here the same pipeline is three declarative stages; checkpointing
  * replaces the sink's hand-rolled tmp→pending→final state machine
  * (HiveOrcSink.java:321-345,448-455) with the `_spark_metadata` commit
  * log, and recovery replays from source offsets instead of an in-heap
  * row buffer (HiveOrcSink.java:271).
  */
object CdcToOrcJob {

  /** Wire the full job from a Kafka topic. */
  def fromKafka(spark: SparkSession, bootstrap: String, topic: String,
                warehouse: String, table: String, checkpoint: String,
                trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    run(KafkaSource.stream(spark, bootstrap, topic),
      warehouse, table, checkpoint, trigger)

  /** Wire the job from any streaming frame with a `payload` string column
    * (MemoryStream in tests — the S1 batch-equivalence seam). */
  def run(payloads: DataFrame, warehouse: String, table: String,
          checkpoint: String,
          trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    val cities = CdcIngest.parse(payloads, "payload")
    OrcTableSink.streamWriter(cities, warehouse, table, "c_date", checkpoint)
      .trigger(trigger)
      .start()
  }
}
