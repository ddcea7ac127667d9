package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2.9 L5 + builder mandate).
  *
  * Media (image/audio/video) is carried as an opaque `binary` payload
  * column plus a typed metadata struct — the schema/partitioning/batching
  * side is real Spark; the actual byte decode is STUBBED deterministically
  * because this container has no image/audio codecs. The stub boundary is
  * [[decodeStub]]: swap it for a real decoder (JNI/FFI or a vectorized
  * Python `mapInPandas` worker on clusters that have one) without touching
  * the surrounding plan.
  */
object Multimodal {

  val metaType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bytes", LongType)))

  /** Attach an opaque binary payload (here: utf8 bytes of a text column —
    * the deterministic stand-in for real media bytes). */
  def withBinaryPayload(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast("binary"))

  /** Typed metadata extraction over the payload. Width/height are derived
    * from the payload hash (deterministic fake in lieu of a real header
    * parse); `bytes` is the real payload length. */
  def withMeta(df: DataFrame): DataFrame =
    df.withColumn("meta", struct(
      lit("image/stub").as("kind"),
      (pmod(xxhash64(col("payload")), lit(1920L)) + 1L).cast("int").as("width"),
      (pmod(xxhash64(col("payload"), lit(1L)), lit(1080L)) + 1L).cast("int").as("height"),
      length(col("payload")).cast("long").as("bytes")))

  /** STUB decoder: payload bytes → fixed-dim feature vector. Deterministic
    * fake (byte histogram folded to `dim` doubles, L2-normalized) standing
    * in for decode→resize→embed. Replace with the real codec here. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Double] = {
    val acc = new Array[Double](dim)
    var i = 0
    while (i < payload.length) { acc(i % dim) += (payload(i) & 0xff) / 255.0; i += 1 }
    val n = math.sqrt(acc.map(x => x * x).sum)
    if (n == 0.0) acc else acc.map(_ / n)
  }

  /** Batched per-partition decode — the `mapInPandas`-shaped integration
    * point: one decoder init per partition, rows processed in a tight
    * loop, output schema declared up front. Partition-parallel, no
    * driver-side collection. */
  def decodeFeatures(df: DataFrame, idCol: String, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder/codec init would go here (once per partition)
        it.map { case (id, payload) => (id, decodeStub(payload, dim)) }
      }
      .toDF(idCol, "feature")
  }
}
