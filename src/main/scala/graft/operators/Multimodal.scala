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

  /** Frame sampling over a video-shaped payload: the payload is treated
    * as contiguous `frameBytes`-sized frames and every `stride`-th full
    * frame becomes its own row (id, frame_idx, frame) — the standard
    * keyframe-extraction shape before per-frame decode/embed. Pure
    * column algebra: offsets via `sequence`, byte slices via `substr`
    * on the binary column, one explode — no UDF, no decode, so the
    * frame fan-out runs inside the scan stage at any corpus size.
    * Payloads shorter than one frame yield no rows. */
  def sampleFrames(df: DataFrame, idCol: String,
                   frameBytes: Int = 64, stride: Int = 2): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be > 0")
    val nFrames = floor(length(col("payload")) / frameBytes).cast("int")
    val idxs = when(nFrames > lit(0),
        sequence(lit(0), nFrames - 1, lit(stride)))
      .otherwise(array().cast(ArrayType(IntegerType)))
    df.select(col(idCol), col("payload"), explode(idxs).as("frame_idx"))
      .select(col(idCol), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame"))
  }

  /** STUB resize: nearest-neighbor byte subsample to exactly
    * `targetBytes` (empty stays empty) — deterministic stand-in for a
    * real image resample; swap the body for the codec call. */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] =
    if (payload.isEmpty || targetBytes <= 0) Array.emptyByteArray
    else Array.tabulate(targetBytes) { i =>
      payload(((i.toLong * payload.length) / targetBytes).toInt
        .min(payload.length - 1))
    }

  /** Batched per-partition resize — same integration shape as
    * [[decodeFeatures]] (one codec init per partition, declared output
    * schema): payload replaced by its resized bytes, meta left to the
    * caller to re-derive. */
  def resizePayloads(df: DataFrame, idCol: String, targetBytes: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // codec init would go here (once per partition)
        it.map { case (id, payload) => (id, resizeStub(payload, targetBytes)) }
      }
      .toDF(idCol, "payload")
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
