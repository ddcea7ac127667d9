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

  /** Perceptual near-dup fingerprint over the opaque binary payload —
    * the pHash slot of an image-dedup pipeline (chunk-simhash stand-in
    * for a real DCT pHash, which needs a decoder this container lacks;
    * swap the chunk hash for the codec-derived bits without touching
    * the pair machinery). The payload's lowercase-hex transcription is
    * cut into `chunkBytes`-byte (2·chunkBytes hex char) chunks, each
    * chunk md5-folded to 60 bits, and the per-bit sign votes become the
    * fingerprint ([[Dedup.fingerprintFromHashes]] — the same fold as
    * token SimHash). A byte-aligned payload edit flips only the touched
    * chunks' hashes → few fingerprint bits, so hamming distance ranks
    * near-duplicate payloads; byte-identical payloads collide at hd=0.
    *
    * Hex staging makes the fingerprint byte-exact AND engine-portable:
    * hex chars are ASCII, so any engine with varchar substring + md5
    * replicates it bit-for-bit (the DuckDB oracle does) — no blob
    * functions needed. The hex column is STAGED in its own projection
    * (HOF staging audit: inlined, Catalyst re-hexes the payload once
    * per lambda). Scale shape: one explode + the keyed partial-agg
    * vote fold — same as token simhash, shuffle ∝ chunk instances.
    * Empty/null payloads carry no chunks and are absent.
    * Output: (idCol, phash). */
  def mediaPHash(df: DataFrame, idCol: String, chunkBytes: Int = 32): DataFrame = {
    require(chunkBytes > 0, "mediaPHash needs chunkBytes > 0")
    val w = chunkBytes * 2
    val hx = col("__hx")
    val nChunks = ceil(length(hx) / lit(w.toDouble)).cast("int")
    graft.operators.Dedup.fingerprintFromHashes(
      df.select(col(idCol), lower(hex(col("payload"))).as("__hx"))
        .select(col(idCol), hx,
          explode(when(length(hx) > 0, sequence(lit(0), nChunks - 1))
            .otherwise(array().cast(ArrayType(IntegerType)))).as("__i"))
        .select(col(idCol),
          conv(substring(md5(hx.substr(col("__i") * w + 1, lit(w))), 1, 15),
            16, 10).cast("long").as("__h")),
      idCol)
      .withColumnRenamed("simhash", "phash")
  }

  /** Multimodal near-dup pairs: [[mediaPHash]] fingerprints into the
    * shared Manku multi-index front ([[Dedup.hammingCandidatePairs]] —
    * exact at maxHamming < blocks by pigeonhole, equi-join candidate
    * generation, never all-pairs). The image/audio analog of the text
    * dedup family: near-dup payload detection at corpus scale without
    * decoding a single byte. Output: (d1, d2, hd), d1 < d2. */
  def mediaNearDupPairs(df: DataFrame, idCol: String, chunkBytes: Int = 32,
                        maxHamming: Int = 3, blocks: Int = 6): DataFrame =
    graft.operators.Dedup.hammingCandidatePairs(
      mediaPHash(df, idCol, chunkBytes), idCol, "phash", maxHamming, blocks)
      .where(col("hd") <= maxHamming)

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
