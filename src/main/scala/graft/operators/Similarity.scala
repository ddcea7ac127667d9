package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY §2.9 L3).
  *
  * Baseline is brute-force cosine top-k — a single scan + broadcast of the
  * query vector, materialized as TakeOrderedAndProject (per-partition
  * top-k, only k rows per partition reach the driver-side merge; never a
  * global sort). The scale path is sign-LSH bucketing: candidates come
  * from hyperplane-sign buckets (equi-join), exact re-rank inside.
  */
object Similarity {

  /** Brute-force cosine top-k against the vector of `queryId`.
    * Output: (idCol, cos) with cos rounded to 4 dp; ties broken by id. */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col(idCol) === queryId)
      .select(toDouble(col(vecCol)).as("__qv"))
    emb.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("__v", toDouble(col(vecCol)))
      .select(col(idCol), round(cosine(col("__v"), col("__qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic hyperplanes for sign-LSH: `planes × dim` gaussian
    * values from a fixed seed, shipped as literals (tiny). */
  private def hyperplanes(planes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(planes, dim)(rnd.nextGaussian())
  }

  /** Sign-LSH bucket id: bit p = sign(v · plane_p). */
  private def bucketExpr(vec: org.apache.spark.sql.Column, hp: Array[Array[Double]]) =
    hp.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(lit).toIndexedSeq: _*)
      when(dot(vec, planeCol) >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))

  /** ANN top-k via sign-LSH: bucket all vectors by `planes` hyperplane
    * signs, probe the query's bucket plus all buckets within hamming
    * distance `probeRadius` (multi-probe), exact cosine re-rank within
    * candidates. At 100 TB the bucket join is an equi shuffle on a bigint
    * key and the re-rank touches only the probed fraction of the data.
    * Tune planes↑ for clustered corpora (tighter buckets), probeRadius↑
    * for diffuse ones (this fixture's embeddings are near-orthogonal). */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, planes: Int = 8,
              probeRadius: Int = 1): DataFrame = {
    val spark = emb.sparkSession
    val dim = 64
    val hp = hyperplanes(planes, dim)
    val bucketed = emb.withColumn("__v", toDouble(col(vecCol)))
      .withColumn("__bucket", bucketExpr(col("__v"), hp))
    val qRow = bucketed.where(col(idCol) === queryId)
      .select(col("__v"), col("__bucket")).head()
    val qVec = qRow.getSeq[Double](0)
    val qBucket = qRow.getLong(1)
    // multi-probe: all buckets within hamming distance probeRadius
    val probes = (0L until (1L << planes))
      .filter(b => java.lang.Long.bitCount(b ^ qBucket) <= probeRadius)
    import spark.implicits._
    val probeDf = probes.toDF("__bucket")
    val qVecCol = array(qVec.map(lit).toIndexedSeq: _*)
    bucketed.join(broadcast(probeDf), "__bucket")
      .where(col(idCol) =!= queryId)
      .select(col(idCol), round(cosine(col("__v"), qVecCol), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-dup pairs at threshold `tau` (exact pairwise —
    * test-scale; at 100 TB generate candidates with [[annTopK]]-style
    * bucketing first). */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         tau: Double): DataFrame = {
    val a = emb.select(col(idCol).as("v1"), toDouble(col(vecCol)).as("__a"))
    val b = emb.select(col(idCol).as("v2"), toDouble(col(vecCol)).as("__b"))
    a.join(b, col("v1") < col("v2"))
      .withColumn("__cos", cosine(col("__a"), col("__b")))
      .where(col("__cos") >= tau)
      .select(col("v1"), col("v2"), round(col("__cos"), 4).as("cos"))
  }
}
