package graft.operators

import graft.expressions.VectorExpressions.fastDot
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Codegen'd cosine: same left-to-right accumulation as the
    * higher-order formulation in [[graft.functions.VectorFunctions]], so
    * results are bit-identical — just compiled to a primitive loop. */
  private def fastCosine(a: Column, b: Column): Column =
    fastDot(a, b) / (sqrt(fastDot(a, a)) * sqrt(fastDot(b, b)))

  /** Brute-force cosine top-k against the vector of `queryId`.
    * Output: (idCol, cos) with cos rounded to 4 dp; ties broken by id. */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col(idCol) === queryId)
      .select(toDouble(col(vecCol)).as("__qv"))
    emb.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("__v", toDouble(col(vecCol)))
      // "+ 0.0" folds IEEE -0.0 (from rounding tiny negative cosines) to
      // +0.0 so cross-engine comparisons agree
      .select(col(idCol),
        (round(fastCosine(col("__v"), col("__qv")), 4) + 0.0).as("cos"))
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
    // dimension comes from the query vector itself (a mismatched
    // hyperplane length would null out every bucket via zip_with padding)
    val qVec = emb.where(col(idCol) === queryId)
      .select(toDouble(col(vecCol))).head().getSeq[Double](0)
    val dim = qVec.length
    val hp = hyperplanes(planes, dim)
    val bucketed = emb.withColumn("__v", toDouble(col(vecCol)))
      .withColumn("__bucket", bucketExpr(col("__v"), hp))
    val qBucket = bucketed.where(col(idCol) === queryId)
      .select(col("__bucket")).head().getLong(0)
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

  /** IVF (inverted-file) ANN top-k: partition vectors into `nCells`
    * Voronoi cells around centroids learned with a few Lloyd iterations,
    * then scan only the `nProbe` cells nearest the query. Complements
    * sign-LSH: IVF adapts to clustered corpora (centroids follow the
    * data), LSH needs no training. Training here is DataFrame-native and
    * seeded: centroids init from evenly-spaced sampled rows, each
    * iteration is one broadcast-join + groupBy (at 100 TB you train on a
    * sample and broadcast the tiny centroid table, exactly as below).
    * Final scan is an equi semi-join on cell id + codegen'd cosine +
    * TakeOrderedAndProject. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, nCells: Int = 16, nProbe: Int = 4,
              lloydIters: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col(idCol).cast("long"), toDouble(col(vecCol)))
      .as[(Long, Array[Double])]
    // deterministic init: rank rows by xxhash64(id), take nCells
    val seedRows = vecs.toDF("id", "v")
      .withColumn("__r", xxhash64(col("id")))
      .orderBy("__r").limit(nCells)
      .select("v").as[Array[Double]].collect()
    var centroids: Array[Array[Double]] = seedRows
    def nearestCell(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        val cv = cs(c)
        while (i < v.length) { val t = v(i) - cv(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    // Lloyd iterations: assign (map over broadcast centroids) + re-mean
    for (_ <- 0 until lloydIters) {
      val cs = centroids
      val bc = spark.sparkContext.broadcast(cs)
      val means = vecs.map { case (_, v) => (nearestCell(v, bc.value), v) }
        .groupByKey(_._1)
        .mapGroups { (cell: Int, it: Iterator[(Int, Array[Double])]) =>
          val acc = new Array[Double](cs(0).length)
          var n = 0L
          it.foreach { case (_, v) =>
            var i = 0; while (i < v.length) { acc(i) += v(i); i += 1 }; n += 1
          }
          (cell, acc.map(_ / n))
        }.collect().toMap
      centroids = Array.tabulate(cs.length)(c => means.getOrElse(c, cs(c)))
    }
    val finalCs = centroids
    val bc = spark.sparkContext.broadcast(finalCs)
    val assigned = vecs.map { case (id, v) => (id, v, nearestCell(v, bc.value)) }
      .toDF(idCol, "__v", "__cell")
    val qVec = assigned.where(col(idCol) === queryId)
      .select("__v").as[Array[Double]].head()
    // probe the nProbe cells whose centroids are nearest the query
    val probeCells = finalCs.zipWithIndex
      .map { case (cv, i) =>
        var d = 0.0; var j = 0
        while (j < qVec.length) { val t = qVec(j) - cv(j); d += t * t; j += 1 }
        (i, d)
      }
      .sortBy(_._2).take(nProbe).map(_._1).toSeq
    val qVecCol = array(qVec.map(lit).toIndexedSeq: _*)
    assigned.where(col("__cell").isin(probeCells: _*) && col(idCol) =!= queryId)
      .select(col(idCol),
        (round(cosine(col("__v"), qVecCol), 4) + 0.0).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-dup pairs at threshold `tau`, exact, via block
    * matrix self-multiply: vectors are L2-normalized once, grouped into
    * blocks of `blockSize`, block *pairs* are joined (each block ships
    * once per pair, not once per row pair), and the dot products run as
    * tight primitive loops inside `flatMap`. A naive pair join would
    * materialize O(N²) rows each carrying two vectors — ~1 KB per pair —
    * which is the difference between 117 s and <2 s at 5k vectors, and
    * between impossible and routine at 100 TB. Norm/threshold pruning and
    * LSH candidate generation slot in front unchanged when tau is high. */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         tau: Double, blockSize: Int = 1024): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val normed = emb.select(col(idCol).cast("long"), toDouble(col(vecCol)))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val n = math.sqrt(v.map(x => x * x).sum)
        (id, if (n == 0.0) v else v.map(_ / n))
      }
    val nBlocks = math.max(1L,
      (emb.count() + blockSize - 1) / blockSize).toInt
    val blocks = normed
      .groupByKey { case (id, _) => (math.abs(id) % nBlocks).toInt }
      .mapGroups((bid: Int, it: Iterator[(Long, Array[Double])]) => (bid, it.toArray))
    val pairs = blocks.as("a")
      .joinWith(blocks.as("b"), $"a._1" <= $"b._1")
      .flatMap { case ((ba, va), (bb, vb)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < va.length) {
          val (ia, xa) = va(i)
          var j = if (ba == bb) i + 1 else 0
          while (j < vb.length) {
            val (ib, xb) = vb(j)
            if (ia != ib) {
              var dot = 0.0
              var k = 0
              while (k < xa.length) { dot += xa(k) * xb(k); k += 1 }
              if (dot >= tau) {
                out += (if (ia < ib) (ia, ib, dot) else (ib, ia, dot))
              }
            }
            j += 1
          }
          i += 1
        }
        out
      }
    pairs.toDF("v1", "v2", "__cos")
      .select(col("v1"), col("v2"), round(col("__cos"), 4).as("cos"))
  }
}
