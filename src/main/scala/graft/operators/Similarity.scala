package graft.operators

import graft.expressions.VectorExpressions.fastDot
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Reciprocal-rank fusion of two ranked candidate lists — the
    * standard hybrid-retrieval combiner (Cormack et al., SIGIR'09):
    * score(d) = Σ_lists 1/(c + rank_list(d)), a doc missing from a list
    * contributes 0. Rank-based, so the lexical and semantic scores
    * need no calibration against each other — exactly why RRF is the
    * default fusion in hybrid search.
    *
    * Deterministic: ranks are integers, each reciprocal is one exact
    * double division, and the two-term sum has a fixed written order;
    * ties after rounding break on the id. Both inputs are top-k lists
    * (k rows), so the full-outer join and the final window cost
    * nothing at any corpus scale — scale lives in the rankers. */
  def rrfFuse(a: DataFrame, idColA: String, rankColA: String,
              b: DataFrame, idColB: String, rankColB: String,
              k: Int, c: Int = 60): DataFrame = {
    require(k > 0 && c >= 0, "rrfFuse needs k > 0 and c >= 0")
    val left = a.select(col(idColA).as("id"), col(rankColA).cast("long").as("__ra"))
    val right = b.select(col(idColB).as("id"), col(rankColB).cast("long").as("__rb"))
    left.join(right, Seq("id"), "full_outer")
      .select(col("id"),
        round(
          coalesce(lit(1.0) / (lit(c.toDouble) + col("__ra").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c.toDouble) + col("__rb").cast("double")), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf").desc, col("id"))).cast("long"))
  }

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

  /** Int8 scalar quantization of an embedding column — the 4×–8×
    * storage/bandwidth cut every 100 TB embedding table takes before
    * anything else (a float32 corpus that doesn't fit executor memory
    * often does at int8, and ANN candidate scoring reads 4× fewer
    * bytes). Symmetric per-vector scheme: scale = max|v|/127,
    * q_i = round(v_i/scale) ∈ [−127, 127] — the zero vector keeps
    * scale 0 and an all-zero code. This is the ARTIFACT producer
    * behind the x_embed_quant QA rollup: that entry measures the
    * scheme's error bound; this one emits the typed (qvec, scale)
    * table a serving path actually stores, plus the reconstruct/audit
    * halves that make quantized retrieval (x_int8_topk) runnable.
    *
    * Pure per-row projection (transform + an order-free max fold) —
    * zero shuffle, codegen-eligible, linear at any corpus size.
    * Output: (idCol, qvec array<tinyint>, scale). Reconstruct with
    * [[int8Reconstruct]]; audit the fidelity with [[int8QuantAudit]]
    * BEFORE trusting quantized scores for a recall-sensitive cut.
    *
    * Precondition (here and in [[int8QuantAudit]]): every embedding is
    * NON-EMPTY — an embedding table has one fixed dim by construction.
    * A zero-length array would quantize to (empty qvec, scale 0) here
    * while SQL engines fold an empty-list max to NULL (the DuckDB
    * oracle would emit NULL rows) — filter `size(vecCol) > 0` upstream
    * before pointing either operator at a column that can be empty. */
  def quantizeInt8(emb: DataFrame, idCol: String,
                   vecCol: String): DataFrame = {
    Joins.requireFreeColumns("quantizeInt8", Seq(idCol), "qvec", "scale")
    val v = graft.functions.VectorFunctions.toDouble(col(vecCol))
    emb.select(col(idCol),
        v.as("__v"),
        (aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x))) / 127.0)
          .as("scale"))
      .select(col(idCol),
        transform(col("__v"), x =>
          when(col("scale") === 0.0, lit(0.0))
            .otherwise(round(x / col("scale"), 0)).cast("tinyint"))
          .as("qvec"),
        col("scale"))
  }

  /** The dequantized vector (array<double>) for a [[quantizeInt8]]
    * row: q_i · scale. */
  def int8Reconstruct(qvec: Column, scale: Column): Column =
    transform(qvec, q => q.cast("double") * scale)

  /** Fidelity audit of [[quantizeInt8]] — the numbers that decide
    * whether quantized scores can drive a cut: per vector, the scale,
    * the worst per-dimension reconstruction error (bounded by scale/2
    * by construction — asserted in the suite, reported here), and the
    * cosine between the vector and its reconstruction (the score a
    * quantized retrieval actually computes). Same float contract as
    * every cosine entry: sequential-order dot folds, round 4, −0.0
    * folded.
    *
    * Scale shape: a pure projection — the audit reads the corpus once,
    * shuffles nothing. Output: (idCol, scale, max_abs_err, cos_fid);
    * cos_fid NULL for the zero vector. */
  def int8QuantAudit(emb: DataFrame, idCol: String, vecCol: String,
                     roundDp: Int = 6): DataFrame = {
    Joins.requireFreeColumns("int8QuantAudit", Seq(idCol),
      "scale", "max_abs_err", "cos_fid")
    val v = graft.functions.VectorFunctions.toDouble(col(vecCol))
    val s = col("__s")
    val recon = transform(col("__v"), x =>
      when(s === 0.0, lit(0.0)).otherwise(round(x / s, 0) * s))
    emb.select(col(idCol), v.as("__v"),
        (aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x))) / 127.0)
          .as("__s"))
      .select(col(idCol), col("__v"), s, recon.as("__r"))
      .select(col(idCol),
        round(s, roundDp).as("scale"),
        round(aggregate(
          zip_with(col("__v"), col("__r"), (a, b) => abs(a - b)),
          lit(0.0), (acc, e) => greatest(acc, e)), roundDp)
          .as("max_abs_err"),
        when(s > 0.0,
          round(fastDot(col("__v"), col("__r")) /
            (sqrt(fastDot(col("__v"), col("__v"))) *
              sqrt(fastDot(col("__r"), col("__r")))), 4) + 0.0)
          .as("cos_fid"))
  }

  /** L3 batch form: top-k cosine neighbors for EVERY query vector — the
    * k-NN join a training pipeline runs for eval-set retrieval, label
    * propagation, or embedding-dedup sweeps ([[cosineTopK]] is its
    * single-query special case). Contract: `queries` is the SMALL side
    * (an eval/probe set); it broadcasts, so the corpus is read once with
    * no shuffle of the raw vectors.
    *
    * Skew posture — the part a naive window gets wrong: one window over
    * `partitionBy(qid)` funnels each query's FULL score set (the whole
    * corpus) through one task. Instead, two-phase top-k: phase 1 takes
    * each query's top-k within each corpus partition (groups keyed by
    * (qid, partition id) — bounded by the scan's partition size), phase
    * 2 reduces the surviving |queries| × partitions × k rows. Same
    * result by dominance: every global top-k row is in its partition's
    * top-k under the same (cos desc, id) order.
    *
    * Output: (qid, vec_id, cos, rk), rk = 1..k, ties broken by id;
    * self-matches (qid == vec_id) excluded. */
  def knnJoin(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"),
      toDouble(col(vecCol)).as("__qv"))
    // corpus-side scan fan-out: the crossJoin-score stage is pure per-row
    // compute (|corpus| × |queries| cosines) and inherits the corpus
    // scan's partitioning — an under-split scan serializes it
    val c = Joins.fanOutForCompute(corpus.select(col(idCol).as("vec_id"),
      toDouble(col(vecCol)).as("__v")), Seq("vec_id"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (round(fastCosine(col("__v"), col("__qv")), 4) + 0.0).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Contrastive hard-negative mining: for each query row, the top-k
    * most-cosine-similar corpus rows carrying a DIFFERENT label — the
    * "looks like the positive but isn't" examples a contrastive /
    * retrieval trainer wants next to each anchor (the in-batch-random
    * alternative is mostly easy negatives). Same contract and scale
    * shape as [[knnJoin]] — queries are the SMALL broadcast side, the
    * corpus streams through once, two-phase top-k so no task holds a
    * query's full score set — plus one codegen'd label predicate before
    * any scoring. Same-id rows are excluded independently of label.
    * Output: (qid, vec_id, cos, rk), rk = 1..k over rounded cosine,
    * ties broken by id. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(labelCol).as("__ql"),
      toDouble(col(vecCol)).as("__qv"))
    // same corpus-side fan-out rationale as [[knnJoin]]
    val c = Joins.fanOutForCompute(
      corpus.select(col(idCol).as("vec_id"), col(labelCol).as("__cl"),
        toDouble(col(vecCol)).as("__v")), Seq("vec_id"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid") && col("__cl") =!= col("__ql"))
      .select(col("qid"), col("vec_id"),
        (round(fastCosine(col("__v"), col("__qv")), 4) + 0.0).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Per-label centroid quality report — the embedding-space cluster
    * health check (is this label a coherent region or a grab-bag?):
    * for every label, its vector count, the L2 norm of its centroid
    * (→ 0 when members cancel out), and the mean/min cosine of members
    * to their own centroid (cohesion and the worst member).
    *
    * Determinism across engines, the whole design: centroid components
    * are PICO-FIXED-POINT sums — each member component quantizes to a
    * round(x·1e12) long BEFORE the per-(label, dim) sum, so the
    * reduction is exact integer addition in any order (the tokenDrift
    * contract); the centroid assembles by dim order, cosines fold that
    * array left-to-right (one exact expression per member), and the
    * per-label cosine mean is AGAIN a fixed-point sum of round(cos·1e4)
    * longs. No float ever reduces in shuffle order.
    *
    * Scale shape: one posexplode (rows × dim — the same expansion the
    * embedding scan already paid), ONE map-side-combining groupBy per
    * (label, dim), a dim-bounded per-label array assembly, a broadcast
    * centroid join back over the members, and a final per-label agg.
    *
    * Output: (label, n, centroid_norm 6 dp, avg_cos 6 dp,
    * min_cos 4 dp). */
  def labelCentroidStats(emb: DataFrame, labelCol: String,
                         vecCol: String): DataFrame = {
    Joins.requireFreeColumns("labelCentroidStats", Seq(labelCol),
      "n", "centroid_norm", "avg_cos", "min_cos", "__d", "__v", "__s",
      "__c", "__cv", "__cos")
    val comp = emb
      .select(col(labelCol), posexplode(toDouble(col(vecCol)))
        .as(Seq("__d", "__v")))
      .groupBy(col(labelCol), col("__d"))
      .agg(sum(round(col("__v") * 1e12, 0).cast("long")).as("__s"),
        count(lit(1)).as("n"))
    val cent = comp
      .groupBy(col(labelCol))
      .agg(max("n").as("n"),
        transform(array_sort(collect_list(struct(col("__d"), col("__s")))),
          e => e("__s").cast("double") / 1e12).as("__cs"))
      .select(col(labelCol), col("n"),
        transform(col("__cs"), v => v / col("n")).as("__c"))
      .localCheckpoint() // |labels| rows; probe side of the member join
    // a zero-norm centroid (members cancel exactly) OR a zero-norm
    // member vector yields a NULL cosine, not NaN — NULL is what both
    // engines' sum/min then ignore identically (a NaN here would cast
    // to 0L on the Spark side and silently count as cos = 0.0)
    val withCos = emb
      .select(col(labelCol), toDouble(col(vecCol)).as("__cv"))
      .join(broadcast(cent), Seq(labelCol))
      .select(col(labelCol), col("n"), col("__c"),
        when(fastDot(col("__c"), col("__c")) > 0.0 &&
            fastDot(col("__cv"), col("__cv")) > 0.0,
          round(fastCosine(col("__cv"), col("__c")), 4) + 0.0).as("__cos"))
    withCos
      .groupBy(col(labelCol))
      .agg(max("n").as("n"),
        round(sqrt(first(fastDot(col("__c"), col("__c")))), 6)
          .as("centroid_norm"),
        round(sum(round(col("__cos") * 1e4, 0).cast("long"))
          .cast("double") / 1e4 / max("n"), 6).as("avg_cos"),
        min("__cos").as("min_cos"))
  }

  /** Mutual nearest neighbors: unordered pairs {a, b} where b is in
    * a's top-k AND a is in b's top-k — the reciprocity filter that
    * turns a k-NN graph into high-precision alignment/dedup candidates
    * (one-directional neighbors are dominated by hubs; mutual ones are
    * the classic translation-pair / near-dup signal).
    *
    * `mutualPairs` is the general form over ANY (qid, vec_id, cos)
    * neighbor frame — exact [[knnJoin]] output at probe scale, or an
    * ANN front ([[annTopK]]/IVF) at corpus scale, where the
    * reciprocity join stays ∝ k·|corpus| either way (one self
    * equi-join of the neighbor edges on the reversed pair). The
    * convenience wrapper runs the exact knn first and inherits its
    * small-side contract.
    *
    * Output: (id_a, id_b, cos) with id_a < id_b, cos = the a→b score
    * (symmetric metric ⇒ equal to b→a's). */
  def mutualPairs(knn: DataFrame): DataFrame = {
    val rev = knn.select(col("qid").as("__rq"), col("vec_id").as("__rv"))
    knn.where(col("qid") < col("vec_id"))
      .join(rev, col("qid") === col("__rv") && col("vec_id") === col("__rq"),
        "left_semi")
      .select(col("qid").as("id_a"), col("vec_id").as("id_b"), col("cos"))
  }

  /** Exact MNN over an embedding table — [[mutualPairs]] over
    * [[knnJoin]](emb, emb). Probe-set-sized inputs only (the knn is
    * brute-force); feed ANN output to [[mutualPairs]] at corpus
    * scale. */
  def mutualNearestNeighbors(emb: DataFrame, idCol: String,
                             vecCol: String, k: Int): DataFrame =
    // no free-column guard: knnJoin projects (qid, vec_id, cos) fresh,
    // so input names (incl. an id literally called vec_id) never leak
    mutualPairs(knnJoin(emb, emb, idCol, vecCol, k).localCheckpoint())

  /** Shared two-phase top-k tail over (qid, vec_id, cos) rows: phase 1
    * prunes to k within each (qid, upstream partition), phase 2 reduces
    * the survivors — no task ever holds one query's full score set. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val byScore = Seq(col("cos").desc, col("vec_id").asc)
    val local = Window.partitionBy("qid", "__p").orderBy(byScore: _*)
    val global = Window.partitionBy("qid").orderBy(byScore: _*)
    scored.withColumn("__p", spark_partition_id())
      .withColumn("__lr", row_number().over(local)).where(col("__lr") <= k)
      .withColumn("rk", row_number().over(global).cast("long"))
      .where(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("cos"), col("rk"))
  }

  /** ANN k-NN join — [[knnJoin]]'s scale path when the query set itself
    * is too large to score exhaustively: both sides bucket by the same
    * seed-pinned hyperplane signs, each query row explodes into its
    * multi-probe buckets (all masks with ≤ `probeRadius` bits — a probe
    * factor of C(planes,≤r), 9 at the defaults), and candidates come
    * from an EQUI-join on the bucket id — broadcast when the expanded
    * query side is small, plain bucket-keyed shuffle otherwise (left to
    * Catalyst/AQE). Exact cosine re-rank through the same two-phase
    * top-k tail. A corpus row has exactly one bucket and probe buckets
    * are distinct per query, so no candidate dedup is needed.
    *
    * Deterministic given (planes, probeRadius) — the hyperplanes are
    * seed-pinned literals — which is what makes the x_ann_knn DuckDB
    * oracle possible (same planes embedded in SQL). Recall follows the
    * sign-LSH S-curve exactly as [[annTopK]]; output schema matches
    * [[knnJoin]].
    *
    * SIZING CONTRACT at scale: with the query side ∝ the corpus,
    * `planes` must grow as log2(corpus / targetBucket) so the expected
    * bucket size stays pinned — candidates are then ∝ rows·bucket,
    * linear (the sign-LSH analog of IVF's nCells-∝-corpus rule;
    * ScaleSmoke's x_mnn_ann_full measures exactly this). Fixed planes
    * on a growing corpus go quadratic. */
  def annKnnJoin(queries: DataFrame, corpus: DataFrame, idCol: String,
                 vecCol: String, k: Int, planes: Int = 8,
                 probeRadius: Int = 1, dim: Int = 0): DataFrame = {
    require(planes > 0 && planes <= 24,
      s"annKnnJoin supports 1..24 hyperplanes, got $planes")
    // Hyperplane construction needs the vector dimension. Callers that
    // know it pass `dim` and skip the probe; otherwise one take(1) runs
    // the query-side plan once up front (in addition to the join run).
    val vecDim = if (dim > 0) dim else {
      val first = queries.select(toDouble(col(vecCol))).take(1)
      require(first.nonEmpty,
        "annKnnJoin needs a non-empty query side to infer the vector " +
          "dimension (or pass dim explicitly)")
      first(0).getSeq[Double](0).length
    }
    val hp = hyperplanes(planes, vecDim)
    val c = corpus.select(col(idCol).as("vec_id"),
        toDouble(col(vecCol)).as("__v"))
      .withColumn("__b", bucketExpr(col("__v"), hp))
    val masks = (0L until (1L << planes))
      .filter(m => java.lang.Long.bitCount(m) <= probeRadius)
    val q = queries.select(col(idCol).as("qid"),
        toDouble(col(vecCol)).as("__qv"))
      .withColumn("__qb", bucketExpr(col("__qv"), hp))
      .withColumn("__probe", explode(array(masks.map(lit).toIndexedSeq: _*)))
      .select(col("qid"), col("__qv"),
        col("__qb").bitwiseXOR(col("__probe")).as("__pb"))
    val scored = c.join(q,
        col("__b") === col("__pb") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (round(fastCosine(col("__v"), col("__qv")), 4) + 0.0).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Semantic decontamination — flag corpus rows that are
    * embedding-space near-duplicates of a benchmark/eval set, the
    * similarity-level complement of the n-gram `decontaminate` (exact
    * phrase leaks) for paraphrased or re-templated contamination.
    *
    * Same sign-LSH front as [[annKnnJoin]] (seed-pinned hyperplanes,
    * multi-probe at `probeRadius`), flipped to aggregate per CORPUS row:
    * a corpus row is contaminated when ANY probed benchmark vector
    * scores cosine ≥ tau; output keeps its best match (highest cos,
    * smallest benchmark id on ties — deterministic) and the number of
    * probed benchmark hits. Recall follows the sign-LSH S-curve; exact
    * duplicates always share their bucket (probe 0), so verbatim
    * benchmark leakage is caught at ANY probeRadius. The same
    * planes-∝-log2(corpus/targetBucket) sizing contract as annKnnJoin
    * applies when the benchmark side grows with the corpus.
    *
    * Scale shape: one bucket-keyed equi-join (benchmark side explodes
    * ×C(planes,≤r) probes and typically BROADCASTS — eval sets are
    * small), cosine + threshold inside the join projection, one
    * map-side-combining groupBy per flagged corpus row. No windows.
    *
    * Output: (idCol, matched_id, cos, n_hits) — flagged rows only. */
  def semanticDecontam(corpus: DataFrame, benchmark: DataFrame,
                       idCol: String, vecCol: String, tau: Double,
                       planes: Int = 8, probeRadius: Int = 1,
                       dim: Int = 0): DataFrame = {
    require(planes > 0 && planes <= 24,
      s"semanticDecontam supports 1..24 hyperplanes, got $planes")
    require(tau > 0.0 && tau <= 1.0, "tau must be in (0, 1]")
    val vecDim = if (dim > 0) dim else {
      val first = benchmark.select(toDouble(col(vecCol))).take(1)
      require(first.nonEmpty,
        "semanticDecontam needs a non-empty benchmark side to infer the " +
          "vector dimension (or pass dim explicitly)")
      first(0).getSeq[Double](0).length
    }
    val hp = hyperplanes(planes, vecDim)
    val c = corpus.select(col(idCol).as("__cid"),
        toDouble(col(vecCol)).as("__v"))
      .withColumn("__b", bucketExpr(col("__v"), hp))
    val masks = (0L until (1L << planes))
      .filter(m => java.lang.Long.bitCount(m) <= probeRadius)
    val q = benchmark.select(col(idCol).as("__qid"),
        toDouble(col(vecCol)).as("__qv"))
      .withColumn("__qb", bucketExpr(col("__qv"), hp))
      .withColumn("__probe", explode(array(masks.map(lit).toIndexedSeq: _*)))
      .select(col("__qid"), col("__qv"),
        col("__qb").bitwiseXOR(col("__probe")).as("__pb"))
    c.join(q, col("__b") === col("__pb"))
      .select(col("__cid"), col("__qid"),
        (round(fastCosine(col("__v"), col("__qv")), 4) + 0.0).as("__cos"))
      .where(col("__cos") >= tau)
      .groupBy(col("__cid").as(idCol))
      .agg(max_by(col("__qid"), struct(col("__cos"), (-col("__qid")).as("__nq")))
          .as("matched_id"),
        max(col("__cos")).as("cos"),
        count(lit(1)).as("n_hits"))
  }

  /** PCA moments, covariance, and components — the deterministic
    * pipeline behind [[pcaProject]]:
    *
    * 1. EXACT moment sums: per-dim sums and upper-triangle cross
    *    sums, values quantized to micro-units BEFORE aggregation and
    *    products summed as decimals (128-bit-exact at any corpus
    *    size) — so the covariance is a function of the corpus, never
    *    of shuffle arrival order. All d + d(d+1)/2 sums are columns
    *    of ONE no-grouping aggregation (no row fan-out at all): the
    *    map side folds each row into a single flat buffer and the
    *    shuffle is one 1-row frame however large the corpus.
    * 2. Driver covariance (d ≤ `maxDim`, require'd loud — d² doubles
    *    is the one deliberate driver step, the ivfTrain posture).
    * 3. Cyclic Jacobi eigensolver — fixed sweep cap, deterministic
    *    rotation order; eigenpairs sorted by (eigenvalue desc, index)
    *    and each vector sign-canonicalized (its largest-|component|
    *    entry positive, first index on ties), so the component basis
    *    is reproducible bit-for-bit given the corpus.
    *
    * Returns (mean, components k×d as rows, eigenvalues k). Exposed
    * `private[graft]` so the dump-time oracle can embed the identical
    * literals. */
  private[graft] def pcaComponents(emb: DataFrame, vecCol: String,
                                   k: Int, maxDim: Int = 128)
      : (Array[Double], Array[Array[Double]], Array[Double]) = {
    val xe = emb.select(toDouble(col(vecCol)).as("__x"))
      .where(col("__x").isNotNull)
    val first = xe.take(1)
    require(first.nonEmpty, "pcaComponents needs a non-empty corpus")
    val d = first(0).getSeq[Double](0).length
    require(d >= 1 && d <= maxDim,
      s"pcaComponents supports 1..$maxDim dims, got $d (the d x d " +
        "covariance is a deliberate driver step; raise maxDim knowingly)")
    require(k >= 1 && k <= d, s"pcaComponents needs 1 <= k <= $d")
    // ONE exact-integer fold pass (the spark.ml RowMatrix posture,
    // measured against the alternatives — see BASELINE.md): each
    // partition folds its rows into a single flat moment accumulator
    // (d mean sums + d(d+1)/2 upper-triangle product sums, 128-bit
    // exact via long fast path + BigInteger overflow spill), then a
    // depth-2 treeAggregate merges ≤ √P partials per reducer and the
    // driver receives ONE partial — no row fan-out, no d²-row
    // shuffle, no 2000-expression plan. Quantization stays on the
    // SQL side (the same round(x*1e6) micro-unit transform as every
    // fixed-point operator), so the covariance — and the component
    // literals the dump-time oracle embeds — are bit-identical to
    // the previous forms: integer sums are order-independent.
    import emb.sparkSession.implicits._
    val xq = xe.select(transform(col("__x"),
      x => round(x * 1e6, 0).cast("long")).as("__q"))
    val merged = xq.as[Array[Long]].rdd
      .treeAggregate(new ExactMoments(d))(
        (acc, q) => acc.add(q), (a, b) => a.merge(b), depth = 2)
    val n = merged.n
    require(n > 0, "pcaComponents needs a non-empty corpus")
    val mean = Array.tabulate(d)(i =>
      merged.cell(i).doubleValue() / 1e6 / n)
    val cov = Array.ofDim[Double](d, d)
    var pc = d
    var ii = 0
    while (ii < d) {
      var jj = ii
      while (jj < d) {
        val pq = merged.cell(pc).doubleValue() / 1e12 / n
        val c = pq - mean(ii) * mean(jj)
        cov(ii)(jj) = c; cov(jj)(ii) = c
        pc += 1; jj += 1
      }
      ii += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = (0 until d).sortBy(i => (-evals(i), i)).take(k)
    val comps = order.map { ci =>
      val vec = Array.tabulate(d)(r => evecs(r)(ci))
      // sign convention: the largest-|component| entry positive
      var best = 0
      var i = 1
      while (i < d) {
        if (math.abs(vec(i)) > math.abs(vec(best))) best = i
        i += 1
      }
      if (vec(best) < 0.0) vec.map(x => -x) else vec
    }.toArray
    (mean, comps, order.map(evals).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — fixed
    * sweep order and cap, pure JVM doubles: identical input bits give
    * identical eigenpairs on every run, which is what lets the oracle
    * dump and the runtime query derive the same basis independently. */
  private def jacobiEigen(covIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = covIn.length
    val a = Array.tabulate(d, d)((i, j) => covIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0; var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 64 && off() > 1e-18) {
      var p = 0
      while (p < d - 1) {
        var qi = p + 1
        while (qi < d) {
          val apq = a(p)(qi)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(qi)(qi) - a(p)(p)) / (2.0 * apq)
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var kk = 0
            while (kk < d) {
              val akp = a(kk)(p); val akq = a(kk)(qi)
              a(kk)(p) = c * akp - sn * akq
              a(kk)(qi) = sn * akp + c * akq
              kk += 1
            }
            kk = 0
            while (kk < d) {
              val apk = a(p)(kk); val aqk = a(qi)(kk)
              a(p)(kk) = c * apk - sn * aqk
              a(qi)(kk) = sn * apk + c * aqk
              kk += 1
            }
            kk = 0
            while (kk < d) {
              val vkp = v(kk)(p); val vkq = v(kk)(qi)
              v(kk)(p) = c * vkp - sn * vkq
              v(kk)(qi) = sn * vkp + c * vkq
              kk += 1
            }
          }
          qi += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** PCA projection onto the top-k principal components — the
    * dimensionality-reduction / whitening front every embedding
    * pipeline runs before clustering or visualization. Components come
    * from [[pcaComponents]] (exact integer moments → driver Jacobi);
    * the projection itself is pc_j = x·v_j − μ·v_j with μ·v_j folded
    * into one scalar literal, so the per-row work is ONE codegen'd dot
    * product per component over the raw scan — no centering pass, no
    * shuffle beyond the d²-bounded stats.
    *
    * Output: (idCol, pc1..pck) rounded to 4 dp. */
  def pcaProject(emb: DataFrame, idCol: String, vecCol: String,
                 k: Int, maxDim: Int = 128): DataFrame = {
    val (mean, comps, _) = pcaComponents(emb, vecCol, k, maxDim)
    val outs = comps.zipWithIndex.map { case (vec, j) =>
      val vLit = array(vec.map(lit).toIndexedSeq: _*)
      val muDotV = mean.zip(vec).foldLeft(0.0) { case (acc, (m, c)) =>
        acc + m * c
      }
      (round(fastDot(toDouble(col(vecCol)), vLit) - lit(muDotV), 4) + 0.0)
        .as(s"pc${j + 1}")
    }
    emb.select((col(idCol) +: outs.toIndexedSeq): _*)
  }

  /** Deterministic hyperplanes for sign-LSH: `planes × dim` gaussian
    * values from a fixed seed, shipped as literals (tiny). Visible to
    * [[graft.SparkEntry]] so the DuckDB oracle SQL can embed the exact
    * same planes as literals and replicate the bucketing. */
  private[graft] def hyperplanes(planes: Int, dim: Int): Array[Array[Double]] = {
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
    // probe enumeration below iterates 1L << planes on the driver; 2^24
    // (~17M cheap iterations) is the sane ceiling — beyond that the caller
    // wants a different probing scheme, not a bigger loop
    require(planes > 0 && planes <= 24,
      s"annTopK supports 1..24 hyperplanes, got $planes")
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
      // "+ 0.0" folds IEEE -0.0 after rounding (see cosineTopK)
      .select(col(idCol), (round(cosine(col("__v"), qVecCol), 4) + 0.0).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) ANN top-k: partition vectors into `nCells`
    * Voronoi cells around centroids learned with a few Lloyd iterations,
    * then scan only the `nProbe` cells nearest the query. Complements
    * sign-LSH: IVF adapts to clustered corpora (centroids follow the
    * data), LSH needs no training.
    *
    * Training is sample-based: one TakeOrdered pass picks `trainCap`
    * rows by hash rank (deterministic, ~2 MB at the default cap), then
    * Lloyd runs driver-side over that sample — zero cluster passes per
    * iteration. The full corpus is touched exactly twice: once to draw
    * the sample, once for final cell assignment with the trained
    * centroids broadcast. That is the 100 TB shape — training cost is
    * bounded by the cap, not by corpus size. Final scan is an equi
    * semi-join on cell id + codegen'd cosine + TakeOrderedAndProject. */
  /** Squared-L2 argmin over centroids; ties keep the earliest index
    * (first-strictly-less). Shared by training, assignment, and probe
    * selection so all three agree bit-for-bit. */
  private[graft] def nearestCell(v: Array[Double], cs: Array[Array[Double]]): Int = {
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

  /** Deterministic IVF training (the first of ivfTopK's two corpus
    * passes): top-`trainCap` rows by xxhash64(id) rank (id tie-break,
    * TakeOrderedAndProject — only trainCap rows reach the driver), then
    * `lloydIters` Lloyd iterations over that sample in-process. Exposed
    * `private[graft]` so [[graft.SparkEntry]] can run the identical fold
    * at oracle-dump time and embed the trained centroids as DuckDB
    * literals — the same pattern [[hyperplanes]] uses for annTopK. */
  private[graft] def ivfTrain(emb: DataFrame, idCol: String, vecCol: String,
                              nCells: Int, lloydIters: Int,
                              trainCap: Int): Array[Array[Double]] = {
    require(trainCap >= nCells, s"trainCap ($trainCap) must cover nCells ($nCells)")
    val spark = emb.sparkSession
    import spark.implicits._
    val sample: Array[Array[Double]] = emb
      .select(col(idCol).cast("long").as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("__r", xxhash64(col("id")))
      .orderBy("__r", "id").limit(trainCap)
      .select("v").as[Array[Double]].collect()
    // init: first nCells sampled rows; Lloyd over the sample, in-process
    var centroids: Array[Array[Double]] = sample.take(nCells)
    for (_ <- 0 until lloydIters) {
      val cs = centroids
      val dim = cs(0).length
      val sums = Array.fill(cs.length)(new Array[Double](dim))
      val counts = new Array[Long](cs.length)
      sample.foreach { v =>
        val c = nearestCell(v, cs)
        var i = 0; while (i < dim) { sums(c)(i) += v(i); i += 1 }
        counts(c) += 1
      }
      centroids = Array.tabulate(cs.length) { c =>
        if (counts(c) == 0) cs(c) else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  /** The `nProbe` cells whose centroids are nearest `qVec` (squared L2,
    * index tie-break via stable sort) — ivfTopK's probe set, exposed for
    * the oracle to embed as literals. */
  private[graft] def ivfProbes(centroids: Array[Array[Double]],
                               qVec: Array[Double], nProbe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (cv, i) =>
        var d = 0.0; var j = 0
        while (j < qVec.length) { val t = qVec(j) - cv(j); d += t * t; j += 1 }
        (i, d)
      }
      .sortBy(_._2).take(nProbe).map(_._1).toSeq

  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, nCells: Int = 16, nProbe: Int = 4,
              lloydIters: Int = 2, trainCap: Int = 4096): DataFrame =
    ivfTopKWith(emb, idCol, vecCol, queryId, k,
      ivfTrain(emb, idCol, vecCol, nCells, lloydIters, trainCap), nProbe)

  /** [[ivfTopK]]'s apply half against ALREADY-TRAINED centroids (same
    * session's [[ivfTrain]] or an [[ivfLoad]] of a versioned artifact) —
    * the production shape: train once, version the index, route every
    * query batch with the mounted centroids and never re-run Lloyd per
    * query. Output ≡ ivfTopK at equal centroids by construction (the
    * suite round-trips it bit-for-bit through save/load). */
  def ivfTopKWith(emb: DataFrame, idCol: String, vecCol: String,
                  queryId: Long, k: Int,
                  centroids: Array[Array[Double]],
                  nProbe: Int = 4): DataFrame = {
    require(centroids.nonEmpty, "ivfTopKWith needs at least one centroid")
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col(idCol).cast("long"), toDouble(col(vecCol)))
      .as[(Long, Array[Double])]
    val bc = spark.sparkContext.broadcast(centroids)
    val assigned = vecs.map { case (id, v) => (id, v, nearestCell(v, bc.value)) }
      .toDF(idCol, "__v", "__cell")
    val qVec = assigned.where(col(idCol) === queryId)
      .select("__v").as[Array[Double]].head()
    // probe the nProbe cells whose centroids are nearest the query
    val probeCells = ivfProbes(centroids, qVec, nProbe)
    val qVecCol = array(qVec.map(lit).toIndexedSeq: _*)
    assigned.where(col("__cell").isin(probeCells: _*) && col(idCol) =!= queryId)
      .select(col(idCol),
        (round(cosine(col("__v"), qVecCol), 4) + 0.0).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Persist trained IVF centroids as a VERSIONED warehouse table at
    * `path` (parquet, partitioned by `version`, the [[graft.operators
    * .Pipelines.bpeSave]] contract: dynamic partition overwrite, so
    * re-saving a version REPLACES exactly that version and re-runs are
    * idempotent; other versions stay). One row per centroid —
    * metadata-sized at any corpus size. Doubles round-trip parquet
    * bit-exactly, so a load reproduces the training session's routing
    * decisions identically. */
  def ivfSave(spark: org.apache.spark.sql.SparkSession,
              centroids: Array[Array[Double]], path: String,
              version: Long): Unit = {
    require(version >= 0, "ivfSave needs version >= 0")
    require(centroids.nonEmpty, "ivfSave needs at least one centroid")
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
      .toDF("cell", "vec")
      .withColumn("version", lit(version))
      .repartition(1)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("version").parquet(path)
  }

  /** Load [[ivfSave]]d centroids: the highest version at `path`, or the
    * explicitly requested one (loud when absent). Cells must come back
    * dense 0..n-1 — a partially-written artifact fails here, not as a
    * silently mis-routed index. */
  def ivfLoad(spark: org.apache.spark.sql.SparkSession, path: String,
              version: Option[Long] = None)
      : (Array[Array[Double]], Long) = {
    // partition-column inference may narrow `version` to int — cast
    val all = spark.read.parquet(path)
      .withColumn("version", col("version").cast("long"))
    val v = version.getOrElse(all.agg(max("version")).head().getLong(0))
    val rows = all.where(col("version") === v)
      .select("cell", "vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    require(rows.nonEmpty, s"ivfLoad: no rows for version $v at $path")
    require(rows.map(_._1).toSeq == (0L until rows.length).toSeq,
      s"ivfLoad: cells not dense 0..${rows.length - 1} for version $v " +
        s"at $path — partial or corrupt artifact")
    (rows.map(_._2), v)
  }

  /** Deterministic product-quantization training (Jégou/Douze/Schmid,
    * PAMI 2011): the vector space is split into `m` contiguous
    * subspaces and a `ks`-centroid codebook is Lloyd-trained per
    * subspace over ONE hash-capped sample — the same sample draw as
    * [[ivfTrain]] (top-`trainCap` rows by xxhash64(id), TakeOrdered),
    * collected once and sliced driver-side, so training cost is bounded
    * by the cap at any corpus size. Returns `m × ks × (dim/m)`
    * codebooks. Exposed `private[graft]` so the oracle dump can run the
    * identical fold and embed the codebooks as SQL literals. */
  private[graft] def pqTrain(emb: DataFrame, idCol: String, vecCol: String,
                             m: Int, ks: Int, lloydIters: Int,
                             trainCap: Int): Array[Array[Array[Double]]] = {
    require(m >= 1 && ks >= 1, "pqTrain needs m >= 1 and ks >= 1")
    require(trainCap >= ks, s"trainCap ($trainCap) must cover ks ($ks)")
    val spark = emb.sparkSession
    import spark.implicits._
    val sample: Array[Array[Double]] = emb
      .select(col(idCol).cast("long").as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("__r", xxhash64(col("id")))
      .orderBy("__r", "id").limit(trainCap)
      .select("v").as[Array[Double]].collect()
    require(sample.nonEmpty, "pqTrain needs a non-empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"vector dim $dim must be divisible by m=$m")
    val sub = dim / m
    Array.tabulate(m) { s =>
      val slice = sample.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
      var cs: Array[Array[Double]] = slice.take(ks)
      for (_ <- 0 until lloydIters) {
        val cur = cs
        val sums = Array.fill(cur.length)(new Array[Double](sub))
        val counts = new Array[Long](cur.length)
        slice.foreach { v =>
          val c = nearestCell(v, cur)
          var i = 0; while (i < sub) { sums(c)(i) += v(i); i += 1 }
          counts(c) += 1
        }
        cs = Array.tabulate(cur.length) { c =>
          if (counts(c) == 0) cur(c) else sums(c).map(_ / counts(c))
        }
      }
      cs
    }
  }

  /** PQ-encode + ADC score against one query vector, shared by
    * [[pqTopK]] and the oracle cross-check: per subspace the vector's
    * code is its nearest codebook centroid ([[nearestCell]] — the same
    * argmin everywhere), and the asymmetric-distance cosine is computed
    * from two m×ks lookup tables built once from the query:
    * `qDots(s)(j) = q_s · c_s(j)` and `cNorm2(s)(j) = |c_s(j)|²`, giving
    * `cos ≈ Σ_s qDots(s)(code_s) / (|q| · √Σ_s cNorm2(s)(code_s))`. */
  private[graft] def adcCosine(v: Array[Double],
                               cbs: Array[Array[Array[Double]]],
                               qDots: Array[Array[Double]],
                               cNorm2: Array[Array[Double]],
                               qNorm: Double): Double = {
    val m = cbs.length
    val sub = v.length / m
    var dotSum = 0.0; var n2Sum = 0.0
    var s = 0
    while (s < m) {
      val code = nearestCell(
        java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub), cbs(s))
      dotSum += qDots(s)(code); n2Sum += cNorm2(s)(code)
      s += 1
    }
    val denom = qNorm * math.sqrt(n2Sum)
    if (denom == 0.0) 0.0 else dotSum / denom
  }

  /** Product-quantization ANN top-k: corpus vectors are compressed to
    * `m` small codes (m bytes at ks ≤ 256 — a 32× memory cut at dim 64
    * float32) and scored against the query with asymmetric distance
    * computation: the query stays exact, each subvector contributes via
    * a precomputed m×ks lookup table, so scoring is m table lookups per
    * vector instead of a dim-length dot product.
    *
    * 100 TB shape: training is one capped TakeOrdered sample (driver
    * Lloyd, cost independent of corpus size); the corpus is then
    * touched exactly once more — encode + score + TakeOrdered top-k in
    * a single pass with the codebooks and lookup tables broadcast. In a
    * standing deployment the codes table is written once and every
    * later query pays only the m-lookup scan over codes (64× less IO
    * than raw vectors); compose with [[ivfTopK]]'s cell routing for
    * IVFADC. Exact re-rank: join the PQ top-`R` ids back to the raw
    * vectors and run [[cosineTopK]] over that candidate slice.
    *
    * Output: (idCol, cos) — ADC-approximate cosine rounded to 4 dp,
    * ties broken by id, query row excluded. */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String,
             queryId: Long, k: Int, m: Int = 4, ks: Int = 16,
             lloydIters: Int = 2, trainCap: Int = 4096): DataFrame =
    pqTopKWith(emb, idCol, vecCol, queryId, k,
      pqTrain(emb, idCol, vecCol, m, ks, lloydIters, trainCap))

  /** [[pqTopK]]'s apply half against ALREADY-TRAINED codebooks (same
    * session's [[pqTrain]] or a [[pqLoad]] of a versioned artifact) —
    * train once, version the index, score every query batch with the
    * mounted codebooks. Output ≡ pqTopK at equal codebooks. */
  def pqTopKWith(emb: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int,
                 cbs: Array[Array[Array[Double]]]): DataFrame = {
    require(cbs.nonEmpty && cbs.forall(_.nonEmpty),
      "pqTopKWith needs non-empty codebooks")
    val m = cbs.length
    val spark = emb.sparkSession
    import spark.implicits._
    val qVec = emb.where(col(idCol) === queryId)
      .select(toDouble(col(vecCol))).as[Array[Double]].head()
    val dim = qVec.length
    require(dim % m == 0, s"query dim $dim not divisible by m=$m")
    val sub = dim / m
    val qDots = Array.tabulate(m) { s =>
      cbs(s).map { c =>
        var d = 0.0; var i = 0
        while (i < sub) { d += qVec(s * sub + i) * c(i); i += 1 }
        d
      }
    }
    val cNorm2 = Array.tabulate(m)(s => cbs(s).map(c => c.map(x => x * x).sum))
    val qNorm = math.sqrt(qVec.map(x => x * x).sum)
    val bcCbs = spark.sparkContext.broadcast(cbs)
    val bcQd = spark.sparkContext.broadcast(qDots)
    val bcCn = spark.sparkContext.broadcast(cNorm2)
    emb.select(col(idCol).cast("long"), toDouble(col(vecCol)))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        (id, adcCosine(v, bcCbs.value, bcQd.value, bcCn.value, qNorm))
      }
      .toDF(idCol, "__cos")
      .where(col(idCol) =!= queryId)
      .select(col(idCol), (round(col("__cos"), 4) + 0.0).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Persist trained PQ codebooks as a VERSIONED warehouse table at
    * `path` — the [[ivfSave]] contract with one row per (subspace,
    * code) centroid. m × ks rows: metadata-sized forever. */
  def pqSave(spark: org.apache.spark.sql.SparkSession,
             codebooks: Array[Array[Array[Double]]], path: String,
             version: Long): Unit = {
    require(version >= 0, "pqSave needs version >= 0")
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "pqSave needs non-empty codebooks")
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (c, j) => (s.toLong, j.toLong, c.toSeq) }
    }.toSeq
      .toDF("sub", "code", "vec")
      .withColumn("version", lit(version))
      .repartition(1)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("version").parquet(path)
  }

  /** Load [[pqSave]]d codebooks (highest version, or the requested one
    * — loud when absent). Subspaces must come back dense 0..m-1 with a
    * uniform code count per subspace — a ragged artifact fails here. */
  def pqLoad(spark: org.apache.spark.sql.SparkSession, path: String,
             version: Option[Long] = None)
      : (Array[Array[Array[Double]]], Long) = {
    val all = spark.read.parquet(path)
      .withColumn("version", col("version").cast("long"))
    val v = version.getOrElse(all.agg(max("version")).head().getLong(0))
    val rows = all.where(col("version") === v)
      .select("sub", "code", "vec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty, s"pqLoad: no rows for version $v at $path")
    val bySub = rows.groupBy(_._1)
    val m = bySub.size
    require(bySub.keySet == (0L until m).toSet,
      s"pqLoad: subspaces not dense 0..${m - 1} for version $v at $path")
    val ks = bySub(0L).length
    val cbs = Array.tabulate(m) { s =>
      val cb = bySub(s.toLong).sortBy(_._2)
      require(cb.length == ks && cb.map(_._2).toSeq == (0L until ks).toSeq,
        s"pqLoad: subspace $s codes not dense 0..${ks - 1} for version " +
          s"$v at $path — partial or corrupt artifact")
      cb.map(_._3)
    }
    (cbs, v)
  }

  /** IVFADC ANN top-k (Jégou/Douze/Schmid PAMI 2011 §IV — the layout
    * billion-scale ANN deployments run): coarse IVF cell routing
    * composed with PQ code scoring. Vectors are assigned to
    * [[ivfTrain]] Voronoi cells; within the `nProbe` cells nearest the
    * query, candidates are scored by ADC cosine over their PQ codes
    * instead of exact dot products — so vs [[pqTopK]] the scan touches
    * only the probed fraction of the corpus, and vs [[ivfTopK]] each
    * candidate costs `m` table lookups, not a dim-length dot product.
    *
    * This is the flat-PQ variant: codes quantize the vectors
    * themselves, not the per-cell residuals (the residual refinement
    * trades one more centroid subtraction per encode for tighter
    * quantization; flat codes keep the code table cell-independent,
    * which is what lets one codes column serve both [[pqTopK]] full
    * scans and routed scans here). Training = two capped driver folds
    * over the SAME hash-drawn sample rule; the corpus is touched twice
    * (sample, assign+encode+score in one pass with everything
    * broadcast). Output schema matches [[pqTopK]]. */
  def ivfadcTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int, nCells: Int = 16, nProbe: Int = 4,
                 m: Int = 4, ks: Int = 16, lloydIters: Int = 2,
                 trainCap: Int = 4096): DataFrame =
    ivfadcTopKWith(emb, idCol, vecCol, queryId, k,
      ivfTrain(emb, idCol, vecCol, nCells, lloydIters, trainCap),
      pqTrain(emb, idCol, vecCol, m, ks, lloydIters, trainCap), nProbe)

  /** [[ivfadcTopK]]'s apply half against ALREADY-TRAINED structures —
    * the mounted form of the billion-scale layout: coarse centroids
    * ([[ivfLoad]]) route, codebooks ([[pqLoad]]) score, Lloyd never
    * re-runs per query batch. Output ≡ ivfadcTopK at equal structures. */
  def ivfadcTopKWith(emb: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int,
                     coarse: Array[Array[Double]],
                     cbs: Array[Array[Array[Double]]],
                     nProbe: Int = 4): DataFrame = {
    require(coarse.nonEmpty, "ivfadcTopKWith needs at least one centroid")
    require(cbs.nonEmpty && cbs.forall(_.nonEmpty),
      "ivfadcTopKWith needs non-empty codebooks")
    val m = cbs.length
    val spark = emb.sparkSession
    import spark.implicits._
    val qVec = emb.where(col(idCol) === queryId)
      .select(toDouble(col(vecCol))).as[Array[Double]].head()
    val sub = qVec.length / m
    require(qVec.length % m == 0, s"query dim ${qVec.length} not divisible by m=$m")
    val probes = ivfProbes(coarse, qVec, nProbe).toSet
    val qDots = Array.tabulate(m) { s =>
      cbs(s).map { c =>
        var d = 0.0; var i = 0
        while (i < sub) { d += qVec(s * sub + i) * c(i); i += 1 }
        d
      }
    }
    val cNorm2 = Array.tabulate(m)(s => cbs(s).map(c => c.map(x => x * x).sum))
    val qNorm = math.sqrt(qVec.map(x => x * x).sum)
    val bcCoarse = spark.sparkContext.broadcast(coarse)
    val bcCbs = spark.sparkContext.broadcast(cbs)
    val bcQd = spark.sparkContext.broadcast(qDots)
    val bcCn = spark.sparkContext.broadcast(cNorm2)
    val bcProbes = spark.sparkContext.broadcast(probes)
    emb.select(col(idCol).cast("long"), toDouble(col(vecCol)))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        if (!bcProbes.value.contains(nearestCell(v, bcCoarse.value))) None
        else Some((id, adcCosine(v, bcCbs.value, bcQd.value, bcCn.value, qNorm)))
      }
      .toDF(idCol, "__cos")
      .where(col(idCol) =!= queryId)
      .select(col(idCol), (round(col("__cos"), 4) + 0.0).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-dup pairs at threshold `tau`, via a candidate
    * block-pair front + exact block kernel.
    *
    * Shape: vectors are L2-normalized and hashed into `nBlocks` blocks;
    * the kernel consumes a DataFrame of *candidate block pairs* — joined
    * twice by equi-join on block id (never a non-equi join over block
    * rows) — and runs the dot products as tight primitive loops inside
    * `flatMap`. Each block ships once per candidate pair, not once per
    * row pair: a naive row-pair join materializes O(N²) rows each
    * carrying two vectors, the difference between 117 s and <2 s at 5k
    * vectors and between impossible and routine at 100 TB.
    *
    * Candidate generation (default): sign-LSH banding over the
    * normalized vectors — `bands` bands of `bitsPerBand` hyperplane-sign
    * bits each; a block pair is a candidate iff some band-bucket occurs
    * in both blocks. Row-pair recall for a pair at cosine c is
    * `1-(1-p^r)^bands` with `p = 1-acos(c)/π`; block-level recall is at
    * least that (blocks can also collide via other rows). Defaults
    * (r=2, 64 bands) put recall at ~1-1e-14 for c ≥ 0.4 — effectively
    * exhaustive — while staying one tiny keyed self-join on (band,
    * bucket) ints. On clustered corpora at higher tau, raise
    * `bitsPerBand` so the bucket space actually partitions the blocks;
    * at low tau on isotropic data the front degenerates to ~all pairs
    * (information-theoretically there is nothing to prune) but costs
    * only the summary join extra. `exactAllPairs = true` bypasses LSH
    * and enumerates every block pair (the oracle form for equivalence
    * tests).
    *
    * At 100 TB: size `nBlocks` ≈ corpus/1024 rows — each block is
    * materialized as ONE array-typed row inside the kernel, so nBlocks
    * is what bounds per-task memory (1024 rows × dim 64 ≈ 0.5 MB/block;
    * at 10⁹ vectors that means nBlocks ≈ 10⁶, NOT the default 64). The
    * LSH front stays an equi-join on ints at any nBlocks; only
    * `exactAllPairs` (which enumerates nBlocks²/2 pairs driver-side) is
    * capped at 1024. Persist the upstream (normalized) table if calling
    * repeatedly — the lazy plan recomputes the scan per join input
    * otherwise. */
  /** cosineNearDupPairs' first pass, exposed for candidate-count tests:
    * (blockId, id, normalizedVec, bandKeys) — one typed pass; hyperplanes
    * regenerate per partition from the fixed seed (needs the runtime
    * dim). Band key packs (band index, r sign bits) into one long. */
  private[graft] def nearDupNormed(emb: DataFrame, idCol: String,
                                   vecCol: String, nBlocks: Int,
                                   bitsPerBand: Int, bands: Int)
      : org.apache.spark.sql.Dataset[(Int, Long, Array[Double], Array[Long])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val planes = bitsPerBand * bands
    val (nb, r, nbands) = (nBlocks, bitsPerBand, bands)
    emb.select(col(idCol).cast("long"), toDouble(col(vecCol)))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        var hp: Array[Array[Double]] = null
        it.map { case (id, v) =>
          val n = math.sqrt(v.map(x => x * x).sum)
          val nv = if (n == 0.0) v else v.map(_ / n)
          if (hp == null) hp = hyperplanes(planes, nv.length)
          val keys = Array.tabulate(nbands) { b =>
            var bucket = 0L
            var j = 0
            while (j < r) {
              val plane = hp(b * r + j)
              var dot = 0.0; var i = 0
              while (i < nv.length) { dot += nv(i) * plane(i); i += 1 }
              if (dot >= 0) bucket |= (1L << j)
              j += 1
            }
            (b.toLong << 32) | bucket
          }
          (((id % nb + nb) % nb).toInt, id, nv, keys)
        }
      }
  }

  /** The LSH candidate front: block pairs (ba ≤ bb) sharing at least one
    * band bucket. Distinct (block, band-bucket) summaries are ints — the
    * self-join is an equi hash join on the band key. Exposed so tests can
    * assert the front actually prunes (count ≪ nBlocks²/2) on clustered
    * corpora at high tau — the regime the scale path relies on. */
  private[graft] def lshCandidateBlockPairs(
      normed: org.apache.spark.sql.Dataset[(Int, Long, Array[Double], Array[Long])])
      : DataFrame = {
    val spark = normed.sparkSession
    import spark.implicits._
    val summaries = normed
      .flatMap { case (bid, _, _, keys) => keys.map(k => (bid, k)) }
      .toDF("bid", "k").distinct()
    summaries.select(col("bid").as("ba"), col("k"))
      .join(summaries.select(col("bid").as("bb"), col("k").as("k2")),
        col("k") === col("k2") && col("ba") <= col("bb"))
      .select("ba", "bb").distinct()
  }

  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         tau: Double, nBlocks: Int = 64,
                         bitsPerBand: Int = 2, bands: Int = 64,
                         exactAllPairs: Boolean = false): DataFrame = {
    require(nBlocks > 0, s"nBlocks must be positive, got $nBlocks")
    // only the exact path enumerates nBlocks²/2 (ba, bb) ints driver-side;
    // the LSH front scales to any block count (equi-join on int keys)
    require(!exactAllPairs || nBlocks <= 1024,
      s"exactAllPairs enumerates nBlocks^2/2 pairs driver-side: nBlocks in 1..1024, got $nBlocks")
    require(bitsPerBand >= 1 && bitsPerBand <= 16 && bands >= 1,
      "bitsPerBand in 1..16, bands >= 1")
    val spark = emb.sparkSession
    import spark.implicits._
    val nb = nBlocks
    val normed = nearDupNormed(emb, idCol, vecCol, nBlocks, bitsPerBand, bands)
    val blocks = normed.groupByKey(_._1)
      .mapGroups((bid, it) => (bid, it.map(t => (t._2, t._3)).toArray))
      .toDF("bid", "rows")
    val cand: DataFrame =
      if (exactAllPairs) {
        val all = for { i <- 0 until nb; j <- i until nb } yield (i, j)
        all.toDF("ba", "bb")
      } else lshCandidateBlockPairs(normed)
    val paired = cand
      .join(blocks.select(col("bid").as("ba"), col("rows").as("rowsA")), "ba")
      .join(blocks.select(col("bid").as("bb"), col("rows").as("rowsB")), "bb")
      .select((col("ba") === col("bb")).as("same"), col("rowsA"), col("rowsB"))
      .as[(Boolean, Array[(Long, Array[Double])], Array[(Long, Array[Double])])]
    val pairs = paired.flatMap { case (same, va, vb) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var i = 0
      while (i < va.length) {
        val (ia, xa) = va(i)
        var j = if (same) i + 1 else 0
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

  /** L6 over the cosine metric: [[cosineNearDupPairs]] edges (LSH-fronted
    * block kernel, per-pair recall ~1-1e-14 at the defaults for c ≥ 0.4)
    * into the shared transitive-closure + labeling tail
    * ([[Dedup.connectedComponents]]). Every vector is labeled with its
    * component's min id plus the cluster size; vectors in no pair become
    * singletons of themselves. The embedding analog of
    * [[Dedup.nearDupClusters]] (token Jaccard) and
    * [[Dedup.simHashClusters]] (fingerprint hamming) — SEMANTIC dedup
    * for training corpora, catching paraphrases that share no tokens:
    * keep the `idCol == cluster_id` rows.
    *
    * 100 TB posture inherits from its two parts: the pair front is a
    * banded equi-join + caller-sized block kernel (size `nBlocks` so a
    * block is ~1k rows), and the closure is O(log diameter) keyed
    * shuffles. Near-dup graphs are shallow (star-shaped around
    * canonical texts), so the closure typically converges in 2-3
    * rounds. */
  def cosineClusters(emb: DataFrame, idCol: String, vecCol: String,
                     tau: Double, nBlocks: Int = 64, bitsPerBand: Int = 2,
                     bands: Int = 64): DataFrame = {
    graft.operators.Joins.requireFreeColumns("cosineClusters", emb.columns,
      "cluster_id", "csize")
    val edges = cosineNearDupPairs(emb, idCol, vecCol, tau, nBlocks,
        bitsPerBand, bands)
      .select(col("v1").as("d1"), col("v2").as("d2"))
    Dedup.labelClusters(emb, idCol, edges)
  }

  /** SemDeDup (Abbas et al., arXiv:2303.09540): semantic dedup by
    * k-means partitioning + within-cell cosine pruning. The corpus is
    * assigned to `nCells` k-means cells (the [[ivfTrain]] deterministic
    * Lloyd fold — trainCap-bounded sample, same centroids as the IVF
    * oracle), pairwise cosine is computed ONLY within a cell, and of any
    * duplicate group (cosine ≥ tau) the member LEAST similar to its
    * centroid survives — the paper's keep-low-centroid-similarity rule
    * (§4.1: low-similarity exemplars maximize retained diversity). The
    * keep rule is order-free and SQL-expressible: drop x iff some
    * same-cell y has cos(x,y) ≥ tau and y precedes x under
    * (cent_cos asc, id asc) — i.e. each dup group keeps exactly its
    * precedence-minimal members that aren't dominated by an earlier one.
    * Comparisons use the ROUNDED (4 dp) centroid cosine so the DuckDB
    * oracle's ordering agrees bit-for-bit.
    *
    * DOCUMENTED DEVIATION (order-free drop vs the paper's
    * one-exemplar-per-group reading): the dominating row y need not
    * itself survive, so a similarity chain a–b–c with cos(a,c) < tau
    * drops BOTH b and c even though c has no kept near-duplicate —
    * stricter (over-drops) relative to keeping one exemplar per
    * connected dup group. This is deliberate: it keeps the rule
    * order-free and expressible as one self-join predicate (no
    * sequential sweep, no transitive closure), which is what makes the
    * cell-keyed equi-join plan and the DuckDB oracle possible. The
    * oracle and the property tests replicate it identically.
    *
    * Scale shape — the point of the cell front: pairwise work is
    * quadratic only WITHIN a cell, and nCells is sized to the corpus
    * (the paper runs k=110 000 over 5 B LAION entries, keeping cells at
    * ~50 k rows), so the within-cell kernel is bounded while total cost
    * stays ∝ rows · cellSize. Assignment is one broadcast-centroid map
    * pass; the pair probe is an equi-join on the cell id (shuffle keyed
    * by cell, AQE-splittable on skewed cells); the drop set is a
    * DISTINCT projection semi-joined back. The assigned frame feeds the
    * join's both sides and the final labeling, so it is eagerly
    * localCheckpoint'd — one scan, three consumers. Training cost is
    * trainCap-bounded at any corpus size.
    *
    * Output: (idCol, cell, cent_cos, keep) for EVERY input row —
    * `keep = false` marks semantic duplicates to excise. */
  def semDeDup(emb: DataFrame, idCol: String, vecCol: String,
               tau: Double, nCells: Int = 16, lloydIters: Int = 2,
               trainCap: Int = 4096): DataFrame = {
    graft.operators.Joins.requireFreeColumns("semDeDup", emb.columns,
      "cell", "cent_cos", "keep")
    val spark = emb.sparkSession
    import spark.implicits._
    val cs = ivfTrain(emb, idCol, vecCol, nCells, lloydIters, trainCap)
    val bc = spark.sparkContext.broadcast(cs)
    val assigned = emb
      .select(col(idCol).cast("long"), toDouble(col(vecCol)))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val all = bc.value
        val cell = nearestCell(v, all)
        val cv = all(cell)
        var dvc = 0.0; var dvv = 0.0; var dcc = 0.0; var i = 0
        while (i < v.length) {
          dvc += v(i) * cv(i); dvv += v(i) * v(i); dcc += cv(i) * cv(i)
          i += 1
        }
        val nrm = math.sqrt(dvv)
        val u = if (nrm == 0) v else v.map(_ / nrm)
        // zero-norm vectors OR zero-norm centroids pin cent_cos to 0.0
        // (not 0/0 = NaN): Spark orders NaN above all doubles while
        // DuckDB division yields NULL, so a NaN here would silently
        // diverge the precedence rule; the oracle mirrors this with an
        // explicit CASE on both norms
        val cc = if (nrm == 0.0 || dcc == 0.0) 0.0
          else dvc / (nrm * math.sqrt(dcc))
        (id, cell, cc, u)
      }
      .toDF(idCol, "cell", "__cc", "__u")
      .withColumn("cent_cos", round(col("__cc"), 4) + 0.0)
      .drop("__cc")
      .localCheckpoint()
    val a = assigned.select(col(idCol).as("__ida"), col("cell"),
      col("cent_cos").as("__ca"), col("__u").as("__ua"))
    val b = assigned.select(col(idCol).as("__idb"), col("cell"),
      col("cent_cos").as("__cb"), col("__u").as("__ub"))
    val dropped = a.join(b, Seq("cell"))
      .where(col("__ida") =!= col("__idb")
        && (col("__cb") < col("__ca")
          || (col("__cb") === col("__ca") && col("__idb") < col("__ida")))
        && fastDot(col("__ua"), col("__ub")) >= tau)
      .select(col("__ida").as(idCol)).distinct()
      .withColumn("__drop", lit(true))
    assigned.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell").cast("long").as("cell"),
        col("cent_cos"), col("__drop").isNull.as("keep"))
  }

  /** D4 curation (Tirumala et al., arXiv:2308.12284): de-duplicate,
    * then DIVERSIFY — after [[semDeDup]]'s near-duplicate prune, the
    * most PROTOTYPICAL survivors (nearest their cluster centroid, the
    * paper's SSL-prototypes criterion) are dropped as well: per cell,
    * the top `ceil(dropFrac · n_kept)` kept rows by (cent_cos desc, id
    * asc) rank. NOTE the per-cell ceil: every non-empty cell drops AT
    * LEAST one prototype, so on small cells the realized drop rate
    * exceeds the nominal dropFrac (16 cells × 1 row each at dropFrac
    * 0.1 would still drop 16 rows). Under the nCells-∝-corpus sizing
    * rule cells are ~100+ rows and the overshoot vanishes
    * (ceil adds < 1 row per cell); it is a deliberate floor — a cell
    * dense enough to exist contributes at least one prototype — and
    * the oracle and tests replicate ceil exactly.
    * Dense cluster cores carry redundant easy examples;
    * excising both verbatim-near neighbors AND the dense core is the
    * paper's recipe for better pretraining data per token. One shared
    * clustering serves both stages (the paper re-embeds and re-clusters
    * between them; with one embedding space the re-cluster is a no-op —
    * documented simplification).
    *
    * Scale shape: [[semDeDup]]'s posture plus one window, PARTITIONED BY
    * CELL — per-task state bounded by cell size (nCells ∝ corpus, the
    * same sizing rule), never a global rank. The semdedup frame feeds
    * the rank and the final label, so it is localCheckpoint'd once.
    *
    * Output: (idCol, cell, cent_cos, stage) for EVERY input row —
    * stage ∈ 'dup' (semdedup-dropped) | 'proto' (diversity-dropped) |
    * 'kept'. */
  def d4Prune(emb: DataFrame, idCol: String, vecCol: String,
              tau: Double, dropFrac: Double, nCells: Int = 16,
              lloydIters: Int = 2, trainCap: Int = 4096): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0, "dropFrac must be in [0, 1)")
    val sd = semDeDup(emb, idCol, vecCol, tau, nCells, lloydIters, trainCap)
      .localCheckpoint()
    val ranked = sd.where(col("keep"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("cell").orderBy(col("cent_cos").desc, col(idCol))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("cell")))
      .select(col(idCol),
        (col("__rk") <= ceil(lit(dropFrac) * col("__n")).cast("long"))
          .as("__proto"))
    sd.join(ranked, Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("cent_cos"),
        when(!col("keep"), lit("dup"))
          .when(col("__proto"), lit("proto"))
          .otherwise(lit("kept")).as("stage"))
  }
}

/** Flat exact-integer moment accumulator behind
  * [[Similarity.pcaComponents]]: `d` per-dim micro-unit sums followed
  * by the d(d+1)/2 upper-triangle product sums in row-major order,
  * each cell a long fast path with a BigInteger overflow spill —
  * 128-bit-exact at any corpus size with near-zero allocation on the
  * fast path. Integer addition is order-independent, so the
  * treeAggregate fold is deterministic under any partitioning — the
  * same contract as the decimal-sum aggregates, at a fraction of the
  * plan/runtime cost (the measured comparison is in BASELINE.md). */
private[graft] final class ExactMoments(val d: Int) extends Serializable {
  private val cells = d + d * (d + 1) / 2
  var n = 0L
  private val fast = new Array[Long](cells)
  private val spill = new Array[java.math.BigInteger](cells)

  private def bump(c: Int, v: Long): Unit = {
    val prev = fast(c)
    val s = prev + v
    if (((prev ^ s) & (v ^ s)) < 0L) { // signed long overflow
      val b =
        if (spill(c) == null) java.math.BigInteger.ZERO else spill(c)
      spill(c) = b.add(java.math.BigInteger.valueOf(prev))
      fast(c) = v
    } else fast(c) = s
  }

  def add(q: Array[Long]): ExactMoments = {
    require(q.length == d,
      s"pcaComponents expects uniform $d-dim vectors, got ${q.length}")
    n += 1L
    var i = 0
    while (i < d) { bump(i, q(i)); i += 1 }
    var c = d
    i = 0
    while (i < d) {
      val qi = q(i)
      var j = i
      while (j < d) {
        try bump(c, Math.multiplyExact(qi, q(j)))
        catch {
          case _: ArithmeticException => // |x| > ~3e3: exact big product
            val p = java.math.BigInteger.valueOf(qi)
              .multiply(java.math.BigInteger.valueOf(q(j)))
            spill(c) = if (spill(c) == null) p else spill(c).add(p)
        }
        c += 1; j += 1
      }
      i += 1
    }
    this
  }

  def merge(o: ExactMoments): ExactMoments = {
    n += o.n
    var c = 0
    while (c < cells) {
      bump(c, o.fast(c))
      if (o.spill(c) != null)
        spill(c) =
          if (spill(c) == null) o.spill(c) else spill(c).add(o.spill(c))
      c += 1
    }
    this
  }

  /** Exact cell value: spill + fast remainder. */
  def cell(c: Int): java.math.BigInteger = {
    val b = java.math.BigInteger.valueOf(fast(c))
    if (spill(c) == null) b else spill(c).add(b)
  }
}
