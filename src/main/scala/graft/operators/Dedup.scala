package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication operators (SURVEY §2.9 L1/L2).
  *
  * Scale posture: the exact pairwise forms are test-scale oracles; the
  * production path is candidate generation (MinHash-LSH banding) so the
  * pairwise verify stage only ever sees bucket-cohabiting pairs, keyed
  * shuffles throughout, never an unbounded cross join.
  */
object Dedup {

  def tokenSet(text: Column): Column = array_distinct(split(text, " "))

  /** L1 exact dedup: one representative row per distinct content hash.
    * With `idCol`, the representative is the minimum id — deterministic
    * across runs/partitionings (required by the incremental-rebuild
    * posture in [[Pipelines]]); without it, dropDuplicates keeps an
    * arbitrary row (cheaper: map-side partial dedup, no window). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String = ""): DataFrame = {
    Joins.requireFreeColumns("exactDedup", df.columns, "__h", "__rn")
    val hashed = df.withColumn("__h", md5(col(textCol)))
    val kept =
      if (idCol.isEmpty) hashed.dropDuplicates("__h")
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("__h").orderBy(col(idCol))
        hashed.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn")
      }
    kept.drop("__h")
  }

  /** Incremental exact dedup — the form a 100 TB corpus actually runs:
    * the full corpus was deduped once, and each new crawl DELTA must
    * drop rows whose content hash is already in the SEEN corpus.
    *
    * Scale shape: one pass over `seen` builds a bloom filter of its
    * content hashes (the engine's native `BloomFilterAggregate` — the
    * same machinery as Spark's runtime join filters, codegen-probed,
    * not a UDF); every delta row probes it locally via
    * `BloomFilterMightContain`, and only MAYBE-hits pay the verify
    * anti-join shuffle. Definite misses — the overwhelming majority of
    * a typical delta against a deduped corpus — never shuffle at all.
    * Output is EXACT: the bloom only prunes the verify join's input,
    * false positives are settled by the anti-join. The verify join is
    * pruned from BOTH directions: the delta's maybe-hit hashes build a
    * second bloom that filters the SEEN side before it shuffles — at a
    * 100 TB seen corpus, the verify join's right side is then
    * ~|maybe-hits| rows, not a full corpus rescan (a bidirectional
    * bloom join; dropping seen rows that match nothing in the delta
    * cannot change which delta rows have matches, so output stays
    * exact). `expectedSeen` sizes the seen filter (~1.2 GB of bits per
    * 10^9 hashes at the default fpp — on a cluster, prefer persisting
    * the hash set bucketed by `__h` so the verify join is co-located);
    * `expectedDelta` sizes the delta-side filter.
    */
  def incrementalExactDedup(delta: DataFrame, seen: DataFrame,
                            textCol: String, seenTextCol: String,
                            expectedSeen: Long,
                            expectedDelta: Long = 1L << 20,
                            maxBloomItems: Long = 200000000L): DataFrame = {
    Joins.requireFreeColumns("incrementalExactDedup", delta.columns, "__h")
    require(expectedSeen > 0 && expectedDelta > 0,
      "expectedSeen and expectedDelta must be positive")
    // The seen-side bloom materializes on the DRIVER as a plan literal
    // (~1.2 GB of bits at 10⁹ hashes): past `maxBloomItems` that
    // strains driver memory and plan size before the math breaks, so
    // the operator switches itself to the keyed anti-join form — same
    // output, no driver state (the documented cluster-scale path).
    if (expectedSeen > maxBloomItems)
      return incrementalExactDedupJoin(delta, seen, textCol, seenTextCol)
    val seenH = seen.select(md5(col(seenTextCol)).as("__h"))
    val bfBytes = Joins.bloomOf(seenH, expectedSeen)
    val hashed = delta.withColumn("__h", md5(col(textCol)))
    if (bfBytes == null) hashed.drop("__h") // empty seen corpus: all-new
    else {
      val might = Joins.mightContain(bfBytes, col("__h"))
      val definiteNew = hashed.where(!might)
      val maybe = hashed.where(might)
      val deltaBfBytes = Joins.bloomOf(maybe.select(col("__h")), expectedDelta)
      if (deltaBfBytes == null) definiteNew.drop("__h") // no maybe-hits
      else {
        val verified = maybe.join(
          seenH.where(Joins.mightContain(deltaBfBytes, col("__h"))), Seq("__h"), "left_anti")
        definiteNew.unionByName(verified).drop("__h")
      }
    }
  }

  /** The driver-stateless form of [[incrementalExactDedup]]: a plain
    * hash-keyed left-anti join of the delta's content hashes against
    * the seen corpus's. No bloom, no literal in the plan — both sides
    * shuffle on `__h` (or co-locate for free when the seen hash set is
    * persisted bucketed by `__h`, the layout the sink writes at
    * cluster scale), so it holds at any `seen` cardinality; the price
    * is that definite-miss delta rows shuffle too, which the bloom
    * form exists to avoid. [[incrementalExactDedup]] falls back to
    * this automatically past `maxBloomItems`; both forms are
    * output-identical (OperatorsSuite differential). */
  def incrementalExactDedupJoin(delta: DataFrame, seen: DataFrame,
                                textCol: String,
                                seenTextCol: String): DataFrame = {
    Joins.requireFreeColumns("incrementalExactDedup", delta.columns, "__h")
    delta.withColumn("__h", md5(col(textCol)))
      .join(seen.select(md5(col(seenTextCol)).as("__h")).distinct(),
        Seq("__h"), "left_anti")
      .drop("__h")
  }

  private def jaccard(t1: Column, t2: Column): Column =
    size(array_intersect(t1, t2)) / size(array_union(t1, t2)).cast("double")

  /** Exact token-set Jaccard over all pairs of `docs` (FIXTURES Q41 form —
    * test-scale only; production uses [[minHashLshPairs]]). Output:
    * (d1, d2, j) with the *unrounded* similarity filtered at `tau` and the
    * reported `j` rounded to 4 dp.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String, tau: Double): DataFrame = {
    val t = docs.select(col(idCol).as("__id"), tokenSet(col(textCol)).as("__tok"))
    val a = t.select(col("__id").as("d1"), col("__tok").as("t1"))
    val b = t.select(col("__id").as("d2"), col("__tok").as("t2"))
    a.join(b, col("d1") < col("d2"))
      .withColumn("__j", jaccard(col("t1"), col("t2")))
      .where(col("__j") >= tau)
      .select(col("d1"), col("d2"), round(col("__j"), 4).as("j"))
  }

  /** EXACT set-similarity self-join via prefix filtering — the
    * AllPairs/PPJoin candidate principle (Chaudhuri et al. ICDE'06,
    * Bayardo et al. WWW'07): output ≡ [[jaccardPairs]] at the same tau
    * (every pair with unrounded token-set Jaccard ≥ tau, j rounded
    * 4 dp) with NO all-pairs stage — the exact counterpart of the
    * probabilistic [[minHashLshPairs]], for when recall must be 1.0 by
    * construction rather than by banding odds.
    *
    * Candidate principle: order every doc's distinct tokens by a GLOBAL
    * (corpus frequency, token) order — rarest first — and keep each
    * doc's first m − ⌈tau·m⌉ + 1 tokens (computed as
    * m − floor(tau·m) + 1, one token longer under float jitter, never
    * shorter — recall is never at the mercy of a ulp). Two docs with
    * J ≥ tau MUST share a prefix token, so candidates = equi-join of
    * the prefix-token rows on the token. The exact verify then filters
    * false candidates.
    *
    * Scale shape: token-frequency table = one map-side-combining
    * groupBy; the prefix rank is a per-DOC window (state ∝ one doc's
    * tokens); candidates are a keyed equi-join whose buckets hold
    * PREFIX occurrences only — prefixes are each doc's RAREST tokens,
    * so the head of the token frequency distribution (the skew that
    * makes a naive token-inverted join quadratic) is structurally
    * excluded from long docs and survives only via short docs; a
    * tau-slack length filter (|b| ≥ tau·|a|, epsilon-padded toward
    * keeping) prunes cross-length candidates before the verify. Exact
    * verify work ∝ candidates, which at high tau ∝ true pairs. */
  def jaccardJoinPrefix(docs: DataFrame, idCol: String, textCol: String,
                        tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, "tau must be in (0, 1]")
    Joins.requireFreeColumns("jaccardJoinPrefix", docs.columns,
      "__id", "__toks", "__m", "__tok", "__tf", "__rn", "d1", "d2", "j")
    // checkpoint: the token-set frame feeds the prefix build AND both
    // sides of the verify join — three consumers, one scan
    val toks = docs
      .select(col(idCol).as("__id"),
        tokenSet(col(textCol)).as("__toks"))
      .where(size(col("__toks")) > 0)
      .localCheckpoint()
    val tokRows = toks.select(col("__id"),
      size(col("__toks")).as("__m"), explode(col("__toks")).as("__tok"))
    val tf = tokRows.groupBy("__tok").agg(count(lit(1)).as("__tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__id").orderBy(col("__tf"), col("__tok"))
    // checkpoint: the prefix frame is BOTH sides of the candidate
    // self-join — without it the freq join + window run twice
    val prefix = tokRows.join(tf, "__tok")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <=
        col("__m") - floor(col("__m") * lit(tau)) + 1)
      .select(col("__tok"), col("__id"), col("__m"))
      .localCheckpoint()
    val cand = prefix.select(col("__tok"), col("__id").as("d1"),
        col("__m").as("__m1"))
      .join(prefix.select(col("__tok"), col("__id").as("d2"),
        col("__m").as("__m2")), Seq("__tok"))
      .where(col("d1") < col("d2") &&
        // J ≥ tau ⇒ min size ≥ tau·max size; epsilon pads toward KEEPING
        col("__m1").cast("double") >= col("__m2") * tau - 1e-9 &&
        col("__m2").cast("double") >= col("__m1") * tau - 1e-9)
      .select("d1", "d2").distinct()
    cand
      .join(toks.select(col("__id").as("d1"), col("__toks").as("__t1")), "d1")
      .join(toks.select(col("__id").as("d2"), col("__toks").as("__t2")), "d2")
      .withColumn("__j", jaccard(col("__t1"), col("__t2")))
      .where(col("__j") >= tau)
      .select(col("d1"), col("d2"), round(col("__j"), 4).as("j"))
  }

  /** MinHash signature column: for seed i, min over tokens of
    * xxhash64(token, i). Seed-pinned → deterministic across runs.
    * Fused single-pass codegen expression (each token's bytes hashed
    * once, all seeds derived via the int-mix tail) — value-identical to
    * `array((0 until numHashes).map(i => array_min(transform(tok, t =>
    * xxhash64(t, lit(i))))))`, proven by OperatorsSuite's differential;
    * the HOF form re-hashed every token's bytes per seed through
    * interpreted lambda dispatch. */
  private def minHashSig(tok: Column, numHashes: Int): Column =
    graft.expressions.HashExpressions.minHashSignature(tok, numHashes)

  /** L2 at scale: MinHash + LSH banding candidate generation, then exact
    * Jaccard verification of candidates only.
    *
    * Pipeline: tokens → `numHashes` minhash values → `bands` band keys
    * (hash of each signature slice) → explode to (band, key) → self-join
    * on the band key (equi, shuffle-keyed — bucket sizes bounded by band
    * collision rate) → distinct candidate pairs → join token sets back →
    * exact-Jaccard filter at `tau`. With r = numHashes/bands rows per
    * band, P(candidate | j) = 1-(1-j^r)^bands; defaults (64, 32 ⇒ r=2)
    * give recall ≈ 1-(1-0.36)^32 ≈ 1.0 at j = 0.6.
    */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      tau: Double, numHashes: Int = 64, bands: Int = 32): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"), tokenSet(col(textCol)).as("__tok"))
    val banded = bandKeys(docs, idCol, textCol, numHashes, bands)
    val a = banded.select(col("__bkey"), col("__id").as("d1"))
    val b = banded.select(col("__bkey").as("__bkey2"), col("__id").as("d2"))
    val cand = a.join(b, col("__bkey") === col("__bkey2") && col("d1") < col("d2"))
      .select("d1", "d2").dropDuplicates("d1", "d2")
    val t1 = toks.select(col("__id").as("d1"), col("__tok").as("t1"))
    val t2 = toks.select(col("__id").as("d2"), col("__tok").as("t2"))
    cand.join(t1, "d1").join(t2, "d2")
      .withColumn("__j", jaccard(col("t1"), col("t2")))
      .where(col("__j") >= tau)
      .select(col("d1"), col("d2"), round(col("__j"), 4).as("j"))
  }

  /** Incremental near-dup: which DELTA docs are near-dups (token-set
    * Jaccard ≥ `tau`) of which already-ingested SEEN docs — the
    * continuous-crawl form of [[minHashLshPairs]], where re-banding the
    * whole corpus per batch would be the naive alternative. Both sides
    * band with the SAME seed-pinned minhash family, candidates come
    * from the asymmetric band-key equi-join (no seen×seen or
    * delta×delta work — exactly the pairs a self-join would add and
    * this use case doesn't want), and only candidates get the exact
    * verify join. The seen side's banded form is a pure projection of
    * the seen corpus, so a production deployment persists it once and
    * appends each batch's bands — this operator IS that probe.
    * Output: (delta_id, seen_id, j) at j ≥ tau.
    *
    * Same recall algebra as [[minHashLshPairs]]: with r =
    * numHashes/bands, P(candidate | j) = 1-(1-j^r)^bands — ≈ 1 at the
    * default (64, 32) for j ≥ 0.6. */
  def incrementalNearDupPairs(delta0: DataFrame, seen0: DataFrame,
                              idCol: String, textCol: String, tau: Double,
                              numHashes: Int = 64, bands: Int = 32): DataFrame = {
    // scan fan-out on both sides: the minhash signature pass is
    // O(tokens × numHashes) per row and inherits the scan's
    // partitioning; the shared exchange is reused by the band and
    // token-set branches (no-op when the scan already parallelizes)
    val delta = Joins.fanOutForCompute(delta0, Seq(idCol))
    val seen = Joins.fanOutForCompute(seen0, Seq(idCol))
    val bd = bandKeys(delta, idCol, textCol, numHashes, bands)
      .withColumnRenamed("__id", "delta_id")
    val bs = bandKeys(seen, idCol, textCol, numHashes, bands)
      .withColumnRenamed("__id", "seen_id")
    val cand = bd.join(bs, "__bkey")
      .select("delta_id", "seen_id").dropDuplicates("delta_id", "seen_id")
    val t1 = delta.select(col(idCol).as("delta_id"),
      tokenSet(col(textCol)).as("__t1"))
    val t2 = seen.select(col(idCol).as("seen_id"),
      tokenSet(col(textCol)).as("__t2"))
    cand.join(t1, "delta_id").join(t2, "seen_id")
      .withColumn("__j", jaccard(col("__t1"), col("__t2")))
      .where(col("__j") >= tau)
      .select(col("delta_id"), col("seen_id"), round(col("__j"), 4).as("j"))
  }

  /** Persist a corpus slice's banded projection as a generation-
    * partitioned table at `path` — the standing-deployment half of
    * [[incrementalNearDupPairs]]: a continuous crawl banding its whole
    * landed corpus per batch re-pays the minhash signature work
    * (O(tokens × numHashes) hashing per doc) every trigger; the banded
    * projection is a pure function of the docs, so it persists once per
    * generation and each batch appends only its own bands. Dynamic
    * partition overwrite on `gen` — a replayed generation's bands
    * replace themselves, and a missing generation (crash between data
    * land and band write) is REBUILDABLE from the landed data: the
    * bands are a derived cache, never the source of truth. Schema:
    * (id, bkey) partitioned by gen. */
  def writeBandKeys(docs: DataFrame, idCol: String, textCol: String,
                    path: String, generation: Long,
                    numHashes: Int = 64, bands: Int = 32): Unit = {
    require(generation >= 0, "writeBandKeys needs generation >= 0")
    bandKeys(docs, idCol, textCol, numHashes, bands)
      .select(col("__id").as("id"), col("__bkey").as("bkey"))
      .withColumn("gen", lit(generation))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("gen").parquet(path)
  }

  /** [[incrementalNearDupPairs]] against a PERSISTED seen-side band
    * table ([[writeBandKeys]] rows: id, bkey): the delta still bands
    * live (delta-sized), candidates come from the same asymmetric
    * band-key equi-join, and the exact verify joins candidate ids back
    * to the seen DOCS — so the corpus-sized minhash recompute is
    * replaced by a scan of the persisted bands. Output ≡
    * [[incrementalNearDupPairs]] at equal params and seed-pinned hash
    * family (OperatorsSuite differential). At standing scale, persist
    * the band table bucketed by `bkey` to co-locate the candidate
    * join. */
  def incrementalNearDupPairsWithBands(delta: DataFrame, idCol: String,
                                       textCol: String,
                                       seenBands: DataFrame,
                                       seenDocs: DataFrame,
                                       tau: Double,
                                       numHashes: Int = 64,
                                       bands: Int = 32): DataFrame = {
    val bd = bandKeys(delta, idCol, textCol, numHashes, bands)
      .withColumnRenamed("__id", "delta_id")
    val bs = seenBands.select(col("bkey").as("__bkey"),
      col("id").as("seen_id"))
    val cand = bd.join(bs, "__bkey")
      .select("delta_id", "seen_id").dropDuplicates("delta_id", "seen_id")
    val t1 = delta.select(col(idCol).as("delta_id"),
      tokenSet(col(textCol)).as("__t1"))
    val t2 = seenDocs.select(col(idCol).as("seen_id"),
      tokenSet(col(textCol)).as("__t2"))
    cand.join(t1, "delta_id").join(t2, "seen_id")
      .withColumn("__j", jaccard(col("__t1"), col("__t2")))
      .where(col("__j") >= tau)
      .select(col("delta_id"), col("seen_id"), round(col("__j"), 4).as("j"))
  }

  /** (doc id, band key) rows: `bands` LSH keys per doc, each a hash of
    * (band index, its `numHashes/bands`-value signature slice). Shared
    * by the verified pair path and the LSH-only star-edge path — at
    * equal params both see the SAME buckets, which is what makes the
    * approx clustering a provable coarsening of the verified one. */
  private def bandKeys(docs: DataFrame, idCol: String, textCol: String,
                       numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    val sig = docs
      .select(col(idCol).as("__id"), tokenSet(col(textCol)).as("__tok"))
      .withColumn("__sig", minHashSig(col("__tok"), numHashes))
    sig.select(col("__id"),
      explode(array((0 until bands).map { b =>
        // band key = hash of (band index, signature slice)
        hash(lit(b) +: (0 until r).map(i => element_at(col("__sig"), b * r + i + 1)): _*)
      }: _*)).as("__bkey"))
  }

  /** LSH-only spanning edges: within each band bucket, every member
    * connects to the bucket's minimum id — O(bucket size) edges where
    * the all-pairs candidate form is O(bucket size²). For connectivity
    * (clustering) a spanning star per bucket carries exactly the same
    * information as the bucket's full clique, so nothing is lost vs the
    * candidate graph; what IS dropped is the exact-Jaccard verify step.
    *
    * Skew posture: the bucket min comes from a `groupBy` (map-side
    * partial agg — a mega-bucket of near-identical docs contributes one
    * partial min per map task, never a single hot reducer; a window
    * `min over partitionBy(bkey)` would pin the whole bucket to one
    * task) joined back on the band key, where AQE's skew-join split
    * applies. Then a pair-keyed distinct. */
  def minHashLshStarEdges(docs: DataFrame, idCol: String, textCol: String,
                          numHashes: Int = 128, bands: Int = 16): DataFrame = {
    val banded = bandKeys(docs, idCol, textCol, numHashes, bands)
    val mins = banded.groupBy("__bkey").agg(min("__id").as("__m"))
    banded.join(mins, "__bkey")
      .where(col("__id") =!= col("__m"))
      .select(col("__m").as("d1"), col("__id").as("d2"))
      .distinct()
  }

  /** SimHash fingerprint: per-token 60-bit hash, per-bit ±1 votes, sign
    * of each vote sum becomes the bit. Near-dup docs differ in few bits
    * (compare via hamming distance on the bigint). Pure column algebra —
    * explode + 60 conditional sums, one keyed shuffle.
    *
    * The per-token bit source is the first 15 hex chars of md5 (60 bits)
    * rather than xxhash64: md5 is computable by any engine, which makes
    * the whole fingerprint differential-testable against the DuckDB
    * oracle. Any uniform hash works for simhash; 60 vs 64 bits changes
    * nothing structural. */
  val simHashBits = 60

  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // (explode_outer considered and rejected here: the inferred-filter
    // duplication is one split+distinct per doc — same cost class as
    // the explode itself — and the A/B read as noise-to-negative)
    val tok = docs.select(col(idCol), explode(tokenSet(col(textCol))).as("__t"))
      .withColumn("__h", conv(substring(md5(col("__t")), 1, 15), 16, 10).cast("long"))
    fingerprintFromHashes(tok.select(col(idCol), col("__h")), idCol)
  }

  /** The sign-vote fold shared by token [[simHash]] and the media
    * chunk fingerprint ([[Multimodal.mediaPHash]]): per-bit ±1 votes
    * over each id's 60-bit hash multiset, sign becomes the bit. One
    * keyed partial-agg shuffle; input is (idCol, __h). */
  private[graft] def fingerprintFromHashes(hashed: DataFrame,
                                           idCol: String): DataFrame = {
    val votes = (0 until simHashBits).map { b =>
      sum(when(col("__h").bitwiseAND(shiftleft(lit(1L), b)) =!= 0L, 1).otherwise(-1)).as(s"__v$b")
    }
    val bits = (0 until simHashBits).map { b =>
      when(col(s"__v$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    hashed.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol), bits.as("simhash"))
  }

  /** Row-local SimHash fingerprint as a pure Column: per-token
    * md5-sourced 60-bit hash, per-bit set-bit counts folded over the
    * token array, bit b set iff tokens with bit b set outnumber those
    * without (2·count > n ⇔ the ±1 vote sum is positive — same rule as
    * [[simHash]], counts instead of votes; equality is asserted on the
    * fixture in StreamingSuite's T6×L2 test).
    *
    * NOT the batch path: measured ~40% slower than the explode +
    * codegen'd partial-sum groupBy at sf0.1 (nested higher-order
    * lambdas don't codegen), and as a projection it has no exchange for
    * AQE to reuse across [[simHashNearDupPairs]]'s self-join. It exists
    * because it is the only form a STREAMING pipeline can use: a
    * stateless select — no explode/groupBy pre-shuffle, nothing for
    * watermarks or state stores to track — which is what
    * [[graft.streaming.StreamOps.simHashDedup]] builds on. */
  def simHashExpr(text: Column): Column = {
    val hashes = transform(tokenSet(text),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    // counts[b] = how many token hashes have bit b set
    val masks = typedLit((0 until simHashBits).map(b => 1L << b))
    val counts = aggregate(hashes,
      array_repeat(lit(0), simHashBits),
      (acc, h) => zip_with(acc,
        transform(masks,
          m => when(h.bitwiseAND(m) =!= 0L, 1).otherwise(0)),
        _ + _))
    // token count from the already-built hash array (transform preserves
    // length) — size(tokenSet(text)) would re-split + re-distinct per row
    val n = size(hashes)
    (0 until simHashBits).map { b =>
      when(element_at(counts, b + 1) * 2 > n, shiftleft(lit(1L), b))
        .otherwise(0L)
    }.reduce(_.bitwiseOR(_))
  }

  /** L2 SimHash near-dup pairs at scale: multi-index hamming search over
    * the 60-bit [[simHash]] fingerprint, after the block-combination
    * scheme of Manku, Jain & Sarma, "Detecting Near-Duplicates for Web
    * Crawling" (WWW 2007, §3). The fingerprint splits into `blocks`
    * equal-width blocks; each of the C(blocks, blocks-maxHamming) ways
    * to choose (blocks-maxHamming) blocks becomes a probe table whose
    * key is those blocks' concatenated bits. Docs sharing any table key
    * become candidates (one equi-join on (table id, key)), then the true
    * hamming distance filters at `maxHamming`.
    *
    * EXACT, not probabilistic, whenever `maxHamming < blocks` (default
    * 3 < 6): ≤ maxHamming differing bits touch ≤ maxHamming blocks, so
    * some (blocks-maxHamming)-subset of blocks is entirely clean and
    * that table's keys agree (pigeonhole). That determinism is what lets
    * the operator hash-match a DuckDB all-pairs oracle while running as
    * a keyed equi-join at scale.
    *
    * Why combinations and not single-block tables (the blocks=4,
    * maxHamming=3 special case, where blocks-maxHamming=1): key WIDTH is
    * what bounds bucket sizes, and single-block keys of 60/4 = 15 bits
    * collapse at web scale — at 10⁹ docs every 15-bit bucket holds ~n/2¹⁵
    * ≈ 30 k docs and the per-bucket join work is quadratic. The default
    * 6 blocks give C(6,3) = 20 tables keyed on 30 bits: 5 × the explode
    * factor buys 2¹⁵ × smaller random-collision buckets, which is the
    * difference between "runs on a crawl" and "doesn't". This table/key
    * trade is exactly Manku §3's design point.
    *
    * Dedup across tables is a first-match FILTER, not a shuffle: a pair
    * whose fingerprints agree on k tables exits the join k times, but
    * both fingerprints are in hand post-join, so each copy locally
    * checks "is my table the lowest-index table whose key blocks all
    * agree?" and all but one copy drop. A `dropDuplicates(d1,d2)` here
    * would re-shuffle the entire candidate-pair stream. */
  def simHashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3, blocks: Int = 6): DataFrame =
    simHashCandidatePairs(docs, idCol, textCol, maxHamming, blocks)
      .where(col("hd") <= maxHamming)

  /** Candidate pairs (post table-dedup, PRE hamming threshold) — the
    * front whose size governs the join cost. Package-visible so tests
    * can assert it grows ~linearly on a corpus with no true near-dups
    * (random-collision rate 2^-(key width) per table). */
  private[graft] def simHashCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, blocks: Int): DataFrame =
    hammingCandidatePairs(simHash(docs, idCol, textCol), idCol, "simhash",
      maxHamming, blocks)

  /** The Manku multi-index front over an ARBITRARY 60-bit fingerprint
    * column — extracted from the token-simhash path so media payload
    * fingerprints ([[Multimodal.mediaNearDupPairs]]) ride the same
    * exact-at-pigeonhole equi-join machinery. Input: (idCol, fpCol)
    * one row per id. Output: candidate pairs with `hd`, PRE threshold. */
  private[graft] def hammingCandidatePairs(
      fps: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int, blocks: Int): DataFrame = {
    require(maxHamming < blocks,
      "exactness needs maxHamming < blocks (pigeonhole recall guarantee)")
    require(simHashBits % blocks == 0, s"blocks must divide $simHashBits")
    val w = simHashBits / blocks
    val mask = (1L << w) - 1
    def block(h: Column, j: Int): Column =
      shiftright(h, j * w).bitwiseAND(lit(mask))
    // probe tables: every (blocks-maxHamming)-subset of block indices,
    // key = that subset's blocks packed into one long (subsets of a
    // 60-bit fingerprint always pack: width ≤ 60-maxHamming·w < 64)
    val combos = (0 until blocks).combinations(blocks - maxHamming).toVector
    def key(h: Column, c: Seq[Int]): Column =
      c.foldLeft(lit(0L)) { (acc, j) =>
        shiftleft(acc, w).bitwiseOR(block(h, j)) }
    // rename staged in its own projection: the explode below references
    // "simhash", which for fpCol != "simhash" would otherwise resolve as
    // a same-select lateral column alias — illegal under Generate
    val renamed = fps.select(col(idCol).as("__id"), col(fpCol).as("simhash"))
    val tables = renamed.select(
      col("__id"), col("simhash"),
      explode(array(combos.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("t"), key(col("simhash"), c).as("k"))
      }: _*)).as("__p"))
      .select(col("__id"), col("simhash"),
        col("__p.t").as("__t"), col("__p.k").as("__k"))
    val a = tables.select(col("__t"), col("__k"),
      col("__id").as("d1"), col("simhash").as("__h1"))
    val b = tables.select(col("__t").as("__t2"), col("__k").as("__k2"),
      col("__id").as("d2"), col("simhash").as("__h2"))
    // first clean table: lowest i whose key blocks are all zero in xor
    val xor = col("__h1").bitwiseXOR(col("__h2"))
    def clean(c: Seq[Int]): Column =
      c.map(j => block(xor, j) === 0L).reduce(_ && _)
    val firstClean = combos.zipWithIndex.reverse.tail
      .foldLeft(lit(combos.size - 1)) { case (acc, (c, i)) =>
        when(clean(c), lit(i)).otherwise(acc) }
    a.join(b, col("__t") === col("__t2") && col("__k") === col("__k2") &&
        col("d1") < col("d2"))
      .where(col("__t") === firstClean)
      .select(col("d1"), col("d2"),
        bit_count(xor).cast("long").as("hd"))
  }

  /** L6: connected components over an undirected pair graph — the
    * transitive-closure step every production dedup pipeline runs after
    * pair generation (a near-dup of a near-dup is a dup; keeping one doc
    * per *pair* under-deletes). Output: one row per vertex that appears
    * in `edges`, labeled with the minimum id reachable from it
    * ("hash-to-min" label propagation — cf. Rastogi et al., *Finding
    * Connected Components in Map-Reduce in Logarithmic Rounds*, ICDE'13).
    *
    * Each round: (a) every vertex takes the min label over its closed
    * neighborhood (one keyed shuffle + partial-agg groupBy); (b) pointer
    * jump — shortcut through the label itself, `next(v) = min(m(v),
    * label(m(v)))` (label values are always vertex ids, so the lookup is
    * an equi-join against the label table). The jump doubles the distance
    * a min travels per round, so a diameter-d chain collapses in O(log d)
    * rounds instead of O(d) (verified by the 200-node-path test). Labels
    * are monotonically non-increasing, stay within the component's id
    * set, and are bounded by the component min, so the fixpoint (no label
    * changed) is exactly min-reachable-id — deterministic for any
    * partitioning. Per-round `localCheckpoint` truncates the lineage (an
    * iterative DataFrame loop otherwise re-plans an exponentially growing
    * tree). Driver holds only the loop counter and a converged flag; all
    * data stays distributed.
    *
    * Small-graph fast path: when the edge list is at most `driverEdgeCap`
    * rows (and ids are LongType), the edges — already materialized for
    * the loop's own checkpoint — are collected and closed with a driver
    * union-find (min-id roots, path halving), skipping the O(log d)
    * shuffle rounds entirely. Output-identical to the distributed loop
    * (asserted in OperatorsSuite's differential test): both label every
    * vertex of a non-self-loop edge with its component's min id. This is
    * the trainCap pattern: pair graphs that survive an LSH/multi-index
    * front are typically far smaller than the corpus, and paying 3-5
    * distributed rounds of fixed overhead to close a few-hundred-KB graph
    * is the wrong trade at any scale. The cap bounds driver memory at
    * ~2 longs × cap (≲64 MB at the default); a 100 TB corpus whose band
    * graph exceeds it takes the distributed loop unchanged. Pass
    * `driverEdgeCap = 0` to force the distributed path.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 50,
                          driverEdgeCap: Long = 2000000L): DataFrame = {
    // checkpoint the raw edges BEFORE symmetrizing: the union references
    // the edge plan twice, and for the expensive pair fronts feeding
    // this (LSH banding, block kernels) an un-materialized plan would
    // execute its whole upstream once per reference
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(true)
    val longIds = e.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (longIds && driverEdgeCap > 0 && e.count() <= driverEdgeCap)
      return unionFindLabels(edges.sparkSession, e)
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .where(col("a") =!= col("b")).distinct()
      .localCheckpoint(true) // reused every round
    uncheckpoint(e) // sym materialized — the raw edge blocks are dead
    // init at min(id, min neighbor) — one groupBy instead of the
    // identity labeling's distinct (same shuffle), and it pre-runs the
    // loop's first min-propagation: shallow graphs (the near-dup norm,
    // star-shaped clusters) then converge a full round earlier. The loop
    // invariants hold unchanged: labels start within the component's id
    // set, ≥ the component min, and monotonically non-increasing.
    var labels = sym.groupBy("a").agg(min("b").as("__mb"))
      .select(col("a").as("id"), least(col("a"), col("__mb")).as("cluster"))
      .localCheckpoint(true)
    // the checkpointed frame whose storage blocks back `labels`; freed
    // each round once the next checkpoint is materialized — without
    // this, blocks from all O(log d) rounds stay pinned in the block
    // manager until session end
    var prevCkpt = labels
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbr = sym.join(labels.withColumnRenamed("id", "b"), "b")
        .select(col("a").as("id"), col("cluster"))
      val m = nbr.union(labels).groupBy("id").agg(min("cluster").as("m"))
      val jump = labels.select(col("id").as("__jid"), col("cluster").as("__jc"))
      val stepped = labels.join(m, "id") // (id, cluster, m)
        .join(jump, col("m") === col("__jid"))
        .select(col("id"), least(col("m"), col("__jc")).as("next"),
          col("cluster").as("prev"))
        .localCheckpoint(true) // eager: prior round's blocks now unreferenced
      uncheckpoint(prevCkpt)
      prevCkpt = stepped
      converged = stepped.where(col("next") =!= col("prev")).isEmpty
      labels = stepped.select(col("id"), col("next").as("cluster"))
      iter += 1
    }
    uncheckpoint(sym) // returned labels depend only on the last checkpoint
    require(converged, s"connectedComponents: not converged after $maxIter rounds")
    labels
  }

  /** Drop the block-manager storage behind a `localCheckpoint(true)`ed
    * frame once no live plan references it: an eager local checkpoint
    * persists its RDD (MEMORY_AND_DISK) and nothing unpins it until
    * session end. Matches only a ROOT `LogicalRDD` — i.e. a frame that
    * IS a checkpoint — so it's a true no-op on anything else; a plan
    * traversal would also unpersist caller-owned RDD-backed inputs
    * buried inside derived frames. */
  private[graft] def uncheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Driver union-find closure for [[connectedComponents]]' small-graph
    * fast path: `e` is the checkpointed (a, b) edge list, already
    * count-bounded by the caller. Roots are kept at the component min by
    * construction (a union always links the larger root under the
    * smaller), so `find` returns the min-reachable-id directly; path
    * halving keeps find amortized near-constant. Self-loops are skipped
    * and vertices seen only in self-loops are absent from the output —
    * the same contract as the distributed loop's `a =!= b` symmetrize. */
  private def unionFindLabels(spark: SparkSession, e: DataFrame): DataFrame = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.get(x)
      while (p != x) {
        val gp = parent.get(p)
        parent.put(x, gp); x = gp; p = parent.get(x)
      }
      x
    }
    e.collect().foreach { r =>
      if (!r.isNullAt(0) && !r.isNullAt(1)) {
        val a = r.getLong(0); val b = r.getLong(1)
        if (a != b) {
          parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent.put(rb, ra)
          else if (rb < ra) parent.put(ra, rb)
        }
      }
    }
    uncheckpoint(e)
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
    val ks = parent.keySet().iterator()
    while (ks.hasNext) { val k = ks.next(); out += ((k, find(k))) }
    spark.createDataFrame(out.toSeq).toDF("id", "cluster")
  }

  /** L6 end-to-end: near-dup *clusters* over `docs` — MinHash-LSH pair
    * generation at `tau` ([[minHashLshPairs]]), transitive closure
    * ([[connectedComponents]]), then every doc labeled with its cluster's
    * min id (docs in no pair become singleton clusters of themselves) and
    * the cluster size. Downstream dedup keeps `idCol == cluster_id` rows.
    */
  def nearDupClusters(docs: DataFrame, idCol: String, textCol: String,
                      tau: Double, numHashes: Int = 64, bands: Int = 32): DataFrame = {
    Joins.requireFreeColumns("nearDupClusters", docs.columns,
      "cluster_id", "csize", "__ccid", "__cc")
    labelClusters(docs, idCol,
      minHashLshPairs(docs, idCol, textCol, tau, numHashes, bands))
  }

  /** L6 at corpus scale: LSH-only near-dup clusters — [[minHashLshStarEdges]]
    * (no exact-Jaccard verify) into the same transitive closure + labeling
    * as [[nearDupClusters]]. This is the mode large LLM-corpus dedup
    * pipelines actually run: on a dup-dense corpus the verified path is
    * inherently quadratic inside clusters (this repo's fixture measures
    * ~25% of ALL pairs above j=0.8 — ≥3M true pairs at sf0.1, and any
    * verify stage must score each one), while the star-edge graph stays
    * O(bands × docs) no matter how dup-dense the data is.
    *
    * Precision/recall vs the verified path: clustering is by shared-bucket
    * connectivity, so the effective threshold is the band S-curve
    * P(share a bucket | j) = 1-(1-j^r)^bands, r = numHashes/bands —
    * defaults (128, 16 ⇒ r=8) put the 50% point at j ≈ (1/16)^(1/8) ≈ 0.71
    * with a sharp transition; there is no post-hoc tau. False-positive
    * bucket collisions merge clusters that exact verification would keep
    * apart, so at EQUAL (numHashes, bands) every verified cluster is
    * contained in one approx cluster (a coarsening — asserted in
    * OperatorsSuite). Use the verified path when precision is the
    * contract; use this when the corpus is web-scale or dup-dense. */
  def nearDupClustersApprox(docs: DataFrame, idCol: String, textCol: String,
                            numHashes: Int = 128, bands: Int = 16): DataFrame = {
    Joins.requireFreeColumns("nearDupClustersApprox", docs.columns,
      "cluster_id", "csize", "__ccid", "__cc")
    labelClusters(docs, idCol,
      minHashLshStarEdges(docs, idCol, textCol, numHashes, bands))
  }

  /** Exact-collapse front for verified near-dup clustering: collapse
    * verbatim duplicates (same `md5(text)`) to their min-id
    * representative, run the verified LSH + Jaccard + CC path over
    * representatives only, then propagate labels back to every doc.
    *
    * Output-IDENTICAL to [[nearDupClusters]] on the full corpus, not an
    * approximation: members of an exact group share the same token set,
    * so (a) every within-group pair has Jaccard 1 ≥ tau — a clique the
    * closure would collapse anyway — and (b) any cross-group pair
    * (a, b) has J(rep(a), rep(b)) = J(a, b), so rep connectivity equals
    * doc connectivity, and the min-id label lifts unchanged because
    * each rep IS its group's min id. What's saved: the verify stage
    * never sees a within-group pair — on web corpora, where verbatim
    * boilerplate dominates dup mass, that's most of the quadratic
    * within-cluster cost of the verified path (a group of m verbatim
    * copies contributes m²/2 candidate pairs but only 1 rep).
    * One extra groupBy + one join vs [[nearDupClusters]]; the join back
    * on the text hash is skew-split by AQE when a group is huge. */
  def nearDupClustersCollapsed(docs: DataFrame, idCol: String, textCol: String,
                               tau: Double, numHashes: Int = 64,
                               bands: Int = 32): DataFrame = {
    Joins.requireFreeColumns("nearDupClustersCollapsed", docs.columns,
      "cluster_id", "csize", "__h", "__rep", "__cc")
    val withH = docs.select(col(idCol), col(textCol), md5(col(textCol)).as("__h"))
    val groupRep = withH.groupBy("__h").agg(min(col(idCol)).as("__rep"))
    val tagged = withH.join(groupRep, "__h") // (id, text, __h, __rep)
    val reps = tagged.where(col(idCol) === col("__rep"))
      .select(col(idCol), col(textCol))
    val cc = connectedComponents(
        minHashLshPairs(reps, idCol, textCol, tau, numHashes, bands), "d1", "d2")
      .select(col("id").as("__rep"), col("cluster").as("__cc"))
    val lbl = tagged.select(col(idCol), col("__rep"))
      .join(cc, Seq("__rep"), "left")
      .select(col(idCol), coalesce(col("__cc"), col("__rep")).as("cluster_id"))
    val sizes = lbl.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
    lbl.join(sizes, "cluster_id").select(col(idCol), col("cluster_id"), col("csize"))
  }

  /** L6 over the hamming metric: [[simHashNearDupPairs]] edges (exact at
    * `maxHamming` by the multi-index pigeonhole) into the shared
    * transitive-closure + labeling tail. The hamming analog of
    * [[nearDupClusters]]: same output contract (every doc labeled with
    * its component's min id + cluster size, singletons of themselves),
    * different similarity metric — fingerprint hamming distance instead
    * of verified Jaccard, which prices each pair at O(1) bit-ops rather
    * than a token-set intersection. */
  def simHashClusters(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3, blocks: Int = 6): DataFrame = {
    Joins.requireFreeColumns("simHashClusters", docs.columns,
      "cluster_id", "csize", "__ccid", "__cc")
    labelClusters(docs, idCol,
      simHashNearDupPairs(docs, idCol, textCol, maxHamming, blocks))
  }

  /** Shared labeling tail: transitive closure over `edges` (d1, d2),
    * then every doc labeled with its component's min id (docs in no edge
    * become singletons of themselves) and the cluster size. Downstream
    * dedup keeps `idCol == cluster_id` rows. */
  private[operators] def labelClusters(docs: DataFrame, idCol: String,
                                       edges: DataFrame): DataFrame = {
    val cc = connectedComponents(edges, "d1", "d2")
      .select(col("id").as("__ccid"), col("cluster").as("__cc"))
    val lbl = docs.select(col(idCol))
      .join(cc, col(idCol) === col("__ccid"), "left")
      .select(col(idCol), coalesce(col("__cc"), col(idCol)).as("cluster_id"))
    val sizes = lbl.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
    lbl.join(sizes, "cluster_id").select(col(idCol), col("cluster_id"), col("csize"))
  }

  /** Curation tail for any L6 clustering: pick each cluster's canonical
    * representative by highest score, ties broken by min id — "keep the
    * best copy" instead of [[labelClusters]]'s min-id convention, which
    * is how a corpus pipeline actually dedups (drop the low-quality
    * mirrors, keep the cleanest). `clusters` follows the labelClusters
    * contract (`idCol`, cluster_id, csize); `scored` maps `idCol` → a
    * `scoreCol`. One keyed join + a per-cluster window — the window's
    * partition is the cluster, so skew is bounded by the largest dup
    * cluster, not the corpus. Output: one row per cluster
    * (cluster_id, rep_id, rep_score, csize). */
  def keepBestPerCluster(clusters: DataFrame, scored: DataFrame,
                         idCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Joins.requireFreeColumns("keepBestPerCluster", scored.columns, "__rk",
      "cluster_id", "csize")
    Joins.requireFreeColumns("keepBestPerCluster", clusters.columns, "__rk")
    val w = Window.partitionBy("cluster_id")
      .orderBy(col(scoreCol).desc, col(idCol))
    clusters.join(scored, idCol)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col("cluster_id"), col(idCol).as("rep_id"),
        col(scoreCol).as("rep_score"), col("csize"))
  }

  /** Word n-gram (shingle) Jaccard pairs — contiguous n-token shingles,
    * then exact Jaccard at `tau` (test-scale exact form; the LSH path
    * applies unchanged by swapping token sets for shingle sets). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, tau: Double): DataFrame = {
    // token array staged in its own projection: inlined into the shingle
    // lambda it would re-split the text once PER SHINGLE (O(tokens²) per
    // row); the size guard keeps docs shorter than n tokens shingle-free
    // instead of feeding `sequence` a descending (1, size-n+1) range
    val toks = col("__toks")
    val shingles = when(size(toks) >= n, array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
    val t = docs.select(col(idCol).as("__id"), split(col(textCol), " ").as("__toks"))
      .select(col("__id"), shingles.as("__tok"))
      .where(size(col("__tok")) > 0)
    val a = t.select(col("__id").as("d1"), col("__tok").as("t1"))
    val b = t.select(col("__id").as("d2"), col("__tok").as("t2"))
    a.join(b, col("d1") < col("d2"))
      .withColumn("__j", jaccard(col("t1"), col("t2")))
      .where(col("__j") >= tau)
      .select(col("d1"), col("d2"), round(col("__j"), 4).as("j"))
  }

  /** Line-level boilerplate removal (the RefinedWeb/Dolma pass that
    * runs BESIDE document-level dedup): a line occurring in more than
    * `maxDocFreq` distinct documents is boilerplate (headers, footers,
    * cookie banners, nav chrome) and is dropped from every document;
    * surviving lines are re-joined in original order. Documents whose
    * every line is boilerplate disappear from the output — that is the
    * point (they carried no content).
    *
    * Output: id, n_lines (original), n_kept, clean (re-joined text).
    *
    * Scale shape: one distinct on (doc, line) + one line-keyed count +
    * one join back — all keyed shuffles. The join's hot keys are
    * exactly the boilerplate lines, but the build side carries ONE row
    * per distinct line, so skew costs a fan-out probe, not a mega
    * partition; the per-doc reassembly groupBy is bounded by doc
    * length. Line identity is exact-string; normalize upstream if
    * near-identical banners must collapse. */
  /** Aggressive dedup normalization (the RefinedWeb/Dolma "fuzzy
    * exact" preprocessing): lowercase, every non-alphanumeric char to
    * a space, whitespace runs collapsed, ends trimmed. Exact dedup on
    * this form catches the casing/punctuation/markup variants that
    * verbatim-hash dedup misses while staying a pure codegen'd
    * projection (no tokenization, no pairwise compare). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
      " +", " "))

  /** [[normalizeText]] with a Unicode NFKC compatibility fold in
    * front (the C4/CCNet preprocessing order): full-width forms,
    * ligatures, and combining sequences collapse to their canonical
    * ASCII/composed shapes BEFORE the lowercase/strip pass — so
    * "Ｈｅｌｌｏ" and "hello", or "ﬁnal" and "final", normalize (and
    * hence dedup) together, where the plain form would strip the
    * non-ASCII source characters to spaces and miss the match. Still
    * a pure codegen'd projection (the normalizer is a native
    * Expression, graft.expressions.UnicodeNormalize). */
  def normalizeTextUnicode(text: Column): Column =
    normalizeText(graft.expressions.TextExpressions.normalizeUnicode(text))

  /** L1n normalized exact dedup: every doc labeled with its
    * normalized-form hash, the group representative (min id), the
    * group size, and a keep flag. Same scale shape as [[exactDedup]] --
    * one hash-keyed groupBy + one join back, both well-distributed
    * (md5 keys) -- deliberately NOT a window over partitionBy(norm_h):
    * a mega dup group (web boilerplate with millions of copies) would
    * pin every copy to one window task, while the join form gets AQE
    * skew-split (PlanShapeSuite pins the window-free shape). The
    * (id, norm_h) projection is localCheckpoint'ed so the regex
    * normalizer runs ONCE per row -- without it the group agg and the
    * probe side each re-evaluate the normalize (they cannot share an
    * exchange: partial-agg rows vs raw rows); the materialization is
    * id + 32-hex-char rows, doc-count-sized.
    *
    * Null text, and text whose normalized form is EMPTY (pure
    * punctuation/markup -- no alphanumeric content), gets a null
    * `norm_h` and passes through as its own singleton group
    * (rep_id = id, dup_count = 1, keep = true) -- consistent with the
    * streaming variant's null passthrough, and so that content-free
    * symbol soup doesn't collapse into one giant accidental dup group.
    * Output: (id, norm_h, rep_id, dup_count, keep). */
  def normalizedDedup(df: DataFrame, idCol: String, textCol: String,
                      nfkc: Boolean = false): DataFrame = {
    Joins.requireFreeColumns("normalizedDedup", df.columns,
      "norm_h", "rep_id", "dup_count", "keep")
    val norm =
      if (nfkc) normalizeTextUnicode(col(textCol))
      else normalizeText(col(textCol))
    val hashed = df.select(col(idCol),
      when(col(textCol).isNull || norm === "", lit(null).cast("string"))
        .otherwise(md5(norm)).as("norm_h"))
      .localCheckpoint()
    val groups = hashed.where(col("norm_h").isNotNull).groupBy("norm_h")
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("dup_count"))
    hashed.join(groups, Seq("norm_h"), "left")
      .select(col(idCol), col("norm_h"),
        coalesce(col("rep_id"), col(idCol)).as("rep_id"),
        coalesce(col("dup_count"), lit(1L)).as("dup_count"),
        (coalesce(col("rep_id"), col(idCol)) === col(idCol)).as("keep"))
  }

  def dropBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
                           maxDocFreq: Long): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val lines = df.select(col(idCol),
        size(split(col(textCol), "\n")).cast("long").as("__nl"),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val docFreq = lines.select(col(idCol), col("__line")).distinct()
      .groupBy("__line").agg(count(lit(1)).as("__df"))
    lines.join(docFreq, "__line")
      .where(col("__df") <= maxDocFreq)
      .groupBy(col(idCol))
      .agg(max(col("__nl")).as("n_lines"),
        count(lit(1)).as("n_kept"),
        sort_array(collect_list(struct(col("__pos"), col("__line")))).as("__a"))
      .select(col(idCol), col("n_lines"), col("n_kept"),
        array_join(transform(col("__a"), x => x.getField("__line")), "\n")
          .as("clean"))
  }

  /** Exact substring dedup (the Lee et al. 2022 "Deduplicating Training
    * Data Makes Language Models Better" ExactSubstr family, re-expressed
    * as a fixed-width shingle-fingerprint pass instead of a suffix
    * array): any token run of length ≥ 2k−1 that appears more than once
    * in the corpus — across documents or repeated inside one — is
    * excised from every occurrence EXCEPT the globally first (min
    * (id, position)), so exactly one copy of each repeated span
    * survives. This is the operator the whole-doc/normalized/line
    * dedups can't express: a 200-token boilerplate block embedded in
    * two otherwise-distinct documents.
    *
    * Mechanics: position i of a doc carries the xxhash64 of its k-token
    * shingle `toks[i..i+k−1]`; a start is duplicated when its shingle
    * hash occurs ≥ 2 times corpus-wide and it is not the first
    * occurrence in (id, pos) order; every token covered by a duplicated
    * start is cut and survivors are re-joined in order. A shared run of
    * length L ≥ k contributes L−k+1 duplicated starts whose covered
    * union is the whole run, so the guarantee is: repeated spans of
    * ≥ 2k−1 tokens are fully excised from non-first occurrences
    * (shorter repeats ≥ k lose their interior; < k are invisible —
    * pick k at half the span width you care about, Lee et al. use 50).
    *
    * Scale shape: one shuffle keyed on the shingle hash — but as a
    * partial-aggregable `groupBy(fp).agg(count, min((id, pos)))`, NOT a
    * window: map-side combine collapses a hot shingle (a banner repeated
    * 10⁶×) into per-partition partials, so no single reducer ever sorts
    * the full occurrence list, and the post-filter stats table carries
    * DUPLICATED fps only (small by the same argument dedup exists at
    * all — AQE broadcasts it when it fits). Then one explode of dup
    * starts (fan-out k per start, bounded by dup volume), one
    * doc-keyed groupBy of covered positions, and one doc-keyed join of
    * the covered-position ARRAY back onto the token array, excised with
    * an order-preserving HOF `filter` — the corpus text itself is never
    * exploded or re-sorted. No pairwise compare, no suffix array, no
    * driver state. Output: (id, n_tokens, n_removed, clean).
    */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 8): DataFrame = {
    require(k >= 2, "substringDedup needs k >= 2")
    Joins.requireFreeColumns("substringDedup", df.columns,
      "n_tokens", "n_removed", "clean")
    val s = col("__s")
    val base = df.select(col(idCol), split(col(textCol), " ").as("__s"))
    // staged gram array (the winnowing lesson: inlined into a second
    // HOF it would re-hash the text once per window). Docs shorter than
    // k can't fill a shingle and emit no starts (Spark sequence(1, 0)
    // would count DOWN — the filter, not greatest(), is the guard).
    // fingerprint = xxhash64 (8-byte long), not md5 hex (32-char string):
    // the fp is INTERNAL — only its equality matters, the output carries
    // positions and text — so the cheapest collision-resistant hash wins;
    // at 10⁹ shingles the 64-bit birthday bound is ~3·10⁻², per-PAIR
    // false-merge odds ~2⁻⁶⁴, and a collision costs one spurious span
    // excision, not corruption. The DuckDB oracle hashes with md5 and
    // still matches: both sides decide excision on shingle EQUALITY.
    // localCheckpoint: both the fp-stats agg and the dup-start probe
    // consume `starts`, and their exchanges can't be shared (the agg
    // side shuffles map-combined partials, the join side raw rows) —
    // without it the split+slice+hash shingle pass runs twice. The
    // materialization is (id, pos, fp) longs — ~24 B/shingle.
    // POSITIONAL explode (the langIdNgram instances pattern), not an
    // explode of a per-doc transform() array: InferFiltersFromGenerate
    // adds a `size(child) > 0` pre-filter to every Generate, and with a
    // transform() child that filter re-inlines the WHOLE shingle-hash
    // lambda — the full O(tokens × k) hashing ran TWICE per doc, once
    // inside the inferred filter (pushed below the operator's first
    // exchange, i.e. serially into the scan stage) and once in the real
    // projection (measured: a 1-task ~1.9 s CPU stage at sf0.1 doing
    // nothing but the duplicated filter hashing). Exploding the int
    // position sequence makes the inferred filter O(tokens) sequence
    // construction, and the hash computes once per position AFTER the
    // explode, inside the parallel stage.
    val starts = base.where(size(s) >= k)
      .select(col(idCol), s,
        explode(sequence(lit(1), size(s) - (k - 1))).as("__pos"))
      .select(col(idCol), col("__pos"),
        xxhash64(array_join(slice(s, col("__pos"), lit(k)), " ")).as("__fp"))
      .localCheckpoint()
    // dup-fp stats: count + global first occurrence, both map-side
    // combinable (min over the (id, pos) struct IS the row_number()=1
    // row of the old window formulation, without the per-fp sort).
    val fpStats = starts
      .groupBy(col("__fp"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col(idCol), col("__pos"))).as("__first"))
      .where(col("__c") >= 2)
      .select(col("__fp"), col("__first"))
    val dupStarts = starts
      .join(fpStats, Seq("__fp"))
      .where(struct(col(idCol), col("__pos")) =!= col("__first"))
      .select(col(idCol), col("__pos"))
    // per-doc covered-position set (collect_set dedups overlapping
    // shingle windows); dup-volume-bounded, keyed by doc.
    val covered = dupStarts
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + (k - 1))).as("__tp"))
      .groupBy(col(idCol))
      .agg(collect_set(col("__tp")).as("__cov"))
    base.join(covered, Seq(idCol), "left")
      .select(col(idCol),
        size(s).cast("long").as("n_tokens"),
        coalesce(size(col("__cov")), lit(0)).cast("long").as("n_removed"),
        when(col("__cov").isNull, array_join(s, " "))
          .otherwise(array_join(
            zip_with(s, sequence(lit(1), size(s)),
              (tok, p) => when(array_contains(col("__cov"), p), lit(null))
                .otherwise(tok)),
            " "))
          .as("clean"))
  }
}
