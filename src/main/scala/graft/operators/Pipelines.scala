package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation utilities a training-data pipeline runs after
  * dedup/quality filtering: deterministic splits, stratified sampling,
  * PII scrubbing, and output sharding. All seeded/hash-based — the same
  * row lands in the same split on every run and every cluster, which is
  * the property that matters when the corpus is rebuilt incrementally.
  */
object Pipelines {

  /** Deterministic train/val/test split: xxhash64(id, seed) mod 100
    * against cumulative percentage cut-points. No sampling state, no
    * shuffle — a pure projection, stable under re-runs and appends. */
  def splitByHash(df: DataFrame, idCol: String,
                  cuts: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5),
                  seed: Long = 42L): DataFrame = {
    require(cuts.map(_._2).sum == 100, "split percentages must total 100")
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(100L))
    val expr = cuts.scanLeft(("", 0)) { case ((_, acc), (name, p)) => (name, acc + p) }
      .drop(1)
      .foldRight(lit(null).cast("string")) { case ((name, upper), els) =>
        when(bucket < upper, name).otherwise(els)
      }
    df.withColumn("split", expr)
  }

  /** Oracle-portable deterministic split: the first hex nibble of
    * `md5(id)` → 16 equal buckets, mapped to named splits by cumulative
    * nibble upper-bounds (default 14/15/16 ≈ 87.5/6.25/6.25%). Same
    * fixed-point property as [[splitByHash]] — row → split is a pure
    * function of the id, stable under re-runs and appends — but
    * reproducible on any engine with md5, which is what a train/val
    * contamination audit outside Spark needs. [[splitByHash]] (xxhash64
    * mod 100) stays the in-engine default: percent-granular cuts and a
    * cheaper non-cryptographic hash. */
  def splitByMd5Prefix(df: DataFrame, idCol: String,
                       cuts: Seq[(String, Int)] =
                         Seq("train" -> 14, "val" -> 15, "test" -> 16)): DataFrame = {
    val uppers = cuts.map(_._2)
    require(uppers.nonEmpty && uppers.last == 16 && uppers == uppers.sorted.distinct,
      "cuts must be strictly increasing hex-nibble upper bounds ending at 16")
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 1), 16, 10).cast("long")
    val splitExpr = cuts.foldRight(lit(null).cast("string")) {
      case ((name, upper), els) => when(bucket < upper, name).otherwise(els)
    }
    df.withColumn("split", splitExpr)
  }

  /** Leakage-free train/val/test split: assign each doc the split of
    * its NEAR-DUP CLUSTER (md5 of the cluster id, same nibble cuts as
    * [[splitByMd5Prefix]]), so two near-duplicate documents can never
    * land on opposite sides of a train/eval boundary — the standard
    * eval-contamination failure of splitting on doc id, fixed at the
    * split stage rather than by post-hoc decontamination. Composes
    * [[Dedup.nearDupClusters]] (MinHash-LSH + exact verify + CC; its
    * scale posture applies) with the content-addressed split; docs in
    * no cluster are their own singleton (cluster_id = own id) and
    * split independently, exactly as before.
    * Output: (id, cluster_id, csize, split). */
  def leakFreeSplit(docs: DataFrame, idCol: String, textCol: String,
                    tau: Double,
                    cuts: Seq[(String, Int)] =
                      Seq("train" -> 14, "val" -> 15, "test" -> 16)): DataFrame =
    splitByMd5Prefix(
      Dedup.nearDupClusters(docs, idCol, textCol, tau), "cluster_id", cuts)

  /** √-temperature mixture rates (temperature sampling at α = 1/2,
    * the multilingual-corpus re-balancing convention of XLM-R /
    * mT5-style mixing): per stratum the keep fraction
    * `sqrt(min_n / n_s)` — the per-doc rate that turns the observed
    * distribution into the α = 0.5-tempered one, normalized so the
    * smallest stratum keeps everything. `keep256 = min(256,
    * ⌈frac·256⌉)` feeds [[mixtureSampleByMd5]] directly.
    *
    * α is FIXED at 1/2 on purpose: sqrt is correctly rounded by IEEE
    * 754 on every engine, so the rate table is bit-deterministic —
    * a general `pow(n, α-1)` is not correctly rounded and two engines
    * can disagree in the last ulp (and after rounding). One partial-agg
    * groupBy + a 1-row broadcast min.
    * Output: (stratum, n_docs, keep_frac, keep256). */
  def sqrtTemperatureRates(df: DataFrame, stratumCol: String): DataFrame = {
    Joins.requireFreeColumns("sqrtTemperatureRates", Seq(stratumCol),
      "n_docs", "keep_frac", "keep256")
    val s = df.groupBy(stratumCol).agg(count(lit(1)).as("n_docs"))
    val m = s.agg(min("n_docs").as("__mn"))
    val frac = sqrt(col("__mn").cast("double") / col("n_docs").cast("double"))
    s.crossJoin(broadcast(m))
      .select(col(stratumCol), col("n_docs"),
        round(frac, 4).as("keep_frac"),
        least(lit(256L), ceil(frac * 256).cast("long")).as("keep256"))
  }

  /** Deterministic content-addressed sample: keep a row iff its first
    * md5 byte (of the id) falls under `keep256`/256 — a pure filter, no
    * RNG state, the same rows survive on every engine, every run, and
    * every append (the property an eval/holdout set needs; `sampleBy`'s
    * executor-local RNG can't promise any of that outside Spark). */
  def sampleByMd5(df: DataFrame, idCol: String, keep256: Int): DataFrame = {
    require(keep256 >= 0 && keep256 <= 256, "keep256 must be in [0, 256]")
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 2), 16, 10).cast("long")
    df.where(bucket < keep256)
  }

  /** Deterministic per-stratum QUOTA sample: exactly min(k, |stratum|)
    * rows per stratum, chosen by smallest md5(id) — the "exactly 10k
    * eval docs per domain" primitive. Content-addressed like
    * [[sampleByMd5]] (same rows win on every engine and every run) but
    * quota-exact where the byte threshold is only rate-exact; NOT
    * append-stable (a new row with a smaller hash displaces the
    * largest winner — the price of an exact count).
    *
    * Scale shape: one window PARTITIONED BY THE STRATUM ordered by
    * (hash, id) — per-task state is a row counter; a mega-stratum
    * lands on one task, so for quota-sampling a near-unkeyed corpus
    * use [[quotaSampleByMd5TwoPhase]] (identical winners, sharded
    * phase-1 top-k) or fall back to [[sampleByMd5]].
    * Output: input columns, quota survivors only. */
  def quotaSampleByMd5(df: DataFrame, stratumCol: String, idCol: String,
                       k: Int): DataFrame = {
    require(k >= 0, "k must be >= 0")
    Joins.requireFreeColumns("quotaSampleByMd5", df.columns, "__h", "__rk")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(stratumCol)).orderBy(col("__h"), col(idCol))))
      .where(col("__rk") <= k)
      .drop("__h", "__rk")
  }

  /** [[quotaSampleByMd5]] without the mega-stratum pin: the SAME
    * (md5(id), id)-smallest winners, selected in TWO phases — a
    * shard-local top-k (window over (stratum, shard), shard = md5-tail
    * mod `shards`) and then a per-stratum top-k over only the phase-1
    * survivors. Exact by a standard argument: the global k smallest
    * of a stratum are each among their own shard's k smallest, so
    * top-k(∪ shard-local top-ks) ≡ top-k(stratum). No task ever sees
    * more than max(shard size, shards·k) rows: phase 1 parallelizes a
    * mega-stratum across `shards` tasks and phase 2's per-stratum
    * input is ≤ shards·k rows — this is the escape hatch the
    * single-window form's scaladoc points at. Output: input columns,
    * quota survivors only (row order unspecified). */
  def quotaSampleByMd5TwoPhase(df: DataFrame, stratumCol: String,
                               idCol: String, k: Int,
                               shards: Int = 32): DataFrame = {
    require(k >= 0, "k must be >= 0")
    require(shards >= 1, "shards must be >= 1")
    Joins.requireFreeColumns("quotaSampleByMd5TwoPhase", df.columns,
      "__h", "__shard", "__rk", "__rk2")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__h", md5(col(idCol).cast("string")))
      // tail nibbles of the same hash: deterministic, balance-only
      // (selection never depends on WHICH shard a row lands in)
      .withColumn("__shard", pmod(
        conv(substring(col("__h"), 25, 8), 16, 10).cast("long"),
        lit(shards.toLong)))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(stratumCol), col("__shard"))
          .orderBy(col("__h"), col(idCol))))
      .where(col("__rk") <= k)
      .withColumn("__rk2", row_number().over(
        Window.partitionBy(col(stratumCol)).orderBy(col("__h"), col(idCol))))
      .where(col("__rk2") <= k)
      .drop("__h", "__shard", "__rk", "__rk2")
  }

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis 2006, algorithm A-ES), content-addressed: each row draws
    * its uniform u ∈ (0,1) from md5(id) — first 13 hex nibbles j →
    * (j + 0.5) / 2^52 — and the k rows with the largest u^(1/w) win,
    * computed in log space as ln(u)/w (same argmax, no underflow at
    * tiny weights). Higher weight ⇒ key closer to 0 ⇒ more likely
    * selected; raising one row's weight can only keep or add it
    * (monotone), never drop it. The key is rounded to 10 dp so
    * near-equal keys become EXACT ties broken by id — the ordering an
    * independent engine reproduces bit-for-bit.
    *
    * Scale shape: global top-k via orderBy+limit ⇒
    * TakeOrderedAndProject (per-partition partial top-k, single
    * k-sized merge) — no window, no full sort. Rows with w ≤ 0 or
    * null are excluded (A-ES is defined on positive weights).
    * Output: input columns, sample members only. */
  def weightedSampleByMd5(df: DataFrame, idCol: String, weightCol: String,
                          k: Int): DataFrame = {
    require(k >= 0, "k must be >= 0")
    Joins.requireFreeColumns("weightedSampleByMd5", df.columns, "__key")
    val j = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("double")
    val u = (j + 0.5) / 4503599627370496.0 // 2^52
    df.where(col(weightCol).cast("double") > 0.0)
      .withColumn("__key", round(log(u) / col(weightCol).cast("double"), 10))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .drop("__key")
  }

  /** Per-stratum weighted sample WITHOUT replacement: A-ES
    * ([[weightedSampleByMd5]]'s key — ln(u)/w from md5(id), rounded
    * 10 dp, id tie-break) ranked INSIDE each stratum by the quota
    * machinery ([[quotaSampleByMd5]]'s window shape) — "the best-k
    * documents per domain, quality-weighted", the primitive that
    * closes the quota (uniform, exact-k) vs weighted (global-k) gap.
    *
    * Same mega-stratum caveat as [[quotaSampleByMd5]]: the per-stratum
    * window pins a stratum to one task. For a near-unkeyed corpus,
    * the two-phase trick applies identically (shard-local top-k on the
    * SAME key, then per-stratum top-k over ≤ shards·k survivors) —
    * pass `shards > 1` to take that path; winners are identical.
    * Rows with w ≤ 0 or null are excluded.
    * Output: input columns, sample members only. */
  def weightedQuotaSampleByMd5(df: DataFrame, stratumCol: String,
                               idCol: String, weightCol: String, k: Int,
                               shards: Int = 1): DataFrame = {
    require(k >= 0, "k must be >= 0")
    require(shards >= 1, "shards must be >= 1")
    Joins.requireFreeColumns("weightedQuotaSampleByMd5", df.columns,
      "__h", "__key", "__shard", "__rk", "__rk2")
    import org.apache.spark.sql.expressions.Window
    val j = conv(substring(col("__h"), 1, 13), 16, 10).cast("double")
    val u = (j + 0.5) / 4503599627370496.0 // 2^52
    val staged = df
      .where(col(weightCol).cast("double") > 0.0)
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__key", round(log(u) / col(weightCol).cast("double"), 10))
    val phase1 =
      if (shards == 1) staged
      else staged
        .withColumn("__shard", pmod(
          conv(substring(col("__h"), 25, 8), 16, 10).cast("long"),
          lit(shards.toLong)))
        .withColumn("__rk", row_number().over(
          Window.partitionBy(col(stratumCol), col("__shard"))
            .orderBy(col("__key").desc, col(idCol))))
        .where(col("__rk") <= k)
    phase1
      .withColumn("__rk2", row_number().over(
        Window.partitionBy(col(stratumCol))
          .orderBy(col("__key").desc, col(idCol))))
      .where(col("__rk2") <= k)
      .drop("__h", "__key", "__shard", "__rk", "__rk2")
  }

  /** Stratified sample: per-stratum fractions via seeded `sampleBy` —
    * e.g. downsample over-represented languages. Executor-local RNG per
    * row, no shuffle. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  private val piiPatterns: Seq[(String, String)] = Seq(
    ("""[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}""", "<EMAIL>"),
    ("""https?://[^\s]+""", "<URL>"),
    ("""\b(?:\+?\d{1,3}[ -]?)?(?:\(\d{2,4}\)[ -]?)?\d{3,4}[ -]\d{3,4}\b""", "<PHONE>"),
    ("""\b\d{3}-\d{2}-\d{4}\b""", "<SSN>"))

  /** Scrub common PII shapes from a text column (email, URL, phone, SSN)
    * — chained regexp_replace, codegen-eligible, order matters (URL
    * before phone so digits in URLs don't half-match). */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Strip HTML/markup down to text (the first stage of every
    * web-crawl curation pipeline — WET-style extraction): script/style
    * blocks removed WITH their content, comments removed, remaining
    * tags removed, the common character entities decoded (amp last, so
    * `&amp;lt;` decodes to the literal `&lt;` and never resurrects a
    * tag), and whitespace collapsed/trimmed. Chained codegen'd
    * regexp_replace — zero shuffle, streams through the scan; the
    * pattern set is RE2-compatible (no lookarounds, lazy quantifiers
    * only), so an oracle can replay it verbatim. NOT a sanitizer:
    * malformed/adversarial markup may survive — this is corpus
    * cleaning, not XSS defense. */
  def stripMarkup(text: Column): Column = {
    val deTagged = Seq(
      """(?is)<script\b[^>]*>.*?</script\s*>""" -> " ",
      """(?is)<style\b[^>]*>.*?</style\s*>""" -> " ",
      """(?s)<!--.*?-->""" -> " ",
      """(?s)<[^>]+>""" -> " ")
      .foldLeft(text) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) }
    val deEntitied = Seq(
      "&nbsp;" -> " ", "&quot;" -> "\"", "&#39;" -> "'",
      "&lt;" -> "<", "&gt;" -> ">", "&amp;" -> "&")
      .foldLeft(deTagged) { case (c, (ent, ch)) =>
        regexp_replace(c, ent, java.util.regex.Matcher.quoteReplacement(ch)) }
    trim(regexp_replace(deEntitied, """\s+""", " "))
  }

  /** Shard a corpus for output: repartition by hash of id into `shards`
    * writer tasks → `shards` similar-sized files per partition dir, the
    * knob that keeps 100 TB outputs at 128-512 MB per file. */
  def shardForOutput(df: DataFrame, idCol: String, shards: Int): DataFrame =
    df.repartition(shards, col(idCol))

  /** Chunk long documents into overlapping token windows (context-length
    * preparation): windows of `chunkSize` tokens every `chunkSize -
    * overlap` tokens, last partial window kept. Pure column algebra —
    * sequence → transform → posexplode, no shuffle, no UDF. Output: one
    * row per (doc, chunk_id) with the chunk text and its token count. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    // token array staged in its own projection — inlined into the chunk
    // lambda it would re-split the text once per chunk
    val toks = col("__toks")
    // window starts: 1, 1+step, … up to numToks - overlap (1-based): a
    // start past that bound would yield a window fully contained in the
    // previous chunk's overlap. The last window may be partial.
    val starts = sequence(lit(1), greatest(size(toks) - overlap, lit(1)), lit(step))
    val chunks = transform(starts, s => struct(
      concat_ws(" ", slice(toks, s, lit(chunkSize))).as("chunk"),
      size(slice(toks, s, lit(chunkSize))).cast("bigint").as("n_tokens")))
    df.select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "c")))
      .select(col(idCol), col("chunk_id").cast("bigint").as("chunk_id"),
        col("c.chunk").as("chunk"), col("c.n_tokens").as("n_tokens"))
  }

  /** Sequence packing for fixed-context training (the concatenate-and-
    * chunk construction): documents are laid end-to-end in deterministic
    * (shard, id) order and the token stream is cut every `capacity`
    * tokens; each document records which context window(s) it lands in.
    * Output per input row: `shard`, `n_tokens`, `gstart` (the doc's
    * offset in its shard's token stream), `start_bin`/`end_bin` (first/
    * last context window the doc touches — a doc may straddle windows,
    * exactly like the standard pretraining pack), and `bin_offset` (the
    * doc's offset inside its first window).
    *
    * Scale shape: one hash shuffle on the shard key + a per-shard
    * running-sum window — each shard's stream is independent, so
    * parallelism is `shards` regardless of corpus size; pick shards ≈
    * cluster cores. Deterministic: same rows → same packing on every
    * run/engine (xxhash shard + id order), which is what makes packed
    * corpora reproducible across rebuilds. Rows with no tokens are
    * dropped up front (they would alias onto the next doc's offset and
    * contribute nothing to any window). */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
                    capacity: Int, shards: Int): DataFrame = {
    require(shards >= 1, "packSequences needs shards >= 1")
    Joins.requireFreeColumns("packSequences", df.columns, "shard")
    packSequencesByShard(
      df.withColumn("shard", pmod(xxhash64(col(idCol)), lit(shards.toLong))),
      idCol, nTokensCol, capacity, "shard")
  }

  /** [[packSequences]] over a caller-provided shard column — the seam
    * that lets an engine-portable shard assignment (e.g. an md5-derived
    * bucket, reproducible outside Spark) drive the same packing; the
    * xxhash64 default stays the in-engine fast path. */
  def packSequencesByShard(df: DataFrame, idCol: String, nTokensCol: String,
                           capacity: Int, shardCol: String): DataFrame = {
    require(capacity >= 1, "packSequences needs capacity >= 1")
    Joins.requireFreeColumns("packSequences",
      df.columns.filterNot(_ == shardCol),
      "__cum", "n_tokens", "gstart", "start_bin", "end_bin", "bin_offset")
    import org.apache.spark.sql.expressions.Window
    val n = col(nTokensCol).cast("long")
    val w = Window.partitionBy(shardCol).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.where(n > 0)
      .withColumn("__cum", sum(n).over(w))
      .select(col(idCol), col(shardCol).cast("long").as("shard"),
        n.as("n_tokens"),
        (col("__cum") - n).as("gstart"),
        floor((col("__cum") - n) / capacity).as("start_bin"),
        floor((col("__cum") - 1) / capacity).as("end_bin"),
        pmod(col("__cum") - n, lit(capacity.toLong)).as("bin_offset"))
  }

  /** Deterministic training-order shuffle: every row gets a
    * content-addressed position — `shuffle_shard` (first md5 byte of
    * the id, 0..255) and `shuffle_pos` (rank of md5(id) within the
    * shard) — so (shuffle_shard, shuffle_pos) is a total order that is
    * (a) statistically shuffled w.r.t. any natural key order, (b)
    * identical on every run, engine, and cluster layout (the property
    * "same corpus ⇒ same training curriculum" that seeded RNG shuffles
    * lose the moment partitioning changes), and (c) append-stable in
    * the shard assignment. Scale shape: one hash shuffle keyed on the
    * 256 shards + a per-shard sort — a distributed sort whose
    * parallelism is the shard count, never a single-task global
    * window. Writers emit shards in order and a trainer streams them
    * shard-by-shard. */
  def orderForTraining(df: DataFrame, idCol: String): DataFrame = {
    Joins.requireFreeColumns("orderForTraining", df.columns,
      "__md5", "shuffle_shard", "shuffle_pos")
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(idCol).cast("string"))
    val shard = conv(substring(h, 1, 2), 16, 10).cast("long")
    val w = Window.partitionBy("shuffle_shard")
      .orderBy(col("__md5"), col(idCol))
    df.withColumn("__md5", h)
      .withColumn("shuffle_shard", shard)
      .withColumn("shuffle_pos", row_number().over(w).cast("long"))
      .drop("__md5")
  }

  /** Deterministic domain-mixture sampling: per-stratum keep rates (the
    * temperature re-weighting step that balances a training mixture —
    * e.g. downsample an over-crawled language toward target proportions)
    * applied as content-addressed md5 thresholds, so survival is a pure
    * function of the row id: append-stable, engine-portable, and
    * monotone in the rate (raising a stratum's rate only ADDS rows —
    * the property that lets a mixture be re-tuned without resampling
    * everything). `rates` maps stratum value → keep-numerator out of
    * 256 (first md5 byte of the id); strata not listed use `default`. */
  def mixtureSampleByMd5(df: DataFrame, stratumCol: String, idCol: String,
                         rates: Map[String, Int],
                         default: Int = 256): DataFrame = {
    (rates.values.toSeq :+ default).foreach(r =>
      require(r >= 0 && r <= 256, s"keep rate $r outside [0, 256]"))
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 2), 16, 10)
      .cast("long")
    val rate = rates.toSeq.sortBy(_._1).foldRight(lit(default)) {
      case ((stratum, r), els) =>
        when(col(stratumCol) === stratum, lit(r)).otherwise(els)
    }
    df.where(bucket < rate)
  }

  /** TF-IDF top terms per document — the classic two-pass relevance
    * scorer. One explode+groupBy produces tf; docFreq derives from tf
    * (one row per (doc, term) already) with no second scan of the input;
    * nDocs joins in as a 1-row aggregate so nothing executes eagerly.
    * The idf join is left to AQE — a web-scale vocabulary must NOT be
    * force-broadcast (10^8+ distinct terms blows the broadcast limit);
    * AQE broadcasts it exactly when it is actually small. */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      // localCheckpoint: the doc-freq agg and the score join both read
      // the tf table; without it the explode+groupBy runs twice
      .localCheckpoint()
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("__n"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("term"))
    tf.join(docFreq, "term")
      .crossJoin(nDocs)
      .withColumn("score",
        round(col("tf") * log((col("__n") + 1.0) / (col("df") + 1)), 4))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col(idCol), col("term"), col("score"), col("rk").cast("bigint").as("rk"))
  }

  /** Tokenizer-prep vocabulary coverage: the top-`k` corpus tokens by
    * frequency with each prefix's cumulative share of ALL token
    * instances — the curve a vocab-size / OOV-budget decision reads
    * (e.g. "the top 32k types cover 99.5% of instances"). Ties break
    * on the token string so the cut is deterministic.
    *
    * Scale shape: one explode + one token-keyed count (map-side partial
    * agg), then TakeOrdered for the top-k; the running sum windows over
    * only the k survivors (single partition by construction, k rows —
    * same k-rows-only exception as [[graft.operators.TextAnalysis
    * .bm25TopDocs]]'s rank). Counts are exact longs, so the curve is
    * bit-stable. */
  def vocabCoverage(df: DataFrame, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "vocabCoverage needs a positive k")
    val counts = df.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").cast("double").as("__tot"))
    val w = Window.orderBy(col("cnt").desc, col("token"))
    counts.orderBy(col("cnt").desc, col("token")).limit(k)
      .crossJoin(broadcast(total))
      .select(
        row_number().over(w).cast("long").as("rank"),
        col("token"), col("cnt"),
        round(sum("cnt").over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("double") / col("__tot"), 4).as("cum_frac"))
  }

  /** Per-group z-score of an integer-valued metric: joins each row's
    * group mean/stddev back and emits (x − μ)/σ — the "normalize a
    * quality signal within its language/source before a global cut"
    * step (a raw length cut at corpus level mostly encodes language,
    * not quality).
    *
    * Deterministic by construction: the group aggregates are exact
    * integers (count as long; Σx, Σx² as decimal(38,0), since Σx²'s
    * per-row addend reaches 1e12 at x ~ 1e6 and a long sum would wrap
    * at ~9e6 such rows) — and μ/σ² derive from them
    * in ONE fixed expression, so there is no Welford-merge-order noise
    * to disagree across engines or partitionings. Sample variance
    * (n−1); groups with n < 2 or zero variance emit z = 0. One
    * partial-agg groupBy + one broadcastable join back (the stats
    * table has one row per group). */
  def groupZScore(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    // Decimal accumulators: Σx is long-safe to 9e18 but Σx² overflows a
    // long at ~9e6 rows of x ~ 1e6 (the gini bug class); the per-row
    // square is formed IN decimal so it can't wrap before the sum. The
    // long cast comes FIRST, preserving the documented integer-metric
    // contract bit-for-bit (long truncates toward zero; a direct
    // decimal cast would HALF_UP fractional inputs and silently shift
    // every z between releases).
    val xDec = col(valCol).cast("long").cast("decimal(19,0)")
    val stats = df.groupBy(keyCol).agg(
      count(lit(1)).as("__n"),
      sum(xDec).as("__s1"),
      sum(xDec * xDec).as("__s2"))
    val n = col("__n").cast("double")
    val mean = col("__s1").cast("double") / n
    val variance = (col("__s2").cast("double") - col("__s1").cast("double") * mean) /
      (n - 1.0)
    df.join(broadcast(stats), keyCol)
      .withColumn("__var", when(col("__n") < 2, lit(0.0)).otherwise(variance))
      .withColumn("z",
        when(col("__var") <= 0.0, lit(0.0))
          .otherwise(round((col(valCol).cast("double") - mean) / sqrt(col("__var")), 4) + 0.0))
      .drop("__n", "__s1", "__s2", "__var")
  }

  /** Per-group discrete-quantile cut for an integer metric: computes
    * each group's exact p-quantile threshold (smallest value whose
    * cumulative count reaches ⌈p·n⌉) and flags rows at or below it —
    * the "truncate the per-language length tail" filter, with the
    * threshold exact rather than sketched.
    *
    * Scalable exact quantiles: the cumulative window runs over the
    * (group, value) HISTOGRAM — distinct values per group, not rows —
    * so a 10^11-row corpus with ~10^5 distinct lengths per language
    * windows over ~10^5 rows. No interpolation (discrete quantile),
    * no per-row window, threshold table is one row per group
    * (broadcast join back). */
  def quantileCut(df: DataFrame, keyCol: String, valCol: String,
                  p: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(p > 0.0 && p <= 1.0, "quantileCut needs p in (0, 1]")
    val hist = df.groupBy(col(keyCol), col(valCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cum = hist.withColumn("__cum",
      sum("__c").over(Window.partitionBy(keyCol).orderBy(col("__v"))))
    val tot = hist.groupBy(keyCol).agg(sum("__c").as("__n"))
    val thr = cum.join(tot, keyCol)
      .where(col("__cum") >= ceil(lit(p) * col("__n").cast("double")))
      .groupBy(keyCol).agg(min("__v").as("q_thr"))
    df.join(broadcast(thr), keyCol)
      .withColumn("keep", col(valCol).cast("long") <= col("q_thr"))
  }

  /** BPE merge candidates (Sennrich et al. 2016 — the first merge
    * iteration of byte-pair-encoding tokenizer training): corpus-wide
    * counts of adjacent character pairs WITHIN words (pair occurrences
    * weighted by word frequency, "aaa" counts "aa" twice), top-k by
    * count — the argmax of this table is BPE's first merge, and the
    * table itself is the corpus statistic each subsequent iteration
    * recomputes over a shrinking symbol stream. Sits next to
    * [[vocabCoverage]] in the tokenizer-prep family.
    *
    * Scale shape: the pair explode runs over the DISTINCT word table
    * (vocabulary-sized, with exact long counts), not the token stream —
    * a 10^11-token corpus with a 10^7 vocabulary explodes 10^7·avg_len
    * pairs; the count groupBy partial-aggs and the top-k is TakeOrdered
    * (never a global sort). Ties break lexicographically.
    * Output: (rank, pair, cnt), rank = 1..k. */
  def bpeMergeCandidates(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "bpeMergeCandidates needs k >= 1")
    import org.apache.spark.sql.expressions.Window
    val words = df.select(explode(split(col(textCol), " ")).as("__w"))
      .where(length(col("__w")) >= 2)
      .groupBy("__w").agg(count(lit(1)).as("__c"))
    // positional explode: exploding a transform() array lets
    // InferFiltersFromGenerate re-inline the whole pair build into a
    // size()>0 pre-filter (every pair built twice); the int-sequence
    // explode keeps the inferred filter trivial (length(__w) >= 2 is
    // already guaranteed above, so the sequence never descends)
    val pairs = words.select(col("__c"),
        explode(sequence(lit(1), length(col("__w")) - 1)).as("__i"),
        col("__w"))
      .select(col("__c"), col("__w").substr(col("__i"), lit(2)).as("pair"))
    pairs.groupBy("pair").agg(sum("__c").as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("pair")))
          .cast("long"))
      .select("rank", "pair", "cnt")
  }

  /** Full BPE tokenizer training (Sennrich et al. 2016), the iterated
    * closure of [[bpeMergeCandidates]]: starting from characters,
    * repeatedly count adjacent symbol pairs over the (word, freq)
    * vocabulary — pair occurrences weighted by word frequency — and
    * merge the argmax (ties break to the smallest (a, b) in CODE-POINT
    * order — the UTF8String order the distributed trainer's argmax
    * compares by), emitting the merge list in creation order. Pure local
    * Scala over a vocabulary-sized table: the caller collects the
    * distinct-word counts (capped — see [[bpeEncode]]), never the
    * token stream. Deterministic: same vocabulary → same merges on
    * every run/engine. Stops early when no adjacent pair remains. */
  /** One symbol per Unicode CODE POINT — never per UTF-16 unit: a
    * per-unit split would make each half of a surrogate pair (any
    * emoji) its own symbol, and a lone surrogate cannot survive the
    * executor's UTF8String round-trip (it mangles to '?', collapsing
    * distinct symbols in the distributed trainer's pair counts). One
    * splitter shared by the local and distributed trainers keeps their
    * merge sequences bit-equal on ANY corpus; identical on BMP text. */
  private[graft] def splitChars(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** CODE-POINT string order — the order Spark's UTF8String (UTF-8
    * binary) and DuckDB's default collation compare by. Java's
    * `String.compareTo` orders by UTF-16 unit instead, which disagrees
    * exactly when a symbol in [U+E000, U+FFFF] meets an astral symbol
    * (surrogate units 0xD800-0xDFFF sort below 0xE000 but encode code
    * points ≥ 0x10000): under UTF-16 order the emoji sorts FIRST, under
    * code-point order LAST. The local BPE trainer's tie-break must use
    * this order — the distributed trainer's argmax
    * (`orderBy(cnt.desc, a, b)`) compares UTF8Strings and can't use any
    * other — or the two pick different merges on such a count tie. */
  private[graft] def codePointCompare(x: String, y: String): Int = {
    val nx = x.length; val ny = y.length
    var i = 0
    while (i < nx && i < ny) {
      val cx = x.codePointAt(i); val cy = y.codePointAt(i)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
    }
    Integer.compare(nx - i, ny - i)
  }

  private[graft] val codePointOrdering: Ordering[String] =
    (x: String, y: String) => codePointCompare(x, y)

  def bpeTrainMerges(words: Seq[(String, Long)],
                     numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, "bpeTrainMerges needs numMerges >= 0")
    var syms: Seq[(Vector[String], Long)] =
      words.map { case (w, c) => splitChars(w) -> c }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- syms; j <- 0 until s.length - 1)
        counts(s(j) -> s(j + 1)) = counts.getOrElse(s(j) -> s(j + 1), 0L) + c
      if (counts.isEmpty) done = true
      else {
        // tie-break in CODE-POINT order, not String.compareTo's UTF-16
        // unit order — the distributed trainer's argmax compares
        // UTF8Strings, and the two orders disagree on [U+E000,U+FFFF]
        // vs astral symbols (see codePointCompare)
        val (a, b) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }(
            Ordering.Tuple3(Ordering.Long, codePointOrdering,
              codePointOrdering))._1
        merges += (a -> b)
        syms = syms.map { case (s, c) => mergePair(s, a, b) -> c }
        i += 1
      }
    }
    merges.result()
  }

  /** One greedy left-to-right merge pass: every adjacent (a, b) in
    * `s` becomes the fused symbol (so "aaa" under (a,a) → [aa, a]). */
  private def mergePair(s: Vector[String], a: String,
                        b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < s.length) {
      if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += s(j); j += 1 }
    }
    out.result()
  }

  /** BPE-encode one word with a trained merge list: the GPT-2 `bpe()`
    * loop — while any adjacent pair has a rank, merge every occurrence
    * of the LOWEST-ranked pair (greedy left-to-right), which reproduces
    * the training-time segmentation. Local and deterministic; words
    * with characters unseen at train time still encode (the unknown
    * character rides through as its own symbol). */
  def bpeEncodeWord(w: String,
                    ranks: Map[(String, String), Int]): Vector[String] = {
    var s = splitChars(w)
    var done = s.length < 2
    while (!done) {
      // one O(len) sweep finds the lowest-ranked adjacent pair directly
      // (ranks are distinct creation indices, so the argmin is unique);
      // scanning the whole merge table per step would go
      // O(len · numMerges) — a CPU cliff at production merge counts
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var j = 0
      while (j < s.length - 1) {
        val p = s(j) -> s(j + 1)
        val r = ranks.getOrElse(p, Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = p }
        j += 1
      }
      if (bestPair == null) done = true
      else {
        s = mergePair(s, bestPair._1, bestPair._2)
        done = s.length < 2
      }
    }
    s
  }

  /** Distributed BPE trainer — [[bpeTrainMerges]] with NO driver word
    * cap: the (word, count) vocabulary stays a DataFrame end-to-end, so
    * training scales to any corpus vocabulary. Each round is one
    * vocabulary pass: adjacent symbol pairs explode from the symbol
    * arrays (weighted by word count), a map-side-combining groupBy sums
    * them, and the argmax arrives via TakeOrdered(1) — ONE (a, b, cnt)
    * row reaches the driver per round, the loop's entire driver
    * footprint. The winning merge applies as a vocabulary-sized map
    * (the same [[mergePair]] fold the local trainer runs), and lineage
    * truncates every round with an eager localCheckpoint whose
    * predecessor's blocks are explicitly unpersisted (the
    * [[Dedup.connectedComponents]] superstep posture), keeping plan
    * depth and block-manager storage O(1) across `numMerges` rounds.
    *
    * The character split is the SAME code-point [[splitChars]] the
    * local trainer runs (a per-word UDF over the vocabulary table — the
    * token stream never passes through it), so the merge sequence is
    * bit-equal to [[bpeTrainMerges]] on the same vocabulary: ties break
    * to the lexicographically smallest (a, b) in both (PipelinesSuite
    * differential incl. an astral-char corpus; the x_bpe_dist_merges
    * oracle replays the local fold as dump-time literals). Stops early
    * when no adjacent pair remains. */
  def bpeTrainMergesDistributed(df: DataFrame, textCol: String,
                                numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, "bpeTrainMergesDistributed needs numMerges >= 0")
    val charSplit = udf { w: String => splitChars(w) }
    var syms = distinctWordCounts(df, textCol)
      .select(col("__c"), charSplit(col("__w")).as("__s"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      // guard size >= 2 BEFORE the sequence: sequence(1, 0) would
      // generate the DESCENDING [1, 0] and element_at(_, 0) throws
      // positional explode (the bpeMergeCandidates rationale): the
      // transform()-array explode built every adjacent pair TWICE per
      // round via InferFiltersFromGenerate's size()>0 pre-filter
      val top = syms.where(size(col("__s")) >= 2)
        .select(col("__c"), col("__s"),
          explode(sequence(lit(1), size(col("__s")) - 1)).as("__j"))
        .groupBy(element_at(col("__s"), col("__j")).as("a"),
          element_at(col("__s"), col("__j") + 1).as("b"))
        .agg(sum(col("__c")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        merges += (a -> b)
        val applyMerge = udf { s: Seq[String] => mergePair(s.toVector, a, b) }
        val next = syms.withColumn("__s", applyMerge(col("__s")))
          .localCheckpoint()
        Dedup.uncheckpoint(syms)
        syms = next
        i += 1
      }
    }
    Dedup.uncheckpoint(syms)
    merges.result()
  }

  /** A [[BpeModel]] from the distributed trainer: merges from
    * [[bpeTrainMergesDistributed]], base characters from a distributed
    * distinct over the vocabulary (same code-point split, sorted).
    * Equals [[bpeTrainModel]] bit-for-bit whenever the vocabulary fits
    * under its trainCap (the suite pins it); past the cap this is the
    * exact trainer — no word ever drops from the statistics. */
  def bpeTrainModelDistributed(df: DataFrame, textCol: String,
                               numMerges: Int): BpeModel = {
    val merges = bpeTrainMergesDistributed(df, textCol, numMerges)
    val charSplit = udf { w: String => splitChars(w) }
    val baseChars = distinctWordCounts(df, textCol)
      .select(explode(charSplit(col("__w"))).as("__ch"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    BpeModel(baseChars, merges)
  }

  private def distinctWordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("__w"))
      .where(length(col("__w")) >= 1)
      .groupBy("__w").agg(count(lit(1)).as("__c"))

  /** A trained BPE tokenizer: the training-set character inventory
    * (sorted) plus the merge list in creation order — the complete,
    * persistable artifact. `ranks` and `ids` (the standard id layout:
    * characters first, then one id per merge) derive from these two
    * sequences by ONE shared formula, so an encode through a saved-
    * then-loaded model is bit-identical to the training session's. */
  case class BpeModel(baseChars: Seq[String],
                      merges: Seq[(String, String)]) {
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
    lazy val ids: Map[String, Long] =
      (baseChars.zipWithIndex.map { case (c, i) => c -> i.toLong } ++
        merges.zipWithIndex.map { case ((a, b), i) =>
          (a + b) -> (baseChars.length + i).toLong }).toMap
  }

  /** Train on the top-`trainCap` words and lay out the id space:
    * training-set characters sorted, then merge products in creation
    * order. Shared by [[bpeEncode]] and [[bpeEncodingTable]] so the
    * operator and its oracle can never drift. */
  private def bpeArtifacts(words: DataFrame, numMerges: Int,
                           trainCap: Int): BpeModel = {
    val trainWords = words
      .orderBy(col("__c").desc, col("__w")).limit(trainCap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val merges = bpeTrainMerges(trainWords, numMerges)
    val baseChars = trainWords.flatMap(w => splitChars(w._1)).distinct.sorted
    BpeModel(baseChars, merges)
  }

  /** Train a [[BpeModel]] on the corpus's distinct-word table — the
    * artifact half of [[bpeEncode]], exposed so a training job can
    * [[bpeSave]] the tokenizer once and every downstream job
    * [[bpeLoad]] + [[bpeEncodeWith]] it instead of retraining. */
  def bpeTrainModel(df: DataFrame, textCol: String, numMerges: Int,
                    trainCap: Int = 1000000): BpeModel =
    bpeArtifacts(distinctWordCounts(df, textCol), numMerges, trainCap)

  /** Persist a [[BpeModel]] as a VERSIONED warehouse table at `path`
    * (parquet, partitioned by `version`; a re-save of an existing
    * version replaces it, other versions stay): one row per base
    * character (kind `char`, ord = sorted position) and one per merge
    * (kind `merge`, ord = creation index, left/right symbols). The
    * table stores the model's two DEFINING sequences, never the derived
    * ranks/ids maps — [[bpeLoad]] rebuilds those with the same formula
    * [[BpeModel]] uses, so a rare merge-product string collision
    * resolves identically on save and load. Vocabulary-sized (a 10⁷-
    * word corpus trains to ~10⁵ rows) — metadata, not data. */
  def bpeSave(spark: SparkSession, model: BpeModel, path: String,
              version: Long): Unit = {
    require(version >= 0, "bpeSave needs version >= 0")
    import spark.implicits._
    val rows =
      model.baseChars.zipWithIndex.map { case (c, i) =>
        ("char", i.toLong, null: String, null: String, c) } ++
        model.merges.zipWithIndex.map { case ((a, b), i) =>
          ("merge", i.toLong, a, b, a + b) }
    // dynamic partition overwrite: re-saving a version REPLACES exactly
    // that version's partition (idempotent re-runs), other versions
    // stay — the append-new/replace-same contract an artifact store needs
    rows.toDF("kind", "ord", "left", "right", "symbol")
      .withColumn("version", lit(version))
      .repartition(1)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("version").parquet(path)
  }

  /** Load a [[bpeSave]]d model back: the highest version at `path`, or
    * the explicitly requested one (loud when absent). A fresh session /
    * separate job loading here reproduces the training session's
    * encodings bit-for-bit (the suite round-trips it). */
  def bpeLoad(spark: SparkSession, path: String,
              version: Option[Long] = None): (BpeModel, Long) = {
    // partition-column type inference may narrow `version` to int —
    // normalize to long before any read
    val all = spark.read.parquet(path)
      .withColumn("version", col("version").cast("long"))
    val v = version.getOrElse(
      all.agg(max("version")).head().getLong(0))
    val rows = all.where(col("version") === v)
      .select("kind", "ord", "left", "right", "symbol")
      .collect()
    require(rows.nonEmpty, s"bpeLoad: no rows for version $v at $path")
    val chars = rows.filter(_.getString(0) == "char")
      .sortBy(_.getLong(1)).map(_.getString(4)).toSeq
    val merges = rows.filter(_.getString(0) == "merge")
      .sortBy(_.getLong(1)).map(r => r.getString(2) -> r.getString(3)).toSeq
    (BpeModel(chars, merges), v)
  }

  /** The word→encoding table [[bpeEncode]] would apply, materialized
    * for EVERY distinct corpus word (oracle/debug surface — loud cap,
    * corpora past it should read the operator output instead). Each
    * entry round-trips (`toks` re-concatenates to the word) by
    * construction of the merge pass; callers may re-`require` it.
    * Returns (word, toks_str, ids_str, n_toks). */
  def bpeEncodingTable(df: DataFrame, textCol: String, numMerges: Int,
                       trainCap: Int = 1000000,
                       tableCap: Int = 100000): Seq[(String, String, String, Long)] = {
    val words = distinctWordCounts(df, textCol)
    val model = bpeArtifacts(words, numMerges, trainCap)
    val all = words.orderBy(col("__w")).collect().map(_.getString(0))
    require(all.length <= tableCap,
      s"bpeEncodingTable: ${all.length} distinct words exceeds cap $tableCap")
    all.toSeq.map { w =>
      val toks = bpeEncodeWord(w, model.ranks)
      require(toks.mkString == w, s"BPE round-trip failed for '$w'")
      (w, toks.mkString("|"),
        toks.map(model.ids.getOrElse(_, -1L)).mkString(","),
        toks.length.toLong)
    }
  }

  /** Distributed BPE encode: train `numMerges` merges on the corpus's
    * distinct-word table and emit each document's subword segmentation
    * and token-id sequence. Token ids are the standard layout —
    * training-set characters in sorted order, then one id per merge in
    * creation order; symbols outside that vocabulary (characters never
    * seen at train time) get id −1 rather than a crash, the honest
    * OOV marker.
    *
    * Scale shape (the reason this isn't a per-token UDF): training
    * collects the top-`trainCap` distinct words by (count, word) — a
    * TakeOrdered over the vocabulary table, the operator's only
    * driver-side materialization, same posture and cap discipline as
    * Lloyd training in Similarity — and the per-word encode UDF runs
    * over the DISTINCT-word table only (vocabulary-sized, a 10¹¹-token
    * corpus has a 10⁷-row vocabulary), which then broadcast-joins back
    * to the position-exploded token stream; per-doc reassembly is one
    * keyed groupBy bounded by doc length. The token stream itself
    * never passes through the UDF and never collects.
    * Output: (id, n_words, n_tokens, toks_str `|`-joined,
    * ids_str `,`-joined). */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
                numMerges: Int, trainCap: Int = 1000000): DataFrame =
    bpeEncodeWith(df, idCol, textCol,
      bpeArtifacts(distinctWordCounts(df, textCol), numMerges, trainCap))

  /** [[bpeEncode]]'s apply half against an ALREADY-TRAINED model (from
    * the same session's [[bpeTrainModel]] or a [[bpeLoad]] of a saved
    * artifact) — the production shape: train once, version the
    * artifact, encode everywhere. Same plan as bpeEncode: the UDF runs
    * over the distinct-word table only, joined back onto the
    * position-exploded stream.
    *
    * Broadcast safety valve: the word→encoding table broadcasts only
    * while the vocabulary is at most `broadcastWordCap` distinct words
    * (the default ~4 M words ≈ low hundreds of MB — well under Spark's
    * 8 GB broadcast hard limit); past the cap it shuffle-joins the
    * exploded stream instead, which costs one extra keyed exchange
    * (the stream shuffles for the per-doc groupBy anyway), never an
    * un-broadcastable multi-GB driver/executor copy. The vocabulary
    * table is localCheckpoint'ed so the sizing count and the join read
    * one materialization, not two corpus passes. Both modes are
    * hash-identical by construction (same UDF, same join keys). */
  def bpeEncodeWith(df: DataFrame, idCol: String, textCol: String,
                    model: BpeModel,
                    broadcastWordCap: Long = 4000000L): DataFrame = {
    val spark = df.sparkSession
    val ranksB = spark.sparkContext.broadcast(model.ranks)
    val idsB = spark.sparkContext.broadcast(model.ids)
    encodeWordStream(df, idCol, textCol, broadcastWordCap, udf { (w: String) =>
      val toks = bpeEncodeWord(w, ranksB.value)
      (toks.mkString("|"), toks.map(idsB.value.getOrElse(_, -1L)).mkString(","),
        toks.length.toLong)
    })
  }

  /** The tokenizer-apply plan [[bpeEncodeWith]] and
    * [[unigramEncodeWith]] share: the per-word encode UDF runs over the
    * DISTINCT-word table only (vocabulary-sized), joined back onto the
    * position-exploded token stream — broadcast below
    * `broadcastWordCap` distinct words, shuffle-join past it (the 8 GB
    * broadcast safety valve); per-doc reassembly is one keyed groupBy
    * bounded by doc length. The token stream itself never passes
    * through the UDF and never collects. */
  private def encodeWordStream(df: DataFrame, idCol: String,
                               textCol: String, broadcastWordCap: Long,
                               encodeUdf: org.apache.spark.sql.expressions
                                 .UserDefinedFunction): DataFrame = {
    Joins.requireFreeColumns("encodeWordStream", df.columns,
      "n_words", "n_tokens", "toks_str", "ids_str")
    val words = distinctWordCounts(df, textCol).localCheckpoint(eager = false)
    val nWords = words.count()
    val wordToks = words.select(col("__w"),
      encodeUdf(col("__w")).as("__e"))
    val mapping =
      if (nWords <= broadcastWordCap) broadcast(wordToks) else wordToks
    val stream = df.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("__pos", "__w")))
      .where(length(col("__w")) >= 1)
    stream.join(mapping, "__w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__e._3")).as("n_tokens"),
        sort_array(collect_list(struct(col("__pos"),
          col("__e._1").as("__t"), col("__e._2").as("__i")))).as("__a"))
      .select(col(idCol), col("n_words"), col("n_tokens"),
        array_join(transform(col("__a"), x => x.getField("__t")), "|")
          .as("toks_str"),
        array_join(transform(col("__a"), x => x.getField("__i")), ",")
          .as("ids_str"))
  }

  /** Token-budget mixture plan per stratum (usually language) — the
    * table a multilingual training run is CONFIGURED from: temperature-
    * weighted mixture probabilities p_l ∝ share_l^α (α = 1 keeps the
    * natural distribution, α → 0 flattens it; 0.5 is the classic
    * mBERT/mT5 re-balance), a total token budget split by p, and the
    * per-stratum keep rate that realizes it — capped at 1 (this
    * operator never prescribes oversampling; a `capped` stratum's
    * unmet budget is the signal to re-plan on the uncapped rest or
    * accept repeats explicitly). `keep256` composes directly with
    * [[sampleByMd5]], so the plan is executable as one deterministic
    * filter.
    *
    * Float contract: token counts are exact longs; each stratum's
    * temperature weight is 1e-12-quantized before the cross-stratum
    * sum (exact integer — the order-free form), so p/rates are single
    * double expressions over exact integers.
    *
    * Scale shape: one map-side-combining groupBy over the corpus, then
    * pure algebra on the ≤ strata-row frame (two tiny broadcast
    * totals). Output: (stratumCol, n_docs, n_tokens, p_mix,
    * target_tokens, keep_frac, keep256, capped). */
  def tokenBudgetRates(df: DataFrame, stratumCol: String, textCol: String,
                       budgetTokens: Long, alpha: Double = 0.5,
                       roundDp: Int = 6): DataFrame = {
    require(budgetTokens > 0, "tokenBudgetRates needs a positive budget")
    require(alpha > 0.0 && alpha <= 1.0,
      "tokenBudgetRates needs alpha in (0, 1]")
    Joins.requireFreeColumns("tokenBudgetRates", Seq(stratumCol),
      "n_docs", "n_tokens", "p_mix", "target_tokens", "keep_frac",
      "keep256", "capped", "__nt", "__tt", "__wq", "__swq")
    val s = df
      .select(col(stratumCol),
        size(split(col(textCol), " ")).cast("long").as("__nt"))
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"), sum("__nt").as("n_tokens"))
      .localCheckpoint(eager = false) // ≤ strata rows, read by both totals
    val tot = s.agg(sum("n_tokens").as("__tt"))
    val weighted = s.crossJoin(broadcast(tot))
      .withColumn("__wq",
        round(pow(col("n_tokens").cast("double") / col("__tt"), alpha)
          * 1e12, 0).cast("long"))
      .localCheckpoint(eager = false)
    val sw = weighted.agg(sum("__wq").as("__swq"))
    val p = col("__wq").cast("double") / col("__swq")
    val target = lit(budgetTokens.toDouble) * p
    val keep = least(lit(1.0), target / col("n_tokens").cast("double"))
    weighted.crossJoin(broadcast(sw))
      .select(col(stratumCol), col("n_docs"), col("n_tokens"),
        round(p, roundDp).as("p_mix"),
        round(target, 4).as("target_tokens"),
        round(keep, roundDp).as("keep_frac"),
        least(lit(256L), ceil(keep * 256).cast("long")).as("keep256"),
        (target >= col("n_tokens").cast("double")).as("capped"))
  }

  /** Tokenizer fertility by group (usually language): tokens-per-word
    * under a trained [[BpeModel]] — THE number a tokenizer choice is
    * judged on per language (fertility 3× on one language means that
    * language costs 3× the compute per word and fills 3× the context;
    * the classic under-represented-script failure a multilingual
    * corpus audit must surface before training, not after).
    *
    * Scale shape: [[bpeEncodeWith]]'s plan (encode UDF over DISTINCT
    * words only, broadcast-joined to the exploded stream) + one keyed
    * join back to the group column + one map-side-combining groupBy.
    * Counts are exact longs; fertility is one double division.
    *
    * Output: (groupCol, n_docs, n_words, n_tokens, fertility). */
  def bpeFertility(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String, model: BpeModel,
                   roundDp: Int = 6): DataFrame =
    fertilityRollup(bpeEncodeWith(df, idCol, textCol, model),
      df, idCol, groupCol, roundDp)

  /** [[bpeFertility]] under a unigram-LM model — the same
    * tokens-per-word-by-language audit for the OTHER production
    * tokenizer family, so a BPE-vs-unigram choice can be judged on the
    * same per-language cost table. Identical plan: encode over distinct
    * words, one keyed join back to the group column, one map-side-
    * combining rollup. */
  def unigramFertility(df: DataFrame, idCol: String, textCol: String,
                       groupCol: String, model: UnigramModel,
                       roundDp: Int = 6): DataFrame =
    fertilityRollup(unigramEncodeWith(df, idCol, textCol, model),
      df, idCol, groupCol, roundDp)

  private def fertilityRollup(encoded: DataFrame, df: DataFrame,
                              idCol: String, groupCol: String,
                              roundDp: Int): DataFrame = {
    Joins.requireFreeColumns("fertility", Seq(idCol, groupCol),
      "n_docs", "n_words", "n_tokens", "fertility")
    encoded
      .join(df.select(col(idCol), col(groupCol)), idCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_tokens").as("n_tokens"))
      .select(col(groupCol), col("n_docs"), col("n_words"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("n_words"), roundDp)
          .as("fertility"))
  }

  /** A trained unigram-LM (SentencePiece-style, Kudo 2018) tokenizer:
    * the piece inventory in id order with each piece's log probability
    * — the complete, persistable artifact, the other half of
    * production tokenizer practice next to [[BpeModel]]. Segmentation
    * is Viterbi (max-sum of piece log probs), deterministic by
    * construction: ties resolve to the longest piece (the DP scans
    * split points left-to-right and only replaces on a STRICT
    * improvement). Characters unseen at train time ride through as
    * their own symbol at a fixed OOV penalty, id −1 — the honest OOV
    * marker, same contract as BPE. */
  case class UnigramModel(pieces: Seq[(String, Double)]) {
    lazy val logProb: Map[String, Double] = pieces.toMap
    lazy val ids: Map[String, Long] =
      pieces.zipWithIndex.map { case ((p, _), i) => p -> i.toLong }.toMap
    lazy val maxPieceLen: Int =
      if (pieces.isEmpty) 1 else pieces.iterator.map(_._1.length).max
  }

  /** The fixed log-prob assigned to an out-of-vocabulary single
    * character — harsh enough that known pieces always win, finite so
    * unseen text still segments. */
  private val UnigramOovLogProb = -20.0

  /** Viterbi-segment one word under a trained [[UnigramModel]]. */
  def unigramEncodeWord(w: String, model: UnigramModel): Vector[String] = {
    val n = w.length
    if (n == 0) return Vector.empty
    val neg = Double.NegativeInfinity
    val best = Array.fill(n + 1)(neg); best(0) = 0.0
    val back = Array.fill(n + 1)(-1)
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - model.maxPieceLen)
      while (j < i) {
        if (best(j) != neg) {
          val piece = w.substring(j, i)
          val lp = model.logProb.getOrElse(piece,
            if (i - j == 1) UnigramOovLogProb else neg)
          if (lp != neg) {
            val cand = best(j) + lp
            if (cand > best(i)) { best(i) = cand; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val segs = scala.collection.mutable.ListBuffer.empty[String]
    var k = n
    while (k > 0) { val j = back(k); segs.prepend(w.substring(j, k)); k = j }
    segs.toVector
  }

  /** Train a [[UnigramModel]] on the corpus's distinct-word table —
    * hard-EM (Viterbi counts) over the top-`trainCap` words, the same
    * capped driver-side posture as [[bpeTrainModel]]:
    *
    *  1. seed = every single character plus the `4 × vocabSize` most
    *     frequent substrings up to `maxPieceLen` (counts weighted by
    *     word frequency), probabilities ∝ seed counts;
    *  2. `emIters` rounds of: Viterbi-segment every distinct word under
    *     the current model (weighted by its count), re-estimate piece
    *     probabilities from the segmentation counts (multi-char pieces
    *     that win nothing are dropped; characters always survive with a
    *     +1 floor so every string stays segmentable);
    *  3. prune to `vocabSize`: all characters (mandatory coverage),
    *     then the best multi-char pieces by (count, piece).
    *
    * Everything sorts before it selects, so the artifact is a pure
    * function of the word table. Id layout mirrors BPE: characters in
    * sorted order first, then multi-char pieces by descending count. */
  def unigramTrainModel(df: DataFrame, textCol: String,
                        vocabSize: Int, maxPieceLen: Int = 8,
                        emIters: Int = 3,
                        trainCap: Int = 1000000): UnigramModel = {
    require(vocabSize >= 1, "unigramTrainModel needs vocabSize >= 1")
    require(maxPieceLen >= 1 && emIters >= 1, "bad unigram params")
    val words = distinctWordCounts(df, textCol)
      .orderBy(col("__c").desc, col("__w")).limit(trainCap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val chars = words.flatMap(_._1.map(_.toString)).distinct.sorted
    // seed substring counts, frequency-weighted
    val seedCounts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words; len <- 1 to math.min(maxPieceLen, w.length);
         start <- 0 to w.length - len) {
      val p = w.substring(start, start + len)
      seedCounts(p) = seedCounts.getOrElse(p, 0L) + c
    }
    val seedMulti = seedCounts.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(4 * vocabSize)
    var model = unigramToModel(
      chars.map(c => c -> math.max(1L, seedCounts.getOrElse(c, 1L))) ++
        seedMulti)
    for (_ <- 1 to emIters) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((w, c) <- words; p <- unigramEncodeWord(w, model))
        counts(p) = counts.getOrElse(p, 0L) + c
      // chars always survive (coverage floor); dead multi-char drop
      model = unigramToModel(
        chars.map(c => c -> (counts.getOrElse(c, 0L) + 1L)) ++
          counts.iterator.filter(_._1.length > 1).toSeq)
    }
    unigramPrune(model, vocabSize)
  }

  /** Counts → model: probabilities ∝ counts, id layout = sorted chars
    * then multi-char pieces by (count desc, piece). Shared by the
    * capped and distributed trainers so their folds cannot drift. */
  private def unigramToModel(counts: Seq[(String, Long)]): UnigramModel = {
    val total = counts.iterator.map(_._2).sum.toDouble
    val cs = counts.filter(_._1.length == 1).sortBy(_._1)
    val ms = counts.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
    UnigramModel((cs ++ ms).map { case (p, c) =>
      p -> math.log(c / total) })
  }

  /** Final prune to `vocabSize`: every char (mandatory coverage), then
    * the best multi-char pieces in model order; renormalize over the
    * kept inventory. Shared by both trainers. */
  private def unigramPrune(model: UnigramModel,
                           vocabSize: Int): UnigramModel = {
    val charsN = model.pieces.count(_._1.length == 1)
    val keepMulti = math.max(0, vocabSize - charsN)
    val pruned = model.pieces.filter(_._1.length == 1) ++
      model.pieces.filter(_._1.length > 1).take(keepMulti)
    // re-normalize over the kept inventory (one more Viterbi count pass
    // would also work; a plain renorm keeps the artifact minimal)
    val mass = pruned.iterator.map { case (_, lp) => math.exp(lp) }.sum
    UnigramModel(pruned.map { case (p, lp) => p -> (lp - math.log(mass)) })
  }

  /** Lossless piece transport for the distributed unigram trainer:
    * fixed-width (4 hex digits) encoding of each UTF-16 unit. The
    * trainer's substring windows run over UTF-16 units (the
    * [[unigramEncodeWord]] indexing), so a piece can be a LONE
    * surrogate — which cannot survive a DataFrame round-trip (the
    * executor's UTF8String mangles it to '?', collapsing distinct
    * pieces). Hex strings also ORDER like their decoded strings
    * (fixed-width lowercase hex compares numerically per unit; the
    * shorter-prefix rule carries over), so TakeOrdered on the hex
    * column reproduces the local trainer's (count desc, piece) order
    * exactly. */
  private[graft] def hexUnits(s: String): String =
    s.map(u => f"${u.toInt}%04x").mkString
  private[graft] def unhexUnits(h: String): String = {
    val sb = new StringBuilder(h.length / 4)
    var i = 0
    while (i < h.length) {
      sb.append(Integer.parseInt(h.substring(i, i + 4), 16).toChar)
      i += 4
    }
    sb.toString
  }

  /** Distributed unigram-LM trainer — [[unigramTrainModel]] with NO
    * driver word cap: the distinct-word table stays a DataFrame; the
    * substring seed pass and each hard-EM round are one exploded,
    * map-side-combining count over it, and ONLY vocabulary-sized
    * frames ever reach the driver (seed top-`4·vocabSize` via
    * TakeOrdered, per-round Viterbi piece counts bounded by the model
    * inventory — model pieces + OOV chars — never corpus-sized). All
    * probability math runs driver-side through the same
    * [[unigramToModel]]/[[unigramPrune]] folds as the capped trainer,
    * over identical exact long counts, so the resulting model is
    * BIT-equal to [[unigramTrainModel]] whenever the vocabulary fits
    * under its trainCap (PipelinesSuite pins it, including an
    * astral-character corpus — pieces travel as lossless fixed-width
    * hex, see [[hexUnits]]). Past the cap this is the exact trainer:
    * no word ever drops from the statistics.
    *
    * Scale shape: corpus-sized work = distinctWordCounts (once,
    * localCheckpoint'd) + 1 seed pass + `emIters` encode passes, each
    * a vocabulary-keyed explode + partial-agg groupBy. The per-round
    * model broadcast is vocabulary-sized metadata. */
  def unigramTrainModelDistributed(df: DataFrame, textCol: String,
                                   vocabSize: Int, maxPieceLen: Int = 8,
                                   emIters: Int = 3): UnigramModel = {
    require(vocabSize >= 1, "unigramTrainModelDistributed needs vocabSize >= 1")
    require(maxPieceLen >= 1 && emIters >= 1, "bad unigram params")
    val spark = df.sparkSession
    val words = distinctWordCounts(df, textCol).localCheckpoint()
    try {
      // seed substring counts, frequency-weighted — the local trainer's
      // (w, len, start) triple loop as one explode + groupBy
      val mpl = maxPieceLen
      val seedUdf = udf { (w: String) =>
        val out = Seq.newBuilder[String]
        var len = 1
        while (len <= math.min(mpl, w.length)) {
          var st = 0
          while (st <= w.length - len) {
            out += hexUnits(w.substring(st, st + len)); st += 1
          }
          len += 1
        }
        out.result()
      }
      // explode_outer + isNotNull, not explode: the plain explode's
      // inferred size()>0 pre-filter re-invokes the (deterministic)
      // candidate UDF on every word — the whole enumeration ran twice
      // per word. The UDF never returns null elements, so dropping the
      // outer-join null row is exactly plain-explode semantics.
      val seed = words
        .select(col("__c"), explode_outer(seedUdf(col("__w"))).as("__p"))
        .where(col("__p").isNotNull)
        .groupBy("__p").agg(sum("__c").as("__n"))
        .localCheckpoint()
      // chars (hex length 4) are an inventory-sized collect; multi-char
      // seeds TakeOrdered to 4·vocabSize by (count desc, piece) — hex
      // order ≡ decoded-string order, so the cut matches the local fold
      val (seedChars, seedMulti) =
        try {
          (seed.where(length(col("__p")) === 4)
            .collect().map(r => unhexUnits(r.getString(0)) -> r.getLong(1))
            .toMap,
            seed.where(length(col("__p")) > 4)
              .orderBy(col("__n").desc, col("__p")).limit(4 * vocabSize)
              .collect()
              .map(r => unhexUnits(r.getString(0)) -> r.getLong(1))
              .toSeq)
        } finally Dedup.uncheckpoint(seed)
      val chars = seedChars.keys.toSeq.sorted
      var model = unigramToModel(
        chars.map(c => c -> math.max(1L, seedChars.getOrElse(c, 1L))) ++
          seedMulti)
      for (_ <- 1 to emIters) {
        val modelB = spark.sparkContext.broadcast(model)
        val emUdf = udf { (w: String) =>
          unigramEncodeWord(w, modelB.value).map(hexUnits)
        }
        // counted pieces ⊆ model inventory ∪ OOV chars — the collect is
        // vocabulary-sized at any corpus size
        // explode_outer + isNotNull: same UDF-double-evaluation dodge
        // as the seed pass above, per EM iteration
        val counts = words
          .select(col("__c"), explode_outer(emUdf(col("__w"))).as("__p"))
          .where(col("__p").isNotNull)
          .groupBy("__p").agg(sum("__c").as("__n"))
          .collect().map(r => unhexUnits(r.getString(0)) -> r.getLong(1))
          .toMap
        model = unigramToModel(
          chars.map(c => c -> (counts.getOrElse(c, 0L) + 1L)) ++
            counts.iterator.filter(_._1.length > 1).toSeq)
      }
      unigramPrune(model, vocabSize)
    } finally Dedup.uncheckpoint(words)
  }

  /** Persist a [[UnigramModel]] through the same versioned-artifact
    * seam as [[bpeSave]]: one row per piece (ord = id, log_prob),
    * dynamic partition overwrite by version — idempotent re-saves,
    * other versions untouched. */
  def unigramSave(spark: SparkSession, model: UnigramModel, path: String,
                  version: Long): Unit = {
    require(version >= 0, "unigramSave needs version >= 0")
    import spark.implicits._
    model.pieces.zipWithIndex
      .map { case ((p, lp), i) => (i.toLong, p, lp) }
      .toDF("ord", "piece", "log_prob")
      .withColumn("version", lit(version))
      .repartition(1)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("version").parquet(path)
  }

  /** Load a [[unigramSave]]d model: highest version at `path` or the
    * requested one. Bit-identical encodings across sessions — the
    * artifact stores the defining (ord, piece, log_prob) rows and the
    * derived maps rebuild by the same formula. */
  def unigramLoad(spark: SparkSession, path: String,
                  version: Option[Long] = None): (UnigramModel, Long) = {
    val all = spark.read.parquet(path)
      .withColumn("version", col("version").cast("long"))
    val v = version.getOrElse(all.agg(max("version")).head().getLong(0))
    val rows = all.where(col("version") === v)
      .select("ord", "piece", "log_prob").collect()
    require(rows.nonEmpty, s"unigramLoad: no rows for version $v at $path")
    (UnigramModel(rows.sortBy(_.getLong(0))
      .map(r => r.getString(1) -> r.getDouble(2)).toSeq), v)
  }

  /** The word→encoding table [[unigramEncodeWith]] applies, for EVERY
    * distinct corpus word — the oracle/debug surface, same contract as
    * [[bpeEncodingTable]] (loud cap, every entry round-trips by
    * segmentation construction). */
  def unigramEncodingTable(df: DataFrame, textCol: String,
                           model: UnigramModel,
                           tableCap: Int = 100000)
      : Seq[(String, String, String, Long)] = {
    val all = distinctWordCounts(df, textCol)
      .orderBy(col("__w")).collect().map(_.getString(0))
    require(all.length <= tableCap,
      s"unigramEncodingTable: ${all.length} distinct words exceeds cap $tableCap")
    all.toSeq.map { w =>
      val toks = unigramEncodeWord(w, model)
      require(toks.mkString == w, s"unigram round-trip failed for '$w'")
      (w, toks.mkString("|"),
        toks.map(model.ids.getOrElse(_, -1L)).mkString(","),
        toks.length.toLong)
    }
  }

  /** Distributed unigram-LM encode against a trained model — the exact
    * [[bpeEncodeWith]] plan (encode UDF over DISTINCT words only,
    * joined back onto the position-exploded stream, broadcast under the
    * cap / shuffle past it). Output: (id, n_words, n_tokens,
    * toks_str `|`-joined, ids_str `,`-joined). */
  def unigramEncodeWith(df: DataFrame, idCol: String, textCol: String,
                        model: UnigramModel,
                        broadcastWordCap: Long = 4000000L): DataFrame = {
    val spark = df.sparkSession
    val modelB = spark.sparkContext.broadcast(model)
    encodeWordStream(df, idCol, textCol, broadcastWordCap, udf { (w: String) =>
      val m = modelB.value
      val toks = unigramEncodeWord(w, m)
      (toks.mkString("|"), toks.map(m.ids.getOrElse(_, -1L)).mkString(","),
        toks.length.toLong)
    })
  }

  /** KMV (k-minimum-values) corpus-overlap estimation (Beyer et al.
    * SIGMOD'07): per group keep the k lexicographically smallest md5
    * hashes of its DISTINCT items (tokens, n-grams, URLs…); for every
    * group pair, Ĵ = |K(k, A∪B) ∩ K(A) ∩ K(B)| / |K(k, A∪B)| where
    * K(k, ·) is the k smallest of a set. The corpus-vs-corpus overlap
    * matrix (which sources duplicate each other, how much of a new
    * crawl is already held) from fixed-size sketches instead of a
    * vocabulary-sized pair join.
    *
    * Deterministic: the sketch is a pure function of the item SET
    * (md5 order), so estimates are reproducible across runs, engines
    * and partitionings — unlike seeded-sample sketches. Scale shape:
    * one (group, hash) distinct, then two-phase min-k (partition-local
    * `sort_array∘slice` under dominance, then a ≤ partitions·k merge
    * per group — no per-group global sort); the pair stage joins
    * GROUP-count rows carrying k hashes each, quadratic only in the
    * number of corpora compared, never in items.
    * Output: (g1, g2, k_used, jacc_est), g1 < g2; `k_used` < k flags
    * pairs whose union had fewer than k distinct items (estimate is
    * then exact). */
  def kmvOverlap(items: DataFrame, groupCol: String, itemCol: String,
                 k: Int): DataFrame = {
    require(k >= 1, "kmvOverlap needs k >= 1")
    Joins.requireFreeColumns("kmvOverlap", items.columns,
      "g1", "g2", "k_used", "jacc_est")
    val hashed = items
      .select(col(groupCol).as("__g"), md5(col(itemCol)).as("__h"))
      .distinct()
    val local = hashed.withColumn("__p", spark_partition_id())
      .groupBy("__g", "__p")
      .agg(slice(sort_array(collect_set(col("__h"))), 1, k).as("__hs"))
    // (g, h) is globally distinct, so partition-local sketches are
    // disjoint — the merge needs no dedup
    // localCheckpoint: the pair join reads the sketch table twice
    // (both sides); the table is one k-hash row per group, but its
    // lineage is the corpus-wide distinct + two groupBys
    val sk = local.groupBy("__g")
      .agg(slice(sort_array(flatten(collect_list(col("__hs")))), 1, k)
        .as("__kmv"))
      .localCheckpoint()
    val a = sk.select(col("__g").as("g1"), col("__kmv").as("__ka"))
    val b = sk.select(col("__g").as("g2"), col("__kmv").as("__kb"))
    a.join(b, col("g1") < col("g2"))
      .withColumn("__ku",
        slice(sort_array(array_distinct(concat(col("__ka"), col("__kb")))),
          1, k))
      .select(col("g1"), col("g2"),
        size(col("__ku")).cast("long").as("k_used"),
        round(size(array_intersect(array_intersect(col("__ku"), col("__ka")),
            col("__kb"))).cast("double") / size(col("__ku")).cast("double"), 4)
          .as("jacc_est"))
  }

  /** Per-source curation decision table: document count, token volume,
    * mean length, verbatim-duplicate fraction (1 − distinct md5(text)
    * share) and language spread per source — the aggregate a
    * source-level allow/deny/re-weight decision reads (RefinedWeb-style
    * domain filtering applies exactly this shape at the domain key).
    * One groupBy with partial aggregation; all outputs are exact
    * integer arithmetic or exact-ratio doubles, so the table is
    * bit-stable across runs and engines. */
  /** URL canonicalization (the RefinedWeb/CCNet first-stage curation
    * projection): lowercase the scheme and host, strip the scheme's
    * default port (`:80` http / `:443` https — non-default ports are
    * load-bearing and kept), drop the fragment, drop tracking
    * parameters (`utm_*`, `gclid`, `fbclid`, `ref`) from the query —
    * removing the `?` entirely when nothing survives — and strip
    * trailing slashes from the path. Path/query case and parameter
    * ORDER are preserved (they can be semantic; canonicalize-by-sort
    * belongs to a crawler's politeness layer, not a curation key).
    * Pure codegen'd regexp/HOF column algebra — zero shuffle, one row
    * in, one value out — so it runs inside the scan's WholeStageCodegen
    * at any corpus size. */
  def urlNormalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[^/]*//([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val rest = regexp_extract(url, "^[^/]*//[^/?#]*(.*)$", 1)
    val path = regexp_replace(regexp_extract(rest, "^([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "\\?([^#]*)", 1)
    val kept = filter(split(query, "&"), p =>
      length(p) > 0 && !p.rlike("^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="))
    val qs = when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host, path, qs)
  }

  /** The registrable-host curation key of [[urlNormalize]]'s input:
    * lowercased host with any port and a leading `www.` stripped — the
    * group key RefinedWeb-style domain-level filtering aggregates on. */
  def urlDomain(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(url, "^[^/]*//([^/?#]*)", 1)),
        ":[0-9]+$", ""),
      "^www\\.", "")

  /** Per-domain curation decision table — [[sourceStats]] at the
    * [[urlDomain]] key, plus the distinct normalized-URL count (the
    * crawl-frontier dedup signal: n_docs ≫ n_urls means re-crawls of
    * the same pages). One groupBy with partial aggregation over
    * codegen'd projections; domains are the natural unit of web-scale
    * allow/deny lists, so the output is decision-table-sized. */
  def domainStats(df: DataFrame, urlCol: String, textCol: String,
                  langCol: String): DataFrame = {
    Joins.requireFreeColumns("domainStats", df.columns,
      "domain", "n_docs", "n_urls", "n_tokens", "avg_tokens", "dup_frac",
      "n_langs")
    df.select(urlDomain(col(urlCol)).as("domain"),
        urlNormalize(col(urlCol)).as("__u"),
        md5(col(textCol)).as("__h"),
        size(split(col(textCol), " ")).cast("long").as("__nt"), col(langCol))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__u")).as("n_urls"),
        sum("__nt").as("n_tokens"),
        round(avg(col("__nt").cast("double")), 4).as("avg_tokens"),
        round(lit(1.0) - countDistinct(col("__h")).cast("double") / count(lit(1)), 4)
          .as("dup_frac"),
        countDistinct(col(langCol)).as("n_langs"))
  }

  /** End-to-end curation funnel: the composed pipeline every corpus
    * build runs — quality filter → exact dedup → deterministic sample —
    * reported as a per-source funnel (how many documents survive each
    * stage). Stages are the engine's own operators, composed, so this is
    * both a useful report and a living test that the stages compose:
    *
    *   1. raw      — every document
    *   2. quality  — [[TextAnalysis.gopherQualityFlags]] `passes`
    *   3. dedup    — of the quality survivors, the min-id exemplar per
    *                 exact text (the [[Dedup.exactDedup]] keep rule)
    *   4. sampled  — of the dedup survivors, the content-addressed md5
    *                 byte-threshold keep ([[sampleByMd5]] semantics,
    *                 `keep256`/256 of rows, append-stable)
    *
    * Scale shape: one narrow staged projection is checkpointed and feeds
    * both the dedup groupBy and the final funnel agg (one scan, two
    * consumers); the dedup stage is the skew-safe groupBy(text)+join
    * form, never a window over a possibly-huge dup group; the funnel agg
    * is a partial-aggregating groupBy on the source key. Counting all
    * four stages in ONE pass over the left-joined marker frame means no
    * stage materializes its survivor set.
    *
    * Output: (srcCol, n_raw, n_quality, n_dedup, n_sampled), one row per
    * source. */
  def curationFunnel(docs: DataFrame, idCol: String, textCol: String,
                     srcCol: String, minWords: Int = 50,
                     keep256: Int = 192): DataFrame = {
    Joins.requireFreeColumns("curationFunnel", docs.columns,
      "passes", "__kept", "n_raw", "n_quality", "n_dedup", "n_sampled")
    val flags = TextAnalysis.gopherQualityFlags(
        docs.select(col(idCol), col(textCol)), idCol, textCol,
        minWords = minWords)
      .select(col(idCol), col("passes"))
    val staged = docs.select(col(idCol), col(textCol), col(srcCol))
      .join(flags, Seq(idCol))
      .localCheckpoint()
    val keep = staged.where(col("passes"))
      .groupBy(col(textCol)).agg(min(col(idCol)).as(idCol))
      .select(col(idCol), lit(true).as("__kept"))
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 2), 16, 10)
      .cast("long")
    staged.join(keep, Seq(idCol), "left")
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_raw"),
        count(when(col("passes"), lit(1))).as("n_quality"),
        count(when(col("__kept"), lit(1))).as("n_dedup"),
        count(when(col("__kept") && bucket < keep256, lit(1))).as("n_sampled"))
  }

  /** Corpus version diff: row-level added / removed / changed status
    * between two snapshots of a keyed table — the data-ops primitive
    * behind "what did this crawl/recuration actually change", audit
    * trails, and incremental downstream invalidation.
    *
    * `changed` compares md5 over the concat of FIXED-WIDTH per-column
    * md5 tokens (NULL → a reserved non-hex token), so column boundaries
    * are unambiguous whatever bytes the values contain — NULL ≠ empty
    * string, ("a","bc") ≠ ("ab","c"), and a value equal to any sentinel
    * text can never collide. Unchanged rows are dropped —
    * at corpus scale they are the bulk, and emitting them would make
    * the diff output ∝ corpus instead of ∝ churn.
    *
    * Scale shape: one full-outer equi-join on the id (sort-merge,
    * AQE-sized) over two narrow (id, hash) projections — column pruning
    * reaches both scans; the hash collapses arbitrarily wide compare
    * column sets into one 32-char comparison.
    *
    * Output: (idCol, status ∈ added|removed|changed). */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                 compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "corpusDiff needs compare columns")
    def keyed(df: DataFrame, h: String) = df.select(col(idCol),
      md5(concat(compareCols.map(c =>
        coalesce(md5(col(c).cast("string")),
          lit("!-------------------------------"))): _*))
        .as(h))
    keyed(oldDf, "__ho")
      .join(keyed(newDf, "__hn"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__ho").isNull, lit("added"))
          .when(col("__hn").isNull, lit("removed"))
          .when(col("__ho") =!= col("__hn"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .where(col("status") =!= "unchanged")
  }

  /** Equi-width histogram of a numeric column: `bins` equal-width
    * buckets over [lo, hi] with the bounds taken from the data (one
    * 1-row agg, broadcast), the distribution-profiling complement of
    * the equi-depth [[quantile cut|graft.operators.TextAnalysis]]
    * family. Bucket i covers [lo + i·w, lo + (i+1)·w); the max value
    * lands in the last bucket (not a phantom bins+1). NULLs are
    * excluded. One partial-agg groupBy — result is `bins` rows at any
    * corpus size.
    * Output: (bucket, lo_edge, hi_edge, n), dense over observed
    * buckets. */
  def equiWidthHistogram(df: DataFrame, valueCol: String,
                         bins: Int): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    Joins.requireFreeColumns("equiWidthHistogram", df.columns,
      "__lo", "__hi", "bucket", "lo_edge", "hi_edge", "n")
    val v = col(valueCol).cast("double")
    val bounds = df.agg(min(v).as("__lo"), max(v).as("__hi"))
    val w = (col("__hi") - col("__lo")) / bins
    df.where(v.isNotNull)
      .crossJoin(broadcast(bounds))
      // degenerate all-equal column (w = 0) pins everything to bucket 0
      // instead of 0/0 = NaN
      .select(when(col("__hi") === col("__lo"), lit(0)).otherwise(
        least(lit(bins - 1), floor((v - col("__lo")) / w).cast("int")))
        .as("bucket"),
        col("__lo"), col("__hi"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        first(col("__lo")).as("__l"), first(col("__hi")).as("__h2"))
      .select(col("bucket").cast("long").as("bucket"),
        round(col("__l") + col("bucket") * (col("__h2") - col("__l")) / bins, 4)
          .as("lo_edge"),
        round(col("__l") + (col("bucket") + 1) * (col("__h2") - col("__l")) / bins, 4)
          .as("hi_edge"),
        col("n"))
  }

  /** Column profile: per-column null and exact distinct counts in ONE
    * aggregation pass — the data-quality report run before a corpus
    * ships (null-rate regressions, cardinality drift).
    *
    * Counts only (no min/max strings): integer metrics are the
    * cross-engine-stable core; value-typed extremes re-enter formatting
    * territory.
    *
    * Distinct mode: `approxRsd = 0` (default) keeps EXACT distincts —
    * each expands to its own aggregate in the same job (Spark's
    * multi-distinct Expand duplicates the input ×cols, expensive at
    * 100 TB). A positive `approxRsd` switches every n_distinct to
    * HLL++ `approx_count_distinct` at that relative standard
    * deviation: one plain (non-Expand) agg pass, constant sketch
    * memory per column, map-side partial merge — the scale path;
    * error bound asserted in SketchPropsSuite. Null counts stay exact
    * in both modes.
    *
    * Output: (column, n_nulls, n_distinct), one row per profiled
    * column. */
  def profileColumns(df: DataFrame, cols: Seq[String],
                     approxRsd: Double = 0.0): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs columns")
    require(approxRsd >= 0.0 && approxRsd < 1.0,
      "approxRsd must be in [0, 1): 0 = exact, else the HLL++ rsd")
    val aggs = cols.flatMap { c =>
      val nd = if (approxRsd > 0.0) approx_count_distinct(col(c), approxRsd)
        else countDistinct(col(c))
      Seq(count(when(col(c).isNull, lit(1))).as(s"__n_$c"),
        nd.as(s"__d_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', `__n_$c`, `__d_$c`").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stacked) AS (col_name, n_nulls, n_distinct)")
  }

  /** A declarative data-quality constraint for [[checkExpectations]].
    * Each rule reduces to a conditional-count metric over one column;
    * `threshold` and the comparison direction are part of the rule. */
  sealed trait Expectation { def column: String }
  object Expectation {
    /** Null fraction must be ≤ `maxNullFrac`. */
    final case class NotNull(column: String, maxNullFrac: Double = 0.0)
      extends Expectation
    /** Distinct / non-null count must be ≥ `minDistinctFrac`
      * (1.0 = strictly unique; vacuously 1.0 on an all-null column). */
    final case class Unique(column: String, minDistinctFrac: Double = 1.0)
      extends Expectation
    /** Fraction of non-null values in [lo, hi] must be ≥ `minFrac`. */
    final case class InRange(column: String, lo: Double, hi: Double,
                             minFrac: Double = 1.0) extends Expectation
    /** Fraction of non-null values matching `pattern` (Java-regex
      * partial match, `rlike`) must be ≥ `minFrac`. */
    final case class MatchesRegex(column: String, pattern: String,
                                  minFrac: Double = 1.0) extends Expectation
    /** Fraction of non-null values in `values` must be ≥ `minFrac`. */
    final case class InSet(column: String, values: Seq[String],
                           minFrac: Double = 1.0) extends Expectation
  }

  /** Data-quality gate (the Deequ-style publish check a corpus runs
    * before it ships): evaluate every [[Expectation]] and report one
    * row per rule — the measured metric, the rule's threshold, and the
    * verdict. The caller fails the pipeline on `passed = false` rows;
    * nothing here throws, because a quality report must always
    * materialize.
    *
    * Scale shape: ALL rules evaluate in ONE aggregation pass — each
    * rule is a conditional count (map-side partial) over its column;
    * only `Unique` adds a distinct aggregate (Spark's multi-distinct
    * Expand — the same documented cost as [[profileColumns]] exact
    * mode). One job, one 1-row result, however many rules.
    *
    * Metrics are ratios of exact longs (IEEE division is bit-identical
    * cross-engine), rounded to 6 dp on output; `passed` compares the
    * UNROUNDED ratio so the verdict never flips on a rounding edge.
    *
    * Output: (rule, col_name, metric, threshold, passed), in rule
    * order. */
  def checkExpectations(df: DataFrame,
                        rules: Seq[Expectation]): DataFrame = {
    import Expectation._
    require(rules.nonEmpty, "checkExpectations needs at least one rule")
    Joins.requireFreeColumns("checkExpectations", df.columns,
      rules.indices.map(i => s"__m$i") :+ "__e": _*)
    def frac(num: Column, den: Column): Column =
      when(den === 0, lit(1.0)).otherwise(num.cast("double") / den)
    val metric: Seq[Column] = rules.map {
      case NotNull(c, _) =>
        frac(count(when(col(c).isNull, lit(1))), count(lit(1)))
      case Unique(c, _) => frac(countDistinct(col(c)), count(col(c)))
      case InRange(c, lo, hi, _) =>
        // try_cast, not cast: ANSI mode makes CAST('junk' AS DOUBLE)
        // THROW, and a quality report must always materialize — an
        // unparseable value simply counts as out-of-range
        frac(count(when(col(c).try_cast("double").between(lo, hi),
          lit(1))), count(col(c)))
      case MatchesRegex(c, p, _) =>
        frac(count(when(col(c).rlike(p), lit(1))), count(col(c)))
      case InSet(c, vs, _) =>
        frac(count(when(col(c).isin(vs: _*), lit(1))), count(col(c)))
    }
    val wide = df.agg(metric.head.as("__m0"),
      metric.tail.zipWithIndex.map { case (m, i) => m.as(s"__m${i + 1}") }: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      val m = col(s"__m$i")
      val (name, thr, passed) = r match {
        case NotNull(_, t)       => ("not_null", t, m <= t)
        case Unique(_, t)        => ("unique", t, m >= t)
        case InRange(_, _, _, t) => ("in_range", t, m >= t)
        case MatchesRegex(_, _, t) => ("matches_regex", t, m >= t)
        case InSet(_, _, t)      => ("in_set", t, m >= t)
      }
      struct(lit(name).as("rule"), lit(r.column).as("col_name"),
        (round(m, 6) + 0.0).as("metric"), lit(thr).as("threshold"),
        passed.as("passed"))
    }
    wide.select(explode(array(rows: _*)).as("__e")).select(col("__e.*"))
  }

  /** Quantile binning (feature discretizer): label every row with its
    * `nBins`-quantile bucket of `valCol` — equal-POPULATION bins, the
    * feature-prep counterpart of [[equiWidthHistogram]]'s equal-width
    * buckets. Bucket k covers (b_{k-1}, b_k]; ties at a boundary go to
    * the lower bin (strict `v > b` count); NULL values get a NULL bin.
    *
    * Cross-engine determinism is structural, not rounding-based: an
    * interpolated boundary lies strictly BETWEEN two adjacent data
    * values, so engines that disagree about it by accumulation ulps
    * still classify every data value identically (a boundary that lands
    * ON a value is position-integral and exact in both engines).
    *
    * Scale shape: one aggregation computes ALL boundaries (a single
    * (nBins−1)-element array), broadcast as a 1-row frame; bucket
    * lookup is a codegen'd `aggregate` HOF over the array — zero
    * shuffles beyond the boundary agg, output ∝ input. Exact
    * `percentile` buffers the column once (the oracle path);
    * `approxAcc > 0` swaps to the mergeable approx sketch — the 100 TB
    * path ([[robustOutliers]]' split). */
  def quantileBins(df: DataFrame, valCol: String, nBins: Int,
                   binCol: String = "bin", approxAcc: Int = 0): DataFrame = {
    require(nBins >= 2, "quantileBins needs nBins >= 2")
    graft.operators.Joins.requireFreeColumns("quantileBins",
      df.columns, binCol, "__b")
    val fracs = (1 until nBins).map(_.toDouble / nBins).toArray
    val pct =
      if (approxAcc > 0)
        approx_percentile(col(valCol), lit(fracs), lit(approxAcc))
          .cast("array<double>")
      else percentile(col(valCol), lit(fracs)).cast("array<double>")
    val bounds = df.agg(pct.as("__b"))
    df.crossJoin(broadcast(bounds))
      .withColumn(binCol,
        when(col(valCol).isNull, lit(null).cast("int"))
          .otherwise(lit(1) + aggregate(col("__b"), lit(0),
            (acc, b) => acc + when(col(valCol) > b, 1).otherwise(0))))
      .drop("__b")
  }

  /** Key-skew diagnostics: the top-`topK` heaviest keys with their row
    * counts and corpus share — what an engineer reads BEFORE picking a
    * salt factor for [[graft.operators.Joins.saltedJoin]] or blaming a
    * straggler task. Deterministic: count-desc with full key-asc
    * tie-break.
    *
    * Scale shape: one map-side-combining groupBy(keys) count, then an
    * `orderBy().limit(topK)` — planned as TakeOrderedAndProject, a
    * per-partition partial top-k with NO global sort and NO unbounded
    * window; the total rides as a broadcast 1-row aggregate. The only
    * window (the rank number) runs over the ≤ topK survivors.
    *
    * Output: (rank, keyCols…, n, share), share rounded to 6 dp. */
  def skewReport(df: DataFrame, keyCols: Seq[String],
                 topK: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "skewReport needs at least one key column")
    require(topK > 0, "skewReport needs topK > 0")
    graft.operators.Joins.requireFreeColumns("skewReport", df.columns,
      "rank", "n", "share", "__tot")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // feeds both the total and the top-k
    val total = counts.agg(sum("n").as("__tot"))
    val order = col("n").desc +: keyCols.map(col(_).asc)
    val top = counts.orderBy(order: _*).limit(topK)
    top.crossJoin(broadcast(total))
      .withColumn("share", round(col("n") / col("__tot"), 6) + 0.0)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(order: _*)))
      .select(col("rank") +: keyCols.map(col) :+ col("n") :+
        col("share"): _*)
  }

  /** Robust per-group outlier detection — the modified z-score of
    * Iglewicz & Hoaglin (1993): score = 0.6745·(v − median)/MAD, flag
    * |score| > `cutoff` (default 3.5, their recommended threshold).
    * Median/MAD instead of mean/stddev because corpus metrics are
    * heavy-tailed and the outliers being hunted would otherwise inflate
    * the very scale they're judged against.
    *
    * Degenerate MAD = 0 (a majority-constant group): every value ≠
    * median is flagged, score NULL — the statistically honest reading
    * (any deviation from a >50%-constant group is anomalous) and a
    * deterministic one.
    *
    * Scale shape: two aggregation passes (median, then MAD of the
    * residuals) + two keyed joins on the group column — output ∝
    * outliers, never a window. Exact `percentile` buffers a group's
    * values on one executor (the oracle path); `approxAcc > 0` swaps
    * both passes to `approx_percentile` — a mergeable, bounded-memory
    * sketch, the 100 TB path (same exact/approx split as
    * [[profileColumns]]).
    *
    * Output: the input columns + (med, mad, score) rounded to 6 dp,
    * outlier rows only; the flag compares the UNROUNDED score. Rows
    * with a NULL group key are excluded (the equi-joins drop them —
    * there is no population to be an outlier OF); screen for them with
    * an [[Expectation.NotNull]] rule first. */
  def robustOutliers(df: DataFrame, groupCol: String, valCol: String,
                     cutoff: Double = 3.5, approxAcc: Int = 0): DataFrame = {
    require(cutoff > 0, "robustOutliers cutoff must be positive")
    graft.operators.Joins.requireFreeColumns("robustOutliers", df.columns,
      "med", "mad", "score", "__med", "__mad", "__score")
    // exact `percentile` interpolates like SQL quantile_cont (the
    // oracle semantics); approx_percentile returns a sketch ELEMENT —
    // close, but only the approx path may use it
    def pct(c: Column): Column =
      if (approxAcc > 0) approx_percentile(c, lit(0.5), lit(approxAcc))
        .cast("double")
      else percentile(c, lit(0.5)).cast("double")
    val med = df.groupBy(col(groupCol)).agg(pct(col(valCol)).as("__med"))
    val mad = df.join(med, groupCol)
      .groupBy(col(groupCol))
      .agg(pct(abs(col(valCol) - col("__med"))).as("__mad"))
    val scored = df.join(med, groupCol).join(mad, groupCol)
      .withColumn("__score",
        when(col("__mad") > 0,
          lit(0.6745) * (col(valCol) - col("__med")) / col("__mad")))
    scored
      .where((col("__mad") > 0 && abs(col("__score")) > cutoff) ||
        (col("__mad") === 0 && col(valCol) =!= col("__med")))
      .select(df.columns.map(col) ++ Seq(
        (round(col("__med"), 6) + 0.0).as("med"),
        (round(col("__mad"), 6) + 0.0).as("mad"),
        (round(col("__score"), 6) + 0.0).as("score")): _*)
  }

  /** Per-group winsorization: values are clipped to the group's
    * [pLo, pHi] percentile band — the standard tail-taming pass before
    * feature scaling / reward normalization, the EDITING counterpart of
    * [[robustOutliers]] (which only flags).
    *
    * Scale shape: one percentile aggregation per group (group-count
    * rows) joined back — broadcastable whenever the group cardinality
    * is; the clip itself is codegen'd least/greatest. Like
    * [[robustOutliers]], `approxAcc > 0` swaps the exact interpolating
    * `percentile` (the oracle path — ≡ SQL quantile_cont) for the
    * mergeable bounded-memory `approx_percentile` sketch, the 100 TB
    * path. Clip flags compare the UNROUNDED bounds so they cannot flip
    * on display rounding; NULL values pass through unclipped with null
    * flags.
    *
    * Output: input columns + (lo, hi, clipped — 6 dp — and clipped_lo/
    * clipped_hi booleans). */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
                pLo: Double = 0.01, pHi: Double = 0.99,
                approxAcc: Int = 0): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      "winsorize needs 0 <= pLo < pHi <= 1")
    graft.operators.Joins.requireFreeColumns("winsorize", df.columns,
      "lo", "hi", "clipped", "clipped_lo", "clipped_hi", "__lo", "__hi")
    def pct(c: Column, p: Double): Column =
      if (approxAcc > 0) approx_percentile(c, lit(p), lit(approxAcc))
        .cast("double")
      else percentile(c, lit(p)).cast("double")
    val v = col(valCol).cast("double")
    val bounds = df.groupBy(col(groupCol))
      .agg(pct(v, pLo).as("__lo"), pct(v, pHi).as("__hi"))
    df.join(bounds, groupCol)
      .select(df.columns.map(col) ++ Seq(
        (round(col("__lo"), 6) + 0.0).as("lo"),
        (round(col("__hi"), 6) + 0.0).as("hi"),
        (round(least(greatest(v, col("__lo")), col("__hi")), 6) + 0.0)
          .as("clipped"),
        (v < col("__lo")).as("clipped_lo"),
        (v > col("__hi")).as("clipped_hi")): _*)
  }

  /** Token-distribution drift between two corpus slices — add-one-
    * smoothed KL divergence both ways plus the symmetric bounded
    * Jensen-Shannon divergence (natural log), THE health metric for
    * "did this crawl/version shift the data": p_t = (c_a(t)+1)/(n_a+V)
    * over the joint vocabulary V, q_t likewise.
    *
    * Scale shape: one map-side-combining token count per side, a
    * full-outer vocab join (vocab-sized, not corpus-sized), totals ride
    * as a broadcast 1-row aggregate. Cross-engine determinism follows
    * the lang-id fixed-point pattern: each token's four divergence
    * contributions are quantized to round(x·1e12) LONGS in the plan, so
    * the reduction is an order-free integer sum — no float-association
    * drift however the partial aggregation schedules; the oracle
    * computes the identical integers.
    *
    * Output (1 row): (vocab, n_a, n_b, kl_ab, kl_ba, js — 6 dp); when
    * BOTH sides are token-free the joint vocabulary is empty and the
    * output has no rows (there is no distribution to diverge from). */
  def tokenDrift(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame, as: String): DataFrame =
      df.select(explode(split(col(textCol), " ")).as("__tok"))
        .groupBy("__tok").agg(count(lit(1)).as(as))
    val joint = counts(a, "__ca")
      .join(counts(b, "__cb"), Seq("__tok"), "full_outer")
      .select(col("__tok"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val totals = joint.agg(count(lit(1)).cast("double").as("__v"),
      sum("__ca").cast("double").as("__na"),
      sum("__cb").cast("double").as("__nb"))
    val p = (col("__ca").cast("double") + 1.0) / (col("__na") + col("__v"))
    val q = (col("__cb").cast("double") + 1.0) / (col("__nb") + col("__v"))
    val m = (p + q) / 2.0
    def fx(x: Column): Column = round(x * 1e12, 0).cast("long")
    val sums = joint.crossJoin(broadcast(totals))
      .select(fx(p * log(p / q)).as("__ab"), fx(q * log(q / p)).as("__ba"),
        fx(p * log(p / m)).as("__pm"), fx(q * log(q / m)).as("__qm"),
        col("__v"), col("__na"), col("__nb"))
      .groupBy("__v", "__na", "__nb")
      .agg(sum("__ab").as("__sab"), sum("__ba").as("__sba"),
        sum("__pm").as("__spm"), sum("__qm").as("__sqm"))
    sums.select(col("__v").cast("long").as("vocab"),
      col("__na").cast("long").as("n_a"), col("__nb").cast("long").as("n_b"),
      round(col("__sab").cast("double") / 1e12, 6).as("kl_ab"),
      round(col("__sba").cast("double") / 1e12, 6).as("kl_ba"),
      round((col("__spm") + col("__sqm")).cast("double") / 2e12, 6).as("js"))
  }

  /** Categorical-distribution drift between two slices of one STRING
    * column — [[tokenDrift]]'s smoothed Jensen-Shannon divergence with
    * whole VALUES as the categories (no tokenization; a category may
    * contain spaces): p_k = (c_ref(k)+1)/(n_ref+V) over the joint
    * category set V, q_k likewise, js = (KL(p‖m)+KL(q‖m))/2, natural
    * log, bounded by ln 2. The live alarm wire for "a new enum value /
    * a shifted source mix appeared in this batch" — the categorical
    * counterpart of [[psiDrift]]'s numeric screen, used per micro-batch
    * by [[graft.jobs.DriftMonitorJob]].
    *
    * Scale shape: one map-side-combining count per side, a full-outer
    * join on the CATEGORY set (category-sized, never corpus-sized),
    * totals broadcast. Same integer-quantization contract as
    * tokenDrift: each category's two JS terms round to 1e-12 longs
    * before the order-free sum. NULLs are excluded (absence is not a
    * category; count them upstream if it should be).
    *
    * Output (1 row): (n_cats, n_ref, n_cur, js); no rows when both
    * sides are empty. */
  def categoricalDrift(ref: DataFrame, cur: DataFrame, valCol: String,
                       roundDp: Int = 6): DataFrame = {
    Joins.requireFreeColumns("categoricalDrift", Seq(valCol),
      "n_cats", "n_ref", "n_cur", "js", "__k", "__ca", "__cb",
      "__v", "__na", "__nb", "__pm", "__qm")
    def counts(df: DataFrame, as: String): DataFrame =
      df.select(col(valCol).cast("string").as("__k"))
        .where(col("__k").isNotNull)
        .groupBy("__k").agg(count(lit(1)).as(as))
    val joint = counts(ref, "__ca")
      .join(counts(cur, "__cb"), Seq("__k"), "full_outer")
      .select(col("__k"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val totals = joint.agg(count(lit(1)).cast("double").as("__v"),
      sum("__ca").cast("double").as("__na"),
      sum("__cb").cast("double").as("__nb"))
    val p = (col("__ca").cast("double") + 1.0) / (col("__na") + col("__v"))
    val q = (col("__cb").cast("double") + 1.0) / (col("__nb") + col("__v"))
    val m = (p + q) / 2.0
    def fx(x: Column): Column = round(x * 1e12, 0).cast("long")
    joint.crossJoin(broadcast(totals))
      .select(fx(p * log(p / m)).as("__pm"), fx(q * log(q / m)).as("__qm"),
        col("__v"), col("__na"), col("__nb"))
      .groupBy("__v", "__na", "__nb")
      .agg(sum("__pm").as("__spm"), sum("__qm").as("__sqm"))
      .select(col("__v").cast("long").as("n_cats"),
        col("__na").cast("long").as("n_ref"),
        col("__nb").cast("long").as("n_cur"),
        round((col("__spm") + col("__sqm")).cast("double") / 2e12, roundDp)
          .as("js"))
  }

  /** k-anonymity audit over a quasi-identifier column set: every
    * quasi-id combination shared by FEWER than k rows re-identifies its
    * members — the standard privacy screen before releasing or training
    * on user-adjacent data.
    *
    * [[kAnonymityViolations]] lists the violating combos (for triage);
    * [[kAnonymityStats]] reduces to the one-row release decision:
    * total combos, violating combos, rows at re-identification risk,
    * and the corpus' actual k (its smallest group — MIN, so any
    * violating combo drags it down).
    *
    * Scale shape: ONE map-side-combining groupBy over the quasi-id
    * tuple; the stats re-aggregate the (always far smaller) group
    * frame. NULL quasi-values group as their own class, as SQL does.
    * Output (violations): quasi cols + n, only rows with n < k.
    * Output (stats): (n_groups, n_violating, n_rows_at_risk, min_k). */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
                           k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs quasi-identifier columns")
    require(k >= 2, "kAnonymity needs k >= 2")
    Joins.requireFreeColumns("kAnonymityViolations", quasiCols, "n")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") < k)
  }

  /** See [[kAnonymityViolations]]. */
  def kAnonymityStats(df: DataFrame, quasiCols: Seq[String],
                      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs quasi-identifier columns")
    require(k >= 2, "kAnonymity needs k >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("n") < k, col("n")).otherwise(0L))
          .as("n_rows_at_risk"),
        min("n").as("min_k"))
  }

  /** Robust per-group dispersion and outlier count via the median /
    * MAD (median absolute deviation) — the outlier screen that, unlike
    * the mean/σ z-score, is not itself dragged by the outliers it
    * hunts. A row is an outlier when its modified z-score
    * 0.6745·(x − median)/MAD exceeds `cut` (Iglewicz-Hoaglin, 3.5 by
    * convention); a zero-MAD group (≥ half its values identical)
    * reports 0 outliers rather than dividing by zero.
    *
    * Scale shape: two exact-percentile aggregations (group-count rows
    * each, broadcastable) and one broadcast join back over the raw
    * rows for the count — no window, no sort. The percentile is exact
    * by default (the oracle path); `approxAcc > 0` swaps in
    * approx_percentile at that accuracy — the KLL-sketch path whose
    * aggregation state is O(accuracy) per group instead of the full
    * sorted value list, the form a 100 TB run uses.
    *
    * Output: (group, n, med rounded 4, mad rounded 4, n_outliers). */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
                  cut: Double = 3.5, approxAcc: Int = 0): DataFrame = {
    require(cut > 0.0, "madOutliers needs a positive cut")
    Joins.requireFreeColumns("madOutliers", Seq(groupCol),
      "n", "med", "mad", "n_outliers", "__x", "__ad")
    def p50(c: String) =
      if (approxAcc > 0) expr(s"approx_percentile($c, 0.5, $approxAcc)")
      else expr(s"percentile($c, 0.5)")
    val x = col(valCol).cast("double")
    val med = df.groupBy(col(groupCol))
      .agg(p50(valCol).cast("double").as("med"))
    val mad = df.join(broadcast(med), Seq(groupCol))
      .select(col(groupCol), abs(x - col("med")).as("__ad"))
      .groupBy(col(groupCol))
      .agg(p50("__ad").cast("double").as("mad"))
    df.join(broadcast(med), Seq(groupCol))
      .join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(first("med"), 4).as("med"),
        round(first("mad"), 4).as("mad"),
        sum(when(col("mad") > 0.0 &&
          abs(lit(0.6745) * (x - col("med")) / col("mad")) > cut,
          1L).otherwise(0L)).as("n_outliers"))
  }

  /** Binned two-sample Kolmogorov-Smirnov drift between two numeric
    * column distributions — the numeric complement of [[tokenDrift]]
    * (which compares token frequencies): D = max over bin edges of
    * |CDF_a − CDF_b| on a shared equi-width grid.
    *
    * Binning is the declared approximation (the statistic is exact for
    * the binned distributions; finer `bins` → closer to the raw KS D):
    * the shared bounds come from ONE union'd min/max aggregate, each
    * side then bins in a single map-side-combining pass, and the CDF
    * runs over the ≤ `bins`-row joined histogram — the only window in
    * the plan, bounded by the PARAMETER, never the data. Counts are
    * integers, so the CDFs are exact ratios and D is cross-engine
    * deterministic; a degenerate corpus (all values equal) yields one
    * bin and D = 0.
    *
    * Output: one row (n_a, n_b, d_stat rounded to `roundDp`). */
  def ksDrift(a: DataFrame, b: DataFrame, valCol: String,
              bins: Int = 64, roundDp: Int = 6): DataFrame = {
    require(bins >= 1, "ksDrift needs bins >= 1")
    Joins.requireFreeColumns("ksDrift", Seq(valCol),
      "__lo", "__hi", "__bin", "__ca", "__cb", "__na", "__nb",
      "n_a", "n_b", "d_stat")
    val x = col(valCol).cast("double")
    val va = a.select(x.as("__x")).where(col("__x").isNotNull)
    val vb = b.select(x.as("__x")).where(col("__x").isNotNull)
    val bounds = va.unionByName(vb)
      .agg(min("__x").as("__lo"), max("__x").as("__hi"))
    def binned(side: DataFrame, cnt: String): DataFrame =
      side.crossJoin(broadcast(bounds))
        .select(when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(
            floor((col("__x") - col("__lo")) /
              ((col("__hi") - col("__lo")) / bins)).cast("long"),
            lit(bins - 1L))).as("__bin"))
        .groupBy("__bin").agg(count(lit(1)).as(cnt))
    val hist = binned(va, "__ca")
      .join(binned(vb, "__cb"), Seq("__bin"), "full_outer")
      .select(col("__bin"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      .localCheckpoint() // ≤ bins rows, consumed by the totals AND the CDF
    val w = org.apache.spark.sql.expressions.Window.orderBy("__bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    hist
      .crossJoin(broadcast(hist.agg(sum("__ca").as("__na"),
        sum("__cb").as("__nb"))))
      .select(when(col("__na") > 0 && col("__nb") > 0,
        abs(sum(col("__ca")).over(w).cast("double") / col("__na") -
          sum(col("__cb")).over(w).cast("double") / col("__nb")))
        .as("__d"), // one empty side ⇒ NULL d_stat, never NaN/Infinity
        col("__na"), col("__nb"))
      .groupBy("__na", "__nb").agg(round(max("__d"), roundDp).as("d_stat"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"), col("d_stat"))
  }

  /** Population stability index between a reference and a current
    * distribution — the scorecard-drift metric next to [[ksDrift]]
    * (KS reads the worst CDF gap; PSI reads the whole reshape:
    * Σ (p_b − q_b)·ln(p_b/q_b) over shared equal-width bins, the
    * industry alert thresholds being ~0.1 watch / 0.25 act).
    *
    * Bins share bounds across both sides (ksDrift's arithmetic) and
    * both histograms are Laplace-smoothed by +0.5 per bin so an empty
    * bin on one side contributes a finite term instead of ±∞. Every
    * term is quantized to 1e-12 before the sum (the engine's
    * cross-engine float-sum contract).
    *
    * Scale shape: ksDrift's exactly — two map-side-combining bin
    * groupBys, a ≤ bins-row full-outer join, totals broadcast; the PSI
    * fold runs on the ≤ bins-row frame. No windows over the corpus.
    *
    * Output: one row (n_ref, n_cur, psi) — NULL psi when a side is
    * empty. */
  def psiDrift(ref: DataFrame, cur: DataFrame, valCol: String,
               bins: Int = 16, roundDp: Int = 6): DataFrame = {
    require(bins >= 1, "psiDrift needs bins >= 1")
    Joins.requireFreeColumns("psiDrift", Seq(valCol),
      "__lo", "__hi", "__bin", "__ca", "__cb", "__na", "__nb",
      "n_ref", "n_cur", "psi")
    val x = col(valCol).cast("double")
    val va = ref.select(x.as("__x")).where(col("__x").isNotNull)
    val vb = cur.select(x.as("__x")).where(col("__x").isNotNull)
    val bounds = va.unionByName(vb)
      .agg(min("__x").as("__lo"), max("__x").as("__hi"))
    def binned(side: DataFrame, cnt: String): DataFrame =
      side.crossJoin(broadcast(bounds))
        .select(when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(
            floor((col("__x") - col("__lo")) /
              ((col("__hi") - col("__lo")) / bins)).cast("long"),
            lit(bins - 1L))).as("__bin"))
        .groupBy("__bin").agg(count(lit(1)).as(cnt))
    // the full bin range 0..bins−1, so bins empty on BOTH sides still
    // carry their smoothed mass (PSI's denominator is the bin grid, not
    // the occupied bins — dropping empty bins would inflate p and q)
    val grid = ref.sparkSession.range(bins).select(col("id").as("__bin"))
    val hist = grid
      .join(binned(va, "__ca"), Seq("__bin"), "left")
      .join(binned(vb, "__cb"), Seq("__bin"), "left")
      .select(col("__bin"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      // ≤ bins rows, consumed by totals AND the fold; LAZY so merely
      // constructing the returned frame runs no Spark job (a streaming
      // monitor builds one of these per column per micro-batch)
      .localCheckpoint(eager = false)
    val p = (col("__ca").cast("double") + 0.5) /
      (col("__na").cast("double") + 0.5 * bins)
    val q = (col("__cb").cast("double") + 0.5) /
      (col("__nb").cast("double") + 0.5 * bins)
    hist
      .crossJoin(broadcast(hist.agg(sum("__ca").as("__na"),
        sum("__cb").as("__nb"))))
      .groupBy("__na", "__nb")
      .agg((sum(round((p - q) * log(p / q) * 1e12, 0).cast("long"))
        .cast("double") / 1e12).as("__psi"))
      .select(col("__na").as("n_ref"), col("__nb").as("n_cur"),
        when(col("__na") > 0 && col("__nb") > 0,
          round(col("__psi"), roundDp)).as("psi"))
  }

  /** Binned ROC-AUC — the ranking-quality number next to
    * [[calibrationBins]]'s honesty number: scores bin into `bins`
    * equal-width thresholds and AUC is the exact trapezoid over the
    * binned ROC curve, algebraically the tie-aware Mann-Whitney
    * statistic with ties at bin resolution:
    *
    *   AUC = Σ_b neg_b · (2·cumPos_b − pos_b) / (2·P·N)
    *
    * (descending-score cumulative; within-bin ties contribute half).
    * The numerator is an EXACT integer at any corpus size (decimal
    * accumulation — per-bin products overflow a long at ~10¹¹ rows), so
    * the statistic is engine-exact; bins only bound tie resolution, and
    * 1024 bins on a [0,1] score is finer than most learned scorers'
    * meaningful precision.
    *
    * Scale shape: one map-side-combining groupBy on the bin id, then a
    * ≤ bins-row cumulative window (the documented bounded-frame
    * exception) and a single-row agg. No corpus-sized sort — the exact
    * unbinned AUC would need one; this is the 100 TB form.
    *
    * Output: one row (n_pos, n_neg, auc); NULL auc when a class is
    * absent. */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String,
             bins: Int = 1024, roundDp: Int = 6): DataFrame = {
    require(bins >= 2, "rocAuc needs >= 2 bins")
    Joins.requireFreeColumns("rocAuc", df.columns,
      "n_pos", "n_neg", "auc", "__bin", "__pos", "__neg", "__cp")
    val s = col(scoreCol).cast("double")
    val perBin = df
      .where(s.isNotNull && col(labelCol).isNotNull)
      // both-end clamp: scores outside [0,1] take the nearest edge bin
      // (least() alone lets a negative score mint a negative bin id)
      .select(greatest(lit(0L),
          least(floor(s * bins).cast("long"), lit(bins - 1L))).as("__bin"),
        col(labelCol).cast("long").as("__l"))
      .groupBy("__bin")
      .agg(sum("__l").as("__pos"),
        (count(lit(1)) - sum("__l")).as("__neg"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__bin").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    perBin
      .select(col("__pos"), col("__neg"), sum("__pos").over(w).as("__cp"))
      .agg(sum("__pos").as("n_pos"), sum("__neg").as("n_neg"),
        sum(col("__neg").cast("decimal(38,0)") *
          (lit(2L) * col("__cp") - col("__pos")).cast("decimal(38,0)"))
          .as("__num"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          round(col("__num").cast("double") /
            (lit(2.0) * col("n_pos").cast("double") *
              col("n_neg").cast("double")), roundDp)).as("auc"))
  }

  /** Grouped k-fold assignment — the cross-validation split that keeps
    * every row of a group (user, document family, dedup cluster) in ONE
    * fold, so no fold evaluates on entities another fold trained on
    * (the CV-side complement of [[temporalSplitAudit]]). Content-
    * addressed like [[sampleByMd5]]: fold = md5(group) mod k, so the
    * assignment is reproducible on any engine, any run, and any append
    * — a new row of an existing group lands in the group's fold.
    *
    * Scale shape: a pure per-row projection — zero shuffle, zero state.
    *
    * Output: the input plus a `fold` column in [0, k). */
  def groupedKFold(df: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, "groupedKFold needs k >= 2")
    Joins.requireFreeColumns("groupedKFold", df.columns, "fold")
    df.withColumn("fold",
      conv(substring(md5(col(groupCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % k)
  }

  /** Pointwise and aggregate mutual information between two categorical
    * columns — the feature-association screen (is `lang` informative
    * about `source`? is a quality flag independent of the domain?)
    * every curation pipeline runs before trusting a stratification:
    *
    *   pmi(x, y)  = ln( p(x,y) / (p(x)·p(y)) )
    *   mi_contrib = p(x,y) · pmi(x, y)        (Σ over cells = the MI)
    *
    * Scale shape: ONE map-side-combining groupBy over the (x, y) pair
    * — the only pass over the data; marginals and the total are
    * re-aggregated FROM THE JOINT (≤ |X|·|Y| cells however large the
    * corpus) and joined back broadcast-sized. NULL categories group as
    * their own cell, exactly as SQL GROUP BY does. pmi is a per-cell
    * scalar (no float sum at all); mi_contrib values are the ones a
    * caller sums — at `roundDp` their later addition order is the
    * caller's concern, the per-cell values themselves are exact.
    *
    * Output: (xCol, yCol, n, pmi, mi_contrib), one row per observed
    * cell. */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String,
                 roundDp: Int = 6): DataFrame = {
    require(xCol != yCol, "mutualInfo needs two distinct columns")
    Joins.requireFreeColumns("mutualInfo", Seq(xCol, yCol),
      "n", "pmi", "mi_contrib", "__nx", "__ny", "__nt")
    val joint = df.groupBy(col(xCol), col(yCol))
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val mx = joint.groupBy(col(xCol)).agg(sum("n").as("__nx"))
    val my = joint.groupBy(col(yCol)).agg(sum("n").as("__ny"))
    val tot = joint.agg(sum("n").as("__nt"))
    val pxy = col("n").cast("double") / col("__nt")
    val pmi = log(pxy / (col("__nx").cast("double") / col("__nt")) /
      (col("__ny").cast("double") / col("__nt")))
    joint
      .join(mx, Seq(xCol)).join(my, Seq(yCol))
      .crossJoin(broadcast(tot))
      .select(col(xCol), col(yCol), col("n"),
        round(pmi, roundDp).as("pmi"),
        round(pxy * pmi, roundDp).as("mi_contrib"))
  }

  /** Benford's-law audit of a positive numeric column — the classic
    * fabricated-data / unit-mixup screen over numeric fact columns:
    * observed leading-digit counts vs the Benford expectation
    * p(d) = log10(1 + 1/d), with each digit's chi-squared contribution
    * (Σ over a group's digits = the test statistic).
    *
    * The leading digit comes from the value's STRING form (first [1-9]
    * character) — decimal and scientific renderings both lead with the
    * mantissa's first significant digit, so the extraction is
    * rendering-independent and cross-engine deterministic, where a
    * log10-based extraction can misbin an exact power of ten by one
    * ulp. Non-positive and NULL values are excluded (Benford is
    * defined on positive magnitudes).
    *
    * Scale shape: one map-side-combining (group, digit) groupBy — the
    * only pass over the data; expectations and chi² terms are per-cell
    * scalar algebra over integer counts joined against the ≤ 9-rows-
    * per-group broadcast totals. Output is ≤ 9 rows per group forever.
    *
    * Output: (group, digit, n, expected_p, chi2_term) at `roundDp` dp,
    * observed digits only. */
  def benfordAudit(df: DataFrame, groupCol: String, valCol: String,
                   roundDp: Int = 6): DataFrame = {
    Joins.requireFreeColumns("benfordAudit", Seq(groupCol),
      "digit", "n", "expected_p", "chi2_term", "__nt")
    val counts = df
      .where(col(valCol).isNotNull && col(valCol).cast("double") > 0.0)
      .select(col(groupCol),
        regexp_extract(col(valCol).cast("double").cast("string"),
          "[1-9]", 0).cast("long").as("digit"))
      .groupBy(col(groupCol), col("digit"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col(groupCol)).agg(sum("n").as("__nt"))
    val p = log10(lit(1.0) + lit(1.0) / col("digit"))
    counts.join(broadcast(totals), Seq(groupCol))
      .select(col(groupCol), col("digit"), col("n"),
        round(p, roundDp).as("expected_p"),
        round(pow(col("n").cast("double") - col("__nt") * p, 2) /
          (col("__nt") * p), roundDp).as("chi2_term"))
  }

  /** Per-group Gini coefficient of a per-key magnitude — the
    * concentration audit (is 1% of users 90% of the traffic? one
    * domain dominating a source?) that decides whether a cap or a
    * temperature resample is needed before training.
    *
    *   G = (2·Σᵢ i·xᵢ) / (n·Σ xᵢ) − (n + 1)/n
    *
    * over the group's per-key totals xᵢ sorted ascending (i = 1..n,
    * ties broken by key). Magnitudes quantize to micro-units BEFORE
    * any cross-row arithmetic (fixed-point longs — the tokenDrift
    * contract), so rank sums and totals are exact integers and the
    * only float is the final per-group expression. NULL values drop
    * before the quantize (a key with only NULLs would otherwise sort
    * engine-dependently). Assumes non-negative magnitudes (the Gini
    * domain).
    *
    * Scale shape: one (group, key) partial agg, one rank window
    * PARTITIONED BY GROUP (a sort — state O(1) per row), one partial
    * agg back to group rows. Keys per group can be corpus-sized; the
    * window is a distributed sort, never a driver collect.
    *
    * Output: (group, n_keys, total, gini) at `roundDp` dp. */
  def giniConcentration(df: DataFrame, groupCol: String, keyCol: String,
                        valCol: String, roundDp: Int = 6): DataFrame = {
    Joins.requireFreeColumns("giniConcentration", Seq(groupCol),
      "n_keys", "total", "gini", "__xq", "__rk")
    val xq = df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(keyCol))
      .agg(sum(round(col(valCol).cast("double") * 1e6, 0).cast("long"))
        .as("__xq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("__xq"), col(keyCol))
    xq.withColumn("__rk", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_keys"),
        // Decimal accumulators: rank (≤ n_keys) × micro-unit totals
        // (~1e12) overflows a long sum at corpus-sized key counts —
        // the twap/correlationMatrix contract (128-bit-exact sums).
        sum(col("__xq").cast("decimal(28,0)")).as("__sx"),
        sum(col("__rk").cast("decimal(20,0)") *
          col("__xq").cast("decimal(18,0)")).as("__sr"))
      .select(col(groupCol), col("n_keys"),
        round(col("__sx").cast("double") / 1e6, roundDp).as("total"),
        round(lit(2.0) * col("__sr") /
          (col("n_keys").cast("double") * col("__sx").cast("double")) -
          (col("n_keys") + lit(1L)).cast("double") / col("n_keys"),
          roundDp).as("gini"))
  }

  /** Per-group categorical diversity: Shannon entropy (nats), Simpson
    * concentration, and Pielou evenness over a category column — the
    * mixture-health report (is a source all one language? how even is
    * the domain mix?) run before fixing sampling weights.
    *
    *   H = −Σ p·ln p,   simpson = Σ p²,   evenness = H / ln k
    *
    * One map-side-combining (group, category) count is the only pass
    * over the data; the per-group fold is over ≤ |categories| cells,
    * each cell's term quantized to 1e-12 BEFORE the sum so cell
    * arrival order can't move the float result (the tokenDrift
    * contract; the final ≥ 4 dp rounding absorbs engine ln ulps).
    * NULL categories count as their own class, as GROUP BY does.
    *
    * Output: (group, n, k_classes, shannon, simpson, evenness) at
    * `roundDp` dp; evenness NULL for single-class groups. */
  def diversityStats(df: DataFrame, groupCol: String, catCol: String,
                     roundDp: Int = 6): DataFrame = {
    Joins.requireFreeColumns("diversityStats", Seq(groupCol, catCol),
      "n", "k_classes", "shannon", "simpson", "evenness", "__c", "__nt")
    val cells = df.groupBy(col(groupCol), col(catCol))
      .agg(count(lit(1)).as("__c"))
    val tot = cells.groupBy(col(groupCol)).agg(sum("__c").as("__nt"))
    val p = col("__c").cast("double") / col("__nt")
    cells.join(broadcast(tot), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max("__nt").as("n"),
        count(lit(1)).as("k_classes"),
        // Decimal accumulators: per-cell pico-unit terms reach ~1e12,
        // and k_classes can be vocabulary-sized (1e7+) at corpus scale —
        // a long sum wraps at ~9e6 cells (the gini bug class)
        sum(round(-p * log(p) * 1e12, 0).cast("decimal(38,0)")).as("__h"),
        sum(round(p * p * 1e12, 0).cast("decimal(38,0)")).as("__s"))
      .select(col(groupCol), col("n"), col("k_classes"),
        round(col("__h").cast("double") / 1e12, roundDp).as("shannon"),
        round(col("__s").cast("double") / 1e12, roundDp).as("simpson"),
        when(col("k_classes") > 1L,
          round(col("__h").cast("double") / 1e12 /
            log(col("k_classes").cast("double")), roundDp))
          .as("evenness"))
  }

  /** Pairwise Pearson correlation matrix over a set of numeric columns
    * — the feature-redundancy screen (which quality signals move
    * together? is a derived metric just a rescale?) run before a
    * scoring model or a stratification trusts its inputs.
    *
    * All five sufficient statistics per pair are EXACT: values
    * quantize to micro-units, cross products are summed as decimals
    * (128-bit-exact at any corpus size), and the one float expression
    * per pair is computed from those integers in a fixed written order
    * (the laggedCorrelation contract — the oracle replays it
    * verbatim). Rows with a NULL in ANY profiled column are dropped
    * first (listwise completion, so every pair sees the same n). A
    * zero-variance column yields NULL correlations, never NaN.
    *
    * Scale shape: ONE aggregation pass over the data computing all
    * k + k(k+1)/2 sums map-side; the pair expansion happens on the
    * single aggregated row. Output = k(k−1)/2 rows forever.
    *
    * Output: (col_a, col_b, n, corr) at `roundDp` dp, pairs in column
    * order with col_a before col_b. */
  def correlationMatrix(df: DataFrame, cols: Seq[String],
                        roundDp: Int = 6): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs >= 2 columns")
    require(cols.distinct.size == cols.size,
      "correlationMatrix needs distinct columns")
    // scan fan-out: the one aggregation pass carries k + k(k+1)/2
    // decimal multiply-sums per row — per-row compute an under-split
    // scan would serialize on one core (Joins.fanOutForCompute: no-op
    // when the scan already parallelizes)
    val base = Joins.fanOutForCompute(df, cols)
      .where(cols.map(c => col(c).isNotNull).reduce(_ && _))
      .select(cols.zipWithIndex.map { case (c, i) =>
        round(col(c).cast("double") * 1e6, 0).cast("long").as(s"__q$i")
      }: _*)
    val sums = cols.indices.map(i =>
      sum(col(s"__q$i").cast("decimal(18,0)")).as(s"__s$i"))
    val prods = for (i <- cols.indices; j <- i until cols.size) yield
      sum((col(s"__q$i").cast("decimal(18,0)") *
        col(s"__q$j").cast("decimal(18,0)"))).as(s"__p${i}_$j")
    val aggd = base.agg(count(lit(1)).as("__n"),
      (sums ++ prods): _*).localCheckpoint() // 1 row, read k(k-1)/2 times
    val nD = col("__n").cast("double")
    def sD(i: Int) = col(s"__s$i").cast("double")
    def pD(i: Int, j: Int) = col(s"__p${i}_$j").cast("double")
    val pairFrames = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield {
      val den = sqrt(nD * pD(i, i) - sD(i) * sD(i)) *
        sqrt(nD * pD(j, j) - sD(j) * sD(j))
      aggd.select(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        col("__n").as("n"),
        when(den > 0.0,
          round((nD * pD(i, j) - sD(i) * sD(j)) / den, roundDp))
          .as("corr"))
    }
    pairFrames.reduce(_.unionByName(_))
  }

  /** Weighted p-quantile per group: the smallest value whose cumulative
    * weight share reaches p — the importance-weighted quantile
    * (reweighting a corpus moves its effective median; the unweighted
    * percentile would lie about the distribution a sampler actually
    * sees).
    *
    * Weights quantize to micro-units, so cumulative sums are exact
    * integers; the one comparison against p·W computes the identical
    * double on both engines. The cumulative window runs over DISTINCT
    * (group, value) rows — per-value weights pre-aggregate map-side,
    * so window state and row count are bounded by distinct values, not
    * rows (the quantile_cut posture). A non-positive weight raises
    * (it would silently shift every quantile).
    *
    * Output: (group, n, w_total, q) at `roundDp` dp. */
  def weightedQuantile(df: DataFrame, groupCol: String, valCol: String,
                       weightCol: String, p: Double,
                       roundDp: Int = 6): DataFrame = {
    require(p > 0.0 && p <= 1.0, "weightedQuantile needs 0 < p <= 1")
    Joins.requireFreeColumns("weightedQuantile", Seq(groupCol),
      "n", "w_total", "q", "__v", "__wq", "__w", "__c", "__cw", "__wt")
    val wq = round(col(weightCol).cast("double") * 1e6, 0).cast("long")
    val perVal = df.where(col(valCol).isNotNull)
      .select(col(groupCol), col(valCol).cast("double").as("__v"),
        when(wq > 0L, wq).otherwise(raise_error(concat(
          lit("weightedQuantile needs positive weights; got "),
          col(weightCol).cast("string")))).as("__wq"))
      .groupBy(col(groupCol), col("__v"))
      // Decimal accumulators: micro-unit weights (~1e6 per unit-weight
      // row) wrap a long sum at ~9e12 rows (the gini bug class); the
      // downstream total and cumulative-window sums inherit the type
      .agg(sum(col("__wq").cast("decimal(38,0)")).as("__w"),
        count(lit(1)).as("__c"))
    val winSpec = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("__v")
    val win = winSpec.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // group totals via a SECOND (whole-frame) window over the SAME
    // partitioning instead of a groupBy + broadcast join: one WindowExec
    // computes both frames, so perVal (and the scan+quantize+pre-agg
    // plan feeding it) is evaluated ONCE — previously the `tot` branch
    // re-ran the whole upstream plan a second time (two full scans of
    // the raw table at any scale) and added an aggregation + broadcast
    // exchange. Same decimal sums, same p·W comparison, identical rows.
    val whole = winSpec.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    perVal
      .withColumn("__cw", sum(col("__w")).over(win))
      .withColumn("__wt", sum(col("__w")).over(whole))
      .withColumn("n", sum(col("__c")).over(whole))
      .where(col("__cw").cast("double") >= lit(p) * col("__wt"))
      .groupBy(col(groupCol))
      .agg(max("n").as("n"),
        round(max("__wt").cast("double") / 1e6, roundDp).as("w_total"),
        round(min("__v"), roundDp).as("q"))
  }

  /** Binned mutual information between two NUMERIC columns — the
    * numeric complement of [[mutualInfo]] (which needs categoricals),
    * and the nonlinear-dependence screen Pearson correlation misses
    * (corr ≈ 0 on y = x² while binned MI stays high): each column bins
    * on its own equi-width grid ([[ksDrift]]'s shared-bounds
    * arithmetic, identical IEEE width/floor math on both engines), the
    * joint histogram is ONE map-side-combining groupBy, and MI
    * re-aggregates from the ≤ bins² cell frame exactly as mutualInfo
    * does. Binning is the declared approximation; rows with a NULL in
    * either column drop first (the joint needs both sides).
    *
    * Output: one row (n, mi, h_x, h_y, redundancy = mi / min(h_x, h_y)
    * — NULL when either marginal entropy is 0) at `roundDp` dp, all in
    * nats, every entropy folded in 1e-12 fixed point (the tokenDrift
    * contract).
    */
  def binnedMutualInfo(df: DataFrame, xCol: String, yCol: String,
                       bins: Int = 16, roundDp: Int = 6): DataFrame = {
    require(bins >= 1, "binnedMutualInfo needs bins >= 1")
    Joins.requireFreeColumns("binnedMutualInfo", Nil,
      "n", "mi", "h_x", "h_y", "redundancy", "__x", "__y", "__bx",
      "__by", "__c", "__cx", "__cy", "__nt", "__lo_x", "__hi_x",
      "__lo_y", "__hi_y")
    val base = df
      .select(col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val bounds = base.agg(min("__x").as("__lo_x"), max("__x").as("__hi_x"),
      min("__y").as("__lo_y"), max("__y").as("__hi_y"))
    def binOf(v: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L)).otherwise(least(
        floor((v - lo) / ((hi - lo) / bins)).cast("long"),
        lit(bins - 1L)))
    val joint = base.crossJoin(broadcast(bounds))
      .select(binOf(col("__x"), col("__lo_x"), col("__hi_x")).as("__bx"),
        binOf(col("__y"), col("__lo_y"), col("__hi_y")).as("__by"))
      .groupBy("__bx", "__by").agg(count(lit(1)).as("__c"))
      .localCheckpoint() // ≤ bins² rows feeding marginals AND the fold
    val mx = joint.groupBy("__bx").agg(sum("__c").as("__cx"))
    val my = joint.groupBy("__by").agg(sum("__c").as("__cy"))
    val tot = joint.agg(sum("__c").as("__nt"))
    def entTerm(p: Column) =
      sum(round(-p * log(p) * 1e12, 0).cast("long")).cast("double") / 1e12
    val pxy = col("__c").cast("double") / col("__nt")
    val miQ = joint
      .join(mx, Seq("__bx")).join(my, Seq("__by"))
      .crossJoin(broadcast(tot))
      .agg(max("__nt").as("n"),
        (sum(round(pxy * log(pxy / (col("__cx").cast("double") / col("__nt")) /
          (col("__cy").cast("double") / col("__nt"))) * 1e12, 0)
          .cast("long")).cast("double") / 1e12).as("__mi"))
    val hx = mx.crossJoin(broadcast(tot))
      .agg(entTerm(col("__cx").cast("double") / col("__nt")).as("__hx"))
    val hy = my.crossJoin(broadcast(tot))
      .agg(entTerm(col("__cy").cast("double") / col("__nt")).as("__hy"))
    miQ.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(col("n"), round(col("__mi"), roundDp).as("mi"),
        round(col("__hx"), roundDp).as("h_x"),
        round(col("__hy"), roundDp).as("h_y"),
        when(least(col("__hx"), col("__hy")) > 0.0,
          round(col("__mi") / least(col("__hx"), col("__hy")), roundDp))
          .as("redundancy"))
  }

  def sourceStats(df: DataFrame, srcCol: String, textCol: String,
                  langCol: String): DataFrame =
    df.select(col(srcCol), md5(col(textCol)).as("__h"),
        size(split(col(textCol), " ")).cast("long").as("__nt"), col(langCol))
      .groupBy(srcCol)
      .agg(count(lit(1)).as("n_docs"),
        sum("__nt").as("n_tokens"),
        round(avg(col("__nt").cast("double")), 4).as("avg_tokens"),
        round(lit(1.0) - countDistinct(col("__h")).cast("double") / count(lit(1)), 4)
          .as("dup_frac"),
        countDistinct(col(langCol)).as("n_langs"))

  /** Temporal split + leakage audit — the report a time-based train/test
    * cut gets before anyone trusts the eval: rows at-or-after `cutoff`
    * are test, and any key (user, entity, document family) active on
    * BOTH sides is a leak channel (its test rows are predictable from
    * its own train rows, inflating the metric). One row out: sizes per
    * side, key counts per side, shared keys, and the fraction of test
    * ROWS carrying a train-seen key — the number that decides whether
    * the cut needs entity-level separation instead.
    *
    * Scale shape: one map-side-combining groupBy(key) counting each
    * side (shuffle = one row per key), then one single-row agg. No
    * windows, no joins, no corpus-sized collect.
    *
    * Output: (n_train, n_test, train_keys, test_keys, shared_keys,
    * shared_key_frac, leaky_test_rows, leaky_row_frac) at `roundDp`. */
  def temporalSplitAudit(df: DataFrame, keyCol: String, tsCol: String,
                         cutoff: String, roundDp: Int = 6): DataFrame = {
    Joins.requireFreeColumns("temporalSplitAudit", df.columns,
      "n_train", "n_test", "train_keys", "test_keys", "shared_keys",
      "shared_key_frac", "leaky_test_rows", "leaky_row_frac", "__tr", "__te")
    val perKey = df
      .select(col(keyCol),
        when(col(tsCol) < lit(cutoff).cast("timestamp"), 1L).otherwise(0L)
          .as("__tr"),
        when(col(tsCol) >= lit(cutoff).cast("timestamp"), 1L).otherwise(0L)
          .as("__te"))
      .groupBy(keyCol)
      .agg(sum("__tr").as("__tr"), sum("__te").as("__te"))
    perKey.agg(
        sum("__tr").as("n_train"), sum("__te").as("n_test"),
        sum(when(col("__tr") > 0L, 1L).otherwise(0L)).as("train_keys"),
        sum(when(col("__te") > 0L, 1L).otherwise(0L)).as("test_keys"),
        sum(when(col("__tr") > 0L && col("__te") > 0L, 1L).otherwise(0L))
          .as("shared_keys"),
        sum(when(col("__tr") > 0L && col("__te") > 0L, col("__te"))
          .otherwise(0L)).as("leaky_test_rows"))
      .select(col("n_train"), col("n_test"), col("train_keys"),
        col("test_keys"), col("shared_keys"),
        when(col("test_keys") > 0L,
          round(col("shared_keys").cast("double") / col("test_keys"),
            roundDp)).as("shared_key_frac"),
        col("leaky_test_rows"),
        when(col("n_test") > 0L,
          round(col("leaky_test_rows").cast("double") / col("n_test"),
            roundDp)).as("leaky_row_frac"))
  }

  /** Retrieval ranking metrics — the eval harness for any ranked system
    * this engine produces (BM25, cosine/ANN top-k, RRF fusion): per
    * query, precision@k, recall@k, reciprocal rank, and NDCG@k against
    * a graded judgment set.
    *
    * `run` = (queryCol, docCol, rankCol) with rank 1-based within each
    * query; `qrels` = (queryCol, docCol, gradeCol) with grade > 0
    * meaning relevant (graded gains use 2^grade − 1). Run rows beyond
    * rank k are ignored; judged docs the run never returned count
    * against recall and IDCG, exactly as trec_eval does — and a judged
    * QUERY the run never returned at all still gets its row (n_ret 0,
    * all-zero scores), so macro-averages over the output are honest.
    *
    * Float policy: every DCG term is quantized to 1e-12 before its sum
    * (the engine's cross-engine float-sum contract), so per-query DCG /
    * IDCG are exact integers in micro-micro units and the final ratios
    * are single double expressions.
    *
    * Scale shape: one keyed equi-join run⋈qrels on (query, doc) — both
    * sides shuffle on the same key, no window; the IDCG ranking is one
    * window PARTITIONED BY QUERY (state ∝ a query's judged docs, never
    * the corpus); the final groupBy(query) partial-aggregates map-side.
    * Queries are independent — the whole thing is embarrassingly
    * parallel in the query key at any corpus size.
    *
    * Output: (queryCol, n_rel, n_ret, p_at_k, r_at_k, rr, ndcg_at_k). */
  def rankingMetrics(run: DataFrame, qrels: DataFrame, queryCol: String,
                     docCol: String, rankCol: String, gradeCol: String,
                     k: Int, roundDp: Int = 6): DataFrame = {
    require(k >= 1, "rankingMetrics needs k >= 1")
    Joins.requireFreeColumns("rankingMetrics",
      run.columns ++ qrels.columns,
      "__g", "__q2", "__d2", "__dcgq", "__idcgq", "__irank", "n_rel",
      "n_ret", "p_at_k", "r_at_k", "rr", "ndcg_at_k")
    val q = col(queryCol)
    // DCG term at 1-based rank r: (2^g − 1)/log2(r+1), quantized 1e-12
    val judged = qrels
      .where(col(gradeCol) > 0)
      .select(q.as("__q2"), col(docCol).as("__d2"),
        col(gradeCol).cast("long").as("__g"))
    // run side: joined grade (null = unjudged), capped at k for p/r/DCG
    val joined = run
      .select(q, col(docCol), col(rankCol).cast("long").as(rankCol))
      .join(judged, q === col("__q2") && col(docCol) === col("__d2"), "left")
    val perQueryRun = joined
      .groupBy(q)
      .agg(count(lit(1)).as("n_ret"),
        sum(when(col("__g").isNotNull && col(rankCol) <= k, 1L)
          .otherwise(0L)).as("__hits"),
        min(when(col("__g").isNotNull, col(rankCol))).as("__firstrel"),
        // decimal DCG accumulator: one pico-unit term is (2^g−1)·1e12 —
        // already ~8e18 at grade 23 — so the quantized sum is formed in
        // decimal(38,0), never a wrappable long
        sum(when(col("__g").isNotNull && col(rankCol) <= k,
          round((pow(lit(2.0), col("__g").cast("double")) - 1.0) /
            (log(col(rankCol).cast("double") + 1.0) / log(lit(2.0))) * 1e12, 0)
            .cast("decimal(38,0)"))).as("__dcgq"))
    // ideal ranking: judged docs by grade desc (doc asc tiebreak), top k
    val wIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__q2")).orderBy(col("__g").desc, col("__d2"))
    val perQueryIdeal = judged
      .withColumn("__irank", row_number().over(wIdeal))
      .groupBy(col("__q2"))
      .agg(count(lit(1)).as("n_rel"),
        sum(when(col("__irank") <= k,
          round((pow(lit(2.0), col("__g").cast("double")) - 1.0) /
            (log(col("__irank").cast("double") + 1.0) / log(lit(2.0))) * 1e12, 0)
            .cast("decimal(38,0)"))).as("__idcgq"))
    // FULL outer: a judged query the run never returned still gets a row
    // (n_ret 0, zero scores), exactly as trec_eval reports it — a left
    // join would silently drop it and inflate every macro-average
    perQueryRun.join(perQueryIdeal, q === col("__q2"), "full")
      .select(coalesce(q, col("__q2")).as(queryCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_ret"), lit(0L)).as("n_ret"),
        round(coalesce(col("__hits"), lit(0L)).cast("double") / k, roundDp)
          .as("p_at_k"),
        when(col("n_rel") > 0,
          round(coalesce(col("__hits"), lit(0L)).cast("double") / col("n_rel"),
            roundDp)).as("r_at_k"),
        when(col("__firstrel").isNotNull,
          round(lit(1.0) / col("__firstrel"), roundDp)).otherwise(0.0)
          .as("rr"),
        when(col("__idcgq") > 0L,
          round(coalesce(col("__dcgq"), lit(0L)).cast("double") /
            col("__idcgq"), roundDp)).as("ndcg_at_k"))
  }

  /** Score-calibration bins + expected calibration error — the audit a
    * learned quality/reward scorer gets before its threshold is trusted
    * at corpus scale: scores in [0, 1] split into `bins` equal-width
    * bins; per bin the count, mean predicted score, empirical positive
    * rate, and signed gap; plus the overall ECE (Σ n_b/N · |gap_b|) on
    * every row. Scores outside [0, 1] clamp to the nearest edge bin
    * (both ends), so a malformed scorer can never mint an out-of-range
    * bin id — its mean_score-vs-bin mismatch is the loud signal.
    *
    * Float policy: scores quantize to micro-units on entry, so per-bin
    * sums are exact integers; mean/rate/gap/ECE are single double
    * expressions over those integers.
    *
    * Scale shape: one map-side-combining groupBy on the bin id (≤ bins
    * rows reach the reduce), one ≤ bins-row total join — no windows
    * over the corpus, ECE assembled on the ≤ bins-row frame.
    *
    * Output: (bin, n, mean_score, frac_pos, gap, ece), one row per
    * non-empty bin. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      bins: Int = 10, roundDp: Int = 6): DataFrame = {
    require(bins >= 2, "calibrationBins needs >= 2 bins")
    Joins.requireFreeColumns("calibrationBins", df.columns,
      "bin", "n", "mean_score", "frac_pos", "gap", "ece", "__sq", "__pos",
      "__nt")
    val s = col(scoreCol).cast("double")
    val binned = df
      .where(s.isNotNull && col(labelCol).isNotNull)
      // clamp BOTH ends: a score outside [0,1] lands in the nearest edge
      // bin instead of minting an out-of-range bin id (a negative score
      // under least() alone would emit bin −k and break the contract)
      .select(greatest(lit(0L),
          least(floor(s * bins).cast("long"), lit(bins - 1L))).as("bin"),
        // quantize IN decimal: a malformed huge score (the very case the
        // clamp routes to an edge bin) would overflow a per-row long cast
        // under ANSI before its tell-tale mean_score could surface
        round(s * 1e6, 0).cast("decimal(38,0)").as("__sq"),
        col(labelCol).cast("long").as("__pos"))
    // Decimal accumulators: micro-unit score sums (~1e6/row) wrap a long
    // at ~9e12 rows, and poss·1e6 wraps at ~9e12 positives (the gini bug
    // class) — both sums are exact integers in decimal(38,0)
    val perBin = binned.groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum("__sq").as("__sqs"),
        sum("__pos").as("__poss"))
    val tot = perBin.agg(sum("n").as("__nt"),
      // exact integer Σ |n_b·rate_b − n_b·mean_b| in micro-units:
      // |poss·1e6 − sqs| per bin, summed — ECE = that / (N · 1e6)
      sum(abs(col("__poss").cast("decimal(38,0)") * 1000000L -
        col("__sqs"))).as("__gq"))
    perBin.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"),
        round(col("__sqs").cast("double") / 1e6 / col("n"), roundDp)
          .as("mean_score"),
        round(col("__poss").cast("double") / col("n"), roundDp).as("frac_pos"),
        round(col("__poss").cast("double") / col("n") -
          col("__sqs").cast("double") / 1e6 / col("n"), roundDp).as("gap"),
        round(col("__gq").cast("double") / 1e6 / col("__nt"), roundDp)
          .as("ece"))
  }
}
