package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2.9 L4).
  * Everything is column algebra (codegen-eligible); the lone UDF
  * (tokenCount) exists to satisfy F8's "scalar UDF example" and is
  * semantically identical to `size(split(text,' '))`.
  */
object TextAnalysis {

  /** F8's example scalar UDF. Prefer `size(split(c,' '))` (codegen'd);
    * this exists to demonstrate UDF registration parity (FIXTURES Q36).
    * split limit -1 keeps trailing empty tokens and null maps to null —
    * exactly `size(split(c,' '))` semantics, including at the edges. */
  val tokenCountUdf: UserDefinedFunction =
    udf((s: String) =>
      if (s == null) null else java.lang.Long.valueOf(s.split(" ", -1).length.toLong))

  def whitespaceTokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword proxy: split on word boundaries/punctuation, the
    * usual pre-tokenization regex shape. */
  def bpeishTokens(text: Column): Column =
    filter(split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"), t => length(t) > 0)

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Seq("der", "die", "und", "das", "in", "von", "zu", "mit", "den", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des", "en", "du", "que"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"))

  /** n-gram/stopword language-ID heuristic: score = |tokens ∩ stopwords_L|
    * per language, argmax wins ("und" = no stopword hit at all). Pure
    * column algebra — argmax via array_max over (score, lang) structs. */
  def langIdGuess(text: Column): Column =
    langIdGuessFromTokens(array_distinct(whitespaceTokens(lower(text))))

  /** [[langIdGuess]] over a pre-built distinct-lowercased token array —
    * use when the token array is staged as its own projection (the
    * inline form re-splits + re-distincts the text once per language). */
  def langIdGuessFromTokens(toks: Column): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val wl = array(words.map(lit): _*)
      struct(size(array_intersect(toks, wl)).as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Trained char-trigram language-ID (the Cavnar–Trenkle/fastText
    * lineage, as an add-one-smoothed naive-Bayes over character
    * trigrams): per-language trigram counts are TRAINED from a labeled
    * corpus, and each target doc is scored per language with
    * `Σ_pos ln((c(lang, tri)+1)/(n_lang+V))`, argmax winning (ties
    * break to the lexicographically first language). Replaces the
    * 10-stopword [[langIdGuess]] heuristic with a model that learns
    * whatever character-level signal the labeled slice carries —
    * diacritics, function words, scripts — instead of a fixed list.
    *
    * Scale shape: training is ONE keyed count pass over the labeled
    * corpus — per-language totals and the vocab size are re-aggregated
    * from the (lang, trigram) count table, which is profile-sized, not
    * corpus-sized. The LABEL SPACE is then collected to the driver —
    * one row per language, bounded by definition (same capped-collect
    * posture as IVF's trainCap) — so the profile can be pivoted WIDE:
    * one broadcast row per trigram carrying a dense lang-ordered array
    * of FIXED-POINT log-probs — `round(lp · 1e9)` longs, quantized
    * once at vocab scale. Scoring broadcast-joins trigram POSITION
    * rows against that profile and aggregates STRAIGHT to per-doc,
    * per-language integer sums: no per-(doc, trigram) multiplicity
    * shuffle, no ×langs row fan-out, and plain long SUM columns that
    * are associative/commutative (order-free ⇒ deterministic under any
    * partial-agg order, map-side combining, whole-stage codegen — no
    * collect_list, no per-doc sort, no interpreted fold). The 1e-9
    * log-prob quantization is part of the declared semantics; the
    * oracle computes the identical integer sums. Argmax is local
    * over the score array (`array_position` of the max = first/
    * lexicographically-smallest language on ties — exact on integer
    * ties). No per-(doc, lang) shuffle, no argmax window. Docs with no
    * trigram (< 3 chars) pass through as `und` with a null score.
    * Output: (id, n_trigrams, lang_pred, nb_score). */
  def langIdNgram(docs0: DataFrame, train0: DataFrame,
                  idCol: String, textCol: String, langCol: String): DataFrame = {
    Joins.requireFreeColumns("langIdNgram", docs0.columns,
      "n_trigrams", "lang_pred", "nb_score")
    // scan fan-out on both passes: the trigram-position explode and the
    // per-position profile probe are pure per-row compute that inherit
    // the scan's partitioning (no-op when the scan already parallelizes).
    // The train side fans out on (langCol, textCol) — the only columns
    // its contract requires (idCol is a docs-side requirement; keying
    // the train repartition on it made a missing train idCol fail only
    // when the fan-out fired, an input-size-dependent error). langCol
    // alone would hash into ≤ #languages buckets; textCol supplies the
    // key cardinality.
    val docs = Joins.fanOutForCompute(docs0, Seq(idCol))
    val train = Joins.fanOutForCompute(train0, Seq(langCol, textCol))
    val txt = col("__txt")
    // one row per trigram POSITION: explode the int position sequence
    // and slice post-explode — the generate + projection fuse in one
    // codegen stage, so no per-doc array of substrings is ever built
    def instances(df: DataFrame, key: Column, keyName: String): DataFrame =
      df.withColumn("__txt", lower(col(textCol)))
        .where(length(txt) >= 3)
        .select(key.as(keyName), txt,
          explode(sequence(lit(1), length(txt) - 2)).as("__p"))
        .select(col(keyName), txt.substr(col("__p"), lit(3)).as("__tri"))
    // localCheckpoint: the count table is profile-sized (langs × vocab),
    // but its LINEAGE is the train-corpus trigram explode — and it feeds
    // several separate subplans (per-lang totals, the vocab agg, the
    // wide-profile build), which Catalyst treats as independent plans
    // and would re-explode the training text for each. One eager
    // materialization caps the train pass at exactly one scan.
    // (A row-local sorted-array run-length-encoded multiset — skipping
    // this explode+agg entirely — measured 30% SLOWER end to end:
    // array_sort/filter/zip_with are interpreted expressions, while the
    // explode + keyed hash-agg stays inside whole-stage codegen.)
    val counts = instances(train, col(langCol), "__lang")
      .groupBy("__lang", "__tri")
      .agg(count(lit(1)).cast("double").as("__c"))
      .localCheckpoint()
    // label space to the driver: one row per LANGUAGE (bounded by
    // definition — a label set that doesn't fit the driver isn't a
    // language-ID problem). n+v and the unseen-trigram lp0 are computed
    // with the same double ops the per-profile-row path uses, so scores
    // are bit-identical to the per-language formulation.
    val langRows = counts.groupBy("__lang")
      .agg(sum(col("__c")).as("__n"))
      .crossJoin(counts.agg(countDistinct(col("__tri")).cast("double").as("__v")))
      .collect().sortBy(_.getString(0))
    val langs = langRows.map(_.getString(0)).toIndexedSeq
    if (langs.isEmpty) // degenerate empty/sub-trigram train corpus:
      return docs.select(col(idCol), lit(0L).as("n_trigrams"), // matches the
        lit("und").as("lang_pred"),              // old empty-profile output
        lit(null).cast("double").as("nb_score"))
    val nvs = langRows.map(r => r.getDouble(1) + r.getDouble(2)).toIndexedSeq
    // FIXED-POINT profile: lp is quantized to round(lp·1e9) longs IN
    // THE PROFILE (vocab-sized work), mirroring Spark round's
    // BigDecimal HALF_UP so the driver-side lp0 literals land on the
    // same integers the in-plan round produces.
    def fx(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val lp0Fxs = nvs.map(nv => fx(math.log(1.0 / nv) * 1e9))
    val langsLit = array(langs.map(lit): _*)
    val lp0FxLit = array(lp0Fxs.map(lit): _*)
    val nvMap = map(langs.zip(nvs).flatMap { case (l, nv) =>
      Seq(lit(l), lit(nv)) }: _*)
    // wide profile: one row per trigram, DENSE lang-ordered array of
    // fixed-point lp — (vocab) rows, broadcast; lp = ln((c+1)/(n+v))
    // exactly as the narrow form, a (lang, tri) the train slice never
    // saw smooths to c=0 ⟹ lp = lp0 for that language.
    val profWide = counts
      .select(col("__tri"), col("__lang"),
        round(log((col("__c") + 1.0) / element_at(nvMap, col("__lang")))
          * 1e9).cast("long").as("__lpfx"))
      .groupBy("__tri")
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("__lang"), col("__lpfx"))))).as("__pm"))
      .select(col("__tri"), zip_with(langsLit, lp0FxLit,
        (l, d) => coalesce(element_at(col("__pm"), l), d)).as("__lps"))
    // score pass: one row per trigram POSITION joins the broadcast
    // profile and aggregates STRAIGHT to per-doc integer sums — no
    // per-(doc, trigram) multiplicity shuffle at all. Integer addition
    // is order-free, so plain SUM columns are deterministic under any
    // partial-agg order, map-side combining, whole-stage codegen.
    val contrib = instances(docs, col(idCol), idCol)
      .join(broadcast(profWide), Seq("__tri"), "left")
      .withColumn("__mlps", coalesce(col("__lps"), lp0FxLit))
    val slotSums = langs.indices.map(i =>
      sum(element_at(col("__mlps"), i + 1)).as(s"__s$i"))
    val perDoc = contrib.groupBy(col(idCol))
      .agg(count(lit(1)).as("__nt"), slotSums: _*)
      .withColumn("__sms", array(langs.indices.map(i => col(s"__s$i")): _*))
      .withColumn("__pos",
        array_position(col("__sms"), array_max(col("__sms"))).cast("int"))
      .select(col(idCol), col("__nt"),
        element_at(langsLit, col("__pos")).as("__lang"),
        element_at(col("__sms"), col("__pos")).as("__sm"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nt"), lit(0L)).as("n_trigrams"),
        coalesce(col("__lang"), lit("und")).as("lang_pred"),
        (round(col("__sm").cast("double") / 1e9 / col("__nt"), 4) + 0.0)
          .as("nb_score"))
  }

  /** C4-style blocklist screen (Raffel et al. 2020 §2.2's bad-word
    * filter, generalized to any dictionary): per-doc hit statistics
    * against a lowercase word list — `n_hits` (token instances on the
    * list), `n_hit_types` (distinct listed words present), and
    * `keep = n_hits <= maxHits` (C4 drops on ANY hit; maxHits defaults
    * to 0 to match).
    *
    * Scale shape: the dictionary ships as an array LITERAL inside a
    * pure per-row HOF projection — zero shuffle, zero join, fully
    * codegen'd, the filter streams through the scan at any corpus
    * size. Word lists in practice are 10²–10⁴ entries; past literal
    * comfort (~10⁵) switch to a broadcast join on exploded tokens —
    * the same threshold argument as incrementalExactDedup's
    * bloom-literal ceiling. The token array is STAGED in its own
    * projection (HOF staging audit: inlined, Catalyst re-splits the
    * text once per lambda). Null text → 0 hits, keep = true. */
  def blocklistScreen(df: DataFrame, idCol: String, textCol: String,
                      words: Seq[String], maxHits: Long = 0L): DataFrame = {
    require(words.nonEmpty, "blocklistScreen needs a non-empty word list")
    Joins.requireFreeColumns("blocklistScreen", df.columns,
      "n_hits", "n_hit_types", "keep")
    val wl = array(words.distinct.sorted.map(w => lit(w.toLowerCase)): _*)
    val toks = col("__toks")
    df.withColumn("__toks", whitespaceTokens(lower(col(textCol))))
      .select(col(idCol),
        coalesce(size(filter(toks, t => array_contains(wl, t))), lit(0))
          .cast("long").as("n_hits"),
        coalesce(size(array_intersect(array_distinct(toks), wl)), lit(0))
          .cast("long").as("n_hit_types"))
      .withColumn("keep", col("n_hits") <= maxHits)
  }

  /** Heuristic quality score in [0,1]: length band + alpha ratio +
    * mean-token-length band — the usual cheap pre-filters before
    * expensive model scoring. Deterministic. */
  def qualityScore(text: Column): Column =
    qualityScore(text, whitespaceTokens(text))

  /** [[qualityScore]] over a pre-built token array (staging variant). */
  def qualityScore(text: Column, toks: Column): Column = {
    val nToks = size(toks).cast("double")
    val meanTokLen = (length(text) - nToks + 1) / nToks
    val alphaRatio = (length(regexp_replace(text, "[^a-zA-Z ]", "")).cast("double")
      / greatest(length(text), lit(1)).cast("double"))
    val lenScore = when(nToks.between(5, 5000), 1.0).otherwise(0.2)
    val tokScore = when(meanTokLen.between(2.0, 12.0), 1.0).otherwise(0.3)
    round((lenScore * 0.4 + tokScore * 0.3 + alphaRatio * 0.3), 4)
  }

  /** Rolling fingerprint over the token stream: left-fold of
    * xxhash64(acc, token). Order-sensitive — unlike a set hash, catches
    * reorderings — and overflow-free under ANSI mode. */
  def fingerprint(text: Column): Column = fingerprintOfTokens(whitespaceTokens(text))

  /** [[fingerprint]] over a pre-built token array (staging variant). */
  def fingerprintOfTokens(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => xxhash64(acc, t))

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    * MOSS scheme): hash every k-char gram of the text (the rolling-hash
    * shingle set — md5 here so any engine reproduces it), then keep the
    * minimum hash of each w-gram window and emit the distinct window
    * minima as the document's fingerprint set. Guarantees: any shared
    * substring of length ≥ k+w-1 contributes ≥1 shared fingerprint, so
    * near-verbatim overlap (plagiarism / boilerplate / contamination)
    * is caught by a fingerprint-equality join instead of a quadratic
    * text compare. Pure column algebra — sequence/transform/slice HOFs,
    * no UDF, no shuffle; output one row per (doc, fingerprint), ~|text|/w
    * fingerprints per doc. Docs shorter than k fingerprint their whole
    * text (one gram, one window). */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "winnowFingerprints needs k >= 1 and w >= 1")
    Joins.requireFreeColumns("winnowFingerprints", df.columns, "__g", "fp")
    val txt = col(textCol)
    val grams = transform(
      sequence(lit(1), greatest(length(txt) - (k - 1), lit(1))),
      i => md5(txt.substr(i, lit(k))))
    // staged projection: the gram array MUST be materialized per row
    // before the window pass — inlined into the window lambda it would
    // re-hash the entire text once per window (O(len²) md5 calls; 16×
    // wall-clock at sf0.01). CollapseProject keeps the stage because
    // __g is referenced more than once and is non-cheap.
    val g = col("__g")
    val wins = transform(
      sequence(lit(1), greatest(size(g) - (w - 1), lit(1))),
      j => array_min(slice(g, j, lit(w))))
    // explode_outer + isNotNull, not explode: the plain explode's
    // inferred size()>0 pre-filter re-inlines the whole window-min
    // transform (every window minimum computed twice per doc). With the
    // explicit null-text pre-filter below, the staged gram array has no
    // null elements, so dropping the outer null row is exactly
    // plain-explode semantics.
    // Null-text docs are DROPPED, by declared contract (filtered up
    // front rather than incidentally): a null text has no substrings to
    // fingerprint, and the null fp the pre-r18 explode emitted for it
    // could never equi-join anyway (null = null is never true).
    df.where(txt.isNotNull)
      .select(col(idCol), grams.as("__g"))
      .select(col(idCol), explode_outer(array_distinct(wins)).as("fp"))
      .where(col("fp").isNotNull)
  }

  /** Near-dup / contamination pairs via winnowing fingerprints: docs
    * sharing ≥ `minShared` fingerprints, with the shared count. This is
    * the reason winnowing exists at scale — substring-overlap detection
    * becomes a fingerprint equi-join (shuffle keyed on the fingerprint,
    * partial-agg'd pair counts) instead of any pairwise text compare.
    * Fingerprint-frequency skew (boilerplate grams shared by half the
    * corpus) is the classic hazard: `maxDocFreq` drops fingerprints
    * appearing in more than that many docs before the join — exactly
    * the stop-gram cut MOSS applies — bounding any single join key's
    * fan-out at maxDocFreq². */
  def winnowNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, w: Int = 4, minShared: Int = 3,
                         maxDocFreq: Int = 1000): DataFrame = {
    val fps = winnowFingerprints(df, idCol, textCol, k, w)
    val rare = fps.groupBy("fp")
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDocFreq)
      .select("fp")
    val pruned = fps.join(rare, "fp")
    pruned.as("a").join(pruned.as("b"), Seq("fp"))
      .where(col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Train/eval decontamination: winnow-fingerprint the eval set and the
    * training corpus, equi-join on fingerprint, report each eval doc
    * that shares ≥ `minShared` fingerprints with any training doc. The
    * asymmetric two-corpus form of [[winnowNearDupPairs]] — the check
    * every benchmark-hygiene pipeline runs before training. The small
    * (eval) side's fingerprint set broadcasts when it fits; the corpus
    * side streams through the join — no pairwise compare, no corpus
    * self-join. Output: (eval id, corpus id, n_shared). */
  def decontaminationJoin(eval: DataFrame, corpus: DataFrame,
                          idCol: String, textCol: String,
                          k: Int = 8, w: Int = 4,
                          minShared: Int = 3): DataFrame = {
    val evalFps = winnowFingerprints(eval, idCol, textCol, k, w)
      .withColumnRenamed(idCol, "eval_id")
    val corpusFps = winnowFingerprints(corpus, idCol, textCol, k, w)
      .withColumnRenamed(idCol, "corpus_id")
    evalFps.join(corpusFps, "fp")
      .groupBy("eval_id", "corpus_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Per-doc token/char stats frame used by quality dashboards. The
    * whitespace-token and langid-token arrays are each built once per
    * row in a staged projection; the inline forms would split the text
    * three times (count, quality, fingerprint) plus once per language. */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), col(textCol),
        whitespaceTokens(col(textCol)).as("__t"),
        array_distinct(whitespaceTokens(lower(col(textCol)))).as("__lt"))
      .select(
        col(idCol),
        size(col("__t")).cast("long").as("ws_tokens"),
        size(bpeishTokens(col(textCol))).cast("long").as("bpeish_tokens"),
        length(col(textCol)).cast("long").as("chars"),
        qualityScore(col(textCol), col("__t")).as("quality"),
        langIdGuessFromTokens(col("__lt")).as("lang_pred"),
        fingerprintOfTokens(col("__t")).as("fp"))

  /** Gopher-style repetition statistics (Rae et al. 2021 §A1.1): the
    * cheap structural signals web-scale pipelines filter on before any
    * model scoring. Per document:
    *   - `n_lines`, `dup_line_frac`: fraction of lines (split at `\n`)
    *     that are repeats BEYOND each distinct line's first occurrence
    *     — `(n_lines − n_distinct) / n_lines`, so `[a, a]` scores 0.5,
    *     not 1.0 (the occurrences-beyond-first convention, matching
    *     `dup5_char_frac`);
    *   - `dup_line_char_frac`: fraction of line characters inside lines
    *     occurring more than once;
    *   - `top2_char_frac`: characters covered by the most frequent word
    *     bigram / total chars (count ties break to the lexicographically
    *     greatest bigram — deterministic on any engine);
    *   - `dup5_char_frac`: characters in 5-gram occurrences beyond each
    *     gram's first / total chars (the standard approximation of
    *     "chars inside duplicated n-grams" that needs no positional
    *     coverage union).
    *
    * Pure HOF column algebra: no UDF, no shuffle, one row in → one row
    * out. Per-row cost is O(tokens log tokens): every duplicate
    * measure is a single run-aware linear fold over a SORTED array
    * whose lambda bodies touch only lambda variables — equal values
    * are adjacent after the sort, so "occurs more than once" is
    * "equals a neighbor" and no per-gram occurrence scan exists. (The
    * previous form counted each distinct gram with an O(grams) list
    * scan — O(tokens²) — and the optimizer's projection collapsing
    * could inline the gram array's construction into that scan's
    * lambda, re-splitting the full text per element: a crafted
    * 2000-token document burned 20+ CPU-minutes on one core. The fold
    * form is immune to inlining by construction.) For book-length
    * documents [[dupNgramCharFrac]]'s explode+groupBy form remains the
    * shuffle-based alternative. Tokens split on whitespace runs
    * (`\s+`) so line breaks separate words for the n-gram measures
    * too. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    Joins.requireFreeColumns("repetitionStats", df.columns,
      "__lines", "__toks", "__b", "__f", "__ls", "__fs", "__bs",
      "__leq", "__feq",
      "n_lines", "dup_line_frac", "dup_line_char_frac",
      "top2_char_frac", "dup5_char_frac")
    val txt = col(textCol)
    def ngrams(toks: Column, n: Int): Column =
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
    val nullStr = lit(null).cast("string")
    // eqPrev over a sorted array: result[i] says s[i] == s[i-1]
    // (null-safe, so index 0 is false); one trailing false element
    // rides along from the length-(n+1) shifted side
    def eqPrev(sorted: Column): Column =
      zip_with(sorted, concat(array(nullStr), sorted), (a, p) => a <=> p)
    val (lines, toks) = (col("__lines"), col("__toks"))
    val (ls, fs, bs) = (col("__ls"), col("__fs"), col("__bs"))
    val (leq, feq) = (col("__leq"), col("__feq"))
    val lineChars = aggregate(lines, lit(0L),
      (acc, l) => acc + length(l).cast("long"))
    // chars of EVERY occurrence of a duplicated line: in sorted order
    // an occurrence is duplicated iff it equals its predecessor OR its
    // successor (eqNext[i] = eqPrev[i+1])
    val dupLineChars = aggregate(
      zip_with(ls,
        zip_with(leq, slice(leq, lit(2), size(ls)), (p, q) => p || q),
        (l, m) => when(coalesce(m, lit(false)), length(l).cast("long"))
          .otherwise(0L)),
      lit(0L), (acc, x) => acc + coalesce(x, lit(0L)))
    // (k − 1)·len per k-occurrence 5-gram = len wherever fs[i]==fs[i-1]
    val dup5Chars = aggregate(
      zip_with(fs, feq, (g, e) =>
        when(coalesce(e, lit(false)), length(g).cast("long"))
          .otherwise(0L)),
      lit(0L), (acc, x) => acc + coalesce(x, lit(0L)))
    // max bigram run over the sorted array in ONE fold: run length
    // resets on value change; ties keep the LATEST (= lexicographically
    // greatest under the ascending sort) argmax — the old
    // distinct-scan tie rule
    val top2Chars = aggregate(bs,
      struct(nullStr.as("prev"), lit(0L).as("run"), lit(0L).as("best"),
        nullStr.as("bg")),
      (acc, g) => {
        val run2 = when(acc("prev") <=> g, acc("run") + 1L).otherwise(1L)
        struct(g.as("prev"), run2.as("run"),
          when(run2 >= acc("best"), run2).otherwise(acc("best")).as("best"),
          when(run2 >= acc("best"), g).otherwise(acc("bg")).as("bg"))
      },
      acc => coalesce(acc("best") * length(acc("bg")).cast("long"), lit(0L)))
    df.select(col(idCol), txt,
        filter(split(txt, "\n"), l => length(l) > 0).as("__lines"),
        filter(split(txt, "\\s+"), t => length(t) > 0).as("__toks"))
      .withColumn("__b", ngrams(toks, 2))
      .withColumn("__f", ngrams(toks, 5))
      .withColumn("__ls", array_sort(lines))
      .withColumn("__fs", array_sort(col("__f")))
      .withColumn("__bs", array_sort(col("__b")))
      .withColumn("__leq", eqPrev(ls))
      .withColumn("__feq", eqPrev(fs))
      .select(col(idCol),
        size(lines).cast("long").as("n_lines"),
        round((size(lines) - size(array_distinct(lines)))
          / greatest(size(lines), lit(1)).cast("double"), 4).as("dup_line_frac"),
        round(dupLineChars / greatest(lineChars, lit(1)).cast("double"), 4)
          .as("dup_line_char_frac"),
        round(top2Chars / greatest(length(txt), lit(1)).cast("double"), 4)
          .as("top2_char_frac"),
        round(dup5Chars / greatest(length(txt), lit(1)).cast("double"), 4)
          .as("dup5_char_frac"))
  }

  /** The duplicated-n-gram character fraction of [[repetitionStats]] in
    * its explode + groupBy form — the swap for corpora of book-length
    * documents, where the HOF form's per-row O(tokens²) gram-counting
    * scan stops being cheap. One keyed shuffle on (doc, gram) replaces
    * the in-row scans; outputs are IDENTICAL to the HOF measure
    * (OperatorsSuite asserts it), so callers choose purely on document
    * length. Docs with fewer than `n` tokens surface with fraction 0,
    * like the HOF form. */
  def dupNgramCharFrac(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 5): DataFrame = {
    require(n >= 1, "dupNgramCharFrac needs n >= 1")
    Joins.requireFreeColumns("dupNgramCharFrac", df.columns,
      "__len", "__toks", "__g", "__cnt", "dup_char_frac")
    val toks = col("__toks")
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), length(col(textCol)).as("__len"),
        filter(split(col(textCol), "\\s+"), t => length(t) > 0).as("__toks"))
      .select(col(idCol), col("__len"), explode_outer(grams).as("__g"))
      .groupBy(col(idCol), col("__len"), col("__g"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col(idCol), col("__len"))
      .agg(sum(when(col("__g").isNotNull,
          (col("__cnt") - 1) * length(col("__g"))).otherwise(0L))
        .as("__dup"))
      .select(col(idCol),
        round(col("__dup") / greatest(col("__len"), lit(1)).cast("double"), 4)
          .as("dup_char_frac"))
  }

  /** Gopher-style document quality flags (Rae et al. 2021 §A1.1): the
    * rule set web-scale English pipelines apply before model-based
    * scoring, as one codegen-eligible projection. Raw signals plus the
    * boolean each rule implies, plus the conjunction:
    *   - `n_words` in [minWords, maxWords] (whitespace tokens);
    *   - `mean_word_len` in [3, 10];
    *   - `symbol_ratio` (`#` chars + `...` occurrences per word) ≤ 0.1;
    *   - `alpha_word_frac` (words containing ≥1 ASCII letter) ≥ 0.8;
    *   - `n_stop` ≥ `minStop` distinct hits in the 8-word Gopher stop
    *     list (2 is the published rule for natural English; lower it
    *     for corpora whose register is stop-word-poor — code, logs,
    *     synthetic fixtures).
    * No shuffle, no UDF — pure column algebra over one staged token
    * array, so Catalyst keeps the whole thing in one codegen stage. */
  def gopherQualityFlags(df: DataFrame, idCol: String, textCol: String,
                         minWords: Int = 50, maxWords: Int = 100000,
                         minStop: Int = 2): DataFrame = {
    Joins.requireFreeColumns("gopherQualityFlags", df.columns,
      "__toks", "n_words", "mean_word_len", "symbol_ratio",
      "alpha_word_frac", "n_stop", "passes")
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val txt = col(textCol)
    val toks = col("__toks")
    val nWords = size(toks).cast("double")
    val wordChars = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    val meanLen = wordChars / greatest(nWords, lit(1.0))
    val hashes = length(txt) - length(regexp_replace(txt, "#", ""))
    val ellipses = (length(txt) - length(regexp_replace(txt, "\\.\\.\\.", ""))) / 3
    val symbolRatio = (hashes + ellipses) / greatest(nWords, lit(1.0))
    val alphaFrac =
      size(filter(toks, t => t.rlike("[a-zA-Z]"))) / greatest(nWords, lit(1.0))
    val nStop = size(array_intersect(
      array_distinct(transform(toks, t => lower(t))),
      array(gopherStops.map(lit): _*)))
    df.select(col(idCol), txt,
        filter(split(txt, "\\s+"), t => length(t) > 0).as("__toks"))
      .select(col(idCol),
        size(toks).cast("long").as("n_words"),
        round(meanLen, 4).as("mean_word_len"),
        round(symbolRatio, 4).as("symbol_ratio"),
        round(alphaFrac, 4).as("alpha_word_frac"),
        nStop.cast("long").as("n_stop"),
        (size(toks).between(minWords, maxWords) &&
          meanLen.between(3.0, 10.0) &&
          (symbolRatio <= 0.1) &&
          (alphaFrac >= 0.8) &&
          (nStop >= minStop)).as("passes"))
  }

  /** Okapi BM25 top-k documents for a bag-of-words query — the lexical
    * retrieval scorer every corpus-curation pipeline keeps next to its
    * embedding ANN (seed-document expansion, contamination checks,
    * "find more like this" sampling). Standard formula per query term:
    * `idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))` with the
    * always-positive idf `ln(1 + (N-df+0.5)/(df+0.5))`; a document's
    * score sums its matching terms', rounded to 4 decimals, ties broken
    * by id. Only documents containing ≥1 query term are candidates.
    *
    * Scale shape: the token explode filters to the query's terms BEFORE
    * the tf groupBy, so the shuffled stream is |matching postings|, not
    * the corpus token count; the df and corpus-stats sides are ≤|query|
    * and 1 row (broadcast); the doc-length join is the one keyed
    * shuffle; the final top-k is TakeOrderedAndProject, never a global
    * sort. */
  def bm25TopDocs(docs: DataFrame, idCol: String, textCol: String,
                  query: Seq[String], k: Int, k1: Double = 1.2,
                  b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25TopDocs needs at least one query term")
    val lens = docs.select(col(idCol),
      size(whitespaceTokens(col(textCol))).cast("double").as("__dl"))
    val stats = lens.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__dl")).as("__avgdl"))
    val tf = docs.select(col(idCol),
        explode(whitespaceTokens(col(textCol))).as("__term"))
      .where(col("__term").isInCollection(query))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val df = tf.groupBy(col("__term"))
      .agg(count(lit(1)).cast("double").as("__df"))
    val contrib = tf
      .join(broadcast(df), "__term")
      .join(lens, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__c",
        col("__idf") * col("__tf") * (k1 + 1.0)
          / (col("__tf") + (col("__dl") / col("__avgdl") * b + (1.0 - b)) * k1))
    val topk = contrib.groupBy(col(idCol))
      .agg(round(sum(col("__c")), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
    // rank the k survivors (k rows — the window's single partition is
    // fine here and only here; the corpus-wide ordering above is the
    // TakeOrdered path)
    topk.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col(idCol))).cast("long"))
  }

  /** Corpus-trained add-one bigram language-model score: per doc, the
    * mean negative log-likelihood of its token bigrams under the LM
    * whose counts come from the corpus itself — the CCNet/Wikipedia-LM
    * fluency filter, self-trained so it needs no external model.
    * `nll` is low for docs made of common constructions, high for
    * gibberish/boilerplate outliers; filter on a quantile of it.
    *
    * p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V), V = corpus distinct
    * token count. Docs with < 2 tokens have no bigrams and are absent
    * from the output (nothing to score).
    *
    * Scale shape: the bigram instance stream is collapsed to
    * per-(doc, bigram) MULTIPLICITIES row-adjacent to the explode (one
    * keyed partial-agg groupBy, checkpointed), so everything downstream
    * — the c2/c1 count re-aggs AND the score-join probe — runs over
    * distinct (doc, bigram) rows, not positions; repetition inside a
    * doc costs one row however often the bigram repeats. Counts are
    * integers in doubles, so every sum is exact regardless of
    * aggregation order. The per-doc summation folds `m · lp` terms in
    * BIGRAM-sorted order so the float sum is order-deterministic
    * (reproducible across runs/engines — the oracle's `list_reduce
    * (list(mlp ORDER BY bg))` adds in the identical sequence). */
  def lmScoreBigram(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = col("__s")
    val base = df.select(col(idCol), whitespaceTokens(col(textCol)).as("__s"))
    // positional explode (the substringDedup/langIdNgram pattern):
    // exploding a zip_with(...struct...) array lets
    // InferFiltersFromGenerate re-inline the whole bigram-array build
    // into a size()>0 pre-filter — the array was constructed TWICE per
    // doc. The int-sequence explode keeps the inferred filter trivial
    // and builds each bigram once, post-explode. The `size >= 2` guard
    // replaces the implicit empty-slice behavior (sequence(1, 0) would
    // count DOWN); docs with < 2 tokens stay absent from the output.
    val pairs = base.where(size(s) >= 2)
      .select(col(idCol), s, explode(sequence(lit(1), size(s) - 1)).as("__p"))
      .select(col(idCol), element_at(s, col("__p")).as("__w1"),
        concat_ws(" ", element_at(s, col("__p")),
          element_at(s, col("__p") + 1)).as("__bg"))
    // localCheckpoint: the (doc, bigram, m) table feeds three subplans
    // (c2, c1, the score probe); one eager materialization caps the
    // explode+collapse at a single evaluation.
    val docBg = pairs.groupBy(col(idCol), col("__w1"), col("__bg"))
      .agg(count(lit(1)).cast("double").as("__m"))
      .localCheckpoint()
    val c2 = docBg.groupBy("__bg").agg(sum(col("__m")).as("__c2"))
    val c1 = docBg.groupBy("__w1").agg(sum(col("__m")).as("__c1"))
    val v = base.select(explode(s).as("__t"))
      .agg(countDistinct(col("__t")).cast("double").as("__v"))
    docBg.join(c2, "__bg").join(c1, "__w1").crossJoin(broadcast(v))
      .withColumn("__mlp",
        col("__m") * -log((col("__c2") + 1.0) / (col("__c1") + col("__v"))))
      .groupBy(col(idCol))
      .agg(sum(col("__m")).cast("long").as("n_bigrams"),
        sort_array(collect_list(struct(col("__bg"), col("__mlp")))).as("__a"))
      .select(col(idCol), col("n_bigrams"),
        // + 0.0 canonicalizes -0.0 (p(w2|w1)=1 folds to -ln 1 = -0.0)
        (round(aggregate(col("__a"), lit(0.0),
          (acc, x) => acc + x.getField("__mlp")) / col("n_bigrams"), 4) + 0.0)
          .as("nll"))
  }

  /** Per-doc token-distribution diversity: Shannon entropy of the
    * token frequency distribution (nats) plus type/token counts and
    * type-token ratio. Low entropy = repetitive/templated text, near
    * ln(n_tokens) = every token distinct — the cheap repetitiveness
    * screen next to [[repetitionStats]]' n-gram measures.
    *
    * H = ln(n) − (Σ_t c_t·ln c_t)/n, summed over distinct tokens in
    * LEXICOGRAPHIC order so the float fold is order-deterministic.
    * Pure per-row HOF algebra, zero shuffle; per-row cost
    * O(types · tokens), bounded by doc length. Token and distinct
    * arrays are staged in their own projections (inlined, Catalyst
    * re-evaluates them per lambda element — the O(len²) HOF-staging
    * trap). */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (t, d, c) = (col("__t"), col("__d"), col("__c"))
    df.select(col(idCol), whitespaceTokens(col(textCol)).as("__t"))
      .withColumn("__d", array_sort(array_distinct(t)))
      .withColumn("__c",
        transform(d, g => size(filter(t, x => x === g)).cast("double")))
      .select(col(idCol),
        size(t).cast("long").as("n_tokens"),
        size(d).cast("long").as("n_types"),
        round(size(d).cast("double") / size(t), 4).as("ttr"),
        (round(log(size(t).cast("double")) -
          aggregate(c, lit(0.0), (acc, x) => acc + x * log(x)) / size(t), 4)
          + 0.0).as("entropy"))
  }

  /** DSIR-style importance weight: hashed-unigram log-likelihood ratio
    * of a target distribution vs the raw corpus (Xie et al., "Data
    * Selection for Language Models via Importance Resampling"). Tokens
    * hash into `buckets` md5 buckets; each bucket gets
    * lw = ln p_target(b) − ln p_raw(b) (add-one smoothed); a doc's
    * weight is the mean lw over its token instances. Docs whose
    * unigram profile matches the target (`isTarget` rows) score high —
    * resample the corpus proportionally to exp(weight) to shift the
    * mixture toward the target domain.
    *
    * Scale shape: one count pass + one score pass over the corpus; the
    * bucket→weight table is exactly `buckets` rows — broadcast, so the
    * score pass adds no shuffle beyond the final per-doc groupBy.
    * Summation is position-sorted-fold deterministic as in
    * [[lmScoreBigram]]. */
  /** Portable hashed-unigram bucket: first 4 md5 hex chars → 16-bit
    * int, mod `buckets` — reproducible on any engine with md5 (the
    * same trick [[dsirWeights]] and the DuckDB oracles use). */
  private def hashBucket(c: Column, buckets: Int): Column =
    pmod(conv(substring(md5(c), 1, 4), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Quality-classifier TRAINING (the CCNet/fastText linear-classifier
    * stage, as seed-free logistic regression over hashed unigram
    * frequencies): collects a capped, id-ordered sample of per-doc
    * (label, bucket-count) rows and runs full-batch gradient descent
    * locally — no RNG anywhere (zero init, deterministic doc and
    * bucket order), so the same labeled slice yields bit-identical
    * weights on every run, the property that makes the downstream
    * score pass oracle-checkable. Features are within-doc bucket
    * frequencies (counts / doc length), which bounds every feature in
    * [0, 1] and keeps plain GD well-conditioned without normalization
    * state. Returns (weights[buckets], bias).
    *
    * Scale shape: the per-doc feature rows aggregate in Spark (keyed
    * groupBys, sorted bucket lists); only the top-`trainCap` docs by
    * id ever reach the driver — the Lloyd-training posture from
    * Similarity: a documented, capped, deterministic sample, not the
    * corpus. A 10⁹-doc corpus trains on the same `trainCap` rows. */
  def qualityLrTrain(train: DataFrame, idCol: String, textCol: String,
                     labelCol: String, buckets: Int = 256, iters: Int = 50,
                     learnRate: Double = 0.5, trainCap: Int = 5000)
      : (Array[Double], Double) = {
    require(buckets > 0 && iters >= 1 && trainCap >= 1,
      "qualityLrTrain needs positive buckets/iters/trainCap")
    val rows = train
      .select(col(idCol), col(labelCol).cast("double").as("__y"),
        posexplode(whitespaceTokens(col(textCol))).as(Seq("__pos", "__t")))
      .select(col(idCol), col("__y"),
        hashBucket(col("__t"), buckets).as("__b"))
      .groupBy(col(idCol), col("__y"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol), col("__y"))
      .agg(sum("__c").as("__n"),
        sort_array(collect_list(struct(col("__b"), col("__c")))).as("__f"))
      .orderBy(col(idCol)).limit(trainCap)
      .collect()
    val data = rows.map { r =>
      val n = r.getLong(2).toDouble
      val feats = r.getSeq[org.apache.spark.sql.Row](3)
        .map(f => (f.getLong(0).toInt, f.getLong(1).toDouble / n)).toArray
      (r.getDouble(1), feats)
    }
    val w = new Array[Double](buckets)
    var b = 0.0
    val m = math.max(data.length, 1).toDouble
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](buckets)
      var gb = 0.0
      data.foreach { case (y, feats) =>
        var z = b
        feats.foreach { case (j, x) => z += w(j) * x }
        val d = 1.0 / (1.0 + math.exp(-z)) - y
        gb += d
        feats.foreach { case (j, x) => gw(j) += d * x }
      }
      b -= learnRate * gb / m
      var j = 0
      while (j < buckets) { w(j) -= learnRate * gw(j) / m; j += 1 }
      it += 1
    }
    (w, b)
  }

  /** Quality-classifier SCORING with trained [[qualityLrTrain]]
    * weights: one distributed pass — per-token bucket lookup in the
    * broadcast-literal weight array, a position-sorted per-doc fold
    * (the order-deterministic float recipe of [[dsirWeights]]), then
    * `logit = bias + Σ w[bucket]/n_tokens` and `keep = logit ≥ 0`.
    * The LOGIT is the output score: σ is strictly monotone, so the
    * keep decision and any ranking are identical to the sigmoid's,
    * and the oracle needs no cross-engine `exp` — apply σ downstream
    * if a probability is wanted. Zero shuffle beyond the per-doc
    * groupBy; the weight array is a constant-folded literal riding
    * whole-stage codegen. Output: (id, n_tokens, logit, keep). */
  def qualityLrScore(docs0: DataFrame, idCol: String, textCol: String,
                     weights: Array[Double], bias: Double): DataFrame = {
    Joins.requireFreeColumns("qualityLrScore", docs0.columns,
      "n_tokens", "logit", "keep")
    // scan fan-out: tokenize + md5-bucket per position is per-row
    // compute inheriting the scan's partitioning (no-op at scale)
    val docs = Joins.fanOutForCompute(docs0, Seq(idCol))
    val warr = array(weights.map(lit).toIndexedSeq: _*)
    docs.select(col(idCol),
        posexplode(whitespaceTokens(col(textCol))).as(Seq("__pos", "__t")))
      .select(col(idCol), col("__pos"),
        element_at(warr, (hashBucket(col("__t"), weights.length) + 1)
          .cast("int")).as("__lw"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sort_array(collect_list(struct(col("__pos"), col("__lw")))).as("__a"))
      .select(col(idCol), col("n_tokens"),
        (round(lit(bias) + aggregate(col("__a"), lit(0.0),
          (acc, x) => acc + x.getField("__lw")) / col("n_tokens"), 4) + 0.0)
          .as("logit"))
      .withColumn("keep", col("logit") >= 0.0)
  }

  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "dsirWeights needs a positive bucket count")
    val inst = df.select(col(idCol), isTarget.as("__tgt"),
        posexplode(whitespaceTokens(col(textCol))).as(Seq("__pos", "__t")))
      .select(col(idCol), col("__tgt"), col("__pos"),
        pmod(conv(substring(md5(col("__t")), 1, 4), 16, 10).cast("long"),
          lit(buckets.toLong)).as("__b"))
      // localCheckpoint: the bucket-count agg and the score-probe join
      // both consume the instance stream and cannot share an exchange;
      // one materialization caps the explode+md5 pass at one evaluation
      .localCheckpoint()
    val counts = inst.groupBy("__b").agg(
      count(lit(1)).cast("double").as("__cr"),
      count(when(col("__tgt"), 1)).cast("double").as("__ct"))
    val tot = counts.agg(sum("__cr").as("__r"), sum("__ct").as("__tt"))
    val ratios = counts.crossJoin(broadcast(tot))
      .select(col("__b"),
        (log((col("__ct") + 1.0) / (col("__tt") + buckets.toDouble)) -
          log((col("__cr") + 1.0) / (col("__r") + buckets.toDouble))).as("__lw"))
    inst.join(broadcast(ratios), "__b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sort_array(collect_list(struct(col("__pos"), col("__lw")))).as("__a"))
      .select(col(idCol), col("n_tokens"),
        // + 0.0 canonicalizes -0.0 (a near-target-balanced doc can
        // round to negative zero; engines disagree on its sign bit)
        (round(aggregate(col("__a"), lit(0.0),
          (acc, x) => acc + x.getField("__lw")) / col("n_tokens"), 4) + 0.0)
          .as("dsir_w"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §3.3): score
    * every doc with the corpus-self-trained bigram LM
    * ([[lmScoreBigram]]), then split each group (source/lang) into
    * head / middle / tail at its own discrete NLL terciles — the
    * standard "keep head, sample middle, drop tail" curation signal,
    * with thresholds per group so a hard language doesn't land wholly
    * in another's tail.
    *
    * Terciles are exact discrete quantiles over the (group, nll)
    * HISTOGRAM (distinct rounded-NLL values per group, not rows — same
    * scalable-quantile shape as `Pipelines.quantileCut`), thresholds
    * broadcast back; cut expressions are `ceil(n/3.0)` /
    * `ceil(2.0·n/3.0)` so engines agree bit-for-bit. Docs without a
    * bigram (< 2 tokens) carry no LM score and are absent — screen
    * them with a length gate first.
    * Output: (id, group, n_bigrams, nll, ppl_bucket). */
  def pplBuckets(df: DataFrame, idCol: String, textCol: String,
                 groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Joins.requireFreeColumns("pplBuckets", df.columns,
      "n_bigrams", "nll", "ppl_bucket", "__v", "__c", "__cum", "__n",
      "__t1", "__t2")
    // the per-doc score table feeds three subplans (histogram, totals,
    // the final bucket join); checkpointing it caps the whole bigram-LM
    // score pass at ONE evaluation — it is doc-count-sized (one row per
    // doc), so the materialization is small at any corpus scale
    val scored = df.select(col(idCol), col(groupCol))
      .join(lmScoreBigram(df, idCol, textCol), idCol)
      .localCheckpoint()
    val hist = scored.groupBy(col(groupCol), col("nll").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cum = hist.withColumn("__cum",
      sum("__c").over(Window.partitionBy(groupCol).orderBy(col("__v"))))
    val tot = hist.groupBy(groupCol).agg(sum("__c").as("__n"))
    val j = cum.join(tot, groupCol)
    val t1 = j.where(col("__cum") >= ceil(col("__n").cast("double") / 3.0))
      .groupBy(groupCol).agg(min("__v").as("__t1"))
    val t2 = j.where(col("__cum") >=
        ceil(lit(2.0) * col("__n").cast("double") / 3.0))
      .groupBy(groupCol).agg(min("__v").as("__t2"))
    scored.join(broadcast(t1), groupCol).join(broadcast(t2), groupCol)
      .select(col(idCol), col(groupCol), col("n_bigrams"), col("nll"),
        when(col("nll") <= col("__t1"), "head")
          .when(col("nll") <= col("__t2"), "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** Word n-grams of a token array: positions 1..len-n+1, space-joined;
    * empty array when the doc is shorter than n. */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** N-gram novelty: per doc, how many of its distinct word n-grams
    * appear in no other document (corpus doc-freq 1), and that count as
    * a fraction of the doc's distinct grams — low novelty marks
    * templated/duplicated content a dedup pass should visit, high
    * novelty marks the memorization-risk long tail.
    *
    * Scale shape: one explode of per-doc DISTINCT grams, one
    * gram-keyed partial-agg count, one join back, one per-doc agg —
    * all keyed shuffles; no pairwise compare anywhere. The gram-keyed
    * count's key space is the corpus gram vocabulary (well-hashed);
    * boilerplate grams land on single hot keys but carry only a count.
    * Docs shorter than n survive with (0, 0, 0.0).
    * Output: (id, n_grams, n_novel, novel_frac). */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    require(n >= 1, "ngramNovelty needs n >= 1")
    Joins.requireFreeColumns("ngramNovelty", df.columns,
      "__t", "__gram", "__gdf", "n_grams", "n_novel", "novel_frac")
    // (explode_outer + isNotNull considered for the inferred-filter
    // duplication and REVERTED: two independent sf0.1 A/Bs measured the
    // outer-generate mode 1.1–1.2× slower here — the high explode
    // fan-out pays outer-mode overhead per emitted gram, exceeding the
    // once-per-doc duplicated array build it saves)
    val grams = df.select(col(idCol), whitespaceTokens(col(textCol)).as("__t"))
      .select(col(idCol),
        explode(array_distinct(wordNgrams(col("__t"), n))).as("__gram"))
      // localCheckpoint: doc-freq agg + probe join both read the gram
      // stream (exchanges unshareable) — one n-gram explode, not two
      .localCheckpoint()
    val gdf = grams.groupBy("__gram").agg(count(lit(1)).as("__gdf"))
    val perDoc = grams.join(gdf, "__gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__gdf") === 1, 1L).otherwise(0L)).as("n_novel"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_grams"), lit(0L)) === 0L, lit(0.0))
          .otherwise(round(col("n_novel").cast("double") /
            col("n_grams").cast("double"), 4)).as("novel_frac"))
  }

  /** Asymmetric n-gram containment (the eval-side decontamination
    * measure of Brown et al. 2020 App. C / open-data replications):
    * for an eval doc e and corpus doc c,
    * `containment = |grams(e) ∩ grams(c)| / |grams(e)|` — unlike
    * Jaccard it stays high when a short eval doc is embedded in a long
    * corpus doc, which is exactly the leak being hunted. Emits pairs
    * with containment ≥ `tau`.
    *
    * Scale shape: distinct grams per side, corpus-side stop-gram cut
    * at `maxDocFreq` (bounds any join key's fan-out), one gram-keyed
    * equi-join + pair count, denominator joined from an eval-side
    * count — no pairwise text compare. The denominator counts ALL the
    * eval doc's distinct grams (the doc-freq cut prunes candidates
    * only), so a cut boilerplate gram lowers measured containment —
    * the conservative direction for a contamination screen is a LOW
    * cut only when boilerplate grams shouldn't count as evidence;
    * raise `maxDocFreq` when they should.
    * The tau comparison runs on the unrounded ratio on both engines.
    * Output: (eval_id, corpus_id, n_shared, containment). */
  def containmentPairs(evalDf: DataFrame, corpus: DataFrame,
                       idCol: String, textCol: String,
                       n: Int = 5, tau: Double = 0.5,
                       maxDocFreq: Long = 1000L): DataFrame = {
    require(n >= 1 && tau > 0.0 && maxDocFreq >= 1,
      "containmentPairs needs n >= 1, tau > 0, maxDocFreq >= 1")
    // explode_outer + isNotNull: see ngramNovelty — dodges the inferred
    // size()>0 pre-filter that re-built the n-gram array per doc
    def gramsOf(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol), whitespaceTokens(col(textCol)).as("__t"))
        .select(col(idCol).as(as),
          explode_outer(array_distinct(wordNgrams(col("__t"), n))).as("__gram"))
        .where(col("__gram").isNotNull)
    val eg = gramsOf(evalDf, "eval_id").localCheckpoint()
    // localCheckpoint both gram streams: each feeds an agg AND a join
    // probe (stop-gram df / eval-gram totals), which cannot share an
    // exchange — without it the n-gram explodes run twice per side
    val cg = gramsOf(corpus, "corpus_id").localCheckpoint()
    val rare = cg.groupBy("__gram").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDocFreq).select("__gram")
    val en = eg.groupBy("eval_id").agg(count(lit(1)).as("__en"))
    eg.join(rare, "__gram").join(cg, "__gram")
      .groupBy("eval_id", "corpus_id")
      .agg(count(lit(1)).as("n_shared"))
      .join(en, "eval_id")
      .where(col("n_shared").cast("double") / col("__en").cast("double") >= tau)
      .select(col("eval_id"), col("corpus_id"), col("n_shared"),
        round(col("n_shared").cast("double") / col("__en").cast("double"), 4)
          .as("containment"))
  }

  /** PII patterns shared by [[redactPii]] and its oracle. Deliberately
    * restricted to the regex subset Java (`java.util.regex`) and RE2
    * interpret identically — character classes, bounded quantifiers,
    * non-capturing groups, ASCII `\b` — so the same pattern strings run
    * in Spark and in DuckDB. */
  val piiEmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiIpv4Pattern: String = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val piiPhonePattern: String = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** PII scan-and-redact (the mandatory pre-training privacy pass):
    * e-mail addresses, dotted-quad IPs, and NNN-NNN-NNNN phone numbers
    * are counted and replaced with typed placeholder tags, applied in a
    * FIXED order (e-mail → IP → phone) so a span is attributed to
    * exactly one category — each stage counts on the previous stage's
    * output, never re-matching inside an already-planted tag.
    *
    * This is the AUDITED form — per-doc counts feed a compliance report
    * and the whole pass is oracle-replayable; the curation pipeline's
    * in-line column fold ([[Pipelines.scrubPii]], which also strips
    * URLs/SSNs but reports nothing) is its fire-and-forget sibling.
    *
    * Scale shape: pure per-row column algebra (three regexp_count +
    * three regexp_replace), no shuffle at all — the plan is a single
    * map over the scan, so it runs at parquet-read speed on any corpus
    * size and composes with the curation funnel as one more narrow
    * stage.
    *
    * Output: (id, n_email, n_ip, n_phone, clean_text). */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    Joins.requireFreeColumns("redactPii", Seq(idCol),
      "n_email", "n_ip", "n_phone", "clean_text")
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, piiEmailPattern, "<EMAIL>")
    val t2 = regexp_replace(t1, piiIpv4Pattern, "<IP>")
    val t3 = regexp_replace(t2, piiPhonePattern, "<PHONE>")
    docs.select(col(idCol),
      regexp_count(t0, lit(piiEmailPattern)).cast("long").as("n_email"),
      regexp_count(t1, lit(piiIpv4Pattern)).cast("long").as("n_ip"),
      regexp_count(t2, lit(piiPhonePattern)).cast("long").as("n_phone"),
      t3.as("clean_text"))
  }

  /** Token-run collapsing (repetition trimming): runs of the same token
    * repeated more than `maxRun` times in a row are cut down to
    * `maxRun` occurrences — the cheap intra-document counterpart of the
    * Gopher repetition FLAGS (which only score; this one edits).
    *
    * Scale shape: split + two indexed-lambda array HOFs + join back —
    * per-row narrow work, no shuffle.
    *
    * Output: (id, n_tokens, n_removed, clean_text). */
  def collapseTokenRuns(docs: DataFrame, idCol: String, textCol: String,
                        maxRun: Int = 1): DataFrame = {
    require(maxRun >= 1, "maxRun must be >= 1")
    Joins.requireFreeColumns("collapseTokenRuns", Seq(idCol),
      "__toks", "n_tokens", "n_removed", "clean_text")
    val toks = col("__toks")
    // keep token i unless the maxRun tokens before it are all equal to
    // it (1-based element_at; i is the lambda's 0-based index)
    val kept = filter(toks, (t, i) => {
      val runBefore = (1 to maxRun).map { back =>
        i >= back && element_at(toks, (i - back + 1).cast("int")) === t
      }.reduce(_ && _)
      !runBefore
    })
    docs.select(col(idCol), split(col(textCol), " +").as("__toks"))
      .select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        (size(toks) - size(kept)).cast("long").as("n_removed"),
        array_join(kept, " ").as("clean_text"))
  }

  /** Distinctive-token comparison between two corpus slices — the
    * log-odds ratio with a Dirichlet prior (Monroe, Colaresi & Quinn
    * 2008, "Fightin' Words"), the statistically-grounded answer to
    * "which words characterize corpus A vs corpus B":
    *
    *   δ_w = ln( (c1_w + α) / (n1 + α·V − c1_w − α) )
    *       − ln( (c2_w + α) / (n2 + α·V − c2_w − α) )
    *   σ²_w ≈ 1/(c1_w + α) + 1/(c2_w + α),   z_w = δ_w / σ_w
    *
    * with α the per-token prior (0.01 default), V the joint vocabulary,
    * n the slice token totals. |z| ≥ `minZ` rows survive (the
    * significance cut the paper recommends over raw frequency ratios).
    *
    * Determinism: counts are exact integers; δ and z are ONE fixed
    * expression per token — no float ever reduces across rows — so an
    * independent engine reproduces them bit-for-bit modulo ln ulps,
    * absorbed by the 6 dp rounding.
    *
    * Scale shape: one map-side-combining token count per slice, a
    * vocab-sized full-outer join, broadcast 1-row totals, then pure
    * per-row arithmetic — the [[graft.operators.Pipelines.tokenDrift]]
    * posture with a per-token verdict instead of one divergence. */
  def logOddsTokens(a: DataFrame, b: DataFrame, textCol: String,
                    alpha: Double = 0.01, minZ: Double = 2.0,
                    minCount: Long = 1L, roundDp: Int = 6): DataFrame = {
    require(alpha > 0.0, "logOddsTokens needs a positive prior")
    Joins.requireFreeColumns("logOddsTokens", Seq(textCol),
      "token", "c_a", "c_b", "delta", "z", "__n1", "__n2", "__v")
    def counts(side: DataFrame, cnt: String): DataFrame = side
      .select(explode(split(col(textCol), " ")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as(cnt))
    val joint = counts(a, "c_a")
      .join(counts(b, "c_b"), Seq("token"), "full_outer")
      .select(col("token"), coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .localCheckpoint() // vocab-sized; feeds the totals AND the scores
    val totals = joint.agg(sum("c_a").as("__n1"), sum("c_b").as("__n2"),
      count(lit(1)).as("__v"))
    val a0 = lit(alpha)
    def side(c: Column, n: Column): Column =
      log((c + a0) / (n + a0 * col("__v") - c - a0))
    val delta = side(col("c_a").cast("double"), col("__n1").cast("double")) -
      side(col("c_b").cast("double"), col("__n2").cast("double"))
    val z = delta / sqrt(lit(1.0) / (col("c_a") + a0) +
      lit(1.0) / (col("c_b") + a0))
    joint.crossJoin(broadcast(totals))
      .select(col("token"), col("c_a"), col("c_b"),
        round(delta, roundDp).as("delta"), round(z, roundDp).as("z"))
      .where(abs(col("z")) >= minZ &&
        (col("c_a") >= minCount || col("c_b") >= minCount))
  }

  /** Inverted index build: per whitespace token, its document frequency
    * and a bounded, id-sorted posting list — the retrieval-side data
    * structure next to the [[bm25]] scorer (which ranks; this one
    * materializes the index a serving layer would load).
    *
    * Postings are capped at `maxPostings` ids per token (the smallest
    * ids win — deterministic, and exactly the truncation a sharded
    * index would apply per segment); `minDf` thins the long unique-token
    * tail, which dominates raw vocabulary at corpus scale.
    *
    * Scale shape: explode → distinct (token, doc) pairs — map-side
    * partial — then a TWO-PHASE list build (the sharded-quota-sample
    * pattern): phase 1 groups by (token, id-hash shard) and keeps each
    * shard's `maxPostings` smallest ids, so no aggregation state ever
    * exceeds a shard's slice; phase 2 merges ≤ `shards`·maxPostings
    * pre-truncated fragments per token and slices once more. A
    * stop-word appearing in every document therefore never materializes
    * its full posting list anywhere. The exact df rides as a plain
    * count through both phases. Sorted arrays make the output
    * independent of shuffle arrival order.
    *
    * Output: (token, df, postings array<id>, truncated boolean). */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    minDf: Long = 1L, maxPostings: Int = 1000,
                    shards: Int = 32): DataFrame = {
    require(minDf >= 1, "invertedIndex needs minDf >= 1")
    require(maxPostings >= 1, "invertedIndex needs maxPostings >= 1")
    require(shards >= 1, "invertedIndex needs shards >= 1")
    Joins.requireFreeColumns("invertedIndex", Seq(idCol),
      "token", "df", "postings", "truncated", "__sh", "__part", "__c")
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .where(length(col("token")) > 0)
      .distinct()
      .groupBy(col("token"), pmod(xxhash64(col(idCol)), lit(shards))
        .as("__sh"))
      .agg(count(lit(1)).as("__c"),
        slice(sort_array(collect_list(col(idCol))), 1, maxPostings)
          .as("__part"))
      .groupBy("token")
      .agg(sum("__c").as("df"),
        slice(sort_array(flatten(collect_list(col("__part")))), 1,
          maxPostings).as("postings"))
      .where(col("df") >= minDf)
      .select(col("token"), col("df"), col("postings"),
        (col("df") > maxPostings).as("truncated"))
  }

  /** Flesch readability per document — the quality screen's complexity
    * axis (both the too-hard and the too-easy tail correlate with
    * boilerplate/spam): words by whitespace runs (\s+ — newlines and
    * tabs delimit words too), sentences by [.!?] runs
    * (a doc with no terminal punctuation counts as ONE sentence — the
    * delimiter-split convention), syllables by the vowel-group
    * heuristic (runs of [aeiouy] in the lowercased text — the standard
    * dictionary-free estimate).
    *
    *   ease  = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words)
    *   grade = 0.39·(words/sentences) + 11.8·(syll/words) − 15.59
    *
    * Pure per-row projection — shuffle-free, codegen-eligible; empty
    * docs (words = 0) are excluded rather than divided by. Both ratios
    * are single left-assoc double expressions, mirrored verbatim by
    * the oracle; quantization is floor(x·10^dp + 0.5) rather than
    * round() because the 2-dp Flesch constants on rational ratios land
    * on EXACT decimal halves by construction, where engines' round()
    * tie rules differ — the floor form is pure IEEE arithmetic, so the
    * same input double quantizes identically everywhere.
    *
    * Output: (id, words, sentences, syllables, ease, grade) at
    * `roundDp` dp. */
  def readabilityScores(docs: DataFrame, idCol: String, textCol: String,
                        roundDp: Int = 4): DataFrame = {
    Joins.requireFreeColumns("readabilityScores", Seq(idCol),
      "words", "sentences", "syllables", "ease", "grade")
    val words = size(filter(split(col(textCol), "\\s+"),
      t => length(t) > 0)).cast("long")
    val sentences = greatest(size(filter(split(col(textCol), "[.!?]+"),
      t => length(trim(t)) > 0)), lit(1)).cast("long")
    val syllables = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0))).cast("long")
    val wps = col("words").cast("double") / col("sentences")
    val spw = col("syllables").cast("double") / col("words")
    val p10 = math.pow(10.0, roundDp)
    def q(c: org.apache.spark.sql.Column) =
      floor(c * p10 + lit(0.5)).cast("long").cast("double") / p10
    docs
      .select(col(idCol), words.as("words"), sentences.as("sentences"),
        syllables.as("syllables"))
      .where(col("words") > 0L)
      .select(col(idCol), col("words"), col("sentences"),
        col("syllables"),
        q(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw).as("ease"),
        q(lit(0.39) * wps + lit(11.8) * spw - lit(15.59)).as("grade"))
  }

  /** Zipf fit — the corpus-health audit for "does this read like
    * natural language": OLS of ln(frequency) on ln(rank) over the top
    * `topN` tokens. Natural text sits near slope −1 with high r²;
    * boilerplate-heavy or template-generated corpora flatten the head
    * or kink the tail, and a synthetic corpus drawn uniformly reads
    * slope ≈ 0. The numbers a curation dashboard tracks per source.
    *
    * Float policy: each OLS term (x, y, x², y², xy on the ln scale) is
    * quantized to 1e-12 per rank row and summed as integers (≤ topN
    * rows, no overflow), so the sums — and therefore slope/intercept/r²
    * — are engine-exact; ranks tie-break by token for a deterministic
    * head.
    *
    * Scale shape: one map-side-combining token count (the q50 shape),
    * one TakeOrdered top-N (only N rows per partition reach the merge),
    * then all sums on the ≤ topN-row frame. The corpus is touched once.
    *
    * Output: one row (n_terms, slope, intercept, r2) at `roundDp`;
    * slope/r² NULL when fewer than 2 distinct ranks survive. */
  def zipfFit(docs: DataFrame, textCol: String, topN: Int = 1000,
              roundDp: Int = 6): DataFrame = {
    require(topN >= 2, "zipfFit needs topN >= 2")
    Joins.requireFreeColumns("zipfFit", Seq(textCol),
      "n_terms", "slope", "intercept", "r2", "__t", "__n", "__rk")
    val top = docs
      .select(explode(split(col(textCol), " ")).as("__t"))
      .where(length(col("__t")) > 0)
      .groupBy("__t").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__t")).limit(topN)
    val x = log(col("__rk").cast("double"))
    val y = log(col("__n").cast("double"))
    // decimal accumulators: pico-unit terms reach ~1.7e15 (y² at long
    // counts), so a long sum would wrap just past topN ~ 5000
    def qsum(c: org.apache.spark.sql.Column, n: String) =
      sum(round(c * 1e12, 0).cast("decimal(38,0)")).as(n)
    val sums = top
      .select(col("__n"), row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__n").desc, col("__t"))).cast("long").as("__rk"))
      .agg(count(lit(1)).as("n_terms"), qsum(x, "__sx"), qsum(y, "__sy"),
        qsum(x * x, "__sxx"), qsum(y * y, "__syy"), qsum(x * y, "__sxy"))
    val n = col("n_terms").cast("double")
    def d(name: String) = col(name).cast("double") / 1e12
    val vx = n * d("__sxx") - d("__sx") * d("__sx")
    val vy = n * d("__syy") - d("__sy") * d("__sy")
    val cxy = n * d("__sxy") - d("__sx") * d("__sy")
    sums.select(col("n_terms"),
      when(vx > 0.0, round(cxy / vx, roundDp)).as("slope"),
      when(vx > 0.0,
        round((d("__sy") - cxy / vx * d("__sx")) / n, roundDp))
        .as("intercept"),
      when(vx > 0.0 && vy > 0.0,
        round(cxy * cxy / (vx * vy), roundDp)).as("r2"))
  }
}
