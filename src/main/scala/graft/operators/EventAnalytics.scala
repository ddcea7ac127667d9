package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral event analytics over (user, type, timestamp) streams — the
  * product-analytics query family (conversion funnels, retention
  * cohorts) that sits directly on the reference's event-ingest output
  * (`App.txt`'s Kafka → typed-event pipeline feeds exactly this shape).
  */
object EventAnalytics {

  /** First-touch ordered conversion funnel: how many users perform the
    * `stages` event types IN ORDER, each within `maxStepGapSec` of the
    * previous stage's conversion instant.
    *
    * Semantics (the deterministic first-touch reading every funnel
    * product defaults to): a user's stage-1 instant is their EARLIEST
    * stage-1 event; their stage-k instant is their earliest stage-k
    * event STRICTLY after the stage-(k−1) instant and within the gap.
    * Strictly-after means a stage can never be satisfied by the same
    * event twice when adjacent stages share a type.
    *
    * Scale shape: one filtered groupBy(user) per stage, each a map-side
    * partial min keyed on the user id; the per-stage join probes the
    * SHRINKING converted-user set (stage k's frame only holds users who
    * reached stage k), so at cluster scale the later joins broadcast.
    * No windows, no self-join over the raw event stream — per-stage
    * work is ∝ events of that stage's type.
    *
    * Output: (stage 1-based, event_type, n_users), one row per stage. */
  def funnelStages(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, stages: Seq[String],
                   maxStepGapSec: Long): DataFrame = {
    require(stages.nonEmpty, "funnelStages needs at least one stage")
    require(maxStepGapSec > 0, "maxStepGapSec must be positive")
    Joins.requireFreeColumns("funnelStages", events.columns, "__u", "__t")
    val u = col(userCol)
    // each stage frame is consumed TWICE — as the next stage's probe
    // side and by its own count — and without the checkpoint stage k's
    // plan re-executes every earlier stage's filter+join (O(k²) work
    // over the funnel length); the frames shrink monotonically, so the
    // checkpoints are cheap
    val first = events.where(col(typeCol) === stages.head)
      .groupBy(u.as("__u")).agg(min(col(tsCol)).as("__t"))
      .localCheckpoint()
    val frames = stages.tail.scanLeft(first) { (prev, stage) =>
      events.where(col(typeCol) === stage)
        .join(prev, u === col("__u"))
        .where(col(tsCol) > col("__t") &&
          col(tsCol) <= col("__t") + expr(s"INTERVAL $maxStepGapSec SECONDS"))
        .groupBy(col("__u")).agg(min(col(tsCol)).as("__t"))
        .localCheckpoint()
    }
    frames.zip(stages).zipWithIndex.map { case ((f, name), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("long").as("stage"),
          lit(name).as("event_type"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Per-user event-type transition counts (the first-order Markov
    * matrix behind "what do users do next" path analysis): for every
    * consecutive event pair in a user's timeline, count (from, to)
    * occurrences across all users.
    *
    * Ordering inside a user must be TOTAL for determinism, so the
    * window orders by (ts, tieCol) — pass the event id; two events at
    * the same microsecond would otherwise make `lag` engine-dependent.
    *
    * Scale shape: one window PARTITIONED BY USER (state bounded by a
    * user's event count — the natural key nothing here exceeds) feeding
    * a partial-aggregating groupBy on the (from, to) pair, whose result
    * is ≤ |event types|² rows at any corpus size.
    *
    * Output: (from_type, to_type, n) for every observed transition. */
  def transitionCounts(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    Joins.requireFreeColumns("transitionCounts", events.columns,
      "__prev", "from_type", "to_type", "n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(typeCol),
        lag(col(typeCol), 1).over(w).as("__prev"))
      .where(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Multi-touch conversion attribution: credit each touch channel for
    * the conversions it preceded, under the two standard models at once —
    * last-touch (the final touch before the conversion takes the whole
    * conversion) and linear (each of a conversion's n window touches
    * takes 1/n).
    *
    * Window semantics: a touch attributes to a conversion of the same
    * user when `touch_ts ∈ [conv_ts − lookbackSec, conv_ts)` — strictly
    * before the conversion, at most the lookback older. Conversions with
    * no in-window touch are unattributed and carry no credit (the
    * organic remainder every attribution product reports separately);
    * `touchTypes` channels that never earn credit still appear with
    * zeros, so the output row set is exactly `touchTypes`.
    *
    * Scale shape: the touch×conversion pairing reuses [[Joins.rangeJoin]]
    * — the lookback window becomes an equi-join on (user, time-bucket),
    * hash/SMJ eligible, never a per-user cross product over the raw
    * timeline. Everything after is map-side partial groupBys whose
    * keyspaces are ≤ conversions (per-conversion stats) and then
    * ≤ |channels| — the last-touch pick is a `max_by` over the totally
    * ordered (ts, tie) pair, not a window. Credits are rounded to
    * `roundDp` (summation-order ulps, the PageRank contract).
    *
    * Output: (channel, last_touch, linear), one row per touch type,
    * `last_touch` a conversion count, `linear` the rounded fractional
    * credit sum. */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, tieCol: String, touchTypes: Seq[String],
                  convType: String, lookbackSec: Long,
                  roundDp: Int = 6): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    require(lookbackSec > 0, "lookbackSec must be positive")
    Joins.requireFreeColumns("attribution", events.columns,
      "__ch", "__tts", "__ttie", "__cu", "__cts", "__cid", "__n", "__cnt",
      "channel", "last_touch", "linear")
    val spark = events.sparkSession
    import spark.implicits._
    val touches = events.where(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), col(typeCol).as("__ch"),
        col(tsCol).as("__tts"), col(tieCol).as("__ttie"))
    val convs = events.where(col(typeCol) === convType)
      .select(col(userCol).as("__cu"), col(tsCol).as("__cts"),
        col(tieCol).as("__cid"))
    // conv_ts ∈ (touch_ts, touch_ts + lookback] ⇔
    // touch_ts ∈ [conv_ts − lookback, conv_ts)
    val pairs = Joins.rangeJoin(touches, userCol, "__tts",
        convs, "__cu", "__cts", lookbackSec)
      .localCheckpoint() // consumed by both models below
    val perConvCh = pairs.groupBy("__cid", "__ch")
      .agg(count(lit(1)).as("__cnt"))
    val perConv = perConvCh.groupBy("__cid").agg(sum("__cnt").as("__n"))
    val linear = perConvCh.join(perConv, "__cid")
      .groupBy(col("__ch").as("channel"))
      .agg(sum(col("__cnt") / col("__n")).as("linear"))
    val last = pairs.groupBy("__cid")
      .agg(max_by(col("__ch"), struct(col("__tts"), col("__ttie")))
        .as("channel"))
      .groupBy("channel").agg(count(lit(1)).as("last_touch"))
    touchTypes.toDF("channel")
      .join(last, Seq("channel"), "left")
      .join(linear, Seq("channel"), "left")
      .select(col("channel"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"),
        (round(coalesce(col("linear"), lit(0.0)), roundDp) + 0.0)
          .as("linear"))
  }

  /** Item co-occurrence (the bipartite projection / market-basket
    * count): for every unordered item pair sharing a basket, the number
    * of baskets containing both — the association signal behind
    * related-items, co-citation, and query-expansion features.
    *
    * Two explicit caps make it scale-safe, both part of the contract:
    *  - baskets with more than `maxDegree` distinct items are EXCLUDED
    *    (a basket's pair fan-out is O(d²); mega-baskets are the classic
    *    quadratic blowup AND carry near-zero association signal — the
    *    standard capping practice in co-citation/basket mining). Total
    *    pair work is then ≤ maxDegree × Σ basket sizes — linear.
    *  - pairs seen in fewer than `minCount` baskets are dropped, so the
    *    output is the (always far smaller) frequent tail.
    *
    * Scale shape: distinct projection → per-basket degree (partial-agg
    * groupBy) → semi-join cap filter → basket-keyed self equi-join with
    * `itemA < itemB` (hash/SMJ, never cartesian) → map-side-combining
    * pair count. Skewed popular ITEMS are fine — work is keyed by
    * basket, not item.
    *
    * Output: (item_a, item_b, n) with item_a < item_b. */
  def cooccurrence(df: DataFrame, keyCol: String, itemCol: String,
                   maxDegree: Int, minCount: Long = 1L): DataFrame = {
    Joins.requireFreeColumns("cooccurrence", Seq(keyCol, itemCol),
      "item_a", "item_b", "n", "__d")
    cooccurrenceFromBaskets(cappedBaskets(df, keyCol, itemCol, maxDegree),
      keyCol, itemCol, minCount)
  }

  /** [[cooccurrence]] over a PRE-BUILT [[basketProjection]] — the form
    * a caller mining several thresholds (or several rule sets) over
    * the same baskets uses, paying the projection once. */
  def cooccurrenceFromBaskets(baskets: DataFrame, keyCol: String,
                              itemCol: String,
                              minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, "cooccurrence needs minCount >= 1")
    // Same guard the wrapper runs (idempotent when reached via it):
    // a direct caller whose basket frame already carries an output
    // name must fail loud, not silently misbind.
    Joins.requireFreeColumns("cooccurrenceFromBaskets",
      Seq(keyCol, itemCol), "item_a", "item_b", "n")
    pairCounts(baskets, keyCol, itemCol, minCount)
  }

  /** Distinct (basket, item) projection with mega-baskets excluded —
    * the shared front of [[cooccurrence]] and [[associationRules]],
    * public so callers can build it once and mine it several ways.
    * Checkpointed: it feeds the degree agg and both pair-join sides. */
  def basketProjection(df: DataFrame, keyCol: String, itemCol: String,
                       maxDegree: Int): DataFrame =
    cappedBaskets(df, keyCol, itemCol, maxDegree)

  private def cappedBaskets(df: DataFrame, keyCol: String,
                            itemCol: String, maxDegree: Int): DataFrame = {
    require(maxDegree >= 2, "basket projection needs maxDegree >= 2")
    val b = df.select(col(keyCol), col(itemCol)).distinct()
      .localCheckpoint()
    val ok = b.groupBy(col(keyCol)).agg(count(lit(1)).as("__d"))
      .where(col("__d") <= maxDegree).select(col(keyCol))
    b.join(ok, Seq(keyCol), "left_semi").localCheckpoint()
  }

  private def pairCounts(bb: DataFrame, keyCol: String, itemCol: String,
                         minCount: Long): DataFrame = {
    val left = bb.select(col(keyCol), col(itemCol).as("item_a"))
    val right = bb.select(col(keyCol), col(itemCol).as("item_b"))
    left.join(right, Seq(keyCol))
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }

  /** Association rules over the capped basket projection: for every
    * ordered rule antecedent → consequent whose pair support clears
    * `minCount`,
    *
    *   confidence = n_ab / n_a        (P(cons | ante))
    *   lift       = confidence · N / n_b   (vs independence; > 1 ⇒
    *                                        positively associated)
    *
    * with n_a/n_b the items' capped-basket frequencies and N the number
    * of capped baskets — all frequencies measured over the SAME
    * projection the pairs were mined from, so the probabilities are
    * coherent. Both orientations of each unordered pair are emitted.
    *
    * Scale shape: [[cooccurrence]]'s linear pair mine + one item-count
    * groupBy + two broadcastable item-frequency joins; N rides as an
    * in-plan broadcast 1-row aggregate. Doubles are computed in the
    * exact order the oracle mirrors and rounded to `roundDp`.
    *
    * Output: (ante, cons, n, confidence, lift). */
  def associationRules(df: DataFrame, keyCol: String, itemCol: String,
                       maxDegree: Int, minCount: Long = 1L,
                       roundDp: Int = 6): DataFrame = {
    Joins.requireFreeColumns("associationRules", Seq(keyCol, itemCol),
      "ante", "cons", "n", "confidence", "lift", "__ca", "__cb", "__nn")
    associationRulesFromBaskets(cappedBaskets(df, keyCol, itemCol,
      maxDegree), keyCol, itemCol, minCount, roundDp)
  }

  /** [[associationRules]] over a PRE-BUILT [[basketProjection]] —
    * frequencies and N are measured over the given projection, so the
    * probabilities stay coherent with pairs mined from it. */
  def associationRulesFromBaskets(bb: DataFrame, keyCol: String,
                                  itemCol: String, minCount: Long = 1L,
                                  roundDp: Int = 6): DataFrame = {
    Joins.requireFreeColumns("associationRulesFromBaskets",
      Seq(keyCol, itemCol),
      "ante", "cons", "n", "confidence", "lift", "__ca", "__cb", "__nn")
    val pairs = pairCounts(bb, keyCol, itemCol, minCount)
    val items = bb.groupBy(col(itemCol)).agg(count(lit(1)).as("__ca"))
    val total = bb.select(col(keyCol)).distinct()
      .agg(count(lit(1)).as("__nn"))
    val rules = pairs
      .select(col("item_a").as("ante"), col("item_b").as("cons"), col("n"))
      .unionByName(pairs.select(col("item_b").as("ante"),
        col("item_a").as("cons"), col("n")))
    rules
      .join(items.withColumnRenamed(itemCol, "ante"), "ante")
      .join(items.withColumnRenamed(itemCol, "cons")
        .withColumnRenamed("__ca", "__cb"), "cons")
      .crossJoin(broadcast(total))
      .select(col("ante"), col("cons"), col("n"),
        (round(col("n") / col("__ca"), roundDp) + 0.0).as("confidence"),
        (round(col("n") / col("__ca") * col("__nn") / col("__cb"),
          roundDp) + 0.0).as("lift"))
  }

  /** Regular-grid resampling with last-observation-carried-forward
    * (LOCF) gap fill: for every key, one row per `stepSec` bucket from
    * its first to its last event, carrying the value of the latest
    * event at-or-before the bucket — the time-series normalization
    * every downstream joiner/aggregator of irregular event data wants.
    *
    * Within a bucket the LAST event wins (max_by over the total
    * (ts, tie) order); empty buckets inherit the previous bucket's
    * value. No leading nulls: a key's grid starts at its own first
    * event's bucket. Buckets are epoch-second multiples of `stepSec`
    * (floor alignment), emitted as BIGINT epoch seconds.
    *
    * Scale shape: one map-side-combining per-(key, bucket) max_by, one
    * per-key (lo, hi) agg, grid generation via `sequence` + `explode`
    * (rows ∝ the OUTPUT, which is the operator's contract), a keyed
    * left join, and one per-key window (state ∝ a key's grid length —
    * span/stepSec, which the caller bounds by choosing the step). No
    * window ever sees more than one key's grid.
    *
    * Output: (keyCol, bucket, valCol), LOCF-filled. */
  def resampleLocf(events: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, valCol: String,
                   stepSec: Long): DataFrame = {
    require(stepSec > 0, "resampleLocf needs a positive step")
    Joins.requireFreeColumns("resampleLocf", events.columns,
      "bucket", "__lo", "__hi", "__v")
    val bucket = (floor(unix_timestamp(col(tsCol)) / stepSec) * stepSec)
      .cast("long")
    val e = events.select(col(keyCol), bucket.as("bucket"),
      col(tsCol), col(tieCol), col(valCol))
    val perBucket = e.groupBy(col(keyCol), col("bucket"))
      .agg(max_by(col(valCol), struct(col(tsCol), col(tieCol)))
        .as("__v"))
    val span = e.groupBy(col(keyCol))
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"), lit(stepSec)))
        .as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy("bucket")
    grid.join(perBucket, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        last(col("__v"), ignoreNulls = true).over(w).as(valCol))
  }

  /** Regular-grid resampling with LINEAR interpolation — the numeric
    * complement of [[resampleLocf]]: empty buckets between two observed
    * buckets take the straight line between them (weight = bucket
    * distance), buckets after a key's last observation carry it forward
    * (no extrapolation). Observed buckets keep their own anchor value
    * (within a bucket the LAST event wins, same total (ts, tie) order
    * as LOCF). The filler every numeric feature series wants where a
    * step function (LOCF) would bias a downstream mean.
    *
    * All arithmetic is per-row IEEE double on long bucket indices —
    * identical in any engine, no float accumulation anywhere — with one
    * HALF_UP `roundDp` round on the emitted value.
    *
    * Scale shape: [[resampleLocf]]'s exactly — one per-(key, bucket)
    * map-side max_by, one per-key span agg, `sequence`+`explode` grid
    * (rows ∝ the output), a keyed left join, and per-key windows whose
    * state is one key's grid. The two extra windows (previous/next
    * observed anchor) are the same partition and sort — Catalyst plans
    * them in ONE Window operator, so the added cost is two running
    * columns, not extra shuffles.
    *
    * Output: (keyCol, bucket, valCol interpolated, observed flag). */
  def resampleInterp(events: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, valCol: String, stepSec: Long,
                     roundDp: Int = 6): DataFrame = {
    require(stepSec > 0, "resampleInterp needs a positive step")
    Joins.requireFreeColumns("resampleInterp", events.columns,
      "bucket", "observed", "__lo", "__hi", "__v", "__pv", "__pb", "__nv",
      "__nb")
    val bucket = (floor(unix_timestamp(col(tsCol)) / stepSec) * stepSec)
      .cast("long")
    val e = events.select(col(keyCol), bucket.as("bucket"),
      col(tsCol), col(tieCol), col(valCol))
    val perBucket = e.groupBy(col(keyCol), col("bucket"))
      .agg(max_by(col(valCol).cast("double"), struct(col(tsCol), col(tieCol)))
        .as("__v"))
    val span = e.groupBy(col(keyCol))
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"), lit(stepSec)))
        .as("bucket"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy("bucket")
    val wf = wb.rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    grid.join(perBucket, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"), col("__v"),
        last(col("__v"), ignoreNulls = true).over(wb).as("__pv"),
        last(when(col("__v").isNotNull, col("bucket")), ignoreNulls = true)
          .over(wb).as("__pb"),
        first(col("__v"), ignoreNulls = true).over(wf).as("__nv"),
        first(when(col("__v").isNotNull, col("bucket")), ignoreNulls = true)
          .over(wf).as("__nb"))
      .select(col(keyCol), col("bucket"),
        round(
          when(col("__v").isNotNull, col("__v"))
            .when(col("__nv").isNull, col("__pv")) // past the last obs: carry
            .otherwise(col("__pv") +
              (col("__nv") - col("__pv")) *
                ((col("bucket") - col("__pb")).cast("double") /
                  (col("__nb") - col("__pb")).cast("double"))),
          roundDp).as(valCol),
        col("__v").isNotNull.as("observed"))
  }

  /** Weekly retention cohorts: users grouped by the week of their first
    * event; for each (cohort week, week offset) the number of cohort
    * users active in that week. The classic triangle every growth
    * dashboard plots.
    *
    * Scale shape: first-event frame = one groupBy(user) min; activity
    * frame = one distinct over (user, week) — both map-side partial;
    * the join is keyed on the user id and the final count groups by the
    * (cohort, offset) pair, which has ~weeks² distinct values however
    * large the corpus is. No windows.
    *
    * Output: (cohort_week date, week_offset, n_users). */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    Joins.requireFreeColumns("retentionCohorts", events.columns,
      "__u", "__u2", "__cw", "__aw", "cohort_week", "week_offset", "n_users")
    val u = col(userCol)
    val first = events.groupBy(u.as("__u"))
      .agg(date_trunc("week", min(col(tsCol))).as("__cw"))
    val active = events
      .select(u.as("__u2"), date_trunc("week", col(tsCol)).as("__aw"))
      .distinct()
    first.join(active, col("__u") === col("__u2"))
      .select(col("__cw").cast("date").as("cohort_week"),
        floor(datediff(col("__aw"), col("__cw")) / 7).cast("long")
          .as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** OHLC bar resampling: per (key, bucket) the open (value at the
    * earliest (ts, tie)), high, low, close (value at the latest
    * (ts, tie)) and event count — the time-series bar aggregation next
    * to [[resampleLocf]] (which grid-fills; this one summarizes).
    *
    * Scale shape: ONE map-side-combining groupBy on (key, bucket) —
    * open/close ride as min_by/max_by over the (ts, tie) total-order
    * struct, so each partition reduces to one candidate per bar before
    * the shuffle; no window, no per-key sort. Empty buckets are simply
    * absent (compose with [[resampleLocf]] to grid-fill).
    *
    * Output: (key, bucket epoch-sec, open, high, low, close, n). */
  def ohlcBars(events: DataFrame, keyCol: String, tsCol: String,
               tieCol: String, valCol: String, stepSec: Long): DataFrame = {
    require(stepSec > 0, "ohlcBars needs a positive step")
    Joins.requireFreeColumns("ohlcBars", Seq(keyCol),
      "bucket", "open", "high", "low", "close", "n", "__ord")
    val bucket = (floor(unix_timestamp(col(tsCol)) / stepSec) * stepSec)
      .cast("long")
    val v = col(valCol).cast("double")
    events
      .select(col(keyCol), bucket.as("bucket"),
        struct(col(tsCol), col(tieCol)).as("__ord"), v.as("__v"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(min_by(col("__v"), col("__ord")).as("open"),
        max(col("__v")).as("high"), min(col("__v")).as("low"),
        max_by(col("__v"), col("__ord")).as("close"),
        count(lit(1)).as("n"))
  }

  /** RFM segmentation — the classic customer-value triage over an
    * event log: per key, recency (whole days between the key's LAST
    * event and the corpus max event time), frequency (event count) and
    * monetary (value sum), each scored into `nBins` equal-population
    * bins. The recency score is inverted (`nBins+1 − bin`) so the
    * conventional reading holds: high r_score = recently active.
    *
    * Scale shape: one map-side-combining groupBy(key), the corpus max
    * as a broadcast 1-row aggregate, and THREE broadcast-boundary
    * discretizer passes ([[Pipelines.quantileBins]]) — no global
    * window anywhere, so no single task ever sees the key population.
    * Recency arithmetic is exact integer microseconds (`unix_micros`
    * diff, integer day division) — no truncation-vs-fraction seam for
    * an independent engine to diverge on. `approxAcc > 0` swaps the
    * exact bin boundaries for the mergeable sketch (the 100 TB path).
    *
    * Output: (key, recency_days, frequency, monetary 4 dp, r_score,
    * f_score, m_score). */
  def rfmSegments(events: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, nBins: Int = 5,
                  approxAcc: Int = 0): DataFrame = {
    require(nBins >= 2, "rfmSegments needs nBins >= 2")
    Joins.requireFreeColumns("rfmSegments", Seq(keyCol),
      "recency_days", "frequency", "monetary", "r_score", "f_score",
      "m_score", "__last", "__maxts", "__rb", "__fb", "__mb")
    val per = events.groupBy(col(keyCol)).agg(
      max(col(tsCol)).as("__last"),
      count(lit(1)).as("frequency"),
      sum(col(valCol).cast("double")).as("monetary"))
    val maxTs = events.agg(max(col(tsCol)).as("__maxts"))
    val base = per.crossJoin(broadcast(maxTs))
      .select(col(keyCol),
        ((unix_micros(col("__maxts")) - unix_micros(col("__last")))
          .divide(lit(86400000000L)).cast("long")).as("recency_days"),
        col("frequency"), col("monetary"))
    val binned = Seq(("recency_days", "__rb"), ("frequency", "__fb"),
      ("monetary", "__mb")).foldLeft(base) { case (df, (v, b)) =>
        Pipelines.quantileBins(df, v, nBins, b, approxAcc)
      }
    binned.select(col(keyCol), col("recency_days"), col("frequency"),
      round(col("monetary"), 4).as("monetary"),
      (lit(nBins + 1) - col("__rb")).as("r_score"),
      col("__fb").as("f_score"), col("__mb").as("m_score"))
  }

  /** Bounded-horizon exponentially-weighted moving average per key —
    * the adjust=true EWM every time-series library exposes, truncated
    * to the last `horizon` observations:
    *
    *   ewma_i = Σ_{k<H} decay^k·x_{i−k} / Σ_{k<H, k<i} decay^k
    *
    * The truncation is what makes it a WINDOW expression instead of a
    * sequential recurrence: each row needs only its `horizon−1`
    * predecessors (H lag() terms over one per-key window), so the
    * whole operator is one shuffle on the key — no iterative state,
    * no driver loop, and past ~20 terms the dropped tail weighs
    * < decay²⁰ anyway. decay = 0.5 keeps every weight an exact binary
    * fraction, so the weighted terms are exact scalings and the sum
    * order (a fixed left-to-right fold both here and in the oracle)
    * yields bit-identical doubles across engines.
    *
    * Contract: values are assumed non-NULL (a NULL row would contribute
    * 0 to the numerator while still carrying full denominator weight —
    * filter or impute first).
    *
    * Output: input key/ts/tie/value columns + `ewma` (rounded 6dp). */
  def ewmaBounded(events: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, valCol: String,
                  decay: Double = 0.5, horizon: Int = 8): DataFrame = {
    require(decay > 0.0 && decay < 1.0, "decay must be in (0, 1)")
    require(horizon >= 1, "horizon must be >= 1")
    Joins.requireFreeColumns("ewmaBounded", events.columns, "__rn", "ewma")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val x = col(valCol).cast("double")
    val num = (0 until horizon).map { k =>
      coalesce(lag(x, k).over(w), lit(0.0)) * lit(math.pow(decay, k))
    }.reduce(_ + _)
    val den = (0 until horizon).map { k =>
      when(col("__rn") > k, lit(math.pow(decay, k))).otherwise(lit(0.0))
    }.reduce(_ + _)
    events.select(col(keyCol), col(tsCol), col(tieCol), col(valCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("ewma", round(num / den, 6))
      .drop("__rn")
  }

  /** Daily growth accounting — the new / retained / resurrected /
    * churned decomposition every DAU dashboard plots: per calendar day,
    * how many users were active for the first time ever (new), active
    * today AND yesterday (retained), active today after a gap of 2+
    * days (resurrected), and active yesterday but not today (churned —
    * credited to the first inactive day, including the day after a
    * user's final event).
    *
    * Scale shape: one distinct over (user, day) — map-side partial —
    * then ONE window PARTITIONED BY USER over the user's active-day
    * list (state ∝ a user's distinct days, never the corpus) computing
    * lag/lead in a single pass, and a final groupBy(day) whose keyspace
    * is the calendar. No global window, no self-join of the raw stream.
    *
    * Output: (day date, n_new, n_retained, n_resurrected, n_churned),
    * one row per day that has any activity or any day-after churn. */
  def growthAccounting(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    Joins.requireFreeColumns("growthAccounting", events.columns,
      "day", "__prev", "__next", "n_new", "n_retained", "n_resurrected",
      "n_churned")
    val active = events
      .select(col(userCol), col(tsCol).cast("date").as("day"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("day"))
    val classified = active
      .select(col("day"), lag(col("day"), 1).over(w).as("__prev"),
        lead(col("day"), 1).over(w).as("__next"))
      .localCheckpoint() // feeds both the status counts and the churn rows
    val statuses = classified.select(col("day"),
      when(col("__prev").isNull, lit(1L)).otherwise(lit(0L)).as("n_new"),
      when(datediff(col("day"), col("__prev")) === 1, lit(1L))
        .otherwise(lit(0L)).as("n_retained"),
      when(col("__prev").isNotNull &&
        datediff(col("day"), col("__prev")) > 1, lit(1L))
        .otherwise(lit(0L)).as("n_resurrected"),
      lit(0L).as("n_churned"))
    val churns = classified
      .where(col("__next").isNull || datediff(col("__next"), col("day")) > 1)
      .select(date_add(col("day"), 1).as("day"), lit(0L).as("n_new"),
        lit(0L).as("n_retained"), lit(0L).as("n_resurrected"),
        lit(1L).as("n_churned"))
    statuses.unionByName(churns)
      .groupBy("day")
      .agg(sum("n_new").as("n_new"), sum("n_retained").as("n_retained"),
        sum("n_resurrected").as("n_resurrected"),
        sum("n_churned").as("n_churned"))
  }

  /** Funnel conversion latency: for each consecutive stage pair of the
    * first-touch funnel ([[funnelStages]] semantics exactly — earliest
    * qualifying instants, strict ordering, per-step gap), the
    * distribution of the conversion delay — count, exact p50/p90
    * (linear interpolation over the converted users' delays) and mean,
    * in seconds.
    *
    * Scale shape: the same shrinking per-stage frames as
    * [[funnelStages]] (one filtered groupBy(user) min per stage, later
    * joins probe only already-converted users), then per step one
    * all-reduce percentile over the converted-user deltas — rows ∝
    * conversions of that step, never the raw stream. Delays are exact
    * integer microsecond diffs; the seconds conversion and `roundDp`
    * rounding happen once at the end.
    *
    * Output: (step 1-based, from_type, to_type, n_users, p50_sec,
    * p90_sec, avg_sec). */
  def timeToConvert(events: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, stages: Seq[String],
                    maxStepGapSec: Long, roundDp: Int = 4): DataFrame = {
    require(stages.size >= 2, "timeToConvert needs at least two stages")
    require(maxStepGapSec > 0, "maxStepGapSec must be positive")
    Joins.requireFreeColumns("timeToConvert", events.columns,
      "__u", "__t", "__pt", "__dus", "step", "from_type", "to_type",
      "n_users", "p50_sec", "p90_sec", "avg_sec")
    val u = col(userCol)
    val first = events.where(col(typeCol) === stages.head)
      .groupBy(u.as("__u")).agg(min(col(tsCol)).as("__t"))
      .localCheckpoint()
    val frames = stages.tail.scanLeft(first) { (prev, stage) =>
      events.where(col(typeCol) === stage)
        .join(prev, u === col("__u"))
        .where(col(tsCol) > col("__t") &&
          col(tsCol) <= col("__t") + expr(s"INTERVAL $maxStepGapSec SECONDS"))
        .groupBy(col("__u")).agg(min(col(tsCol)).as("__t"))
        .localCheckpoint()
    }
    frames.sliding(2).toSeq.zipWithIndex.map { case (Seq(a, b), i) =>
      val deltas = b.join(a.select(col("__u"), col("__t").as("__pt")), "__u")
        .select((unix_micros(col("__t")) - unix_micros(col("__pt")))
          .as("__dus"))
      deltas.agg(
        count(lit(1)).as("n_users"),
        round(expr("percentile(__dus, 0.5)") / 1e6, roundDp).as("p50_sec"),
        round(expr("percentile(__dus, 0.9)") / 1e6, roundDp).as("p90_sec"),
        round(avg(col("__dus")) / 1e6, roundDp).as("avg_sec"))
        .select(lit(i + 1).cast("long").as("step"),
          lit(stages(i)).as("from_type"), lit(stages(i + 1)).as("to_type"),
          col("n_users"), col("p50_sec"), col("p90_sec"), col("avg_sec"))
    }.reduce(_.unionByName(_))
  }

  /** Gap sessionization, first-class: assign each user's events to
    * sessions (a new session at the first event and at every gap
    * > `gapSec`), and emit ONE ROW PER SESSION with its ordinal, start
    * and end instants, event count and duration — the table every
    * downstream engagement metric joins against ([[sessionPaths]] mines
    * paths over the same assignment).
    *
    * Scale shape: the lag-flag and its running sum share ONE per-user
    * window shuffle (state ∝ a user's events), then one map-side
    * -combining groupBy on (user, session). Durations are exact
    * integer-microsecond diffs emitted as seconds at 6 dp.
    *
    * Output: (userCol, session, start_ts, end_ts, n_events,
    * duration_sec). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 tieCol: String, gapSec: Long): DataFrame = {
    require(gapSec > 0, "sessionize needs a positive gap")
    Joins.requireFreeColumns("sessionize", events.columns,
      "__new", "session", "start_ts", "end_ts", "n_events", "duration_sec")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events.select(col(userCol), col(tsCol), col(tieCol))
      .withColumn("__new",
        when(unix_micros(col(tsCol)) -
          unix_micros(lag(col(tsCol), 1).over(w)) > gapSec * 1000000L ||
          lag(col(tsCol), 1).over(w).isNull, lit(1L)).otherwise(lit(0L)))
      .withColumn("session", sum(col("__new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session"))
      .agg(min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_sec",
        round((unix_micros(col("end_ts")) - unix_micros(col("start_ts")))
          .cast("double") / 1e6, 6))
  }

  /** Frequent contiguous path n-grams over gap sessions: every length-n
    * window of consecutive event types inside a session, counted across
    * all sessions — the sequential-pattern complement of
    * [[sessionPaths]] (whole journeys) and [[transitionCounts]]
    * (n = 2, unsessionized). Sessions shorter than n contribute
    * nothing.
    *
    * Scale shape: the same shared-shuffle sessionization windows, then
    * n−1 lead() terms over the SAME window (one shuffle total) and a
    * map-side-combining count on the n-gram string, thinned by
    * `minCount`.
    *
    * Output: (ngram '>'-joined, n_occurrences ≥ minCount). */
  def sessionPathNgrams(events: DataFrame, userCol: String, typeCol: String,
                        tsCol: String, tieCol: String, gapSec: Long,
                        n: Int, minCount: Long = 1L): DataFrame = {
    require(gapSec > 0, "sessionPathNgrams needs a positive gap")
    require(n >= 2, "sessionPathNgrams needs n >= 2")
    Joins.requireFreeColumns("sessionPathNgrams", events.columns,
      "__new", "__sess", "ngram", "n_occurrences")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val sessioned = events.select(col(userCol), col(typeCol), col(tsCol),
        col(tieCol))
      .withColumn("__new",
        when(unix_micros(col(tsCol)) -
          unix_micros(lag(col(tsCol), 1).over(w)) > gapSec * 1000000L ||
          lag(col(tsCol), 1).over(w).isNull, lit(1L)).otherwise(lit(0L)))
      .withColumn("__sess", sum(col("__new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol), col("__sess"))
      .orderBy(col(tsCol), col(tieCol))
    // the n-gram starting at each row: this type + the n−1 following
    // ones WITHIN the session (lead() over the session window returns
    // null past the end, which drops the incomplete tails)
    val parts = (0 until n).map(i =>
      if (i == 0) col(typeCol) else lead(col(typeCol), i).over(ws))
    sessioned
      .select(when(parts.map(_.isNotNull).reduce(_ && _),
        concat_ws(">", parts: _*)).as("ngram"))
      .where(col("ngram").isNotNull)
      .groupBy("ngram").agg(count(lit(1)).as("n_occurrences"))
      .where(col("n_occurrences") >= minCount)
  }

  /** Session path mining: sessionize each user's timeline by an
    * inactivity gap, read off each session's ordered event-type
    * sequence (truncated to its first `maxLen` events), and count how
    * many sessions follow each path — the "what journeys happen"
    * complement to the one-step [[transitionCounts]] matrix.
    *
    * A new session starts at a user's first event and at every event
    * more than `gapSec` after the previous one (the q39 session-window
    * semantics, expressed as a running flag-sum so each event gets a
    * session ordinal). Event order inside a session is the total
    * (ts, tie) order; the path string joins types with '>'.
    *
    * Scale shape: two windows PARTITIONED BY USER (the lag flag and
    * its running sum share one shuffle; state ∝ a user's events), one
    * per-(user, session) groupBy whose collect_list is bounded by the
    * session length (callers bound sessions via the gap), and a final
    * map-side-combining count on the path string, thinned by
    * `minCount` so the output is the frequent tail.
    *
    * Output: (path, n_sessions) with n_sessions ≥ minCount. */
  def sessionPaths(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, tieCol: String, gapSec: Long,
                   maxLen: Int, minCount: Long = 1L): DataFrame = {
    require(gapSec > 0, "sessionPaths needs a positive gap")
    require(maxLen >= 1, "sessionPaths needs maxLen >= 1")
    Joins.requireFreeColumns("sessionPaths", events.columns,
      "__new", "__sess", "__evs", "path", "n_sessions")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val flagged = events.select(col(userCol), col(typeCol), col(tsCol),
        col(tieCol))
      .withColumn("__new",
        when(unix_micros(col(tsCol)) -
          unix_micros(lag(col(tsCol), 1).over(w)) > gapSec * 1000000L ||
          lag(col(tsCol), 1).over(w).isNull, lit(1L)).otherwise(lit(0L)))
      .withColumn("__sess", sum(col("__new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
    flagged
      .groupBy(col(userCol), col("__sess"))
      .agg(sort_array(collect_list(
        struct(col(tsCol), col(tieCol), col(typeCol)))).as("__evs"))
      .select(concat_ws(">",
        slice(transform(col("__evs"), e => e(typeCol)), 1, maxLen))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .where(col("n_sessions") >= minCount)
  }

  /** Rolling active-user counts — DAU / WAU / MAU and the stickiness
    * ratio (DAU/MAU) per calendar day, the engagement headline next to
    * [[growthAccounting]]'s flow decomposition.
    *
    * A rolling DISTINCT count can't ride a window frame (distinct
    * doesn't decompose), so each is computed by COVERAGE EXPANSION: a
    * user active on day a is "covered" for the next W−1 days — explode
    * a's ≤ W cover days, distinct (user, day), count per day. Fan-out
    * is ≤ W per (user, active day), all aggregation map-side partial —
    * linear at any corpus size, no window at all. Days are reported for
    * the observed activity grid only (no trailing ghost coverage).
    *
    * Output: (day, dau, wau, mau, stickiness = dau/mau rounded 6 dp). */
  def activeUserRatios(events: DataFrame, userCol: String, tsCol: String,
                       wauDays: Int = 7, mauDays: Int = 30): DataFrame = {
    require(wauDays >= 1 && mauDays >= wauDays,
      "activeUserRatios needs 1 <= wauDays <= mauDays")
    Joins.requireFreeColumns("activeUserRatios", events.columns,
      "day", "dau", "wau", "mau", "stickiness", "__a", "__c")
    val active = events
      .select(col(userCol), col(tsCol).cast("date").as("__a"))
      .distinct()
      .localCheckpoint() // feeds the grid and all three coverages
    val grid = active.select(col("__a").as("day")).distinct()
    def rolling(w: Int, name: String): DataFrame =
      active
        .select(col(userCol),
          explode(sequence(col("__a"), date_add(col("__a"), w - 1)))
            .as("day"))
        .distinct()
        .join(grid, Seq("day"), "left_semi")
        .groupBy("day").agg(count(lit(1)).as(name))
    rolling(1, "dau")
      .join(rolling(wauDays, "wau"), "day")
      .join(rolling(mauDays, "mau"), "day")
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        round(col("dau").cast("double") / col("mau"), 6).as("stickiness"))
  }

  /** Lagged Pearson cross-correlation between two keys' INTEGER-valued
    * series (daily counts, quantized metrics): for each lag 0..maxLag,
    * the correlation of (x at t, y at t+lag) over the ordinals where
    * both exist — "does a move in A precede a move in B by ℓ days".
    *
    * The integer contract is what makes it oracle-exact: all five
    * Pearson sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) accumulate
    * as exact longs in any order; only the final correlation is
    * floating, and it's one deterministic expression per lag. A lag
    * whose overlap has zero variance on either side yields NULL (the
    * SQL convention), not NaN.
    *
    * Scale shape: two key-filtered projections, the lag fan-out is an
    * explode of `maxLag + 1` rows per y-observation (the caller bounds
    * maxLag), the alignment is one equi-join on the shifted ordinal,
    * and the stats are a map-side-combining groupBy on ≤ maxLag + 1
    * lag keys. Nothing windows; nothing sorts.
    *
    * Output: (lag, n, corr rounded to `roundDp`), one row per lag. */
  def laggedCorrelation(series: DataFrame, keyCol: String, ordCol: String,
                        valCol: String, keyA: Any, keyB: Any, maxLag: Int,
                        roundDp: Int = 6): DataFrame = {
    require(maxLag >= 0, "laggedCorrelation needs maxLag >= 0")
    // no free-column guard: both sides are projected fresh immediately
    // (a value column literally named "n" is legitimate input)
    val xs = series.where(col(keyCol) === lit(keyA))
      .select(col(ordCol).cast("long").as("__o"),
        col(valCol).cast("long").as("__x"))
    val ys = series.where(col(keyCol) === lit(keyB))
      .select(col(ordCol).cast("long").as("__o"),
        col(valCol).cast("long").as("__y"))
    val lagged = ys.select(col("__o"), col("__y"),
        explode(sequence(lit(0L), lit(maxLag.toLong))).as("lag"))
      .select((col("__o") - col("lag")).as("__j"), col("__y"), col("lag"))
    val stats = xs.join(lagged, col("__o") === col("__j"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum("__x").as("sx"), sum("__y").as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
      .cast("double") *
      (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))
    stats.select(col("lag"), col("n"),
      when(den > 0.0, round(num / den, roundDp)).as("corr"))
  }

  /** Two-sided CUSUM changepoint scores per key — the classic
    * level-shift detector over a keyed series:
    *
    *   s⁺_i = max(0, s⁺_{i−1} + (x_i − target − slack))
    *   s⁻_i = max(0, s⁻_{i−1} − (x_i − target + slack))
    *
    * with target = the key's own series mean. The recurrences are NOT
    * computed sequentially: both have the running-extremum closed form
    * (s⁺_i = C_i − min(0, min_{j≤i} C_j) for the cumsum C of the
    * slack-adjusted deviations, and symmetrically for s⁻), so the whole
    * operator is window algebra — a cumulative sum and a running
    * min/max over the SAME per-key window, one shuffle total.
    *
    * Scale shape: one groupBy(key) mean + broadcast-sized join back,
    * then one window partitioned by key ordered by `ordCol` (state ∝ a
    * key's series length — the caller bounds it by aggregating to a
    * grid first, e.g. daily buckets). Window-order prefix sums are
    * engine-sequential, so doubles are reproducible; `roundDp` absorbs
    * the last ulp.
    *
    * Output: input (key, ord, value) + cusum_pos, cusum_neg. */
  def cusum(series: DataFrame, keyCol: String, ordCol: String,
            valCol: String, slack: Double, roundDp: Int = 6): DataFrame = {
    require(slack >= 0.0, "cusum needs a non-negative slack")
    Joins.requireFreeColumns("cusum", series.columns,
      "__mean", "__c", "__d", "cusum_pos", "cusum_neg")
    val x = col(valCol).cast("double")
    val mean = series.groupBy(col(keyCol)).agg(avg(x).as("__mean"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(ordCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    series.join(mean, Seq(keyCol))
      .withColumn("__c", sum(x - col("__mean") - lit(slack)).over(w))
      .withColumn("__d", sum(x - col("__mean") + lit(slack)).over(w))
      .select(col(keyCol), col(ordCol), col(valCol),
        round(col("__c") - least(min(col("__c")).over(w), lit(0.0)), roundDp)
          .as("cusum_pos"),
        round(greatest(max(col("__d")).over(w), lit(0.0)) - col("__d"),
          roundDp).as("cusum_neg"))
  }

  /** Time-weighted average value per key — the irregular-series
    * normalizer (TWAP): each observation holds until its successor, so
    * its weight is the gap to the next observation; the last
    * observation carries no weight (the right-open step integral over
    * the key's own span).
    *
    *   twap = Σᵢ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first)
    *
    * Weights are exact integer microseconds, values quantize to
    * micro-units, and the weighted sum accumulates as decimals
    * (128-bit-exact at any corpus size) — so the only float is the
    * final per-key expression, replayed verbatim by the oracle. NULL
    * values drop first; a key with zero span (one event, or all
    * simultaneous) yields NULL twap rather than 0/0.
    *
    * Scale shape: ONE per-key lead window (state = one row) + one
    * map-side-combining groupBy. Output = one row per key.
    *
    * Output: (key, n_events, span_sec, twap) at `roundDp` dp. */
  def twap(events: DataFrame, keyCol: String, tsCol: String,
           tieCol: String, valCol: String, roundDp: Int = 6): DataFrame = {
    Joins.requireFreeColumns("twap", Seq(keyCol),
      "n_events", "span_sec", "twap", "__us", "__nxt", "__vq", "__wv",
      "__span")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("__us"), col(tieCol))
    events
      .where(col(valCol).isNotNull)
      .select(col(keyCol), col(tieCol),
        unix_micros(col(tsCol)).as("__us"),
        round(col(valCol).cast("double") * 1e6, 0).cast("long").as("__vq"))
      .withColumn("__nxt", lead(col("__us"), 1).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        (max("__us") - min("__us")).as("__span"),
        sum(when(col("__nxt").isNotNull,
          (col("__nxt") - col("__us")).cast("decimal(20,0)") *
            col("__vq").cast("decimal(18,0)"))).as("__wv"))
      .select(col(keyCol), col("n_events"),
        round(col("__span").cast("double") / 1e6, roundDp).as("span_sec"),
        when(col("__span") > 0L,
          round(col("__wv").cast("double") / 1e6 / col("__span"),
            roundDp)).as("twap"))
  }
}
