package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed/streaming transforms (SURVEY §2.8 T2-T7).
  *
  * Each transform is written against a plain DataFrame so the *same plan*
  * runs in batch (the Q37-39 oracle projections) and under Structured
  * Streaming via `readStream` (the batch-equivalence tests assert the two
  * agree — Structured Streaming's correctness contract). Watermarking is
  * applied by the streaming callers; it is a no-op on batch frames.
  */
object StreamOps {

  /** T2: tumbling event-time window aggregate → (w_start, c, s). */
  def tumblingCounts(events: DataFrame, width: String = "10 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"))
      .agg(count(lit(1)).as("c"), round(sum(col("value")), 4).as("s"))
      .select(col("w.start").as("w_start"), col("c"), col("s"))

  /** T3: sliding window counts → (w_start, c). */
  def slidingCounts(events: DataFrame, width: String = "10 minutes",
                    slide: String = "5 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width, slide).as("w"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("w_start"), col("c"))

  /** T4: session windows (gap-based) → (user_id, sid, c, v) with sid a
    * per-user 1-based session index ordered by session start.
    *
    * Boundary semantics (empirically verified on Spark 4.1): an event at
    * exactly `prev_ts + gap` merges into the SAME session (inclusive),
    * so the gaps-and-islands oracle's "new session when gap > 1800"
    * matches Spark exactly, including at the boundary. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    val s = events.groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("c"), round(sum(col("value")), 4).as("v"))
    s.withColumn("sid",
        row_number().over(Window.partitionBy("user_id").orderBy(col("w.start"))).cast("long"))
      .select(col("user_id"), col("sid"), col("c"), col("v"))
  }

  /** T6: dedup by id; on streams pair with `withWatermark` for state TTL. */
  def dedupByKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** T6 × L2: streaming near-dup drop by SimHash fingerprint — keep the
    * first document per 60-bit fingerprint (fingerprint equality ≈
    * near-identical text; the streaming analog of collapsing hamming-0
    * pairs). The fingerprint is [[graft.operators.Dedup.simHashExpr]],
    * a stateless per-row projection — the only SimHash form legal in a
    * streaming select (the batch explode + groupBy would demand its own
    * aggregation state) — so the query's ONLY state is the fingerprint
    * set.
    *
    * State boundedness: the streaming path uses
    * `dropDuplicatesWithinWatermark`, NOT `dropDuplicates` — plain
    * dropDuplicates only watermark-evicts when the event-time column is
    * among the dedup keys, which a fingerprint key never is, so its
    * state would grow one entry per distinct fingerprint FOREVER. The
    * WithinWatermark form evicts each fingerprint once the watermark
    * passes its last-seen event time; Spark rejects it at analysis if
    * the caller set no watermark, so unbounded state is unrepresentable.
    * The trade every production stream dedup makes: two near-identical
    * docs arriving further apart than the watermark delay are BOTH
    * kept. Batch frames take the plain distinct-by-fingerprint path.
    * Streamed-set ≡ batch-distinct is asserted in StreamingSuite.
    *
    * Token-less rows (null text or no tokens) have no meaningful
    * fingerprint, so they pass through UNFINGERPRINTED (`simhash` null)
    * and are never deduped against anything — a dedup operator must not
    * lose rows it cannot fingerprint. */
  def simHashDedup(docs: DataFrame, textCol: String): DataFrame = {
    graft.operators.Joins.requireFreeColumns("simHashDedup", docs.columns,
      "simhash")
    // three-valued logic: null text → null predicate → false on both
    // branches unless coalesced, which is exactly the silent-drop bug
    val hasTokens =
      coalesce(size(graft.operators.Dedup.tokenSet(col(textCol))) > 0,
        lit(false))
    val fp = docs.where(hasTokens)
      .withColumn("simhash", graft.operators.Dedup.simHashExpr(col(textCol)))
    val deduped =
      if (fp.isStreaming) fp.dropDuplicatesWithinWatermark("simhash")
      else fp.dropDuplicates("simhash")
    val passthrough = docs.where(!hasTokens)
      .withColumn("simhash", lit(null).cast("long"))
    deduped.unionByName(passthrough)
  }

  /** T6 × L1n: streaming "fuzzy exact" dedup — keep the first document
    * per NORMALIZED-text hash ([[graft.operators.Dedup.normalizeText]]:
    * lowercase, de-punctuate, collapse whitespace), so casing and
    * punctuation re-crawls collapse in flight. The normalize+md5 is a
    * stateless codegen'd projection; state is one hash per distinct
    * normalized form, watermark-evicted exactly as [[simHashDedup]]
    * (same WithinWatermark contract, same both-kept trade past the
    * delay). Null text normalizes to null — those rows pass through
    * undeduped (`norm_h` null), never silently dropped. */
  def normalizedDedup(docs: DataFrame, textCol: String): DataFrame = {
    graft.operators.Joins.requireFreeColumns("normalizedDedup",
      docs.columns, "norm_h")
    val hashed = docs.where(col(textCol).isNotNull)
      .withColumn("norm_h",
        md5(graft.operators.Dedup.normalizeText(col(textCol))))
    val deduped =
      if (hashed.isStreaming) hashed.dropDuplicatesWithinWatermark("norm_h")
      else hashed.dropDuplicates("norm_h")
    val passthrough = docs.where(col(textCol).isNull)
      .withColumn("norm_h", lit(null).cast("string"))
    deduped.unionByName(passthrough)
  }

  /** Stream-stream event-time interval join (the T-family's join leg):
    * each left event matched to same-key right events with `r.ts` in
    * `(l.ts, l.ts + within]` — the enrich-a-click-with-its-impressions
    * shape. The join condition carries the event-time bound, which is
    * what lets Structured Streaming bound BOTH buffers: with a
    * watermark on each side (applied by the streaming caller), a
    * buffered left row is droppable once the watermark passes
    * `l.ts + within`, a right row once it passes `r.ts` — without the
    * time bound Spark would have to buffer both streams forever (and
    * rejects the inner join at analysis when neither side is
    * constrained). On batch frames the identical plan is a plain range
    * join; StreamingSuite asserts stream ≡ batch row sets.
    *
    * Output: left columns prefixed `l_`, right's event columns
    * `r_event_id`/`r_ts` — explicit projection so the joined schema is
    * stable for downstream sinks. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   keyCol: String = "user_id",
                   within: String = "10 minutes"): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r,
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
          col("r.ts") > col("l.ts") &&
          col("r.ts") <= col("l.ts") + expr(s"INTERVAL $within"))
      .select(col(s"l.$keyCol").as(keyCol),
        col("l.event_id").as("l_event_id"), col("l.ts").as("l_ts"),
        col("r.event_id").as("r_event_id"), col("r.ts").as("r_ts"))
  }

  /** Left-outer [[intervalJoin]]: every left row survives; unmatched
    * rows carry NULL right columns. In streaming, Spark REQUIRES a
    * watermark on both sides plus the time bound for outer joins —
    * a left row's NULL verdict can only be emitted once the right-side
    * watermark proves no match can still arrive, so outer results
    * trail the watermark by `within` (the correctness-over-latency
    * trade; inner rows still emit immediately). Same bounded-buffer
    * posture as the inner form; batch frames plan the identical plain
    * outer range join (StreamingSuite asserts stream ≡ batch). */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
                            keyCol: String = "user_id",
                            within: String = "10 minutes"): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r,
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
          col("r.ts") > col("l.ts") &&
          col("r.ts") <= col("l.ts") + expr(s"INTERVAL $within"),
        "left_outer")
      .select(col(s"l.$keyCol").as(keyCol),
        col("l.event_id").as("l_event_id"), col("l.ts").as("l_ts"),
        col("r.event_id").as("r_event_id"), col("r.ts").as("r_ts"))
  }

  /** T7: per-key running aggregate (update-mode friendly). */
  def runningTotals(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))

  /** T7 (custom state): per-user accumulator via flatMapGroupsWithState —
    * the escape hatch for state the built-in aggregates can't express
    * (here: running count+sum with an explicit processing-time TTL, the
    * Spark-native analog of the reference's timer-driven idle eviction,
    * HiveOrcSink.java:40-41,137-145). Emits one updated row per key per
    * batch; state for idle keys expires after `ttl`. */
  def statefulRunningTotals(events: DataFrame,
                            ttl: Option[String] = Some("1 hour")): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Append(), timeoutConf) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[UserTotals]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
            val (n, s) = rows.foldLeft((prev.n, prev.total)) {
              case ((cn, cs), (_, v)) => (cn + 1, cs + v)
            }
            val next = UserTotals(uid, n, s)
            state.update(next)
            ttl.foreach(state.setTimeoutDuration)
            Iterator.single(next)
          }
      }
      .toDF()
  }

  /** Streaming heavy-hitter estimates: a count-min sketch held as
    * flatMapGroupsWithState state, folded over the token stream, with
    * the watchlist's estimated counts re-emitted every batch (T7 ×
    * A3+: the frequency analog of the HLL family — per-key state is
    * ONE fixed-size sketch, never the vocabulary). CMS adds are
    * cell-wise increments, so the streamed sketch is value-identical
    * to a batch [[graft.functions.CountMinTokens.tokenSketch]] over
    * the same rows regardless of batch boundaries or row order
    * (StreamingSuite asserts the equality).
    *
    * `shardKey` partitions the state: the default single shard serves a
    * per-tenant/per-topic stream (one task owns one sketch); for a
    * global sketch over a fat stream, shard by a hash and merge the
    * shards downstream (`CountMinSketch.mergeInPlace` — associative). */
  def streamingTokenCounts(docs: DataFrame, textCol: String,
                           watch: Seq[String], eps: Double = 0.001,
                           confidence: Double = 0.99,
                           shardKey: String => Int = _ => 0): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.util.sketch.CountMinSketch
    require(watch.nonEmpty, "streamingTokenCounts needs a watchlist")
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val cmsEnc = org.apache.spark.sql.Encoders.kryo[CountMinSketch]
    docs.select(explode(split(col(textCol), " ")).as("t")).as[String]
      .groupByKey(shardKey)
      .flatMapGroupsWithState[CountMinSketch, (Int, String, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, toks: Iterator[String], state: GroupState[CountMinSketch]) =>
          val cms = state.getOption.getOrElse(
            CountMinSketch.create(eps, confidence, 42))
          toks.foreach(t => if (t != null) cms.addString(t))
          state.update(cms)
          watch.iterator.map(w => (shard, w, cms.estimateCount(w)))
      }
      .toDF("shard", "token", "est")
  }

  /** Streaming first-touch conversion funnel (the live counterpart of
    * [[graft.operators.EventAnalytics.funnelStages]]): per-user stage
    * instants held as flatMapGroupsWithState state — state is
    * `stages.size` longs per user, nothing else — folded over each
    * batch's events IN TIMESTAMP ORDER (the iterator is sorted; within
    * one user a batch is small). The greedy in-order fold computes
    * exactly the batch operator's first-touch recurrence: stage k's
    * instant is the earliest stage-k event strictly after stage k−1's
    * within the gap, and since instants only ever move earlier-to-fixed
    * in ts order, the first qualifying event IS the minimum.
    *
    * DELIVERY ASSUMPTION (documented): per-user in-order arrival across
    * batches — the Kafka-partition-keyed-by-user regime. An event
    * arriving late (earlier ts than an already-fixed instant) is
    * ignored rather than retracted; out-of-order streams need a
    * watermark-buffered variant.
    *
    * Emits (user_id, stages_reached) per user per batch it appears in
    * (Update-style progress; the last emission is the user's final
    * stage). StreamingSuite asserts per-stage user counts equal the
    * batch funnel's on a full replay.
    *
    * STATE EVICTION: by default (`idleTimeoutSec = 0`) per-user state
    * lives forever — unbounded user cardinality grows state without
    * limit, acceptable only for bounded user populations. Pass a
    * positive `idleTimeoutSec` to evict a user's funnel state after
    * that much processing-time inactivity; a user reappearing later
    * restarts from stage 0 (the standard analytics-funnel reading of
    * an expired session). */
  def streamingFunnel(events: DataFrame, stages: Seq[String],
                      gapSec: Long, userCol: String = "user_id",
                      typeCol: String = "event_type", tsCol: String = "ts",
                      idleTimeoutSec: Long = 0L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(stages.nonEmpty, "streamingFunnel needs at least one stage")
    require(idleTimeoutSec >= 0L, "idleTimeoutSec must be >= 0 (0 = never evict)")
    val spark = events.sparkSession
    import spark.implicits._
    val nStages = stages.size
    // a type may occur at several funnel positions ("view view" = two
    // views strictly after each other) — expand each event to every
    // matching stage index, ordered (ts, k): strict > already stops one
    // event from satisfying two consecutive stages
    val stageIdxs: Map[String, Seq[Int]] =
      stages.zipWithIndex.groupBy(_._1).map { case (t, l) => t -> l.map(_._2) }
    val gapMicros = gapSec * 1000000L
    val timeout = if (idleTimeoutSec > 0L) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .select(col(userCol).cast("long"), col(typeCol), col(tsCol))
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelTimes, (Long, Int)](
        OutputMode.Append(), timeout) {
        (uid: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[FunnelTimes]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            def micros(t: java.sql.Timestamp): Long =
              t.getTime / 1000 * 1000000L + t.getNanos / 1000L
            val times = state.getOption
              .map(_.times.toArray)
              .getOrElse(Array.fill(nStages)(-1L))
            rows.toSeq
              .flatMap { case (_, tp, ts) =>
                stageIdxs.getOrElse(tp, Nil).map((_, micros(ts))) }
              .sortBy { case (k, t) => (t, k) }
              .foreach { case (k, t) =>
                if (times(k) < 0 &&
                  (k == 0 || (times(k - 1) >= 0 && t > times(k - 1) &&
                    t <= times(k - 1) + gapMicros)))
                  times(k) = t
              }
            state.update(FunnelTimes(times.toSeq))
            if (idleTimeoutSec > 0L)
              state.setTimeoutDuration(idleTimeoutSec * 1000L)
            Iterator.single((uid, times.count(_ >= 0)))
          }
      }
      .toDF("user_id", "stages_reached")
  }

  /** Streaming per-user event-type transitions (the live counterpart of
    * [[graft.operators.EventAnalytics.transitionCounts]]): state is the
    * user's LAST event (its (ts, tie) position and type — three fields,
    * nothing else); each batch's rows fold in (ts, tie) order emitting
    * one (from_type, to_type) row per consecutive pair, the first pair
    * bridging the previous batch through the stored last event.
    *
    * Same delivery assumption as [[streamingFunnel]]: per-user in-order
    * arrival across batches. A row at or before the stored last (ts,
    * tie) position is late/duplicate and is dropped rather than
    * retracted. `tieCol` must be a numeric total-order tie-break (the
    * event id), exactly as the batch operator requires.
    *
    * Emits transition INSTANCES (one row each); pipe into
    * `groupBy("from_type", "to_type").count()` in update mode for the
    * live matrix — counting downstream keeps this operator append-only
    * and the running totals in Spark's own agg state. StreamingSuite
    * asserts instance counts over a multi-batch replay equal the batch
    * matrix. Same `idleTimeoutSec` eviction contract as
    * [[streamingFunnel]] (a user reappearing after eviction starts a
    * fresh timeline: the bridging transition is not emitted). */
  def streamingTransitions(events: DataFrame, userCol: String = "user_id",
                           typeCol: String = "event_type",
                           tsCol: String = "ts", tieCol: String = "event_id",
                           idleTimeoutSec: Long = 0L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(idleTimeoutSec >= 0L, "idleTimeoutSec must be >= 0 (0 = never evict)")
    val spark = events.sparkSession
    import spark.implicits._
    val timeout = if (idleTimeoutSec > 0L) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .select(col(userCol).cast("long"), col(typeCol), col(tsCol),
        col(tieCol).cast("long"))
      .as[(Long, String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, (String, String)](
        OutputMode.Append(), timeout) {
        (uid: Long, rows: Iterator[(Long, String, java.sql.Timestamp, Long)],
         state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            def micros(t: java.sql.Timestamp): Long =
              t.getTime / 1000 * 1000000L + t.getNanos / 1000L
            val ordered = rows.toSeq
              .map { case (_, tp, ts, tie) => (micros(ts), tie, tp) }
              .sortBy { case (t, tie, _) => (t, tie) }
            var last = state.getOption
            val out = Seq.newBuilder[(String, String)]
            ordered.foreach { case (t, tie, tp) =>
              val fresh = last.forall(l =>
                t > l.tsMicros || (t == l.tsMicros && tie > l.tie))
              if (fresh) {
                last.foreach(l => out += ((l.tp, tp)))
                last = Some(LastEvent(t, tie, tp))
              }
            }
            last.foreach(state.update)
            if (idleTimeoutSec > 0L)
              state.setTimeoutDuration(idleTimeoutSec * 1000L)
            out.result().iterator
          }
      }
      .toDF("from_type", "to_type")
  }

  /** Streaming weekly retention activity (the live counterpart of
    * [[graft.operators.EventAnalytics.retentionCohorts]]): per-user
    * state is the cohort week plus the set of week offsets already
    * emitted (bounded by weeks-since-cohort). Each batch emits one
    * (user_id, cohort_week, week_offset) row per NEWLY-SEEN offset, so
    * a downstream `groupBy(cohort_week, week_offset).count()` in
    * update mode is exactly the batch triangle's n_users — each user
    * contributes to each cell at most once.
    *
    * Week arithmetic happens IN THE PLAN (`date_trunc("week")` +
    * epoch-day datediff) before the stateful fold, so cohort/offset
    * values are bit-identical to the batch operator's, whatever the
    * session timezone. Same delivery assumption as [[streamingFunnel]]
    * (first arrival = first event ⇒ cohort matches the batch min);
    * an out-of-contract earlier-week late event (negative offset) is
    * dropped. State grows one int per active week per user — pair with
    * a processing-time eviction policy at unbounded user cardinality
    * (offsets of evicted users would re-emit on return, overcounting;
    * eviction is therefore NOT offered here, by contract). */
  def streamingCohortActivity(events: DataFrame,
                              userCol: String = "user_id",
                              tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val epoch = to_date(lit("1970-01-01"))
    events
      .select(col(userCol).cast("long").as("__u"),
        datediff(date_trunc("week", col(tsCol)), epoch).as("__wd"))
      .as[(Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CohortSeen, (Long, Int, Int)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Int)],
         state: GroupState[CohortSeen]) =>
          val weeks = rows.map(_._2).toSeq
          if (weeks.isEmpty) Iterator.empty
          else {
            val st = state.getOption
              .getOrElse(CohortSeen(weeks.min, Seq.empty))
            val seen = scala.collection.mutable.Set(st.offsets: _*)
            val fresh = Seq.newBuilder[(Long, Int, Int)]
            weeks.foreach { wd =>
              val off = (wd - st.cohortDays) / 7
              if (off >= 0 && seen.add(off)) fresh += ((uid, st.cohortDays, off))
            }
            state.update(CohortSeen(st.cohortDays, seen.toSeq.sorted))
            fresh.result().iterator
          }
      }
      .toDF("__u", "__cwd", "__off")
      .select(col("__u").as("user_id"),
        date_add(to_date(lit("1970-01-01")), col("__cwd")).as("cohort_week"),
        col("__off").cast("long").as("week_offset"))
  }

  /** Streaming bounded-horizon EWMA — the live counterpart of
    * [[graft.operators.EventAnalytics.ewmaBounded]]: per-key state is
    * the last `horizon − 1` values plus the last (ts, tie) high-water
    * mark, so state is O(horizon) doubles per key REGARDLESS of stream
    * length — exactly the bound the batch operator's window truncation
    * buys. Each event emits its smoothed value; the fold replays the
    * batch expression's term order (ascending k, left-assoc double
    * adds, the same pow(decay, k) weights) and the same HALF_UP 6 dp
    * round, so stream ≡ batch BIT-FOR-BIT under the family's in-order
    * delivery contract (rows not strictly after the high-water mark
    * are dropped, same as [[streamingTransitions]]). Optional
    * processing-time idle eviction; an evicted key restarts its window
    * cold, diverging from batch — 0 (never evict) is the parity mode. */
  def streamingEwma(events: DataFrame, decay: Double = 0.5,
                    horizon: Int = 8, userCol: String = "user_id",
                    tsCol: String = "ts", tieCol: String = "event_id",
                    valCol: String = "value",
                    idleTimeoutSec: Long = 0L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(decay > 0.0 && decay < 1.0, "decay must be in (0, 1)")
    require(horizon >= 1, "horizon must be >= 1")
    require(idleTimeoutSec >= 0L, "idleTimeoutSec must be >= 0 (0 = never evict)")
    val spark = events.sparkSession
    import spark.implicits._
    val timeout = if (idleTimeoutSec > 0L) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val weights = (0 until horizon).map(k => math.pow(decay, k)).toArray
    events
      .select(col(userCol).cast("long"), col(tsCol), col(tieCol).cast("long"),
        col(valCol).cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaWindow, (Long, Long, Double)](
        OutputMode.Append(), timeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
         state: GroupState[EwmaWindow]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            def micros(t: java.sql.Timestamp): Long =
              t.getTime / 1000 * 1000000L + t.getNanos / 1000L
            val ordered = rows.toSeq
              .map { case (_, ts, tie, v) => (micros(ts), tie, v) }
              .sortBy { case (t, tie, _) => (t, tie) }
            var st = state.getOption
              .getOrElse(EwmaWindow(Long.MinValue, Long.MinValue, Nil))
            val out = Seq.newBuilder[(Long, Long, Double)]
            ordered.foreach { case (t, tie, v) =>
              val fresh = t > st.tsMicros ||
                (t == st.tsMicros && tie > st.tie)
              if (fresh) {
                val window = (v +: st.recent).take(horizon) // newest first
                var num = 0.0; var den = 0.0; var k = 0
                while (k < window.length) { // ascending k ≡ the batch fold
                  num += window(k) * weights(k); den += weights(k); k += 1
                }
                val ewma = BigDecimal(num / den)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP)
                  .toDouble + 0.0
                out += ((uid, tie, ewma))
                st = EwmaWindow(t, tie, window.take(horizon - 1))
              }
            }
            if (st.tsMicros != Long.MinValue) state.update(st)
            if (idleTimeoutSec > 0L)
              state.setTimeoutDuration(idleTimeoutSec * 1000L)
            out.result().iterator
          }
      }
      .toDF("user_id", "event_id", "ewma")
  }

  /** Streaming gap sessionization — the live counterpart of
    * [[graft.operators.EventAnalytics.sessionize]]: per-user state is
    * the one OPEN session (ordinal, span, count) plus the session
    * counter; a closed session emits EXACTLY ONCE, either when a new
    * in-order event arrives more than `gapSec` later (the gap closes
    * it) or when the event-time timeout fires — the watermark passing
    * `end + gapSec` proves no event can reopen it. Ordinals persist
    * across sessions (state keeps the counter after emitting), so
    * stream ≡ batch row-for-row under the family's in-order delivery
    * contract (late rows at-or-before the high-water mark drop, the
    * [[streamingEwma]] rule). Durations replay the batch rounding.
    *
    * State per user is O(1) — one open session — and is never evicted
    * (the counter must survive; the [[streamingFunnel]] no-eviction
    * note applies). */
  def streamingSessionize(events: DataFrame, gapSec: Long,
                          watermarkDelay: String = "10 minutes",
                          userCol: String = "user_id",
                          tsCol: String = "ts",
                          tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(gapSec > 0, "streamingSessionize needs a positive gap")
    val spark = events.sparkSession
    import spark.implicits._
    val src = if (events.isStreaming)
      events.withWatermark(tsCol, watermarkDelay) else events
    def fromMicros(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(us / 1000000L * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    def closed(uid: Long, st: OpenSession) = {
      val dur = BigDecimal((st.endUs - st.startUs).toDouble / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      (uid, st.ord, fromMicros(st.startUs), fromMicros(st.endUs), st.n, dur)
    }
    src
      .select(col(userCol).cast("long"), col(tsCol), col(tieCol).cast("long"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession,
        (Long, Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[OpenSession]) =>
          def micros(t: java.sql.Timestamp): Long =
            t.getTime / 1000 * 1000000L + t.getNanos / 1000L
          if (state.hasTimedOut) {
            val st = state.get
            // emit the open session, keep the counter (ord) for parity
            state.update(st.copy(open = false))
            if (st.open) Iterator.single(closed(uid, st)) else Iterator.empty
          } else {
            val ordered = rows.toSeq
              .map { case (_, ts, tie) => (micros(ts), tie) }
              .sortBy(identity)
            var st = state.getOption.getOrElse(
              OpenSession(0L, open = false, 0L, 0L, 0L, Long.MinValue,
                Long.MinValue))
            val out = Seq.newBuilder[
              (Long, Long, java.sql.Timestamp, java.sql.Timestamp, Long,
                Double)]
            ordered.foreach { case (t, tie) =>
              val fresh = t > st.hwUs || (t == st.hwUs && tie > st.hwTie)
              if (fresh) {
                if (!st.open) {
                  st = OpenSession(st.ord + 1, open = true, t, t, 1L, t, tie)
                } else if (t - st.endUs > gapSec * 1000000L) {
                  out += closed(uid, st)
                  st = OpenSession(st.ord + 1, open = true, t, t, 1L, t, tie)
                } else {
                  st = st.copy(endUs = t, n = st.n + 1, hwUs = t, hwTie = tie)
                }
              }
            }
            state.update(st)
            if (st.open) state.setTimeoutTimestamp(
              st.endUs / 1000L + gapSec * 1000L)
            out.result().iterator
          }
      }
      .toDF(userCol, "session", "start_ts", "end_ts", "n_events",
        "duration_sec")
  }

  /** Gap sessionization via Spark's NATIVE `session_window` — the
    * built-in counterpart of
    * [[graft.operators.EventAnalytics.sessionize]] and the
    * cross-validation of [[streamingSessionize]]: one aggregation with
    * merging session windows, usable identically in batch and
    * streaming. In streaming, state is a bounded open-session set the
    * watermark evicts (the built-in holds no cross-session counter,
    * which is exactly why it CAN evict — the custom form's persistent
    * ordinal is what forces its no-eviction contract). Append mode
    * emits each session exactly once when the watermark closes it.
    *
    * Note the built-in's window end is `last event + gap` (the gap
    * horizon), not the last event itself — callers wanting the
    * sessionize span subtract the gap from `window_end`.
    *
    * Output: (user, window_start, window_end, n_events). */
  def sessionWindowAgg(events: DataFrame, gapSec: Long,
                       watermarkDelay: String = "10 minutes",
                       userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    require(gapSec > 0, "sessionWindowAgg needs a positive gap")
    val src = if (events.isStreaming)
      events.withWatermark(tsCol, watermarkDelay) else events
    src
      .groupBy(col(userCol),
        session_window(col(tsCol), s"$gapSec seconds").as("__sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("__sw.start").as("window_start"),
        col("__sw.end").as("window_end"), col("n_events"))
  }

  /** Streaming TWAP — the live counterpart of
    * [[graft.operators.EventAnalytics.twap]]: per-key state is O(1)
    * REGARDLESS of stream length (first/last timestamp, the last
    * observation's quantized value, the running exact-integer weighted
    * sum), because the right-open step integral Σ vᵢ·(tᵢ₊₁ − tᵢ) only
    * ever needs the PREVIOUS observation to add a term — the same
    * reason the batch form is one lead window. The weighted sum
    * accumulates as an arbitrary-precision integer (state-encoded as a
    * string; gap_µs × value_µunits per term overflows a long), and the
    * final expression replays the batch operator's exact quantization
    * (HALF_UP micro-unit round) and term order, so stream ≡ batch
    * BIT-FOR-BIT under the family's in-order delivery contract (rows
    * not strictly after the (ts, tie) high-water mark are dropped,
    * same as [[streamingEwma]]/[[streamingTransitions]]).
    *
    * Update mode: each micro-batch emits one refreshed
    * (key, n_events, span_sec, twap) snapshot per key touched —
    * the live dashboard row; the final snapshot equals the batch
    * operator's output row for the key.
    *
    * Output: (user_id, n_events, span_sec, twap) at 6 dp. */
  def streamingTwap(events: DataFrame, userCol: String = "user_id",
                    tsCol: String = "ts", tieCol: String = "event_id",
                    valCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    events
      .where(col(valCol).isNotNull)
      .select(col(userCol).cast("long"), col(tsCol), col(tieCol).cast("long"),
        col(valCol).cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TwapState, (Long, Long, Double, Option[Double])](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
         state: GroupState[TwapState]) =>
          def micros(t: java.sql.Timestamp): Long =
            t.getTime / 1000 * 1000000L + t.getNanos / 1000L
          // the batch operator's micro-unit quantization: round(v*1e6, 0)
          def quant(v: Double): Long =
            BigDecimal(v * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          val ordered = rows.toSeq
            .map { case (_, ts, tie, v) => (micros(ts), tie, quant(v)) }
            .sortBy { case (t, tie, _) => (t, tie) }
          var st = state.getOption
            .getOrElse(TwapState(Long.MinValue, Long.MinValue, Long.MinValue, 0L, 0L, "0"))
          var wv = BigInt(st.wv)
          var touched = false
          ordered.foreach { case (t, tie, vq) =>
            val fresh = t > st.lastUs || (t == st.lastUs && tie > st.lastTie)
            if (fresh) {
              if (st.n > 0L) wv += BigInt(t - st.lastUs) * BigInt(st.lastVq)
              val first = if (st.n == 0L) t else st.firstUs
              st = TwapState(first, t, tie, vq, st.n + 1L, "0")
              touched = true
            }
          }
          if (touched) {
            state.update(st.copy(wv = wv.toString))
            val span = st.lastUs - st.firstUs
            // replay the batch expression's term order on doubles:
            // round(span/1e6, 6) and round(wv/1e6/span, 6), HALF_UP
            val spanSec = round6(span.toDouble / 1e6)
            val twapOpt = if (span > 0L)
              Some(round6(wv.toDouble / 1e6 / span.toDouble)) else None
            Iterator.single((uid, st.n, spanSec, twapOpt))
          } else Iterator.empty
      }
      .toDF("user_id", "n_events", "span_sec", "twap")
  }

  /** Streaming OHLC bars — the live counterpart of
    * [[graft.operators.EventAnalytics.ohlcBars]]: one watermarked
    * windowed aggregation per (key, bucket), open/close as
    * min_by/max_by over the (ts, tie) total-order struct — the same
    * single-shuffle partial-agg shape as batch, state ∝ open bars only
    * (the watermark closes a bar `delay` past its end and frees it).
    * Append mode: a bar emits exactly once, when the watermark passes
    * it — the exactly-once bar feed a downstream chart/store wants.
    * Bars match the batch operator bit-for-bit once all events are
    * flushed (same floor-aligned epoch buckets: `window()` aligns at
    * the epoch for step sizes that divide a day). */
  def streamingOhlc(events: DataFrame, stepSec: Long,
                    watermarkDelay: String = "10 minutes",
                    keyCol: String = "user_id", tsCol: String = "ts",
                    tieCol: String = "event_id",
                    valCol: String = "value"): DataFrame = {
    require(stepSec > 0, "streamingOhlc needs a positive step")
    val v = col(valCol).cast("double")
    events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol), col(tsCol),
        struct(col(tsCol), col(tieCol)).as("__ord"), v.as("__v"))
      .groupBy(window(col(tsCol), s"$stepSec seconds"), col(keyCol))
      .agg(min_by(col("__v"), col("__ord")).as("open"),
        max(col("__v")).as("high"), min(col("__v")).as("low"),
        max_by(col("__v"), col("__ord")).as("close"),
        count(lit(1)).as("n"))
      .select(col(keyCol),
        unix_timestamp(col("window.start")).as("bucket"),
        col("open"), col("high"), col("low"), col("close"), col("n"))
  }
}

case class UserTotals(user_id: Long, n: Long, total: Double)
case class FunnelTimes(times: Seq[Long])
case class LastEvent(tsMicros: Long, tie: Long, tp: String)
case class CohortSeen(cohortDays: Int, offsets: Seq[Int])
case class EwmaWindow(tsMicros: Long, tie: Long, recent: Seq[Double])
/** [[StreamOps.streamingTwap]] per-key state: first/last event time,
  * the (ts, tie) high-water mark, the last observation's micro-unit
  * value, the event count, and the exact-integer running weighted sum
  * (BigInt as string — a gap_µs × value_µunits term overflows a long). */
case class TwapState(firstUs: Long, lastUs: Long, lastTie: Long,
                     lastVq: Long, n: Long, wv: String)
/** [[StreamOps.streamingSessionize]] per-user state: the one open
  * session (ord/span/count), the in-order high-water mark, and — via
  * `open = false` after an emit — the persisted session counter. */
case class OpenSession(ord: Long, open: Boolean, startUs: Long,
                       endUs: Long, n: Long, hwUs: Long, hwTie: Long)
