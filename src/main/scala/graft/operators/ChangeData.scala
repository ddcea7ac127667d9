package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-stream materialization — the two table-maintenance views every
  * CDC consumer eventually needs downstream of the reference's
  * envelope-decode + sink pipeline (HiveOrcSink.java:34-465 lands raw
  * change records; these operators turn an accumulated change log into
  * queryable state): latest-wins snapshot compaction and SCD type-2
  * validity history.
  *
  * Both take a generic change log: one row per change event carrying the
  * business key, an event-time column, a tie-breaker that makes the
  * per-key order TOTAL (two changes in the same microsecond would
  * otherwise make the result engine-dependent), and an op column whose
  * `deleteOp` value marks tombstones. Everything else rides along as
  * payload.
  */
object ChangeData {

  /** Latest-wins snapshot compaction: one output row per live key — the
    * payload of the key's latest change event — with tombstoned keys
    * (latest op == `deleteOp`) dropped entirely. The batch equivalent of
    * replaying the change log into a keyed upsert store.
    *
    * Scale shape: ONE map-side-combining groupBy on the key — each
    * partition reduces to its local latest row per key before the
    * shuffle, so shuffle volume is ∝ distinct keys per partition, not
    * change volume. Deliberately NOT the row_number()-window form: a
    * window ships every version of every key through the shuffle and
    * sorts it; `max_by` over the (ts, tie) pair ships one row per
    * (partition, key). Hot keys (millions of updates to one row — the
    * classic CDC skew) collapse map-side instead of pinning a task.
    *
    * Output columns: keyCols ++ the remaining input columns, original
    * relative order preserved. (ts, tie) must be unique per key — the
    * totality contract that makes the result deterministic.
    *
    * `keepTombstones = true` keeps a tombstoned key's LATEST row (its
    * delete marker) instead of dropping the key — the store-side form:
    * an upsert store that forgets deletions resurrects a key the moment
    * one late pre-delete update replays. Consumers filter
    * `op != deleteOp` at read time. */
  def latestSnapshot(log: DataFrame, keyCols: Seq[String], tsCol: String,
                     tieCol: String, opCol: String,
                     deleteOp: String = "d",
                     keepTombstones: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "latestSnapshot needs at least one key column")
    Joins.requireFreeColumns("latestSnapshot", log.columns, "__r", "__ord")
    val payload = log.columns.filterNot(keyCols.contains)
    val latest = log
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(col(tsCol), col(tieCol))).as("__r"))
      .select(log.columns.map(c =>
        if (keyCols.contains(c)) col(c) else col(s"__r.$c").as(c)): _*)
    if (keepTombstones) latest else latest.where(col(opCol) =!= deleteOp)
  }

  /** SCD type-2 validity history: one row per NON-delete change event,
    * annotated with its validity interval — `valid_from` = the event's
    * own timestamp, `valid_to` = the timestamp of the key's next change
    * (of ANY op: a tombstone closes the interval it follows), null while
    * still open — and `is_current` = open AND not superseded. A delete
    * event itself emits no row; it only terminates its predecessor.
    *
    * Scale shape: one window partitioned BY KEY ordered by (ts, tie) —
    * state bounded by a single key's version count, the natural key
    * nothing in a change log exceeds — computing `lead(ts)`; then a
    * stateless filter. One shuffle keyed on the business key.
    *
    * Output columns: the input columns ++ (valid_from, valid_to,
    * is_current). Same (ts, tie) totality contract as
    * [[latestSnapshot]]. */
  def scd2History(log: DataFrame, keyCols: Seq[String], tsCol: String,
                  tieCol: String, opCol: String,
                  deleteOp: String = "d"): DataFrame = {
    require(keyCols.nonEmpty, "scd2History needs at least one key column")
    Joins.requireFreeColumns("scd2History", log.columns,
      "valid_from", "valid_to", "is_current")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    log
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .where(col(opCol) =!= deleteOp)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incremental SCD2 maintenance: fold a NEWER change batch into an
    * existing [[scd2History]] table without recomputing it — the result
    * is row-identical to `scd2History(full log)`, but the work touches
    * only the keys present in the delta. At 100 TB the history is the
    * big side; rebuilding it per ingest batch is the antipattern this
    * operator exists to avoid.
    *
    * Contract (the append-only CDC case): every delta event of a key is
    * strictly newer than all history events of that key. Violations
    * don't corrupt silently — the plan raises an error the moment a
    * key's open interval would close before it opened (`raise_error`
    * in the close expression; codegen'd comparison, zero extra passes).
    * Late/out-of-order deltas need the from-scratch rebuild.
    *
    * Scale shape: one partial-agg groupBy over the delta (first change
    * ts per key), one keyed join + one anti-join of the history against
    * that ≤|delta keys| frame — untouched keys stream through the
    * anti-join unmodified, touched open intervals close at the key's
    * first delta timestamp — plus [[scd2History]] over the delta alone
    * (window state bounded by a key's versions WITHIN the batch). No
    * shuffle is proportional to history size beyond the single
    * join-key exchange.
    *
    * `history` columns must be the delta's ++ (valid_from, valid_to,
    * is_current) — i.e. a prior [[scd2History]]/[[mergeScd2]] output. */
  def mergeScd2(history: DataFrame, delta: DataFrame, keyCols: Seq[String],
                tsCol: String, tieCol: String, opCol: String,
                deleteOp: String = "d"): DataFrame = {
    require(keyCols.nonEmpty, "mergeScd2 needs at least one key column")
    Joins.requireFreeColumns("mergeScd2", delta.columns,
      "valid_from", "valid_to", "is_current", "__f")
    val expect = delta.columns ++ Seq("valid_from", "valid_to", "is_current")
    require(history.columns.sameElements(expect),
      s"mergeScd2: history columns ${history.columns.toSeq} must be the " +
        s"delta's ++ (valid_from, valid_to, is_current)")
    val firstDelta = delta.groupBy(keyCols.map(col): _*)
      .agg(min(col(tsCol)).as("__f"))
    val untouched = history.join(firstDelta, keyCols, "left_anti")
    val closed = history.join(firstDelta, keyCols, "inner")
      .withColumn("valid_to", when(col("is_current"),
          when(col("__f") > col("valid_from"), col("__f"))
            .otherwise(raise_error(concat(
              lit("mergeScd2: delta event at or before an open interval's "
                + "valid_from="), col("valid_from").cast("string"),
              lit(" — the delta is not strictly newer; rebuild from the "
                + "full log")))))
        .otherwise(col("valid_to")))
      .withColumn("is_current", lit(false))
      .drop("__f")
    untouched
      .unionByName(closed)
      .unionByName(scd2History(delta, keyCols, tsCol, tieCol, opCol,
        deleteOp))
  }

  /** Mergeable per-key aggregate state — (cnt, vsum, vmin, vmax) per
    * key, the materialized-rollup building block. NULL values are
    * excluded (SQL aggregate semantics); a key whose values are all
    * NULL still appears with cnt 0 and NULL extrema. Derived stats
    * (avg = vsum/cnt) belong at READ time, never in the state — they
    * don't merge. */
  def aggState(df: DataFrame, keyCols: Seq[String],
               valCol: String): DataFrame = {
    require(keyCols.nonEmpty, "aggState needs at least one key column")
    graft.operators.Joins.requireFreeColumns("aggState",
      df.columns.filterNot(keyCols.contains),
      "cnt", "vsum", "vmin", "vmax")
    val v = col(valCol).cast("double")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(v).as("cnt"), sum(v).as("vsum"),
        min(v).as("vmin"), max(v).as("vmax"))
  }

  /** Incremental rollup maintenance: merge any number of [[aggState]]
    * frames into the state of their combined inputs WITHOUT rescanning
    * history — the contract is `mergeAggState(aggState(a), aggState(b))
    * ≡ aggState(a ∪ b)` (modulo float-sum association, which the
    * caller's display rounding absorbs; cnt/min/max are exact).
    *
    * Scale shape: union + ONE map-side-combining groupBy over
    * state-sized inputs (distinct keys, not raw rows) — the nightly
    * "fold today's partition into the running rollup" job touches no
    * historical raw data, which at 100 TB is the difference between a
    * delta-sized job and a full recompute. count merges as SUM(cnt),
    * sum as SUM, extrema as MIN/MAX — every field is associative and
    * commutative, so states compose in any order and any grouping. */
  def mergeAggState(states: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeAggState needs at least one state")
    states.reduce(_.unionByName(_))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("vsum")).as("vsum"),
        min(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))
  }
}
