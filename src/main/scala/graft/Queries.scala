package graft

import graft.functions.{VectorFunctions, WeightedMean}
import graft.operators.{Dedup, Joins, Multimodal, Pipelines, Similarity, TextAnalysis}
import graft.sources.CdcIngest
import graft.streaming.StreamOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The declared query corpus (SURVEY §2 / FIXTURES §3, Q1–Q44) plus the
  * extra LLM-pipeline operators, all as DataFrame plans so Catalyst owns
  * pushdown/pruning/join selection. Aliases here are the t2 contract:
  * they must match the oracle SQL in [[SparkEntry.oracleSql]] exactly.
  */
object Queries {
  import Tables._

  /** Total-order the dump/bench output without running the plan's tail
    * twice: a global sort first samples its child to build range bounds,
    * which re-executes everything after the last shuffle — for these
    * entries that tail IS the expensive stage (pair verify, per-doc
    * scoring, or a shuffle-free full-projection plan). A round-robin
    * repartition in between parks the tail behind a shuffle whose map
    * output both the sampling job and the sort reuse, at the price of
    * one extra shuffle of the (already-reduced) result rows. Applied
    * only where measurement showed the tail dominating — a pair-verify
    * join or a heavy per-row HOF over few rows; plans whose tail is a
    * post-shuffle agg/window (sampling then just re-reads map output),
    * or cheap projections over many rows, got SLOWER from the extra
    * shuffle and keep the plain orderBy. Orderings stay byte-identical:
    * every caller sorts on a unique key set, so range repartitioning
    * has no ties for the upstream partitioning to break. */
  private def stagedSort(df: DataFrame, cols: String*): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
      .orderBy(cols.map(col): _*)

  // ---- §2.1/2.2 scans, projections, filters -------------------------------

  /** Q1 (S2-S4): JSON field extraction. App.txt:59-61's envelope decode
    * re-expressed over the events table. */
  def q1(s: SparkSession, d: String): DataFrame =
    events(s, d).where(col("event_type") === "signup")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .orderBy("event_id")

  /** Q2 (S5): epoch/tz date derivation (App.txt:66-68's UTC+8 shift). */
  def q2(s: SparkSession, d: String): DataFrame =
    events(s, d).select(col("event_id"),
        (col("ts") + expr("INTERVAL 8 HOURS")).cast("date").as("d"))
      .orderBy("event_id")

  /** Q3 (P1/S11): scan + computed projection. */
  def q3(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q4 (P2): predicate families (IN/BETWEEN/LIKE/IS NULL). */
  def q4(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .where(col("o_orderstatus").isin("F", "O")
        && col("o_totalprice").between(1000, 100000)
        && col("o_orderpriority").like("1%")
        && col("o_orderdate").isNotNull)
      .select("o_orderkey").orderBy("o_orderkey")

  /** Q5 (P3/T6): distinct on a key subset. */
  def q5(s: SparkSession, d: String): DataFrame =
    events(s, d).select("user_id", "event_type").distinct()
      .orderBy("user_id", "event_type")

  /** Q6 (P4/P5): conditionals + casts. Truncating double→bigint cast. */
  def q6(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid").otherwise("high").as("band"),
        coalesce(nullif(col("c_mktsegment"), lit("")), lit("NONE")).as("seg"),
        col("c_acctbal").cast("bigint").as("bal_i"))
      .orderBy("c_custkey")

  // ---- §2.3 joins ---------------------------------------------------------

  /** Q7 (J1/J2): star join; dims broadcast (plan-asserted in tests). */
  def q7(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("orders_cnt"), round(sum("o_totalprice"), 4).as("total"))
      .orderBy("n_name")

  /** Q8 (J3): large-large join (SMJ/shuffled-hash territory). */
  def q8(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("li_cnt"), round(sum("l_extendedprice"), 4).as("gross"))
      .orderBy("o_orderstatus")

  /** Q9 (J4): left outer + count of matches. */
  def q9(s: SparkSession, d: String): DataFrame =
    customer(s, d).join(orders(s, d), col("o_custkey") === col("c_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("cnt"))
      .orderBy("c_custkey")

  /** Q10 (J5): semi ∪ anti ≡ EXISTS flag per customer. */
  def q10(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select("c_custkey")
    val o = orders(s, d).select("o_custkey")
    val has = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .withColumn("has_order", lit(true))
    val not = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .withColumn("has_order", lit(false))
    has.unionByName(not).orderBy("c_custkey")
  }

  /** Q11 (J6): cross join + theta filter (BroadcastNestedLoop at scale
    * only because both sides are tiny dims). */
  def q11(s: SparkSession, d: String): DataFrame =
    nation(s, d).crossJoin(region(s, d))
      .where(col("n_regionkey") =!= col("r_regionkey"))
      .select("n_name", "r_name").orderBy("n_name", "r_name")

  /** Q12 (J7): range join via the equi-bucket helper. */
  def q12(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val e1 = e.select(col("event_id").as("l_event_id"), col("user_id").as("l_uid"),
      col("ts").as("l_ts"))
    val e2 = e.select(col("user_id").as("r_uid"), col("ts").as("r_ts"))
    Joins.rangeJoin(e1, "l_uid", "l_ts", e2, "r_uid", "r_ts", widthSec = 600L)
      .groupBy(col("l_event_id").as("event_id"))
      .agg(count(lit(1)).as("followers"))
      .orderBy("event_id")
  }

  /** Q13 (J8): as-of join (strict) — latest prior event per user. */
  def q13(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val right = e.select(col("user_id").as("r_uid"), col("ts").as("r_ts"))
    Joins.asofLatestTs(e.select("event_id", "user_id", "ts"), "user_id", "ts",
        right, "r_uid", "r_ts", strict = true)
      .select(col("event_id"), col("asof_ts").as("prev_ts"))
      .orderBy("event_id")
  }

  // ---- §2.4 aggregations --------------------------------------------------

  /** Q14 (A1): TPC-H Q1-style grouped aggregate (partial+final auto). */
  def q14(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q15 (A2): exact count-distinct (expand+two-phase under the hood). */
  def q15(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("parts"))
      .orderBy("l_returnflag")

  /** Q16 (A4): rollup. */
  def q16(s: SparkSession, d: String): DataFrame =
    orders(s, d).rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("c"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Q17 (A5): filtered/conditional aggregates. */
  def q17(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy("user_id")
      .agg(round(sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(0.0)), 4).as("purchase_val"),
        count(when(col("event_type") === "error", lit(1))).as("errors"))
      .orderBy("user_id")

  /** Q18 (A6): collect_list made deterministic by sort_array. */
  def q18(s: SparkSession, d: String): DataFrame =
    customer(s, d).groupBy("c_nationkey")
      .agg(array_join(sort_array(collect_list(col("c_mktsegment"))), ",").as("segs"))
      .orderBy("c_nationkey")

  /** Q19 (A7): exact median. */
  def q19(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag")
      .agg(round(median(col("l_quantity")), 4).as("med"))
      .orderBy("l_returnflag")

  /** Q20 (A8): custom typed Aggregator (weighted mean) via udaf(). */
  def q20(s: SparkSession, d: String): DataFrame = {
    val wm = udaf(new WeightedMean)
    lineitem(s, d).groupBy("l_returnflag")
      .agg(round(wm(col("l_extendedprice"), col("l_quantity")), 4).as("wavg"))
      .orderBy("l_returnflag")
  }

  // ---- §2.5 window functions ----------------------------------------------

  private def wSeg = Window.partitionBy("c_mktsegment")
    .orderBy(col("c_acctbal").desc, col("c_custkey"))

  /** Q21 (W1): ranking trio. */
  def q21(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_mktsegment"), col("c_custkey"),
        row_number().over(wSeg).cast("bigint").as("rn"),
        rank().over(wSeg).cast("bigint").as("rk"),
        dense_rank().over(wSeg).cast("bigint").as("drk"))
      .orderBy("c_mktsegment", "rn")

  /** Q22 (W2): lag/lead. */
  def q22(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d).select(col("event_id"),
        round(lag("value", 1).over(w), 4).as("prev_v"),
        round(lead("value", 1).over(w), 4).as("next_v"))
      .orderBy("event_id")
  }

  /** Q23 (W3): running sum (rows frame). */
  def q23(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d).select(col("event_id"),
        round(sum("value").over(w), 4).as("run"))
      .orderBy("event_id")
  }

  /** Q24 (W4): time-range frame over epoch seconds. */
  def q24(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tss").rangeBetween(-600, 0)
    events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        unix_timestamp(col("ts")).as("tss"))
      .select(col("event_id"), round(sum("value").over(w), 4).as("win10m"))
      .orderBy("event_id")
  }

  /** Q25 (W5): top-k per group (row_number + filter). */
  def q25(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d).select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("bigint").as("rn"))
      .where(col("rn") <= 2)
      .orderBy("o_custkey", "rn")
  }

  // ---- §2.6 sort / limit / set ops ---------------------------------------

  /** Q26 (O1/O2): global top-k → TakeOrderedAndProject (plan-asserted). */
  def q26(s: SparkSession, d: String): DataFrame =
    orders(s, d).select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)

  /** Q27 (O3): union all + re-aggregate. */
  def q27(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").as("k"))
      .unionByName(supplier(s, d).select(col("s_nationkey").as("k")))
      .groupBy("k").agg(count(lit(1)).as("c"))
      .orderBy("k")

  /** Q28 (O4): intersect / except (distinct set semantics). */
  def q28(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_nationkey").as("k"))
    val su = supplier(s, d).select(col("s_nationkey").as("k"))
    val both = c.intersect(su).withColumn("tag", lit("both"))
    val custOnly = c.except(su).withColumn("tag", lit("cust_only"))
    both.unionByName(custOnly).select("tag", "k").orderBy("tag", "k")
  }

  // ---- §2.7 scalar function families -------------------------------------

  /** Q29 (F1): string family. */
  def q29(s: SparkSession, d: String): DataFrame =
    part(s, d).where(col("p_name").like("%a%"))
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        trim(col("p_name")).as("name_t"),
        substring(col("p_name"), 1, 5).as("name_s5"),
        length(col("p_name")).cast("bigint").as("name_len"),
        concat_ws("-", col("p_brand"), col("p_size").cast("string")).as("brand_size"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"))
      .orderBy("p_partkey")

  /** Q30 (F2): date/time family. */
  def q30(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(col("o_orderkey"),
        year(col("o_orderdate")).cast("bigint").as("y"),
        month(col("o_orderdate")).cast("bigint").as("mo"),
        date_trunc("month", col("o_orderdate")).as("m"),
        datediff(col("o_orderdate").cast("date"), lit("2024-01-01").cast("date"))
          .cast("bigint").as("dd"))
      .orderBy("o_orderkey")

  /** Q31 (F3): math family. Scan fan-out: eight math expressions per
    * row feed the global sort's shuffle — an under-split scan runs them
    * serially (Joins.fanOutForCompute is a no-op at scale). */
  def q31(s: SparkSession, d: String): DataFrame =
    graft.operators.Joins.fanOutForCompute(lineitem(s, d),
        Seq("l_orderkey", "l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("price_r"),
        round(abs(col("l_discount") - 0.05), 4).as("disc_abs"),
        ceil(col("l_quantity")).as("qty_ceil"),
        floor(col("l_quantity")).as("qty_floor"),
        (col("l_orderkey") % 7).as("mod7"),
        round(pow(col("l_tax") + 1, 2), 4).as("tax_pow"),
        round(sqrt(col("l_extendedprice")), 4).as("price_sqrt"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q32 (F4): JSON extraction + aggregate. */
  def q32(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select((get_json_object(col("props"), "$.k").cast("bigint") % 10).as("kb"))
      .groupBy("kb").agg(count(lit(1)).as("c"))
      .orderBy("kb")

  /** Q33 (F5): array family over the embedding column. */
  def q33(s: SparkSession, d: String): DataFrame =
    // "+ 0.0" normalizes IEEE negative zero after rounding (Spark rounds
    // -1e-6 → 0.0, DuckDB → -0.0; the oracle SQL applies the same +0)
    embeddings(s, d).select(col("vec_id"),
        size(col("embedding")).cast("bigint").as("dim"),
        (round(element_at(col("embedding"), 1).cast("double"), 4) + 0.0).as("e1"),
        (round(element_at(col("embedding"), 64).cast("double"), 4) + 0.0).as("e64"))
      .orderBy("vec_id")

  /** Q34 (F6): map functions via from_json(map<string,bigint>). */
  def q34(s: SparkSession, d: String): DataFrame =
    events(s, d).select(col("event_id"),
        element_at(from_json(col("props"), "map<string,bigint>",
          Map.empty[String, String]), "k").as("k"))
      .orderBy("event_id")

  /** Q35 (F7): hash functions as dedup keys. */
  def q35(s: SparkSession, d: String): DataFrame =
    documents(s, d).agg(count(lit(1)).as("n"),
      countDistinct(md5(col("text"))).as("n_distinct"))

  /** Q36 (F8): scalar UDF parity (tokenCount ≡ size(split(…))). */
  def q36(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"),
        TextAnalysis.tokenCountUdf(col("text")).as("ntok"))
      .orderBy("doc_id")

  // ---- §2.8 streaming ops (batch projections) ----------------------------

  /** Q37 (T2): tumbling window — same plan as the streaming path. */
  def q37(s: SparkSession, d: String): DataFrame =
    StreamOps.tumblingCounts(events(s, d)).orderBy("w_start")

  /** Q38 (T3): sliding window. */
  def q38(s: SparkSession, d: String): DataFrame =
    StreamOps.slidingCounts(events(s, d)).orderBy("w_start")

  /** Q39 (T4): session windows + per-user session index. */
  def q39(s: SparkSession, d: String): DataFrame =
    StreamOps.sessionAgg(events(s, d)).orderBy("user_id", "sid")

  // ---- §2.9 LLM-data-pipeline ops ----------------------------------------

  /** Q40 (L1): exact dedup accounting by content hash. */
  def q40(s: SparkSession, d: String): DataFrame =
    documents(s, d).groupBy("lang")
      .agg(countDistinct(md5(col("text"))).as("uniq_docs"))
      .orderBy("lang")

  /** Q41 (L2 exact form): token-set Jaccard pairs ≥ 0.6 on doc_id < 50. */
  def q41(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairs(documents(s, d).where(col("doc_id") < 50),
        "doc_id", "text", tau = 0.6)
      .orderBy("d1", "d2")

  /** Q42 (L3): cosine top-10 vs vec_id=0 via higher-order functions. */
  def q42(s: SparkSession, d: String): DataFrame =
    Similarity.cosineTopK(embeddings(s, d), "vec_id", "embedding", queryId = 0L, k = 10)

  /** L3 batch form: k-NN join — top-5 cosine neighbors for each of the
    * first 5 vectors (the small query side broadcasts; two-phase
    * skew-safe top-k per query). */
  def xKnnJoin(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Similarity.knnJoin(emb.where(col("vec_id") < 5), emb,
        "vec_id", "embedding", k = 5)
      .orderBy("qid", "rk")
  }

  /** L3 scale path of the k-NN join: sign-LSH bucketed, multi-probe at
    * hamming ≤ 1 over 8 planes (deterministic — seed-pinned planes are
    * embedded in the oracle SQL too). */
  def xAnnKnnJoin(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    // dim=64 matches the fixture (and the annBucketSql(8, 64) literals in
    // the oracle) — passing it skips the query-side dimension probe job
    Similarity.annKnnJoin(emb.where(col("vec_id") < 3), emb,
        "vec_id", "embedding", k = 5, dim = 64)
      .orderBy("qid", "rk")
  }

  /** Q43 (L4): per-language corpus stats. */
  def q43(s: SparkSession, d: String): DataFrame =
    documents(s, d).groupBy("lang")
      .agg(count(lit(1)).as("docs"),
        round(avg("n_chars"), 4).as("avg_chars"),
        round(avg(size(split(col("text"), " "))), 4).as("avg_toks"))
      .orderBy("lang")

  /** Q44 (L5): multimodal row = text metadata + embedding vector. */
  def q44(s: SparkSession, d: String): DataFrame =
    documents(s, d).where(col("lang") === "en").as("doc")
      .join(embeddings(s, d), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("lang"), col("label"),
        size(col("embedding")).cast("bigint").as("dim"), col("n_chars"))
      .orderBy("doc_id")

  /** Q45 (A4): cube — every grouping-set combination. */
  def q45(s: SparkSession, d: String): DataFrame =
    orders(s, d).cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("c"), round(sum("o_totalprice"), 4).as("sp"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Q46 (F5): higher-order array functions — fold, transform, sort+slice. */
  def q46(s: SparkSession, d: String): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val sorted = sort_array(v, asc = false)
    // "+ 0.0": negative-zero normalization (see q33)
    embeddings(s, d).select(col("vec_id"),
        (round(aggregate(v, lit(0.0), (a, x) => a + x), 4) + 0.0).as("vsum"),
        round(aggregate(transform(v, x => x * x), lit(0.0), (a, x) => a + x), 4)
          .as("sumsq"),
        (round(element_at(sorted, 1), 4) + 0.0).as("t1"),
        (round(element_at(sorted, 2), 4) + 0.0).as("t2"),
        (round(element_at(sorted, 3), 4) + 0.0).as("t3"))
      .orderBy("vec_id")
  }

  /** Q47 (F1): regexp_extract / lpad / split+join. */
  def q47(s: SparkSession, d: String): DataFrame =
    part(s, d).select(col("p_partkey"),
        regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("last_w"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        array_join(split(col("p_name"), " "), "|").as("name_bar"))
      .orderBy("p_partkey")

  /** Q48 (F6): map_keys / map_values over JSON-decoded props. kv1 looks
    * up key "k" explicitly — the oracle extracts '$.k', and a positional
    * map_values lookup would silently depend on JSON key order the moment
    * the fixture grows a second key. */
  def q48(s: SparkSession, d: String): DataFrame = {
    // STAGE the JSON parse: both output columns consume the same map, and
    // an inline `val m = from_json(...)` plants the parse subtree in each
    // of them — the plan then parses every row TWICE (r13 bench
    // postmortem: this projection was the most interpretation-sensitive
    // entry in the q-set; JsonToStructs is CodegenFallback, so a JIT
    // deopt runs the doubled parse at interpreter speed). A separate
    // projection survives CollapseProject because from_json is not in
    // its cheap-expression set — the map materializes once per row.
    val m = from_json(col("props"), "map<string,bigint>", Map.empty[String, String])
    events(s, d).select(col("event_id"), m.as("__m"))
      .select(col("event_id"),
        array_join(map_keys(col("__m")), ",").as("ks"),
        (element_at(col("__m"), "k") + 1L).as("kv1"))
      .orderBy("event_id")
  }

  /** Q49 (F2): date_add / unix_timestamp / quarter / dayofweek. */
  def q49(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(col("o_orderkey"),
        date_add(col("o_orderdate").cast("date"), 30).as("d30"),
        unix_timestamp(col("o_orderdate")).as("uts"),
        quarter(col("o_orderdate")).cast("bigint").as("qr"),
        dayofweek(col("o_orderdate")).cast("bigint").as("dow"))
      .orderBy("o_orderkey")

  /** Q50 (P-family generate): explode/lateral view — token frequency
    * top-20 (the training-corpus "frequent tokens" report). */
  def q50(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token"))
      .limit(20)

  /** Q51 (A-family pivot): per-user event counts pivoted by type
    * (explicit value list → stable schema at any scale). */
  def q51(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  /** Q52 (W1/W2 rest): ntile, percent_rank, cume_dist, first/last value. */
  def q52(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    customer(s, d).select(col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"),
        first(col("c_custkey")).over(wf).as("top_cust"),
        last(col("c_custkey")).over(wf).as("bottom_cust"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** Q53 (pipeline): overlapping token-window chunking (context-length
    * prep) — 16-token windows, 4-token overlap. */
  def q53(s: SparkSession, d: String): DataFrame =
    Pipelines.chunkByTokens(documents(s, d).where(col("doc_id") < 100),
        "doc_id", "text", chunkSize = 16, overlap = 4)
      .orderBy("doc_id", "chunk_id")

  // ---- extras: rows-only-checked operators (no portable SQL oracle) ------

  /** TF-IDF top-5 terms per doc (ranking on unrounded double scores is
    * libm-sensitive cross-engine → rows-only check + ScalaTest). */
  def xTfIdf(s: SparkSession, d: String): DataFrame =
    Pipelines.tfIdfTopTerms(documents(s, d), "doc_id", "text", k = 5)
      .orderBy("doc_id", "rk")

  /** L2 scale path: MinHash-LSH candidate pairs + exact verify. */
  def xMinHashLsh(s: SparkSession, d: String): DataFrame =
    Dedup.minHashLshPairs(documents(s, d).where(col("doc_id") < 50),
        "doc_id", "text", tau = 0.6)
      .orderBy("d1", "d2")

  /** SimHash fingerprints (md5-sourced bits → oracle-replicable). */
  def xSimHash(s: SparkSession, d: String): DataFrame =
    Dedup.simHash(documents(s, d), "doc_id", "text").orderBy("doc_id")

  /** SimHash multi-index hamming pairs (Manku block-combination tables;
    * exact at maxHamming=3 < 6 blocks by pigeonhole — the DuckDB oracle
    * is the brute all-pairs form). */
  def xSimHashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.simHashNearDupPairs(documents(s, d), "doc_id", "text")
      .transform(stagedSort(_, "d1", "d2"))

  /** L6 over hamming: SimHash multi-index pairs → connected components,
    * min-id label + cluster size (doc_id < 200 keeps the DuckDB
    * recursive-CTE oracle tractable, same cap as x_dedup_clusters). */
  def xSimHashClusters(s: SparkSession, d: String): DataFrame =
    Dedup.simHashClusters(documents(s, d).where(col("doc_id") < 200),
        "doc_id", "text")
      .orderBy("doc_id")

  /** L6: transitive near-dup clusters — LSH pairs at tau=0.8 over
    * doc_id < 200 (a window with a giant component, several 2-clusters
    * and singletons), connected components, min-id cluster label +
    * cluster size per doc. */
  def xDedupClusters(s: SparkSession, d: String): DataFrame =
    Dedup.nearDupClusters(documents(s, d).where(col("doc_id") < 200),
        "doc_id", "text", tau = 0.8)
      .orderBy("doc_id")

  /** Word-3-gram shingle Jaccard near-dup pairs. */
  def xNgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(documents(s, d).where(col("doc_id") < 50),
        "doc_id", "text", n = 3, tau = 0.01)
      .orderBy("d1", "d2")

  /** ANN top-10 via sign-LSH bucketing + exact re-rank. */
  def xAnnTopK(s: SparkSession, d: String): DataFrame =
    Similarity.annTopK(embeddings(s, d), "vec_id", "embedding", queryId = 0L, k = 10)

  /** IVF fixture parameters shared by [[xIvfTopK]] and the dump-time
    * DuckDB oracle in [[SparkEntry]] — defined once so query and oracle
    * cannot silently desynchronize (they must train identical centroids
    * and probe identical cells for the hash compare to hold). */
  private[graft] object IvfFixture {
    val nCells = 16; val nProbe = 4; val k = 10
    val queryId = 0L; val lloydIters = 2; val trainCap = 4096
  }

  /** ANN top-10 via IVF cells (k-means trained, nProbe nearest cells). */
  def xIvfTopK(s: SparkSession, d: String): DataFrame =
    Similarity.ivfTopK(embeddings(s, d), "vec_id", "embedding",
      queryId = IvfFixture.queryId, k = IvfFixture.k,
      nCells = IvfFixture.nCells, nProbe = IvfFixture.nProbe,
      lloydIters = IvfFixture.lloydIters, trainCap = IvfFixture.trainCap)

  /** [[xIvfTopK]] scored through the VERSIONED index artifact: the same
    * [[IvfFixture]] training, but the centroids pass through
    * [[Similarity.ivfSave]] → [[Similarity.ivfLoad]] before routing —
    * the train-once / mount-everywhere production path. The oracle is
    * the same dump-time SQL as x_ivf_topk (identical trained
    * centroids), so any lossy step in the artifact round-trip breaks
    * the hash. */
  def xIvfTopKLoaded(s: SparkSession, d: String): DataFrame = {
    val cs = Similarity.ivfTrain(embeddings(s, d), "vec_id", "embedding",
      IvfFixture.nCells, IvfFixture.lloydIters, IvfFixture.trainCap)
    // app-keyed dir, reused across bench reps (a fresh temp dir per rep
    // would leak one artifact per run); re-saving version 1 replaces
    // its partition — the idempotent-artifact contract under test
    val path = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_ivf_index_${s.sparkContext.applicationId}"
    Similarity.ivfSave(s, cs, path, version = 1L)
    val (loaded, _) = Similarity.ivfLoad(s, path)
    Similarity.ivfTopKWith(embeddings(s, d), "vec_id", "embedding",
      queryId = IvfFixture.queryId, k = IvfFixture.k, loaded,
      nProbe = IvfFixture.nProbe)
  }

  /** Token-budget fixture parameters shared by [[xTokenBudget]] and its
    * DuckDB oracle string in [[SparkEntry]] — one source of truth, so a
    * parameter tweak can never silently break hash parity. */
  private[graft] object TokenBudgetFixture {
    val budgetTokens = 50000L; val alpha = 0.5
  }

  /** Data-card fixture parameters shared by [[xDataCard]] and the
    * dataCardOracleSql generator in [[SparkEntry]] — same
    * one-source-of-truth contract as [[IvfFixture]]. Values deliberately
    * match the standalone entries' fixtures (x_gopher's minWords,
    * x_zipf's topN, x_curation_funnel's keep256) so the card equals the
    * dashboards it summarizes. */
  private[graft] object DataCardFixture {
    val minWords = 20; val zipfTopN = 500; val keep256 = 192
  }

  /** SemDeDup fixture parameters shared by [[xSemDedup]] and the
    * dump-time oracle generator — same pin rationale as [[IvfFixture]]:
    * Spark and SQL must train identical centroids for the hash compare
    * to hold. tau=0.4 targets the corpus's planted near-dup band (the
    * same threshold x_embed_neardup verifies exhaustively). */
  private[graft] object SemDedupFixture {
    val tau = 0.4; val nCells = 16; val lloydIters = 2; val trainCap = 4096
    val dropFrac = 0.1 // D4 per-cell prototype cut, shared with the oracle
  }

  /** Semantic dedup, SemDeDup-style: k-means cells + within-cell cosine
    * prune keeping the low-centroid-similarity exemplar. Every vector
    * is labeled (cell, cent_cos, keep). */
  def xSemDedup(s: SparkSession, d: String): DataFrame =
    Similarity.semDeDup(embeddings(s, d), "vec_id", "embedding",
      tau = SemDedupFixture.tau, nCells = SemDedupFixture.nCells,
      lloydIters = SemDedupFixture.lloydIters,
      trainCap = SemDedupFixture.trainCap)
      .orderBy("vec_id")

  /** D4 dedup-then-diversify: [[xSemDedup]]'s prune plus the per-cell
    * prototype cut (top 10% of kept rows by centroid cosine). Every
    * vector labeled dup | proto | kept. */
  def xD4Prune(s: SparkSession, d: String): DataFrame =
    Similarity.d4Prune(embeddings(s, d), "vec_id", "embedding",
      tau = SemDedupFixture.tau, dropFrac = SemDedupFixture.dropFrac,
      nCells = SemDedupFixture.nCells,
      lloydIters = SemDedupFixture.lloydIters,
      trainCap = SemDedupFixture.trainCap)
      .orderBy("vec_id")

  /** PQ fixture parameters shared by [[xPqTopK]] and the dump-time
    * DuckDB oracle in [[SparkEntry]] (same one-source-of-truth contract
    * as [[IvfFixture]]). */
  private[graft] object PqFixture {
    val m = 4; val ks = 16; val k = 10
    val queryId = 0L; val lloydIters = 2; val trainCap = 4096
  }

  /** ANN top-10 via product quantization: m=4 subspaces × 16-centroid
    * codebooks, ADC cosine scoring. */
  def xPqTopK(s: SparkSession, d: String): DataFrame =
    Similarity.pqTopK(embeddings(s, d), "vec_id", "embedding",
      queryId = PqFixture.queryId, k = PqFixture.k,
      m = PqFixture.m, ks = PqFixture.ks,
      lloydIters = PqFixture.lloydIters, trainCap = PqFixture.trainCap)

  /** [[xIvfAdcTopK]] through BOTH versioned artifacts: coarse
    * centroids via [[Similarity.ivfSave]]/[[Similarity.ivfLoad]],
    * codebooks via pqSave/pqLoad — the mounted form of the
    * billion-scale IVFADC layout, against the same dump-time oracle
    * as the trained entry. */
  def xIvfAdcTopKLoaded(s: SparkSession, d: String): DataFrame = {
    val coarse = Similarity.ivfTrain(embeddings(s, d), "vec_id",
      "embedding", IvfFixture.nCells, IvfFixture.lloydIters,
      IvfFixture.trainCap)
    val cbs = Similarity.pqTrain(embeddings(s, d), "vec_id", "embedding",
      PqFixture.m, PqFixture.ks, PqFixture.lloydIters, PqFixture.trainCap)
    val path = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_ivfadc_index_${s.sparkContext.applicationId}"
    Similarity.ivfSave(s, coarse, s"$path/coarse", version = 1L)
    Similarity.pqSave(s, cbs, s"$path/pq", version = 1L)
    val (coarseL, _) = Similarity.ivfLoad(s, s"$path/coarse")
    val (cbsL, _) = Similarity.pqLoad(s, s"$path/pq")
    Similarity.ivfadcTopKWith(embeddings(s, d), "vec_id", "embedding",
      queryId = PqFixture.queryId, k = PqFixture.k, coarseL, cbsL,
      nProbe = IvfFixture.nProbe)
  }

  /** [[xPqTopK]] scored through the VERSIONED codebook artifact
    * ([[Similarity.pqSave]] → [[Similarity.pqLoad]]) — the
    * [[xIvfTopKLoaded]] contract for the PQ index. */
  def xPqTopKLoaded(s: SparkSession, d: String): DataFrame = {
    val cbs = Similarity.pqTrain(embeddings(s, d), "vec_id", "embedding",
      PqFixture.m, PqFixture.ks, PqFixture.lloydIters, PqFixture.trainCap)
    val path = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_pq_index_${s.sparkContext.applicationId}"
    Similarity.pqSave(s, cbs, path, version = 1L)
    val (loaded, _) = Similarity.pqLoad(s, path)
    Similarity.pqTopKWith(embeddings(s, d), "vec_id", "embedding",
      queryId = PqFixture.queryId, k = PqFixture.k, loaded)
  }

  /** ANN top-10 via IVFADC: IVF cell routing ([[IvfFixture]] coarse
    * params) composed with PQ ADC scoring ([[PqFixture]] code params) —
    * both fixture objects stay the single source of truth so the three
    * ANN oracles can never train different structures. */
  def xIvfAdcTopK(s: SparkSession, d: String): DataFrame =
    Similarity.ivfadcTopK(embeddings(s, d), "vec_id", "embedding",
      queryId = PqFixture.queryId, k = PqFixture.k,
      nCells = IvfFixture.nCells, nProbe = IvfFixture.nProbe,
      m = PqFixture.m, ks = PqFixture.ks,
      lloydIters = PqFixture.lloydIters, trainCap = PqFixture.trainCap)

  /** Embedding-cosine near-dup pairs (threshold fits fixture cosine range). */
  def xEmbedNearDup(s: SparkSession, d: String): DataFrame =
    Similarity.cosineNearDupPairs(embeddings(s, d), "vec_id", "embedding", tau = 0.4)
      .orderBy("v1", "v2")

  /** L6 over cosine: embedding near-dup pairs at tau=0.4 → connected
    * components, min-id cluster label + cluster size per vector —
    * semantic dedup over the embedding space. */
  def xCosineClusters(s: SparkSession, d: String): DataFrame =
    Similarity.cosineClusters(embeddings(s, d), "vec_id", "embedding", tau = 0.4)
      .orderBy("vec_id")

  /** BM25 top-10 documents for a fixed 3-term query (lexical retrieval
    * over the corpus — seed expansion / contamination checks). */
  def xBm25(s: SparkSession, d: String): DataFrame =
    TextAnalysis.bm25TopDocs(documents(s, d), "doc_id", "text",
        Seq("vector", "stream", "merge"), k = 10)
      .orderBy("rk")

  /** Language-ID heuristic vs labeled lang (per-language confusion
    * counts); the distinct-token array is staged so the per-language
    * intersects share one split+distinct per row. */
  def xLangId(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"), array_distinct(
        TextAnalysis.whitespaceTokens(lower(col("text")))).as("__lt"))
      .select(col("lang"),
        TextAnalysis.langIdGuessFromTokens(col("__lt")).as("lang_pred"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
      .orderBy("lang", "lang_pred")

  /** Deterministic synthetic URL per document (the fixture corpus has
    * no URL column): three modulo-selected shapes exercising every
    * normalization rule — uppercase scheme/host + default port +
    * tracking param + fragment; `www.` + trailing slash + all-tracking
    * query; non-default port (kept) + mixed kept/dropped params. */
  private def syntheticUrl: Column = {
    val k = (col("doc_id") % 7).cast("string")
    val id = col("doc_id").cast("string")
    when(col("doc_id") % 3 === 0,
        concat(lit("HTTP://News.Example"), k, lit(".COM:80/A/B/?gclid=123&q="),
          id, lit("#x")))
      .when(col("doc_id") % 3 === 1,
        concat(lit("https://WWW.Shop"), k, lit(".com/items/"), id,
          lit("/?utm_campaign=c")))
      .otherwise(
        concat(lit("https://blog"), k, lit(".example.org:8080/p?id="), id,
          lit("&ref=tw")))
  }

  /** URL canonicalization over the synthetic per-doc URLs. */
  def xUrlNormalize(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"), syntheticUrl.as("url"))
      .select(col("doc_id"), col("url"),
        Pipelines.urlNormalize(col("url")).as("url_norm"),
        Pipelines.urlDomain(col("url")).as("domain"))
      .orderBy("doc_id")

  /** Per-domain curation stats over the synthetic URLs. */
  def xDomainStats(s: SparkSession, d: String): DataFrame =
    Pipelines.domainStats(
        documents(s, d).select(col("doc_id"), col("text"), col("lang"),
          syntheticUrl.as("url")),
        "url", "text", "lang")
      .orderBy("domain")

  /** Trained char-trigram language-ID over documents augmented with a
    * per-language stopword phrase: the fixture's base text is
    * language-blind (one 31-token English-ish vocabulary for every
    * lang label), so the appended phrase is the character-level signal
    * the model must learn — and the same phrases are what the
    * [[TextAnalysis.langIdGuess]] stopword heuristic keys on, making
    * the trained-vs-heuristic accuracy comparison fair. Trains on
    * doc_id % 5 != 0, predicts every doc. */
  /** Documents with a per-language stopword phrase appended — the
    * labeled-training fixture shared by the trained lang-ID and the
    * quality-LR classifier (and their dump-time oracles). */
  private[graft] def langMarkedDocs(s: SparkSession, d: String): DataFrame = {
    val marker = when(col("lang") === "en", "the and of to a in")
      .when(col("lang") === "es", "el la de que y en")
      .when(col("lang") === "de", "der die und das von zu")
      .when(col("lang") === "fr", "le la de et un les")
      .otherwise("的 了 是 在 我 有")
    documents(s, d).select(col("doc_id"), col("lang"),
      concat_ws(" ", col("text"), marker).as("text"))
  }

  def xLangIdNgram(s: SparkSession, d: String): DataFrame = {
    val aug = langMarkedDocs(s, d)
    // train on the doc_id % 5 == 1 slice (20%): the labeled-training cost
    // is the same trigram explode the scoring pass pays, so the slice
    // width is a direct multiplier on total cost — 20% carries the
    // marker signal at full accuracy (ScoringSuite) at 1/4 the train
    // pass of the old %5 != 0 (80%) slice
    TextAnalysis.langIdNgram(aug, aug.where(col("doc_id") % 5 === 1),
        "doc_id", "text", "lang")
      .orderBy("doc_id")
  }

  /** Trained quality-LR score pass: binary label = (lang == 'en') over
    * the marker-augmented docs, trained on doc_id % 5 != 0, scored on
    * every doc. Deterministic end to end (seed-free GD), so the learned
    * weights ship into the dump-time oracle as literals. */
  def xQualityLr(s: SparkSession, d: String): DataFrame = {
    val aug = langMarkedDocs(s, d)
      .withColumn("label", col("lang") === "en")
    val (w, b) = TextAnalysis.qualityLrTrain(
      aug.where(col("doc_id") % 5 =!= 0), "doc_id", "text", "label")
    TextAnalysis.qualityLrScore(aug, "doc_id", "text", w, b)
      .orderBy("doc_id")
  }

  /** Per-doc token/char/quality stats. The rolling xxhash fingerprint is
    * dropped from this surface (xxhash64 has no portable oracle; it is
    * covered by OperatorsSuite's order-sensitivity test) so the remaining
    * columns hash-match the DuckDB oracle. */
  def xTokenStats(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenStats(documents(s, d), "doc_id", "text")
      .drop("fp").transform(stagedSort(_, "doc_id"))

  /** C4 bad-word screen over the fixture vocabulary: "slow"/"dup"/
    * "spill" stand in for the blocklist — common enough in the
    * synthetic corpus that both branches of `keep` are exercised. */
  val blocklistWords: Seq[String] = Seq("slow", "dup", "spill")
  def xBlocklist(s: SparkSession, d: String): DataFrame =
    TextAnalysis.blocklistScreen(documents(s, d), "doc_id", "text",
        blocklistWords)
      .orderBy("doc_id")

  /** Markup-strip over a synthesized HTML wrapper (same posture as
    * x_pii_scrub: the fixture has no raw HTML, so the query plants a
    * deterministic page — script/style with content, a comment,
    * attributes, double-encoded entities — around each doc's prefix
    * and strips it back to text). */
  def xHtmlStrip(s: SparkSession, d: String): DataFrame = {
    val raw = concat(
      lit("<html><head><style>p { color: red; }</style>" +
        "<script type=\"text/javascript\">if (1 < 2) { alert(\"x\"); }</script>" +
        "</head><body><!-- boilerplate --><h1>Doc "), col("doc_id"),
      lit("</h1><p class=\"body\">"), substring(col("text"), 1, 60),
      lit(" &amp; tail&nbsp;&lt;b&gt; &amp;lt;no-tag&amp;gt;</p></body></html>"))
    documents(s, d)
      .select(col("doc_id"), Pipelines.stripMarkup(raw).as("clean"))
      .orderBy("doc_id")
  }

  /** Multimodal plumbing: binary payload + typed meta + batched decode.
    * Surface limited to oracle-checkable columns (kind, payload bytes,
    * decoded feature dim); the xxhash-derived stub width/height are
    * asserted range+determinism in OperatorsSuite instead. */
  def xMultimodal(s: SparkSession, d: String): DataFrame = {
    val withPayload = Multimodal.withMeta(
      Multimodal.withBinaryPayload(documents(s, d), "text"))
    val feats = Multimodal.decodeFeatures(withPayload, "doc_id", dim = 16)
    withPayload.select(col("doc_id"), col("meta.kind").as("kind"),
        col("meta.bytes").as("bytes"))
      .join(feats, "doc_id")
      .select(col("doc_id"), col("kind"), col("bytes"),
        size(col("feature")).cast("bigint").as("feat_dim"))
      .orderBy("doc_id")
  }

  /** Frame sampling (L5): every 2nd 64-byte frame of the payload as its
    * own row, base64'd for the oracle — keyframe extraction as pure
    * column algebra over the binary column. */
  def xFrameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.withBinaryPayload(
          documents(s, d).where(col("doc_id") < 50), "text"),
        "doc_id", frameBytes = 64, stride = 2)
      .select(col("doc_id"), col("frame_idx"),
        hex(col("frame")).as("frame_hex"))
      .orderBy("doc_id", "frame_idx")

  /** Multimodal near-dup (L5 × L2h): perceptual chunk-simhash
    * fingerprints over the binary payload into the shared Manku
    * hamming front — image-dedup-shaped pair detection with zero
    * decode. Oracle is the brute all-pairs hamming form. */
  def xMediaPhash(s: SparkSession, d: String): DataFrame =
    Multimodal.mediaNearDupPairs(
        Multimodal.withBinaryPayload(documents(s, d), "text"), "doc_id")
      .orderBy("d1", "d2")

  /** S6 sink throughput surface: write events as a date-partitioned ORC
    * warehouse table (the reference's entire job, HiveOrcSink.java:34-465)
    * and read it back aggregated — puts ORC write+read throughput into
    * the bench alongside query throughput. The write and read phases are
    * also exposed separately ([[xOrcSinkWrite]]/[[xOrcSinkRead]], bench-
    * only) so sink throughput is a first-class number, not a blend. */
  def xOrcSinkRoundtrip(s: SparkSession, d: String): DataFrame = {
    writeEventsOrc(s, d)
    readSinkAgg(s)
  }

  /** Per-application sink output dir: concurrent Verify/Bench/test
    * processes on one machine must not overwrite each other's files
    * mid-read. */
  private def sinkDir(s: SparkSession): String =
    s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_sink_bench_${s.sparkContext.applicationId}"

  private def writeEventsOrc(s: SparkSession, d: String): Unit = {
    val src = events(s, d).withColumn("c_date",
      date_format(col("ts"), "yyyy-MM-dd"))
    // overwrite (not append): keeps the bench idempotent across runs
    src.write.format("orc").mode("overwrite")
      .partitionBy("c_date").save(sinkDir(s))
  }

  private def readSinkAgg(s: SparkSession): DataFrame =
    // partition discovery type-infers c_date=2024-01-01 dirs as DATE;
    // cast back to the string form the sink wrote (and the oracle emits)
    s.read.orc(sinkDir(s))
      .withColumn("c_date", date_format(col("c_date"), "yyyy-MM-dd"))
      .groupBy("c_date").agg(count(lit(1)).as("n"))
      .orderBy("c_date")

  /** Bench-only write phase: the timed work is the eager partitioned ORC
    * write; the returned frame is a trivial marker. */
  def xOrcSinkWrite(s: SparkSession, d: String): DataFrame = {
    writeEventsOrc(s, d)
    s.range(1).toDF("ok")
  }

  /** Bench-only read phase over [[xOrcSinkWrite]]'s output (writes it
    * first if absent, so the entry also works standalone). */
  def xOrcSinkRead(s: SparkSession, d: String): DataFrame = {
    val dir = new java.io.File(sinkDir(s))
    if (!dir.isDirectory) writeEventsOrc(s, d)
    readSinkAgg(s)
  }

  /** Deterministic md5-prefix train/val/test split — per-row assignment
    * (the strongest checkable surface: every doc's split, not just the
    * ratio). The xxhash64 scale variant is differentially tested against
    * this one in PipelinesSuite. */
  def xSplit(s: SparkSession, d: String): DataFrame =
    Pipelines.splitByMd5Prefix(documents(s, d).select("doc_id"), "doc_id")
      .orderBy("doc_id")

  /** Deterministic 25% sample (first md5 byte < 64) — content-addressed
    * row survival, reproducible outside Spark. */
  def xSample(s: SparkSession, d: String): DataFrame =
    Pipelines.sampleByMd5(documents(s, d).select("doc_id", "lang"),
        "doc_id", keep256 = 64)
      .orderBy("doc_id")

  /** PII scrub over synthetic-but-deterministic dirty text: each doc's
    * text is prefixed with a doc-keyed email, URL, phone and SSN, then
    * scrubbed — exercises all four patterns on every row (the corpus
    * itself contains no PII, which would make the scrub a no-op). */
  def xPiiScrub(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"),
        Pipelines.scrubPii(concat(
          lit("contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or https://ex.example/p/"),
          col("doc_id").cast("string"),
          lit("?q=1 call 555-123-4567 ssn 123-45-6789 :: "),
          substring(col("text"), 1, 40))).as("clean"))
      .orderBy("doc_id")

  /** Corpus-wide top-20 token bigrams — the n-gram frequency profile a
    * contamination / boilerplate audit starts from. Bigrams via
    * zip_with over two shifted slices (no UDF, no sequence-descending
    * edge case), one explode + one groupBy, TakeOrdered top-k. */
  def xBigramTopK(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat_ws(" ", a, b))
    documents(s, d).select(explode(bigrams).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("bigram")).limit(20)
  }

  /** Symmetric int8 embedding quantization QA: per-vector max-abs scale,
    * q = round(x·scale) ∈ [-127,127], reporting the quantized extremes,
    * checksum, scale and max dequantization error — the compression
    * step before an ANN index ships, with its error bound measured
    * rather than assumed. Pure HOF column algebra, no shuffle. */
  def xEmbedQuant(s: SparkSession, d: String): DataFrame = {
    // each intermediate staged in its own projection: inlined, the
    // nested HOF lambdas re-derive scale (and under it the max-abs
    // array pass) PER ELEMENT — O(dim²) work per row; staged, each is
    // one array pass (CollapseProject keeps multiply-referenced
    // non-cheap aliases staged)
    val (e, sc, q) = (col("__e"), col("__sc"), col("__q"))
    embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("__e"))
      .withColumn("__ma", array_max(transform(e, x => abs(x))))
      .withColumn("__sc",
        when(col("__ma") === 0d, lit(1.0)).otherwise(lit(127.0) / col("__ma")))
      .withColumn("__q", transform(e, x => round(x * sc, 0).cast("long")))
      .select(col("vec_id"),
        aggregate(q, lit(0L), (acc, v) => acc + v).as("qsum"),
        array_min(q).as("qmin"), array_max(q).as("qmax"),
        round(sc, 4).as("scale_r"),
        round(array_max(zip_with(e, q, (x, qq) => abs(x - qq / sc))), 4)
          .as("maxerr"))
      .orderBy("vec_id")
  }

  /** Winnowing fingerprints (k=8, w=4) over doc_id < 100 — one row per
    * (doc, distinct window-min gram hash); equal fingerprints across
    * docs witness a shared substring of length ≥ k+w-1 = 11 chars. */
  def xWinnow(s: SparkSession, d: String): DataFrame =
    TextAnalysis.winnowFingerprints(
        documents(s, d).where(col("doc_id") < 100), "doc_id", "text")
      .orderBy("doc_id", "fp")

  /** Incremental exact dedup: a delta of fresh docs (doc_id ≥ 400) plus
    * verbatim re-crawls (copies of docs 100-149 under new ids) against
    * the seen corpus (doc_id < 400) — re-crawls drop, fresh survive.
    * Bloom prefilter + exact anti-join verify (output is exact). */
  def xIncrementalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val seen = docs.where(col("doc_id") < 400)
    val fresh = docs.where(col("doc_id") >= 400).select("doc_id", "text")
    val recrawls = docs.where(col("doc_id").between(100, 149))
      .select((col("doc_id") + 10000L).as("doc_id"), col("text"))
    Dedup.incrementalExactDedup(fresh.unionByName(recrawls), seen,
        "text", "text", expectedSeen = 10000L)
      .select("doc_id").orderBy("doc_id")
  }

  /** Winnowing contamination pairs over doc_id < 100: docs sharing ≥ 3
    * fingerprints after dropping boilerplate fps seen in > 50 docs —
    * substring-overlap detection as a pure fingerprint equi-join. */
  def xWinnowPairs(s: SparkSession, d: String): DataFrame =
    TextAnalysis.winnowNearDupPairs(
        documents(s, d).where(col("doc_id") < 100), "doc_id", "text",
        minShared = 3, maxDocFreq = 50)
      .orderBy("d1", "d2")

  /** Decontamination: eval slice (doc_id < 20) probed against the
    * training slice (20 ≤ doc_id < 200) — eval docs sharing ≥ 3 winnow
    * fingerprints with a training doc are contaminated. */
  def xDecontam(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    TextAnalysis.decontaminationJoin(
        docs.where(col("doc_id") < 20),
        docs.where(col("doc_id") >= 20 && col("doc_id") < 200),
        "doc_id", "text")
      .orderBy("eval_id", "corpus_id")
  }

  /** L6 curation tail: near-dup clusters at tau=0.8 (the x_dedup_clusters
    * graph), each cluster reduced to its best-quality representative —
    * keep-the-cleanest-copy dedup instead of min-id convention. */
  def xDedupBest(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).where(col("doc_id") < 200)
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text", tau = 0.8)
    val scored = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("q"))
    Dedup.keepBestPerCluster(clusters, scored, "doc_id", "q")
      .withColumnRenamed("rep_score", "rep_q")
      .orderBy("cluster_id")
  }

  /** Gopher-style repetition stats (L4) over synthesized multi-line
    * docs: the corpus text re-lined as 4-token lines plus a boilerplate
    * line repeated top and bottom (the web-page template pattern) — so
    * dup-line / dup-char / n-gram repetition measures carry real signal
    * on every row instead of trivially zeroing on the one-line fixture
    * text. The lining is deterministic token arithmetic replicated by
    * the oracle. */
  def xRepetition(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    val chunkLines = transform(
      sequence(lit(1), greatest(size(toks), lit(1)), lit(4)),
      i => concat_ws(" ", slice(toks, i, lit(4))))
    val lined = documents(s, d).where(col("doc_id") < 200)
      .select(col("doc_id"),
        concat(lit("boilerplate header line\n"),
          concat_ws("\n", chunkLines),
          lit("\nboilerplate header line")).as("lined"))
    TextAnalysis.repetitionStats(lined, "doc_id", "lined").orderBy("doc_id")
  }

  /** Gopher quality-rule flags (L4) over the corpus: raw signals + the
    * per-rule booleans + the conjunction. minWords lowered to 20 so the
    * fixture's short docs split the flag both ways (sf docs run ~25-90
    * words; the production default 50 stays in the operator). */
  def xGopher(s: SparkSession, d: String): DataFrame =
    TextAnalysis.gopherQualityFlags(documents(s, d), "doc_id", "text",
        minWords = 20)
      .orderBy("doc_id")

  /** Sequence packing (corpus prep): docs laid end-to-end per md5 shard
    * in id order and cut into 256-token context windows — every doc's
    * window span and offset checked row-by-row. The md5 shard keeps the
    * whole packing engine-portable; production uses the xxhash64 shard
    * via [[graft.operators.Pipelines.packSequences]]. */
  def xPack(s: SparkSession, d: String): DataFrame = {
    val withShard = documents(s, d).select(col("doc_id"),
      size(split(col("text"), " ")).as("nt"),
      pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("long"), lit(8L)).as("sh"))
    Pipelines.packSequencesByShard(withShard, "doc_id", "nt",
        capacity = 256, shardCol = "sh")
      .orderBy("doc_id")
  }

  /** Deterministic domain-mixture sampling: per-language keep rates
    * (en all, de half, zh quarter, default 3/4) as content-addressed
    * md5 thresholds — the temperature re-weighting step of a training
    * mixture, append-stable and engine-portable. */
  def xMixture(s: SparkSession, d: String): DataFrame =
    Pipelines.mixtureSampleByMd5(documents(s, d).select("doc_id", "lang"),
        "lang", "doc_id",
        rates = Map("en" -> 256, "zh" -> 64, "de" -> 128), default = 192)
      .orderBy("doc_id")

  /** Deterministic training-order shuffle: per-row content-addressed
    * (shard, position) — the reproducible curriculum order, checked
    * row-by-row. */
  def xShuffle(s: SparkSession, d: String): DataFrame =
    Pipelines.orderForTraining(documents(s, d).select("doc_id"), "doc_id")
      .orderBy("doc_id")

  /** Self-trained bigram-LM fluency score (CCNet-style): per-doc mean
    * negative log-likelihood under the corpus's own add-one bigram LM.
    * Docs with < 2 tokens carry no bigrams and are absent. */
  def xLmScore(s: SparkSession, d: String): DataFrame =
    TextAnalysis.lmScoreBigram(documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  /** DSIR importance weights with lang='en' as the target
    * distribution: hashed-unigram (1024 md5 buckets) log-ratio of
    * target vs raw corpus, mean per doc — en docs score highest. */
  def xDsir(s: SparkSession, d: String): DataFrame =
    TextAnalysis.dsirWeights(documents(s, d), "doc_id", "text",
        col("lang") === "en")
      .orderBy("doc_id")

  /** Per-source curation decision table: volume, mean length, verbatim
    * dup fraction, language spread. */
  def xSourceStats(s: SparkSession, d: String): DataFrame =
    Pipelines.sourceStats(documents(s, d), "source", "text", "lang")
      .orderBy("source")

  /** Line-level boilerplate removal over re-lined docs (same lining as
    * x_repetition: 4-token chunk lines + a header/footer line shared by
    * every doc): the shared line exceeds docFreq 10 and is stripped
    * from all docs; content lines survive unless near-dup docs push
    * them over the cap. */
  def xLineDedup(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    val chunkLines = transform(
      sequence(lit(1), greatest(size(toks), lit(1)), lit(4)),
      i => concat_ws(" ", slice(toks, i, lit(4))))
    val lined = documents(s, d).where(col("doc_id") < 200)
      .select(col("doc_id"),
        concat(lit("boilerplate header line\n"),
          concat_ws("\n", chunkLines),
          lit("\nboilerplate header line")).as("lined"))
    Dedup.dropBoilerplateLines(lined, "doc_id", "lined", maxDocFreq = 10)
      .orderBy("doc_id")
  }

  /** Per-doc token-distribution entropy + type-token ratio over the
    * corpus — the cheap repetitiveness screen. */
  def xTokenEntropy(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenEntropy(documents(s, d), "doc_id", "text")
      .transform(stagedSort(_, "doc_id"))

  /** Top-100 vocabulary coverage curve over the corpus (tokenizer
    * prep): rank, count, cumulative instance share. */
  def xVocabCoverage(s: SparkSession, d: String): DataFrame =
    Pipelines.vocabCoverage(documents(s, d), "text", k = 100)
      .orderBy("rank")

  /** Per-language z-score of doc token counts — metric normalization
    * within the group before any corpus-global cut. */
  def xZScore(s: SparkSession, d: String): DataFrame =
    Pipelines.groupZScore(
        documents(s, d).select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("nt")),
        "lang", "nt")
      .orderBy("doc_id")

  /** Hybrid retrieval: RRF fusion of the BM25 top-20 (lexical, over
    * documents) with the cosine top-20 against query vector 0
    * (semantic, over embeddings; vec_id doubles as doc id) — the
    * two-ranker hybrid-search composition, fused top-10. */
  def xRrfFusion(s: SparkSession, d: String): DataFrame = {
    val lex = TextAnalysis.bm25TopDocs(documents(s, d), "doc_id", "text",
      Seq("vector", "stream", "merge"), k = 20)
    val sem = Similarity.cosineTopK(embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 20)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cos").desc, col("vec_id"))).cast("long"))
    Similarity.rrfFuse(lex, "doc_id", "rk", sem, "vec_id", "rk", k = 10)
      .orderBy("rank")
  }

  /** Per-language 90th-percentile length cut: exact discrete quantile
    * from the (lang, token-count) histogram, keep flag per doc. */
  def xQuantileCut(s: SparkSession, d: String): DataFrame =
    Pipelines.quantileCut(
        documents(s, d).select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("nt")),
        "lang", "nt", p = 0.9)
      .orderBy("doc_id")

  /** Normalized exact dedup over documents plus synthesized
    * casing/punctuation variants of docs < 50 (the fixture corpus has
    * no verbatim dups, so the variants are what the normalizer must
    * collapse; verbatim-hash dedup sees them as distinct). Two planted
    * degenerate rows — null text and punctuation-only text — exercise
    * the singleton passthrough (null norm_h, keep = true). */
  def xNormDedup(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    val variants = documents(s, d).where(col("doc_id") < 50)
      .select((col("doc_id") + 10000L).as("doc_id"),
        concat(upper(col("text")), lit(" !!")).as("text"))
    val degenerate = s.range(1)
      .select(lit(20000L).as("doc_id"), lit(null).cast("string").as("text"))
      .unionByName(s.range(1)
        .select(lit(20001L).as("doc_id"), lit("!!! ??? ...").as("text")))
    Dedup.normalizedDedup(
        base.unionByName(variants).unionByName(degenerate), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Exact substring dedup over documents plus planted repeats: the
    * fixture corpus has no natural repeated 8-token spans (31-token
    * vocabulary, random draws), so two kinds are synthesized — self-
    * doubled variants of docs < 20 (id+30000; every span repeats the
    * base doc, which keeps the canonical copy) and a literal 12-token
    * span shared by two otherwise-distinct planted docs (40000 keeps
    * it, 40001 loses exactly the span, prefix/suffix survive). */
  def xSubstringDedup(s: SparkSession, d: String): DataFrame = {
    val span = "sp1 sp2 sp3 sp4 sp5 sp6 sp7 sp8 sp9 sp10 sp11 sp12"
    // fan out the full-corpus branch BEFORE the union: the union's
    // partition count (corpus + fixture branches) masks the corpus
    // scan's under-split, so the operator itself can't detect it
    val base = graft.operators.Joins.fanOutForCompute(
      documents(s, d).select(col("doc_id"), col("text")), Seq("doc_id"))
    val doubled = documents(s, d).where(col("doc_id") < 20)
      .select((col("doc_id") + 30000L).as("doc_id"),
        concat_ws(" ", col("text"), col("text")).as("text"))
    val planted = s.range(1)
      .select(lit(40000L).as("doc_id"), lit(s"aaa bbb $span").as("text"))
      .unionByName(s.range(1)
        .select(lit(40001L).as("doc_id"), lit(s"ccc ddd $span eee").as("text")))
    Dedup.substringDedup(
        base.unionByName(doubled).unionByName(planted), "doc_id", "text", k = 8)
      .orderBy("doc_id")
  }

  /** Per-doc trigram novelty over the corpus: distinct-gram count,
    * corpus-unique-gram count, novelty fraction. */
  def xNgramNovelty(s: SparkSession, d: String): DataFrame =
    TextAnalysis.ngramNovelty(documents(s, d), "doc_id", "text", n = 3)
      .orderBy("doc_id")

  /** Eval-side 5-gram containment decontamination: docs ≡ 0 (mod 10)
    * play the eval set, the rest the training corpus; pairs at
    * containment ≥ 0.3 with a doc-freq-50 stop-gram cut. */
  def xContainment(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    TextAnalysis.containmentPairs(
        docs.where(col("doc_id") % 10 === 0),
        docs.where(col("doc_id") % 10 =!= 0),
        "doc_id", "text", n = 5, tau = 0.3, maxDocFreq = 50L)
      .orderBy("eval_id", "corpus_id")
  }

  /** Hard-negative mining: queries = vec_id < 5, corpus = all
    * embeddings; top-10 most-similar rows with a different label. */
  def xHardNegatives(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Similarity.hardNegatives(emb.where(col("vec_id") < 5), emb,
        "vec_id", "embedding", "label", k = 10)
      .orderBy("qid", "rk")
  }

  /** CCNet perplexity buckets: per-source head/middle/tail from the
    * self-trained bigram LM's NLL terciles. */
  def xPplBuckets(s: SparkSession, d: String): DataFrame =
    TextAnalysis.pplBuckets(documents(s, d), "doc_id", "text", "source")
      .orderBy("doc_id")

  /** KMV corpus-overlap matrix: per-source k=64 sketches over distinct
    * word bigrams, pairwise Jaccard estimates for all 20 sources. */
  def xKmvOverlap(s: SparkSession, d: String): DataFrame = {
    // (explode_outer + isNotNull considered and reverted — see
    // TextAnalysis.ngramNovelty: outer-mode overhead per emitted gram
    // measured above the once-per-doc duplicated build it saves)
    val items = documents(s, d)
      .select(col("source"), split(col("text"), " ").as("__t"))
      .select(col("source"),
        explode(array_distinct(TextAnalysis.wordNgrams(col("__t"), 2)))
          .as("item"))
    Pipelines.kmvOverlap(items, "source", "item", k = 64)
      .orderBy("g1", "g2")
  }

  /** Incremental near-dup probe: delta = re-crawl variants of docs
    * 100-149 (a "re " prefix — near-dup, not exact-dup) plus fresh
    * docs [400, 600); seen = docs < 400; pairs at Jaccard ≥ 0.8.
    * LSH candidates + exact verify ≡ the exact cross-corpus pairwise
    * at these params (recall ≈ 1 at j ≥ 0.8, differential-asserted). */
  def xIncrementalNearDup(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val delta = docs.where(col("doc_id").between(100, 149))
      .select((col("doc_id") + 10000L).as("doc_id"),
        concat(lit("re "), col("text")).as("text"))
      .unionByName(docs.where(col("doc_id") >= 400 && col("doc_id") < 600)
        .select("doc_id", "text"))
    val seen = docs.where(col("doc_id") < 400).select("doc_id", "text")
    Dedup.incrementalNearDupPairs(delta, seen, "doc_id", "text", tau = 0.8)
      .transform(stagedSort(_, "delta_id", "seen_id"))
  }

  /** BPE first-merge candidate table: top-50 within-word character
    * pairs by frequency-weighted count. */
  def xBpeMerges(s: SparkSession, d: String): DataFrame =
    Pipelines.bpeMergeCandidates(documents(s, d), "text", k = 50)
      .orderBy("rank")

  /** Distributed-trainer fixture, shared with the dump-time oracle
    * generator in [[SparkEntry]]: merge count kept modest — each merge
    * is one keyed vocabulary-pass round. */
  private[graft] object BpeDistFixture { val numMerges = 16 }

  /** The DISTRIBUTED BPE trainer's merge sequence over the full corpus
    * vocabulary (rank = creation order) — the no-driver-cap training
    * path. The oracle is the LOCAL trainer's sequence on the same
    * vocabulary, shipped as dump-time literals: a genuine
    * distributed-vs-local differential through DuckDB, since any
    * divergence in pair counting, tie-breaking, or merge application
    * breaks the hash. */
  def xBpeDistMerges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Pipelines.bpeTrainMergesDistributed(documents(s, d), "text",
        BpeDistFixture.numMerges)
      .zipWithIndex
      .map { case ((a, b), i) => (i + 1L, a, b) }
      .toDF("rank", "left_sym", "right_sym")
  }

  /** Full BPE encode: 30 merges trained on the corpus vocabulary,
    * every doc segmented to subword tokens + ids (dump-time oracle —
    * the learned word→encoding table ships as SQL literals, each entry
    * round-trip-checked at generation). */
  def xBpeEncode(s: SparkSession, d: String): DataFrame =
    Pipelines.bpeEncode(documents(s, d), "doc_id", "text", numMerges = 30)
      .orderBy("doc_id")

  /** Unigram-LM fixture parameters shared by [[xUnigramLm]] and the
    * dump-time oracle generator in [[SparkEntry]] — the model the
    * entry encodes with and the model the oracle's word→encoding
    * VALUES table is built from must be the same artifact. */
  private[graft] object UnigramFixture {
    val vocabSize = 200; val maxPieceLen = 4; val emIters = 2
  }

  /** The DISTRIBUTED unigram trainer's piece table (ord, piece,
    * log_prob) — the no-driver-cap training path, the [[xBpeDistMerges]]
    * convention for the unigram half: the oracle is the CAPPED trainer's
    * model on the same corpus as dump-time literals, a genuine
    * distributed-vs-local differential (identical exact counts feed the
    * same driver-side probability folds, so even the doubles match
    * bit-for-bit; both sides round to 6 dp for the compare). */
  def xUnigramDist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = Pipelines.unigramTrainModelDistributed(documents(s, d), "text",
      vocabSize = UnigramFixture.vocabSize,
      maxPieceLen = UnigramFixture.maxPieceLen,
      emIters = UnigramFixture.emIters)
    // pieces ship HEX-encoded (the trainer's own lossless transport):
    // a raw piece column would mangle lone UTF-16 surrogates through
    // UTF8String on astral corpora — the exact channel the trainer
    // avoids internally; "+ 0.0" folds a -0.0 from rounding a
    // near-zero log-prob (the house float contract)
    m.pieces.zipWithIndex
      .map { case ((p, lp), i) => (i.toLong, Pipelines.hexUnits(p), lp) }
      .toDF("ord", "piece_hex", "log_prob")
      .withColumn("log_prob", round(col("log_prob"), 6) + 0.0)
  }

  /** Unigram-LM (SentencePiece-style) encode: a 200-piece model
    * hard-EM-trained on the corpus vocabulary, every doc Viterbi-
    * segmented to pieces + ids — the other half of production
    * tokenizer practice next to x_bpe_encode, same dump-time oracle
    * convention (the learned word→encoding table ships as SQL
    * literals, round-trip-checked at generation). */
  def xUnigramLm(s: SparkSession, d: String): DataFrame =
    Pipelines.unigramEncodeWith(documents(s, d), "doc_id", "text",
        Pipelines.unigramTrainModel(documents(s, d), "text",
          vocabSize = UnigramFixture.vocabSize,
          maxPieceLen = UnigramFixture.maxPieceLen,
          emIters = UnigramFixture.emIters))
      .orderBy("doc_id")

  /** Tokenizer fertility per language under the SAME unigram model as
    * x_unigram_lm — the per-language cost table that lets a
    * BPE-vs-unigram choice be judged side by side with
    * x_bpe_fertility. Oracle replays the unigram dump-time
    * word→encoding table with the lang rollup. */
  def xUnigramFertility(s: SparkSession, d: String): DataFrame =
    Pipelines.unigramFertility(documents(s, d), "doc_id", "text", "lang",
        Pipelines.unigramTrainModel(documents(s, d), "text",
          vocabSize = UnigramFixture.vocabSize,
          maxPieceLen = UnigramFixture.maxPieceLen,
          emIters = UnigramFixture.emIters))
      .orderBy("lang")

  /** Leakage-free split over the dup-dense slice: near-dup clusters at
    * τ=0.8 (docs < 200), whole clusters assigned to one split. */
  def xClusterSplit(s: SparkSession, d: String): DataFrame =
    Pipelines.leakFreeSplit(
        documents(s, d).where(col("doc_id") < 200), "doc_id", "text",
        tau = 0.8)
      .orderBy("doc_id")

  /** √-temperature mixture rates per language (α = 1/2): the rate
    * table that re-balances the en-heavy fixture corpus. */
  def xTemperature(s: SparkSession, d: String): DataFrame =
    Pipelines.sqrtTemperatureRates(documents(s, d), "lang")
      .orderBy("lang")

  /** Fuzzy record linkage over customers: within-nation pairs whose
    * names are within edit distance 1, via the FastSS masked-variant
    * front + Levenshtein verify (at maxDist=1 candidates ∝ true
    * matches — immune to the fixture's constant "Customer#…" prefix,
    * which degenerated the earlier segment front to blockwise
    * all-pairs, 13.4 s → ~1 s at sf0.1). Nation co-blocking scopes the
    * declared within-nation linkage semantics. */
  def xEntityMatch(s: SparkSession, d: String): DataFrame =
    graft.operators.Linkage.editDistancePairs(
        customer(s, d), "c_custkey", "c_name",
        blockCols = Seq("c_nationkey"), maxDist = 1)
      .orderBy("id1", "id2")

  /** Indel-capable linkage: the full edit-distance-1 relation
    * (substitution OR insert/delete) over customers augmented with
    * deterministic planted deletion typos — every 7th customer also
    * appears (id + 10M) with the character at position
    * custkey % len + 1 removed, so the fixture provably contains
    * length-differing true pairs. The deletion-neighborhood front
    * covers indels with one extra masked-vs-full equi-join
    * (candidates still ∝ true matches). */
  def xEntityMatchIndel(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val typo = c.where(col("c_custkey") % 7 === 0)
      .select(
        (col("c_custkey") + lit(10000000L)).as("c_custkey"),
        expr("concat(substring(c_name, 1, cast(c_custkey % length(c_name) as int)), " +
          "substring(c_name, cast(c_custkey % length(c_name) as int) + 2))")
          .as("c_name"),
        col("c_nationkey"))
    graft.operators.Linkage.editDistancePairs(
        c.unionByName(typo), "c_custkey", "c_name",
        blockCols = Seq("c_nationkey"), maxDist = 1, indels = true)
      .orderBy("id1", "id2")
  }

  /** PageRank over the nation trade graph: edges customer-nation →
    * supplier-nation weighted by order-line count (the 100 TB-scale
    * part is the 4-way join + groupBy edge extraction; the power
    * iteration then runs on the aggregated graph). 5 iterations,
    * d = 0.85, ranks rounded to 6 dp. */
  def xPageRank(s: SparkSession, d: String): DataFrame =
    graft.operators.Graphs.pageRank(nationTradeEdges(s, d),
        "cnation", "snation", "w", iters = 5)
      .orderBy("node")

  /** The nation trade graph every graph entry walks: edges
    * customer-nation → supplier-nation weighted by order-line count.
    * Memoized per (SparkSession, sfDir) and checkpointed: nine graph
    * entries share this 4-way TPC-H extraction, the result is
    * ≤ |nations|² rows, and the extraction is deterministic — so
    * deriving it once per process removes the dominant shared fixture
    * cost from every graph entry without touching any entry's output.
    * The memo key is the SESSION (weakly held), not the application:
    * a cloned/new session gets its own Dataset (never one bound to
    * another session's state/confs), and dropping the session frees
    * its checkpointed blocks. */
  private val tradeEdgeCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]
  private def sessionMemo(
      cache: java.util.WeakHashMap[SparkSession,
        scala.collection.mutable.Map[String, DataFrame]],
      s: SparkSession, d: String)(build: => DataFrame): DataFrame =
    cache.synchronized {
      val perSession = Option(cache.get(s)).getOrElse {
        val m = scala.collection.mutable.Map.empty[String, DataFrame]
        cache.put(s, m); m
      }
      perSession.getOrElseUpdate(d, build)
    }
  private def nationTradeEdges(s: SparkSession, d: String): DataFrame =
    sessionMemo(tradeEdgeCache, s, d)(
        lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(nation(s, d).select(col("n_nationkey").as("__cnk"),
            col("n_name").as("cnation")), col("c_nationkey") === col("__cnk"))
          .join(nation(s, d).select(col("n_nationkey").as("__snk"),
            col("n_name").as("snation")), col("s_nationkey") === col("__snk"))
          .groupBy("cnation", "snation").agg(count(lit(1)).as("w"))
          .localCheckpoint())

  /** The capped (≤ 20 distinct parts) order-basket projection the
    * co-occurrence and association-rule entries both mine — memoized
    * and checkpointed like the trade edges (same frame, two entries ×
    * bench passes). */
  private val basketCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]
  private def orderBaskets(s: SparkSession, d: String): DataFrame =
    sessionMemo(basketCache, s, d)(
      graft.operators.EventAnalytics.basketProjection(
        lineitem(s, d), "l_orderkey", "l_partkey", maxDegree = 20))

  /** Personalized PageRank over the nation trade graph, seeded at the
    * ASIA nations: proximity-to-Asia trade authority — the
    * crawl-frontier/domain-expansion scoring pattern. 5 iterations,
    * d = 0.85, 6 dp. */
  def xPpr(s: SparkSession, d: String): DataFrame = {
    val seeds = nation(s, d)
      .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .select(col("n_name"))
    graft.operators.Graphs.personalizedPageRank(nationTradeEdges(s, d),
        "cnation", "snation", "w", seeds, "n_name", iters = 5)
      .orderBy("node")
  }

  /** Composed curation funnel per source: gopher quality (minWords
    * lowered to 20 for the fixture's short docs, as in x_gopher) →
    * exact-dedup exemplar → md5 3/4 sample, counted per stage in one
    * pass. */
  def xCurationFunnel(s: SparkSession, d: String): DataFrame =
    Pipelines.curationFunnel(documents(s, d), "doc_id", "text", "source",
        minWords = 20, keep256 = 192)
      .orderBy("source")

  /** First-touch conversion funnel view → click → purchase with a 48 h
    * per-step window, counted per stage (150/96/58 users at sf0.01). */
  def xEventFunnel(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.funnelStages(events(s, d),
        "user_id", "event_type", "ts",
        stages = Seq("view", "click", "purchase"),
        maxStepGapSec = 172800L)
      .orderBy("stage")

  /** First-order Markov transition counts over per-user event
    * timelines, totally ordered by (ts, event_id). */
  def xEventTransitions(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.transitionCounts(events(s, d),
        "user_id", "event_type", "ts", "event_id")
      .orderBy("from_type", "to_type")

  /** Weekly retention cohorts over the event stream: (first-event week,
    * week offset) → active users. */
  def xRetention(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.retentionCohorts(events(s, d),
        "user_id", "ts")
      .orderBy("cohort_week", "week_offset")

  /** Corpus version diff: the v2 snapshot drops every 11th doc, edits
    * every 7th's text, and appends shifted copies of every 13th —
    * row-level added/removed/changed status on (text, lang). */
  def xCorpusDiff(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select("doc_id", "text", "lang")
    val v2 = docs.where(col("doc_id") % 11 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(lit("v2 "), col("text"))).otherwise(col("text")))
      .unionByName(docs.where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          col("text"), col("lang")))
    Pipelines.corpusDiff(docs, v2, "doc_id", Seq("text", "lang"))
      .orderBy("doc_id")
  }

  /** Column profile over the documents table: per-column null and
    * exact distinct counts in one aggregation pass. */
  def xProfile(s: SparkSession, d: String): DataFrame =
    Pipelines.profileColumns(documents(s, d),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      .orderBy("col_name")

  /** Per-source quota sample: exactly 30 docs per source by smallest
    * md5(doc_id) — quota-exact, content-addressed. */
  def xQuotaSample(s: SparkSession, d: String): DataFrame =
    Pipelines.quotaSampleByMd5(
        documents(s, d).select("doc_id", "source"), "source", "doc_id", k = 30)
      .orderBy("doc_id")

  /** Weighted sample without replacement (A-ES): 200 documents drawn
    * by length weight — longer docs proportionally more likely, exact
    * count, content-addressed keys (deterministic on every engine). */
  def xWeightedSample(s: SparkSession, d: String): DataFrame =
    Pipelines.weightedSampleByMd5(
        documents(s, d).select("doc_id", "source", "n_chars"),
        "doc_id", "n_chars", k = 200)
      .orderBy("doc_id")

  /** Per-source weighted quota: the best 30 docs per source drawn by
    * length-weighted A-ES keys — weighted sampling and quota exactness
    * composed. */
  def xWeightedQuota(s: SparkSession, d: String): DataFrame =
    Pipelines.weightedQuotaSampleByMd5(
        documents(s, d).select("doc_id", "source", "n_chars"),
        "source", "doc_id", "n_chars", k = 30)
      .orderBy("doc_id")

  /** Equi-width 12-bin histogram of document lengths (n_chars). */
  def xHistogram(s: SparkSession, d: String): DataFrame =
    Pipelines.equiWidthHistogram(documents(s, d), "n_chars", bins = 12)
      .orderBy("bucket")

  /** CDC-style change log derived from the event stream: user_id as the
    * business key, (ts, event_id) as the total per-key order, 'error'
    * events as tombstones — the generic log shape [[ChangeData]]
    * materializes. */
  private def changeLog(s: SparkSession, d: String): DataFrame =
    events(s, d).select(col("user_id"), col("ts"), col("event_id"),
      when(col("event_type") === "error", lit("d")).otherwise(lit("u"))
        .as("op"),
      col("value"))

  /** Latest-wins snapshot compaction of the change log: one row per
    * live user (latest change not a tombstone), map-side-combining
    * max_by — no window. */
  def xLatestSnapshot(s: SparkSession, d: String): DataFrame =
    graft.operators.ChangeData.latestSnapshot(changeLog(s, d),
        Seq("user_id"), "ts", "event_id", "op")
      .orderBy("user_id")

  /** SCD type-2 validity history of the change log: every non-delete
    * change annotated with its [valid_from, valid_to) interval;
    * tombstones close intervals without emitting rows. */
  def xScd2(s: SparkSession, d: String): DataFrame =
    graft.operators.ChangeData.scd2History(changeLog(s, d),
        Seq("user_id"), "ts", "event_id", "op")
      .orderBy("user_id", "ts", "event_id")

  /** Incremental SCD2 maintenance: history built from the first half of
    * the change log (ts < Jan 16), the second half folded in with
    * [[graft.operators.ChangeData.mergeScd2]] — the oracle is the
    * FROM-SCRATCH history over the full log, so the hash gate proves
    * incremental ≡ rebuild cross-engine. */
  def xScd2Merge(s: SparkSession, d: String): DataFrame = {
    val log = changeLog(s, d)
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    val hist = graft.operators.ChangeData.scd2History(
      log.where(col("ts") < cut), Seq("user_id"), "ts", "event_id", "op")
    graft.operators.ChangeData.mergeScd2(hist,
        log.where(col("ts") >= cut), Seq("user_id"), "ts", "event_id", "op")
      .orderBy("user_id", "ts", "event_id")
  }

  /** Trade edges thinned to above-average weight — the sparse graph the
    * triangle/HITS entries walk (the full 25-nation graph is
    * near-complete, which makes structure metrics degenerate). The
    * average rides in-plan as a broadcast 1-row aggregate; integer
    * counts sum exactly in double, so the threshold is cross-engine
    * deterministic. */
  private def thinTradeEdges(s: SparkSession, d: String,
                             mult: Double = 1.0): DataFrame = {
    // the memo already checkpointed the 625-row edge list, so the
    // average subplan and the cut both read the materialized frame
    val e = nationTradeEdges(s, d)
    e.crossJoin(broadcast(e.agg(avg(col("w")).as("__aw"))))
      .where(col("w") > lit(mult) * col("__aw"))
      .select("cnation", "snation")
  }

  /** Per-nation triangle counts over the thinned (undirected) trade
    * graph — degree-ordered orientation, all keyed equi-joins. */
  def xTriangles(s: SparkSession, d: String): DataFrame =
    graft.operators.Graphs.triangleCounts(thinTradeEdges(s, d),
        "cnation", "snation")
      .orderBy("node")

  /** HITS hubs/authorities over the thinned trade graph: 3 mutual-
    * reinforcement rounds, L1-normalized, 6 dp. */
  def xHits(s: SparkSession, d: String): DataFrame =
    graft.operators.Graphs.hits(thinTradeEdges(s, d),
        "cnation", "snation", iters = 3)
      .orderBy("node")

  /** Market-basket co-occurrence over order line items: part pairs
    * co-purchased in ≥ 2 orders, baskets capped at 20 distinct parts
    * (the memoized shared projection). */
  def xCooccurrence(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.cooccurrenceFromBaskets(
        orderBaskets(s, d), "l_orderkey", "l_partkey", minCount = 2L)
      .orderBy("item_a", "item_b")

  /** Association rules over the order baskets: confidence and lift for
    * every part pair co-purchased in ≥ 3 orders, both orientations. */
  def xAssocRules(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.associationRulesFromBaskets(
        orderBaskets(s, d), "l_orderkey", "l_partkey", minCount = 3L)
      .orderBy("ante", "cons")

  /** 4-core of the 1.2×-average-thinned trade graph: the dense trading
    * kernel after iterative peeling (the sharper 1.2× cut leaves a
    * graph the peel actually bites at every scale factor). */
  def xKcore(s: SparkSession, d: String): DataFrame =
    graft.operators.Graphs.kCore(thinTradeEdges(s, d, mult = 1.2),
        "cnation", "snation", k = 4, maxRounds = 6)
      .orderBy("node")

  /** Deterministic label-propagation communities over the thinned trade
    * graph: 3 synchronous rounds, most-frequent-neighbor label,
    * min-label tie-break. */
  def xCommunities(s: SparkSession, d: String): DataFrame =
    graft.operators.Graphs.labelPropagation(thinTradeEdges(s, d),
        "cnation", "snation", iters = 3)
      .orderBy("node")

  /** Multi-touch attribution: view/click touches credited for the
    * purchases they preceded within 48 h — last-touch and linear models
    * in one pass, range-join paired. */
  def xAttribution(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.attribution(events(s, d),
        "user_id", "event_type", "ts", "event_id",
        touchTypes = Seq("click", "view"), convType = "purchase",
        lookbackSec = 172800L)
      .orderBy("channel")

  /** Declarative data-quality gate over the documents table: five rule
    * types, one aggregation pass; the lang in-set rule fails by design
    * (en+de+fr ≈ 70 % < 80 %) so both verdicts are exercised. */
  def xExpectations(s: SparkSession, d: String): DataFrame = {
    import Pipelines.Expectation._
    Pipelines.checkExpectations(documents(s, d), Seq(
        NotNull("text"),
        Unique("doc_id"),
        InRange("n_chars", 100, 400, minFrac = 0.5),
        MatchesRegex("text", "the", minFrac = 0.5),
        InSet("lang", Seq("en", "de", "fr"), minFrac = 0.8)))
      .orderBy("rule", "col_name")
  }

  /** Daily LOCF resampling of each user's event value: one row per
    * (user, day) from first to last activity, gaps carrying the prior
    * day's last value. */
  def xResample(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.resampleLocf(events(s, d),
        "user_id", "ts", "event_id", "value", stepSec = 86400L)
      .orderBy("user_id", "bucket")

  /** Equal-population binning of document lengths into octiles: the
    * feature-discretizer counterpart of the equi-width histogram. */
  def xQuantileBins(s: SparkSession, d: String): DataFrame =
    Pipelines.quantileBins(
        documents(s, d).select(col("doc_id"), col("n_chars")),
        "n_chars", nBins = 8)
      .orderBy("doc_id")

  /** Key-skew report over the lineitem supplier key: the 20 heaviest
    * suppliers, count-desc with key tie-break — the pre-salting
    * diagnostic. */
  def xSkewReport(s: SparkSession, d: String): DataFrame =
    Pipelines.skewReport(lineitem(s, d), Seq("l_suppkey"), topK = 20)
      .orderBy("rank")

  /** Robust per-(event-type) outlier screen on the value column:
    * modified z-score (median/MAD), |z| > 3.5 — exact percentiles so
    * the DuckDB quantile_cont oracle replays them. */
  def xOutliers(s: SparkSession, d: String): DataFrame =
    Pipelines.robustOutliers(
        events(s, d).select(col("event_id"), col("event_type"),
          col("value")),
        "event_type", "value")
      .orderBy("event_type", "event_id")

  /** CDC-envelope ingest round-trip (S2-S5): build reference-shaped
    * envelopes from nation rows, parse them back typed. */
  def xCdcIngest(s: SparkSession, d: String): DataFrame = {
    val src = nation(s, d).select(
      col("n_nationkey").cast("long").as("ref"),
      col("n_regionkey").cast("long").as("city_id"),
      col("n_name").as("city_name"),
      (lit(1704067200000L) + col("n_nationkey").cast("long") * 86400000L).as("c_ms"))
    CdcIngest.parse(CdcIngest.toEnvelope(src, "c_ms"), "payload").orderBy("ref")
  }

  /** PII scan-and-redact over documents salted with deterministic
    * synthetic PII (the corpus itself is digit-free, so the oracle
    * plants e-mails/IPs/phones as a pure function of doc_id — both
    * engines build the identical augmented text, then redact it). */
  def xPiiRedact(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val aug = documents(s, d).select(id, concat(
        col("text"),
        when(id % 3 === 0, concat(lit(" mail user"), id.cast("string"),
          lit("@example.com"))).otherwise(lit("")),
        when(id % 4 === 0, concat(lit(" host 10."),
          (id % 250).cast("string"), lit(".0."),
          ((id * 7) % 250).cast("string"))).otherwise(lit("")),
        when(id % 5 === 0, concat(lit(" call 555-"),
          lpad((id % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit("")))
      .as("text"))
    TextAnalysis.redactPii(aug, "doc_id", "text").orderBy("doc_id")
  }

  /** Intra-document repetition trimming: consecutive duplicate tokens
    * collapsed to one (the synthetic corpus has real runs). */
  def xCollapseRuns(s: SparkSession, d: String): DataFrame =
    TextAnalysis.collapseTokenRuns(documents(s, d), "doc_id", "text",
        maxRun = 1)
      .orderBy("doc_id")

  /** Bloom-semi-reduction join: one nation's suppliers bloom-prefilter
    * the lineitem scan before the exact equi-join — result ≡ the plain
    * join (the oracle IS the plain join). */
  def xBloomJoin(s: SparkSession, d: String): DataFrame = {
    val sup = supplier(s, d)
      .join(nation(s, d).where(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    Joins.bloomFilteredJoin(lineitem(s, d), "l_suppkey", sup, "s_suppkey",
        expectedKeys = 100000L)
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("s_suppkey")
  }

  /** Bounded-horizon EWMA (decay 0.5, horizon 8) of each user's value
    * series — one keyed window, H lag terms, no recurrence. */
  def xEwma(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.ewmaBounded(events(s, d),
        "user_id", "ts", "event_id", "value", decay = 0.5, horizon = 8)
      .orderBy("event_id")

  /** BFS hop distances over the 1.05×-thinned trade graph, seeded at
    * NATION_12 (multi-hop structure at every fixture SF), capped at 4
    * hops — oracled by a bounded-depth recursive CTE. */
  def xBfs(s: SparkSession, d: String): DataFrame =
    graft.operators.Graphs.bfsHops(thinTradeEdges(s, d, mult = 1.05),
        "cnation", "snation",
        nation(s, d).where(col("n_name") === "NATION_12")
          .select(col("n_name")),
        "n_name", maxHops = 4)
      .orderBy("node")

  /** Per-event-type winsorization of the value column at the exact
    * [p05, p95] band (the oracle path; approxAcc>0 is the 100 TB
    * sketch path). */
  def xWinsorize(s: SparkSession, d: String): DataFrame =
    Pipelines.winsorize(
        events(s, d).select(col("event_id"), col("event_type"),
          col("value")),
        "event_type", "value", pLo = 0.05, pHi = 0.95)
      .orderBy("event_id")

  /** EXACT prefix-filtered Jaccard self-join at tau=0.9 on the capped
    * corpus — the oracle is the brute-force all-pairs join, so the
    * hash match IS the exactness proof of the candidate principle. */
  def xJaccardJoin(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardJoinPrefix(documents(s, d).where(col("doc_id") < 300),
        "doc_id", "text", tau = 0.9)
      .orderBy("d1", "d2")

  /** Incremental rollup maintenance: per-supplier quantity stats kept
    * as mergeable state — history (3/4 of orders) merged with a delta
    * (1/4) must equal the from-scratch rollup, which IS the oracle. */
  def xAggMerge(s: SparkSession, d: String): DataFrame = {
    import graft.operators.ChangeData
    val li = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
      col("l_quantity"))
    val hist = ChangeData.aggState(li.where(col("l_orderkey") % 4 =!= 0),
      Seq("l_suppkey"), "l_quantity")
    val delta = ChangeData.aggState(li.where(col("l_orderkey") % 4 === 0),
      Seq("l_suppkey"), "l_quantity")
    ChangeData.mergeAggState(Seq(hist, delta), Seq("l_suppkey"))
      .select(col("l_suppkey"), col("cnt"),
        round(col("vsum"), 4).as("vsum"), col("vmin"), col("vmax"))
      .orderBy("l_suppkey")
  }

  /** Token-distribution drift (KL both ways + JS) between the src0 and
    * src1 corpus slices — the corpus-version health metric. */
  def xDrift(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    Pipelines.tokenDrift(docs.where(col("source") === "src0"),
      docs.where(col("source") === "src1"), "text")
  }

  /** Categorical drift (smoothed JS over whole values) between the
    * src0 slice's language mix and the rest of the corpus — the
    * batch form of the streaming monitor's `js_cat` alarm row
    * ([[graft.jobs.DriftMonitorJob]] calls this exact operator per
    * micro-batch). */
  def xCatDrift(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    Pipelines.categoricalDrift(
      docs.where(col("source") === "src0").select("lang"),
      docs.where(col("source") =!= "src0").select("lang"), "lang")
  }

  /** RFM segmentation of the event log: per-user recency/frequency/
    * monetary with quintile scores from broadcast boundaries. */
  def xRfm(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.rfmSegments(events(s, d),
        "user_id", "ts", "value", nBins = 5)
      .orderBy("user_id")

  /** 6-hour OHLC bars of each user's value series. */
  def xOhlc(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.ohlcBars(events(s, d),
        "user_id", "ts", "event_id", "value", stepSec = 21600L)
      .orderBy("user_id", "bucket")

  /** Daily growth accounting: new / retained / resurrected / churned
    * user counts per calendar day. */
  def xGrowth(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.growthAccounting(events(s, d),
        "user_id", "ts")
      .orderBy("day")

  /** Funnel conversion latency: per consecutive stage pair of the
    * view → click → purchase funnel (48 h step gap), count and exact
    * p50/p90/mean delay in seconds. */
  def xTimeToConvert(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.timeToConvert(events(s, d),
        "user_id", "event_type", "ts",
        stages = Seq("view", "click", "purchase"),
        maxStepGapSec = 172800L)
      .orderBy("step")

  /** Session path mining: 6 h inactivity-gap sessions, first-8-event
    * type paths, paths followed by ≥ 2 sessions. */
  def xSessionPaths(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.sessionPaths(events(s, d),
        "user_id", "event_type", "ts", "event_id",
        gapSec = 21600L, maxLen = 8, minCount = 2L)
      .orderBy("path")

  /** Two-sided CUSUM changepoint scores over each event type's daily
    * volume series (slack 1.0, the window-algebra closed form). */
  def xCusum(s: SparkSession, d: String): DataFrame = {
    val series = events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    graft.operators.EventAnalytics.cusum(series,
        "event_type", "day", "n", slack = 1.0)
      .orderBy("event_type", "day")
  }

  /** Adamic-Adar link prediction over the thinned trade graph:
    * non-adjacent nation pairs scored by their shared neighbors'
    * inverse-log degrees (centers capped at degree 20). */
  def xAdamicAdar(s: SparkSession, d: String): DataFrame =
    graft.operators.Graphs.adamicAdar(thinTradeEdges(s, d),
        "cnation", "snation", maxDegree = 20)
      .orderBy("node_a", "node_b")

  /** The weighted thinned trade graph [[xSssp]] walks: same 1.05×
    * above-average cut as the BFS entry, keeping the integer
    * line-count weight. */
  private def thinTradeEdgesW(s: SparkSession, d: String): DataFrame = {
    val e = nationTradeEdges(s, d)
    e.crossJoin(broadcast(e.agg(avg(col("w")).as("__aw"))))
      .where(col("w") > lit(1.05) * col("__aw"))
      .select("cnation", "snation", "w")
  }

  /** Bounded-hop weighted shortest paths over the 1.05×-thinned trade
    * graph from NATION_12: min total line-count weight within 4 hops —
    * oracled by a bounded-depth recursive CTE (exact integer costs). */
  def xSssp(s: SparkSession, d: String): DataFrame =
    graft.operators.Graphs.shortestPaths(thinTradeEdgesW(s, d),
        "cnation", "snation", "w",
        nation(s, d).where(col("n_name") === "NATION_12")
          .select(col("n_name")),
        "n_name", maxHops = 4)
      .orderBy("node")

  /** Pointwise mutual information between document language and
    * source — the stratification-independence screen. */
  def xMutualInfo(s: SparkSession, d: String): DataFrame =
    Pipelines.mutualInfo(documents(s, d), "lang", "source")
      .orderBy("lang", "source")

  /** Inverted index over the documents table: tokens with df ≥ 5,
    * id-sorted posting lists capped at 20 ids, sharded two-phase
    * build. Postings are emitted comma-joined (the arrays are already
    * sorted, so the string is canonical) because the driver's oracle
    * canonicalization only handles scalar columns. */
  def xInvertedIndex(s: SparkSession, d: String): DataFrame =
    TextAnalysis.invertedIndex(documents(s, d), "doc_id", "text",
        minDf = 5L, maxPostings = 20, shards = 8)
      .withColumn("postings", array_join(col("postings"), ","))
      .orderBy("token")

  /** Binned two-sample KS drift between the view and purchase value
    * distributions (64 shared equi-width bins). */
  def xKsDrift(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    Pipelines.ksDrift(ev.where(col("event_type") === "view"),
      ev.where(col("event_type") === "purchase"), "value", bins = 64)
  }

  /** Lagged cross-correlation (0..7 days) between the daily view and
    * purchase volumes — integer sufficient statistics, oracle-exact. */
  def xXcorr(s: SparkSession, d: String): DataFrame = {
    val series = events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), unix_date(col("day")).as("ord"), col("n"))
    graft.operators.EventAnalytics.laggedCorrelation(series,
        "event_type", "ord", "n", "view", "purchase", maxLag = 7)
      .orderBy("lag")
  }

  /** Mutual nearest neighbors over the embedding table: reciprocal
    * top-10 cosine pairs — the high-precision alignment candidates.
    * Capped to the first 1000 vectors (the x_knn_join/x_dedup_clusters
    * oracle-cost convention): the exact wrapper is all-pairs by
    * declared contract, and the uncapped fixture would make this one
    * entry ~3× the next-heaviest bench item while testing nothing the
    * cap doesn't. The scale path is mutualPairs over an ANN front
    * (JourneySuite proves the composition). */
  def xMnn(s: SparkSession, d: String): DataFrame =
    Similarity.mutualNearestNeighbors(
        embeddings(s, d).where(col("vec_id") < 1000),
        "vec_id", "embedding", k = 10)
      .orderBy("id_a", "id_b")

  /** The 100 TB path of mutual nearest neighbors: the same reciprocity
    * filter fronted by the sign-LSH ANN knn join (seed-pinned planes,
    * hamming ≤ 1 probes, k = 10) over the FULL embedding corpus — the
    * exact entry x_mnn proves the filter, this one hash-proves the
    * composition the scale path actually runs (candidates ∝ k·|corpus|
    * through the bucket equi-join, never all-pairs). */
  def xMnnAnn(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Similarity.mutualPairs(
        Similarity.annKnnJoin(emb, emb, "vec_id", "embedding", k = 10,
          dim = 64))
      .orderBy("id_a", "id_b")
  }

  /** Fightin'-Words distinctive tokens between the src0 and src1
    * corpus slices: Dirichlet-prior log-odds with |z| ≥ 1 and a
    * 5-occurrence floor. */
  def xLogOdds(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    TextAnalysis.logOddsTokens(docs.where(col("source") === "src0"),
        docs.where(col("source") === "src1"), "text",
        alpha = 0.01, minZ = 1.0, minCount = 5L)
      .orderBy("token")
  }

  /** First-class gap sessionization: one row per 6 h-gap session with
    * span, event count and duration. */
  def xSessions(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.sessionize(events(s, d),
        "user_id", "ts", "event_id", gapSec = 21600L)
      .orderBy("user_id", "session")

  /** Frequent contiguous 3-grams of event types inside 6 h-gap
    * sessions, occurring at least twice. */
  def xPathNgrams(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.sessionPathNgrams(events(s, d),
        "user_id", "event_type", "ts", "event_id",
        gapSec = 21600L, n = 3, minCount = 2L)
      .orderBy("ngram")

  /** Per-label embedding centroid health: count, centroid norm, member
    * cohesion (mean/min cosine to own centroid) — fixed-point sums
    * everywhere, so bit-stable across engines. */
  def xLabelCentroids(s: SparkSession, d: String): DataFrame =
    Similarity.labelCentroidStats(embeddings(s, d), "label", "embedding")
      .orderBy("label")

  /** Rolling DAU/WAU/MAU engagement with the DAU/MAU stickiness ratio
    * — coverage-expansion rolling distincts, window-free. */
  def xStickiness(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.activeUserRatios(events(s, d),
        "user_id", "ts")
      .orderBy("day")

  /** k-anonymity release audit of the documents table over the
    * (lang, source, n_chars) quasi-identifier at k = 5. */
  def xKanon(s: SparkSession, d: String): DataFrame =
    Pipelines.kAnonymityStats(documents(s, d),
      Seq("lang", "source", "n_chars"), k = 5L)

  /** Robust dispersion: per event type the median, MAD and
    * Iglewicz-Hoaglin modified-z outlier count (cut 3.5). */
  def xMad(s: SparkSession, d: String): DataFrame =
    Pipelines.madOutliers(events(s, d), "event_type", "value")
      .orderBy("event_type")

  /** Q55: GROUPING SETS — the per-flag and per-status marginals plus
    * the grand total in one pass, with the grouping-id bitmask. */
  def q55(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("long").as("gid"))
      .orderBy(col("gid"), coalesce(col("l_returnflag"), lit("")),
        coalesce(col("l_linestatus"), lit("")))

  /** Q54: unpivot/melt — the four lineitem measures as
    * (measure, value) rows, the wide→long reshape. */
  def q54(s: SparkSession, d: String): DataFrame = {
    // scan fan-out: the 4× unpivot row expansion feeds the global
    // sort's shuffle — an under-split scan generates it serially
    // (Joins.fanOutForCompute is a no-op at scale)
    val li = graft.operators.Joins.fanOutForCompute(lineitem(s, d),
      Seq("l_orderkey", "l_linenumber"))
    li.unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "measure", "value")
      .orderBy("l_orderkey", "l_linenumber", "measure")
  }

  /** Benford leading-digit audit of the extended-price column per
    * return flag — the fabricated-data / unit-mixup screen. */
  def xBenford(s: SparkSession, d: String): DataFrame =
    Pipelines.benfordAudit(lineitem(s, d), "l_returnflag",
        "l_extendedprice")
      .orderBy("l_returnflag", "digit")

  /** Per-event-type Gini concentration of per-user spend — the
    * who-dominates-the-traffic audit before capping/temperature
    * resampling. */
  def xGini(s: SparkSession, d: String): DataFrame =
    Pipelines.giniConcentration(
        events(s, d).select(col("event_type"), col("user_id"),
          col("value")),
        "event_type", "user_id", "value")
      .orderBy("event_type")

  /** Per-source language-diversity report: Shannon/Simpson/evenness
    * over the lang mix — the corpus mixture-health screen. */
  def xDiversity(s: SparkSession, d: String): DataFrame =
    Pipelines.diversityStats(documents(s, d), "source", "lang")
      .orderBy("source")

  /** Flesch readability over the documents table. The fixture text has
    * no terminal punctuation, so the entry derives sentence breaks
    * deterministically first (every " the " becomes ". " — mirrored
    * verbatim in the oracle) to exercise the multi-sentence path. */
  def xReadability(s: SparkSession, d: String): DataFrame =
    TextAnalysis.readabilityScores(
        documents(s, d).select(col("doc_id"),
          regexp_replace(col("text"), " the ", ". ").as("text")),
        "doc_id", "text")
      .orderBy("doc_id")

  /** Pearson correlation matrix over the four lineitem measures — the
    * feature-redundancy screen, all sufficient statistics exact. */
  def xCorrMatrix(s: SparkSession, d: String): DataFrame =
    Pipelines.correlationMatrix(lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy("col_a", "col_b")

  /** Per-user time-weighted average event value — the TWAP normalizer
    * for irregular series (a burst of cheap events must not drown one
    * long-held expensive state). */
  def xTwap(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.twap(events(s, d), "user_id", "ts",
        "event_id", "value")
      .orderBy("user_id")

  /** Quantity-weighted median extended price per return flag — the
    * importance-weighted quantile (p = 0.5). */
  def xWeightedQuantile(s: SparkSession, d: String): DataFrame =
    Pipelines.weightedQuantile(lineitem(s, d), "l_returnflag",
        "l_extendedprice", "l_quantity", p = 0.5)
      .orderBy("l_returnflag")

  /** Gap sessions via the NATIVE session_window aggregate (6 h gap) —
    * the built-in cross-check of x_sessions (window_end is
    * last event + gap by the built-in's contract). */
  def xSessionWindow(s: SparkSession, d: String): DataFrame =
    graft.streaming.StreamOps.sessionWindowAgg(events(s, d),
        gapSec = 21600L)
      .orderBy("user_id", "window_start")

  /** Binned mutual information between quantity and extended price —
    * the nonlinear-dependence screen over two numeric columns (16
    * shared-bounds equi-width bins per side). */
  def xBinnedMi(s: SparkSession, d: String): DataFrame =
    Pipelines.binnedMutualInfo(lineitem(s, d), "l_quantity",
      "l_extendedprice", bins = 16)

  private[graft] object PcaFixture { val k = 2 }

  /** PCA projection of the embedding corpus onto its top-2 principal
    * components: exact integer moment sums → driver Jacobi →
    * broadcast-literal projection (the whitening/visualization front).
    * The oracle is generated at dump time with the identical
    * (mean, components) literals — the x_quality_lr pattern. */
  def xPcaProject(s: SparkSession, d: String): DataFrame =
    Similarity.pcaProject(embeddings(s, d), "vec_id", "embedding",
        k = PcaFixture.k)
      .orderBy("vec_id")

  /** Sharded corpus export roundtrip: documents → split-labeled,
    * size-targeted parquet shards + per-shard manifest (the artifact a
    * training run mounts), then the per-split manifest rollup
    * (docs, content_xor). Shards partition the corpus, so the rollup
    * must replay exactly from the raw table — the oracle recomputes it
    * from `documents` directly, proving manifest ≡ table. 1 MB target
    * so the fixture produces a genuinely multi-shard layout. */
  def xCorpusExport(s: SparkSession, d: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_export_${s.sparkContext.applicationId}"
    val manifest = graft.sources.CorpusExport.exportShards(
      documents(s, d).select("doc_id", "text", "lang", "source"),
      "doc_id", contentCols = Seq("doc_id", "text"), outDir = out,
      targetShardBytes = 1L << 20)
    manifest.groupBy("split")
      .agg(sum("rows").as("docs"),
        expr("bit_xor(content_xor)").as("content_xor"))
      .orderBy("split")
  }

  /** [[xCorpusExport]]'s roundtrip in the trainer-facing JSONL shape:
    * the same documents exported as gzip-compressed JSONL shards
    * (`split=…/part-*.json.gz`) under the identical manifest contract,
    * then the identical per-split rollup. The oracle is the SAME
    * table-side replay — equality proves the JSON encode → gzip →
    * commit → schema-inferred read-back cycle preserved every row's
    * content byte-for-byte (the md5 row hash covers id AND text). */
  def xCorpusExportJsonl(s: SparkSession, d: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_export_jsonl_${s.sparkContext.applicationId}"
    val manifest = graft.sources.CorpusExport.exportShards(
      documents(s, d).select("doc_id", "text", "lang", "source"),
      "doc_id", contentCols = Seq("doc_id", "text"), outDir = out,
      format = "json", targetShardBytes = 1L << 20,
      codec = Some("gzip"))
    manifest.groupBy("split")
      .agg(sum("rows").as("docs"),
        expr("bit_xor(content_xor)").as("content_xor"))
      .orderBy("split")
  }

  /** WebDataset export roundtrip: documents land as POSIX-ustar tar
    * shards (`split=…/shard-NNNNNN.tar`, members `{doc_id}.{col}`) via
    * [[graft.sources.WebDataset.exportWebDataset]]; the manifest is
    * derived by PARSING the committed tars back, so the per-split
    * rollup proves the tar encode → commit → parse cycle preserved
    * every row byte-for-byte. The oracle is the SAME table-side replay
    * as the parquet/JSONL exports — checksums are format-invariant. */
  def xWebDataset(s: SparkSession, d: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_export_wds_${s.sparkContext.applicationId}"
    val manifest = graft.sources.WebDataset.exportWebDataset(
      documents(s, d).select("doc_id", "text", "lang", "source"),
      "doc_id", contentCols = Seq("doc_id", "text"), outDir = out,
      targetShardBytes = 1L << 20)
    manifest.groupBy("split")
      .agg(sum("rows").as("docs"),
        expr("bit_xor(content_xor)").as("content_xor"))
      .orderBy("split")
  }

  /** Incremental export roundtrip: the corpus lands in TWO generation
    * appends (even doc_ids as the initial crawl, odd as the delta) via
    * [[graft.sources.CorpusExport.exportShardsIncremental]] — each
    * append writes only its own `split=…/gen=N/` partitions and unions
    * the manifest with monotone shard ids. The two generations
    * partition the corpus, so the post-append manifest rollup must
    * replay exactly from the raw table: the oracle is the SAME
    * table-side SQL as x_corpus_export, proving manifest ≡ table after
    * two appends. The outDir is wiped first so bench reps re-run the
    * gen-0 append instead of tripping the out-of-order guard. */
  def xCorpusExportIncr(s: SparkSession, d: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_export_incr_${s.sparkContext.applicationId}"
    val outP = new org.apache.hadoop.fs.Path(out)
    outP.getFileSystem(s.sparkContext.hadoopConfiguration).delete(outP, true)
    val docs = documents(s, d).select("doc_id", "text", "lang", "source")
    graft.sources.CorpusExport.exportShardsIncremental(
      docs.where(col("doc_id") % 2 === 0), "doc_id",
      contentCols = Seq("doc_id", "text"), outDir = out, generation = 0L,
      targetShardBytes = 1L << 20)
    val manifest = graft.sources.CorpusExport.exportShardsIncremental(
      docs.where(col("doc_id") % 2 === 1), "doc_id",
      contentCols = Seq("doc_id", "text"), outDir = out, generation = 1L,
      targetShardBytes = 1L << 20)
    manifest.groupBy("split")
      .agg(sum("rows").as("docs"),
        expr("bit_xor(content_xor)").as("content_xor"))
      .orderBy("split")
  }

  /** Incremental WebDataset roundtrip: the corpus lands as tar shards
    * in TWO generation appends (`split=…/gen=N/shard-*.tar` via
    * [[graft.sources.WebDataset.exportWebDatasetIncremental]]), each
    * manifest derived by PARSING the new generation's committed tars
    * back. The generations partition the corpus, so the post-append
    * rollup replays from the raw table — the SAME oracle as
    * x_corpus_export/x_webdataset (checksums format- and
    * layout-invariant). The outDir is wiped first so bench reps re-run
    * gen 0 instead of tripping the out-of-order guard. */
  def xWebDatasetIncr(s: SparkSession, d: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_export_wdsi_${s.sparkContext.applicationId}"
    val outP = new org.apache.hadoop.fs.Path(out)
    outP.getFileSystem(s.sparkContext.hadoopConfiguration).delete(outP, true)
    val docs = documents(s, d).select("doc_id", "text", "lang", "source")
    graft.sources.WebDataset.exportWebDatasetIncremental(
      docs.where(col("doc_id") % 2 === 0), "doc_id",
      contentCols = Seq("doc_id", "text"), outDir = out, generation = 0L,
      targetShardBytes = 1L << 20)
    val manifest = graft.sources.WebDataset.exportWebDatasetIncremental(
      docs.where(col("doc_id") % 2 === 1), "doc_id",
      contentCols = Seq("doc_id", "text"), outDir = out, generation = 1L,
      targetShardBytes = 1L << 20)
    manifest.groupBy("split")
      .agg(sum("rows").as("docs"),
        expr("bit_xor(content_xor)").as("content_xor"))
      .orderBy("split")
  }

  /** Unicode NFKC normalization over the document corpus: a
    * deterministic width/ligature/combining/compatibility variant
    * (keyed by doc_id % 4) is prepended to each doc, then folded by
    * the native unicode_normalize expression — the preprocessing step
    * C4/CCNet-style pipelines run ahead of normalized dedup. The
    * output proves the fold (norm_text) and the char-count change
    * (raw_chars vs norm_chars: ligatures EXPAND, full-width folds are
    * length-preserving, combining marks CONTRACT). */
  def xUnicodeNorm(s: SparkSession, d: String): DataFrame = {
    // explicit \u escapes, never raw glyphs: composed-vs-decomposed
    // source encoding IS the thing under test, so it must be pinned
    val variants = array(
      // full-width Graft Engine + ideographic space
      lit("\uFF27\uFF52\uFF41\uFF46\uFF54\u3000" +
        "\uFF25\uFF4E\uFF47\uFF49\uFF4E\uFF45"),
      lit("\uFB01nal \uFB02ight"),      // fi/fl ligatures
      lit("cafe\u0301 franc\u0327ais"), // combining acute + cedilla
      lit("x\u00B2 \u00BD \u2168 \u339E")) // super2, half, roman IX, square-km
    val raw = concat(
      element_at(variants, (col("doc_id") % 4 + 1).cast("int")),
      lit(" "), col("text"))
    documents(s, d)
      .select(col("doc_id"), raw.as("__raw"))
      .select(col("doc_id"),
        graft.expressions.TextExpressions.normalizeUnicode(col("__raw"))
          .as("norm_text"),
        length(col("__raw")).cast("long").as("raw_chars"))
      .withColumn("norm_chars", length(col("norm_text")).cast("long"))
      .orderBy("doc_id")
  }

  /** Daily grid with LINEAR interpolation between observed days — the
    * numeric gap filler next to x_resample's LOCF step (an empty day
    * between two observations takes the straight line between them;
    * days past the last observation carry it forward). */
  def xInterp(s: SparkSession, d: String): DataFrame =
    graft.operators.EventAnalytics.resampleInterp(events(s, d),
        "user_id", "ts", "event_id", "value", stepSec = 86400L)
      .withColumn("observed", col("observed").cast("long"))
      .orderBy("user_id", "bucket")

  /** Retrieval eval: per-nation supplier rankings (a deterministic
    * md5-ordered "system") scored against acctbal-graded judgments —
    * precision/recall@5, MRR, NDCG@5 per query. The harness any BM25 /
    * ANN / RRF stack in this engine reports itself with. */
  def xRankEval(s: SparkSession, d: String): DataFrame = {
    val sup = supplier(s, d).join(nation(s, d),
      col("s_nationkey") === col("n_nationkey"))
    val run = sup.select(col("n_name").as("query"),
        col("s_suppkey").as("doc"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("n_name").orderBy(md5(col("s_name")), col("s_suppkey")))
          .cast("long").as("rank"))
    val qrels = sup.where(col("s_acctbal") > 3000.0)
      .select(col("n_name").as("query"), col("s_suppkey").as("doc"),
        when(col("s_acctbal") > 7000.0, 3L)
          .when(col("s_acctbal") > 5000.0, 2L).otherwise(1L).as("grade"))
    Pipelines.rankingMetrics(run, qrels, "query", "doc", "rank", "grade",
        k = 5)
      .orderBy("query")
  }

  /** Temporal 70/30 split + leakage audit over events, keyed by 3-event
    * id-blocks (event ids are time-ordered, so blocks are short-lived
    * entities and only the ones STRADDLING the 2024-01-22 cutoff leak —
    * a non-degenerate fraction; per-user keys on this always-on fixture
    * would read 1.0 leak everywhere). One audit row. */
  def xTimeSplit(s: SparkSession, d: String): DataFrame =
    Pipelines.temporalSplitAudit(
      events(s, d).withColumn("blk", floor(col("event_id") / 3).cast("long")),
      "blk", "ts", "2024-01-22 00:00:00")

  /** Semantic decontamination: an 8-vector "benchmark" (the first
    * corpus embeddings re-keyed +1e6) swept against the full corpus at
    * tau 0.9 — the planted verbatim leaks are caught at probe 0 (an
    * exact duplicate always shares its sign-LSH bucket). */
  def xSemDecontam(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val bench = emb.where(col("vec_id") < 8)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    Similarity.semanticDecontam(emb, bench, "vec_id", "embedding",
        tau = 0.9, planes = 8, probeRadius = 1, dim = 64)
      .orderBy("vec_id")
  }

  /** Zipf fit over the corpus's top-500 tokens — slope/intercept/r² of
    * the log-log rank-frequency line, the natural-language health
    * number a curation dashboard tracks per source. One row. */
  def xZipf(s: SparkSession, d: String): DataFrame =
    graft.operators.TextAnalysis.zipfFit(documents(s, d), "text",
      topN = 500)

  /** Population-stability drift of event values across the 2024-01-15
    * cut — the scorecard PSI next to x_ks_drift's worst-CDF-gap read.
    * One row. */
  def xPsi(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    Pipelines.psiDrift(
      e.where(col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
        .select("value"),
      e.where(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp"))
        .select("value"),
      "value", bins = 16)
  }

  /** Grouped 5-fold assignment over events keyed by user — per-fold row
    * and group counts prove the folds partition USERS (no user's rows
    * straddle folds). */
  def xKfold(s: SparkSession, d: String): DataFrame =
    Pipelines.groupedKFold(events(s, d), "user_id", k = 5)
      .groupBy("fold")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_groups"))
      .orderBy("fold")

  /** Binned ROC-AUC of the same miscalibrated-but-discriminative scorer
    * x_calibration audits: label rate = score², so ranking quality is
    * real (AUC well above 0.5) while calibration is off — the pair of
    * numbers that distinguishes "re-rank it" from "re-train it". */
  def xRocAuc(s: SparkSession, d: String): DataFrame = {
    val u = conv(substring(md5(concat(lit("s"),
      col("event_id").cast("string"))), 1, 6), 16, 10).cast("long")
      .cast("double") / (1 << 24)
    val v = conv(substring(md5(concat(lit("l"),
      col("event_id").cast("string"))), 1, 6), 16, 10).cast("long")
      .cast("double") / (1 << 24)
    val scored = events(s, d).select(u.as("score"),
      when(v < u * u, 1L).otherwise(0L).as("label"))
    Pipelines.rocAuc(scored, "score", "label", bins = 1024)
  }

  /** Calibration audit of a deliberately miscalibrated scorer: score =
    * md5-uniform in [0, 1), label drawn at rate score² (so the
    * reliability curve bows below the diagonal) — per-decile mean
    * score vs empirical rate, and the overall ECE. */
  def xCalibration(s: SparkSession, d: String): DataFrame = {
    val u = conv(substring(md5(concat(lit("s"),
      col("event_id").cast("string"))), 1, 6), 16, 10).cast("long")
      .cast("double") / (1 << 24)
    val v = conv(substring(md5(concat(lit("l"),
      col("event_id").cast("string"))), 1, 6), 16, 10).cast("long")
      .cast("double") / (1 << 24)
    val scored = events(s, d).select(u.as("score"),
      when(v < u * u, 1L).otherwise(0L).as("label"))
    Pipelines.calibrationBins(scored, "score", "label", bins = 10)
      .orderBy("bin")
  }

  /** Int8 quantization fidelity audit over the embedding corpus: per
    * vector the symmetric scale (max|v|/127), worst per-dimension
    * reconstruction error, and the cosine between vector and
    * reconstruction — the table that decides whether quantized scores
    * can drive a recall-sensitive cut. */
  def xInt8Quant(s: SparkSession, d: String): DataFrame =
    Similarity.int8QuantAudit(embeddings(s, d), "vec_id", "embedding")
      .orderBy("vec_id")

  /** Quantized retrieval end-to-end: q42's brute cosine top-10, but
    * scored on int8-reconstructed vectors — the read path a 4×-smaller
    * embedding table actually serves. The oracle replays the
    * quantize→reconstruct→score algebra exactly. */
  def xInt8Topk(s: SparkSession, d: String): DataFrame = {
    val q = Similarity.quantizeInt8(embeddings(s, d), "vec_id", "embedding")
    val recon = q.select(col("vec_id"),
      Similarity.int8Reconstruct(col("qvec"), col("scale")).as("embedding"))
    Similarity.cosineTopK(recon, "vec_id", "embedding", queryId = 0L, k = 10)
  }

  /** Token-budget mixture plan at α = 0.5 against a 50 k-token budget:
    * the per-language keep rates a multilingual run is configured
    * from. The fixed budget reads differently per SF by design — at
    * sf0.001 (~50 k corpus tokens) small languages cap at keep 1.0
    * while the head is cut; at larger SFs nothing caps — both regimes
    * exercise the same algebra. */
  def xTokenBudget(s: SparkSession, d: String): DataFrame =
    Pipelines.tokenBudgetRates(documents(s, d), "lang", "text",
        budgetTokens = TokenBudgetFixture.budgetTokens,
        alpha = TokenBudgetFixture.alpha)
      .orderBy("lang")

  /** Tokenizer fertility per language: tokens-per-word under the same
    * 30-merge model as x_bpe_encode, rolled up by lang — the
    * per-language compute/context cost a multilingual tokenizer choice
    * is judged on. The oracle replays the dump-time word→encoding
    * table with a lang rollup. */
  def xBpeFertility(s: SparkSession, d: String): DataFrame =
    Pipelines.bpeFertility(documents(s, d), "doc_id", "text", "lang",
        Pipelines.bpeTrainModel(documents(s, d), "text", numMerges = 30))
      .orderBy("lang")

  /** Corpus data card: the release-review datasheet assembled by ONE
    * job calling the already-oracled audit operators (column profile,
    * per-source stats, whole-corpus stats, language distribution,
    * Gopher pass rates, Zipf fit, curation-funnel survivors) — fixture
    * parameters match their standalone entries (minWords 20,
    * zipfTopN 500, keep256 192), so every number on the card is a
    * number some dashboard already shows. */
  def xDataCard(s: SparkSession, d: String): DataFrame =
    graft.jobs.DataCardJob.run(documents(s, d),
      profileCols = Seq("doc_id", "text", "lang", "source", "n_chars"),
      minWords = DataCardFixture.minWords,
      keep256 = DataCardFixture.keep256,
      zipfTopN = DataCardFixture.zipfTopN)

  /** BPE tokenizer artifact round-trip: train 30 merges, persist the
    * versioned vocab/merges table, load it back, and encode the corpus
    * with the LOADED model. The oracle is the same dump-time
    * word→encoding replay as x_bpe_encode — a hash match proves a
    * SEPARATE job mounting the saved artifact reproduces the training
    * session's encodings exactly (the train-once / encode-everywhere
    * production contract). */
  def xBpeRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_bpe_model_${s.sparkContext.applicationId}"
    val model = Pipelines.bpeTrainModel(documents(s, d), "text",
      numMerges = 30)
    Pipelines.bpeSave(s, model, path, version = 1L)
    val (loaded, _) = Pipelines.bpeLoad(s, path)
    Pipelines.bpeEncodeWith(documents(s, d), "doc_id", "text", loaded)
      .orderBy("doc_id")
  }

  /** Skew-salted join proven result-transparent: orders (fact side,
    * salted 8 ways) ⋈ customer (dim side, replicated per salt) on
    * custkey, rolled up per nation. The salt is pure plumbing — the
    * oracle runs the PLAIN SQL join, so the hashes match iff salting
    * changes nothing but the shuffle layout. The 100 TB case it
    * prescribes: one key hot past what AQE's skew split can rescue
    * (AQE splits oversized sort-merge partitions after the fact; the
    * salt prevents the oversized partition from existing) —
    * PlanShapeSuite plants that hot key and bounds the post-shuffle
    * partition. */
  def xSaltedJoin(s: SparkSession, d: String): DataFrame =
    Joins.saltedJoin(
        orders(s, d).select("o_orderkey", "o_custkey"),
        customer(s, d).select(col("c_custkey").as("o_custkey"),
          col("c_nationkey")),
        "o_custkey", saltFactor = 8)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), sum("o_orderkey").as("sum_okey"))
      .orderBy("c_nationkey")
}
