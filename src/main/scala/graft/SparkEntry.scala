package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md §3.
  *
  * `queries` keys ↔ `oracleSql` keys; column aliases must match exactly
  * (the driver's compare sorts columns by name before hashing). Oracle SQL
  * is the DuckDB-dialect variant of each query (FIXTURES §3 [variant]
  * notes); entries without portable SQL (the `x_*` operators) get the
  * driver's rows-only check.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q14(spark, "/root/testdata/sf0.001")

  // ---- generated oracle-SQL fragments for the x_* operators ------------

  /** DuckDB fragments for TextAnalysis.langIdGuess: per-language stopword
    * intersection scores over a `__toks` column (distinct lower-cased
    * tokens), and the argmax CASE mirroring the (score, lang) struct-max
    * tie-break — max score wins, score ties break to the lexicographically
    * greatest lang, all-zero → 'und'. Keep in sync with
    * TextAnalysis.stopwords. */
  private val langStopwords = Seq(
    "de" -> Seq("der", "die", "und", "das", "in", "von", "zu", "mit", "den", "ist"),
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des", "en", "du", "que"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"))

  private def langScoreCols: String = langStopwords.map { case (lang, ws) =>
    s"len(list_intersect(__toks, [${ws.map(w => s"'$w'").mkString(",")}])) AS s_$lang"
  }.mkString(", ")

  private def langPredCase: String = {
    val m = "greatest(s_de, s_en, s_es, s_fr, s_zh)"
    s"CASE WHEN $m = 0 THEN 'und' WHEN s_zh = $m THEN 'zh' " +
      s"WHEN s_fr = $m THEN 'fr' WHEN s_es = $m THEN 'es' " +
      s"WHEN s_en = $m THEN 'en' ELSE 'de' END"
  }

  /** Spark-side bpeish token count = split at every alnum/non-alnum
    * boundary, drop empties. RE2 (DuckDB) has no lookarounds, but the
    * count decomposes exactly: every non-alnum char is its own token +
    * every maximal alnum run is a token. */
  private val bpeishCountSql: String =
    "length(regexp_replace(text, '[a-zA-Z0-9]', '', 'g')) + " +
      "len(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), x -> len(x) > 0))"

  /** TextAnalysis.qualityScore replicated: length band + mean-token-len
    * band + alpha ratio, same weights and rounding. */
  private val qualitySql: String =
    "ROUND((CASE WHEN __nt BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.2 END) * 0.4 + " +
      "(CASE WHEN (length(text) - __nt + 1) / __nt BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.3 END) * 0.3 + " +
      "CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / " +
      "CAST(greatest(length(text), 1) AS DOUBLE) * 0.3, 4)"

  /** Queries.langMarkedDocs replicated (per-language marker phrase). */
  private val langMarkedSql: String =
    "SELECT doc_id, lang, text || ' ' || CASE lang " +
      "WHEN 'en' THEN 'the and of to a in' WHEN 'es' THEN 'el la de que y en' " +
      "WHEN 'de' THEN 'der die und das von zu' WHEN 'fr' THEN 'le la de et un les' " +
      "ELSE '的 了 是 在 我 有' END AS text FROM documents"

  /** DuckDB oracle for x_quality_lr, generated AT DUMP TIME (needs the
    * data: the weights are a function of the labeled slice). Training
    * happens ONCE here through the same seed-free
    * [[graft.operators.TextAnalysis.qualityLrTrain]] path the query
    * runs — determinism of that path is what makes the two runs agree
    * — and the learned weight vector ships as a list literal; the SQL
    * replays the distributed score pass (bucket lookup, position-
    * ordered fold, logit + keep). Same contract as [[ivfOracleSql]]. */
  /** DuckDB oracle for x_pca_project, generated AT DUMP TIME (the
    * components depend on the corpus): runs the exact
    * `Similarity.pcaComponents` pipeline the query runs — integer
    * moment sums → driver Jacobi, deterministic per (sfDir, k) — and
    * embeds each component and its μ·v offset as literals, so both
    * engines evaluate the identical left-fold dot product minus the
    * identical scalar. Same `graft.oracle.sfDir` gating as
    * [[ivfOracleSql]]: outside Verify the Try fails and the driver
    * falls back to its rows-only check. */
  private def pcaOracleSql: Option[(String, String)] = scala.util.Try {
    val spark = SparkSession.active
    val sfDir = sys.props("graft.oracle.sfDir") // no default: throws if unset
    val emb = Tables.embeddings(spark, sfDir)
    val (mean, comps, _) = graft.operators.Similarity.pcaComponents(
      emb, "embedding", Queries.PcaFixture.k)
    val pcs = comps.zipWithIndex.map { case (v, j) =>
      val vl = v.mkString("[", ",", "]")
      val mu = mean.zip(v).foldLeft(0.0) { case (acc, (m, c)) => acc + m * c }
      s"ROUND(list_dot_product(e, $vl) - $mu, 4) + 0 AS pc${j + 1}"
    }.mkString(", ")
    "x_pca_project" ->
      (s"WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) " +
        s"SELECT vec_id, $pcs FROM v ORDER BY vec_id")
  }.toOption

  /** DuckDB oracle for x_corr_matrix: the same micro-unit quantization,
    * HUGEINT-exact sufficient statistics (the engine sums decimals),
    * and the identical final float expression per pair. */
  private def corrMatrixOracleSql(table: String, cols: Seq[String]): String = {
    val qs = cols.zipWithIndex.map { case (c, i) =>
      s"CAST(ROUND(CAST($c AS DOUBLE) * 1e6, 0) AS BIGINT) AS q$i"
    }.mkString(", ")
    val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    val ss = cols.indices.map(i => s"SUM(CAST(q$i AS HUGEINT)) AS s$i")
    val ps = for (i <- cols.indices; j <- i until cols.size)
      yield s"SUM(CAST(q$i AS HUGEINT) * q$j) AS p${i}_$j"
    def d(x: String) = s"CAST($x AS DOUBLE)"
    val rows = for (i <- cols.indices; j <- (i + 1) until cols.size) yield {
      val den = s"SQRT(${d("n")} * ${d(s"p${i}_$i")} - ${d(s"s$i")} * ${d(s"s$i")}) * " +
        s"SQRT(${d("n")} * ${d(s"p${j}_$j")} - ${d(s"s$j")} * ${d(s"s$j")})"
      s"SELECT '${cols(i)}' AS col_a, '${cols(j)}' AS col_b, n, " +
        s"CASE WHEN $den > 0 THEN ROUND((${d("n")} * ${d(s"p${i}_$j")} - ${d(s"s$i")} * ${d(s"s$j")}) / ($den), 6) END AS corr FROM st"
    }
    s"WITH v AS (SELECT $qs FROM $table WHERE $notNull), " +
      s"st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, ${(ss ++ ps).mkString(", ")} FROM v) " +
      rows.mkString(" UNION ALL ") + " ORDER BY col_a, col_b"
  }

  private def qualityLrOracleSql: Option[(String, String)] = scala.util.Try {
    import org.apache.spark.sql.functions.col
    val spark = SparkSession.active
    val sfDir = sys.props("graft.oracle.sfDir") // no default: throws if unset
    val aug = Queries.langMarkedDocs(spark, sfDir)
      .withColumn("label", col("lang") === "en")
    val (w, b) = graft.operators.TextAnalysis.qualityLrTrain(
      aug.where(col("doc_id") % 5 =!= 0), "doc_id", "text", "label")
    val warr = w.map(_.toString).mkString("[", ",", "]")
    val sql =
      s"WITH aug AS ($langMarkedSql), " +
        "t AS (SELECT doc_id, string_split(text,' ') AS s FROM aug), " +
        "ti AS (SELECT doc_id, s, UNNEST(range(1, len(s)+1)) AS pos FROM t), " +
        s"i AS (SELECT doc_id, pos, list_extract($warr, CAST(CAST('0x' || substring(md5(s[pos]),1,4) AS BIGINT) % ${w.length} + 1 AS INTEGER)) AS lw FROM ti), " +
        "a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, list_reduce(list(lw ORDER BY pos), (acc,x) -> acc + x) AS sm FROM i GROUP BY doc_id), " +
        s"f AS (SELECT doc_id, n_tokens, ROUND($b + sm / n_tokens, 4) + 0.0 AS logit FROM a) " +
        "SELECT doc_id, n_tokens, logit, logit >= 0 AS keep FROM f ORDER BY doc_id"
    "x_quality_lr" -> sql
  }.toOption

  /** Queries.syntheticUrl replicated (three modulo-selected URL shapes). */
  private val syntheticUrlSql: String =
    "CASE doc_id % 3 " +
      "WHEN 0 THEN 'HTTP://News.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM:80/A/B/?gclid=123&q=' || CAST(doc_id AS VARCHAR) || '#x' " +
      "WHEN 1 THEN 'https://WWW.Shop' || CAST(doc_id % 7 AS VARCHAR) || '.com/items/' || CAST(doc_id AS VARCHAR) || '/?utm_campaign=c' " +
      "ELSE 'https://blog' || CAST(doc_id % 7 AS VARCHAR) || '.example.org:8080/p?id=' || CAST(doc_id AS VARCHAR) || '&ref=tw' END"

  /** Pipelines.urlNormalize/urlDomain replicated as CTE fragments over a
    * table `u(doc_id, url, ...)` → `nrm(doc_id, url, url_norm, domain, ...)`.
    * RE2 semantics match Java here: anchored groups, char classes,
    * list_filter ≡ Spark filter HOF. */
  private val urlNormCteSql: String =
    "p AS (SELECT u.*, " +
      "lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme, " +
      "lower(regexp_extract(url, '^[^/]*//([^/?#]*)', 1)) AS hostport, " +
      "regexp_extract(url, '^[^/]*//[^/?#]*(.*)$', 1) AS rest FROM u), " +
    "p2 AS (SELECT p.*, " +
      "CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '') " +
      "WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '') " +
      "ELSE hostport END AS host, " +
      "regexp_replace(regexp_extract(rest, '^([^?#]*)', 1), '/+$', '') AS path, " +
      "list_filter(string_split(regexp_extract(rest, '\\?([^#]*)', 1), '&'), " +
      "x -> len(x) > 0 AND NOT regexp_matches(x, '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=')) AS kept, " +
      "regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''), '^www\\.', '') AS domain FROM p), " +
    "nrm AS (SELECT p2.*, scheme || '://' || host || path || " +
      "CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&') ELSE '' END AS url_norm FROM p2)"

  /** Sign-LSH bucket expression with the exact hyperplanes annTopK uses
    * (seed-pinned), as DuckDB SQL over a DOUBLE[] column `e`. */
  private def annBucketSql(planes: Int, dim: Int): String =
    graft.operators.Similarity.hyperplanes(planes, dim).zipWithIndex.map {
      case (plane, p) =>
        val lits = plane.mkString("[", ",", "]")
        s"(CASE WHEN list_dot_product(e, $lits) >= 0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")

  /** DuckDB oracle for x_ivf_topk, generated AT DUMP TIME (needs the data:
    * trained centroids and the probe set depend on the corpus, unlike the
    * seed-only hyperplanes). Runs the exact `Similarity.ivfTrain` /
    * `ivfProbes` folds the query runs — deterministic per (sfDir, params)
    * — and embeds centroids + probe cells as literals. Cell assignment in
    * SQL uses the monotone form argmin(|c|² − 2·e·c) (row-constant |e|²
    * dropped); `list_position(ds, list_min(ds))` keeps the first minimum,
    * matching nearestCell's first-strictly-less tie-break.
    *
    * Requires an active SparkSession and `graft.oracle.sfDir` explicitly
    * set (only Verify sets it — no default, so a unit test evaluating
    * `oracleSql` with some other session active can never train against
    * the wrong corpus); anywhere else the Try fails and the entry is
    * simply omitted → the driver falls back to its rows-only check.
    *
    * All parameters come from [[Queries.IvfFixture]] — the same constants
    * `Queries.xIvfTopK` passes — so query and oracle cannot silently
    * desynchronize. Before emitting SQL, the oracle's distance form
    * (|c|²−2·e·c, DuckDB first-min) is cross-checked against
    * `Similarity.nearestCell` (Σ(v−c)², first-strictly-less) over the
    * whole corpus: algebraically equal but not bit-equal, so a vector
    * near-equidistant between centroids could diverge — that fails
    * loudly here (entry omitted, stderr note) instead of shipping a
    * silently divergent oracle. */
  private def ivfOracleSql: Option[(String, String)] = scala.util.Try {
    import Queries.IvfFixture._
    val spark = SparkSession.active
    val sfDir = sys.props("graft.oracle.sfDir") // no default: throws if unset
    val emb = Tables.embeddings(spark, sfDir)
    val cs = graft.operators.Similarity.ivfTrain(
      emb, "vec_id", "embedding", nCells, lloydIters = lloydIters, trainCap = trainCap)
    val qVec = emb.where(org.apache.spark.sql.functions.col("vec_id") === queryId)
      .select(org.apache.spark.sql.functions.col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val probes = graft.operators.Similarity.ivfProbes(cs, qVec, nProbe)
    crossCheckCellAssignment(emb, cs)
    val dists = cs.map { c =>
      val cc = c.map(x => x * x).sum
      s"($cc - 2*list_dot_product(e, ${c.mkString("[", ",", "]")}))"
    }.mkString("[", ",", "]")
    val sql =
      "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
        s"a AS (SELECT vec_id, e, list_position(ds, list_min(ds)) - 1 AS cell " +
        s"FROM (SELECT vec_id, e, $dists AS ds FROM v)), " +
        s"q AS (SELECT e AS qe FROM v WHERE vec_id = $queryId) " +
        "SELECT a.vec_id, ROUND(list_dot_product(a.e,q.qe)/" +
        "(sqrt(list_dot_product(a.e,a.e))*sqrt(list_dot_product(q.qe,q.qe))),4) + 0 AS cos " +
        s"FROM a, q WHERE a.cell IN (${probes.mkString(",")}) AND a.vec_id <> $queryId " +
        s"ORDER BY cos DESC, a.vec_id LIMIT $k"
    "x_ivf_topk" -> sql
  }.toOption

  /** DuckDB oracle for x_semdedup, generated AT DUMP TIME under the
    * [[ivfOracleSql]] contract (active session + `graft.oracle.sfDir`,
    * Try-omitted elsewhere → rows-only fallback): the deterministic
    * `Similarity.ivfTrain` fold runs against the dump corpus and the
    * centroids, their norms, and the squared-distance argmin form all
    * embed as literals. Cell assignment is the proved-out
    * `list_position(ds, list_min(ds)) - 1` first-min (cross-checked
    * against `Similarity.nearestCell` on every corpus vector, same
    * loud-failure posture and list_dot_product accumulation-order
    * assumption). The keep rule compares ROUNDED (4 dp) centroid
    * cosines on both sides, so ordering agrees with Spark exactly; the
    * pair predicate is a raw normalized dot ≥ tau, the same form
    * x_embed_neardup's oracle proved out. */
  /** DuckDB oracle for x_pagerank: the power iteration UNROLLED into
    * one CTE chain (r0 → d1/r1 → … → r`iters`) — fixed iteration count
    * is what makes PageRank oracle-able at all. Every arithmetic step
    * mirrors [[graft.operators.Graphs.pageRank]]'s op order exactly
    * ((1-d)/n, d·(cb + dm/n), w cast to double before the fraction), so
    * the only cross-engine divergence is summation order inside SUM —
    * absorbed by the final 6 dp rounding. Static SQL: the graph is
    * derived in-query from the TPC-H tables, no dump-time state. */
  private def pageRankOracleSql(iters: Int, damping: String = "0.85"): String = {
    val head =
      "WITH e AS (SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS DOUBLE) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
        "JOIN nation cn ON c.c_nationkey = cn.n_nationkey " +
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey GROUP BY 1, 2), " +
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes), " +
        "outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src), " +
        "frac AS (SELECT e.src, e.dst, e.w / o.ow AS p FROM e JOIN outw o ON e.src = o.src), " +
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"
    val steps = (1 to iters).map { t =>
      val prev = s"r${t - 1}"
      s", d$t AS (SELECT COALESCE(SUM(r.r), 0) AS dm FROM $prev r " +
        "LEFT JOIN outw o ON r.node = o.src WHERE o.src IS NULL)" +
        s", r$t AS (SELECT n.node, (1 - $damping) / (SELECT n FROM nn) + " +
        s"$damping * (COALESCE(c.cb, 0) + (SELECT dm FROM d$t) / (SELECT n FROM nn)) AS r " +
        "FROM nodes n LEFT JOIN (SELECT f.dst, SUM(f.p * r.r) AS cb " +
        s"FROM frac f JOIN $prev r ON f.src = r.node GROUP BY f.dst) c ON n.node = c.dst)"
    }.mkString
    head + steps + s" SELECT node, ROUND(r, 6) + 0 AS pr FROM r$iters ORDER BY node"
  }

  /** Unrolled-CTE PPR oracle: same trade-graph CTEs as the PageRank
    * oracle, restart vector = uniform over the ASIA-seed nodes present
    * in the graph, recurrence mirrored op-for-op against
    * Graphs.pprSuperstep ((1-d)*s + d*(cb + dm*s)). */
  private def pprOracleSql(iters: Int, damping: String = "0.85"): String = {
    val head =
      "WITH e AS (SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS DOUBLE) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
        "JOIN nation cn ON c.c_nationkey = cn.n_nationkey " +
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey GROUP BY 1, 2), " +
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
        "seedset AS (SELECT DISTINCT n.node FROM nodes n " +
        "JOIN nation na ON n.node = na.n_name " +
        "JOIN region re ON na.n_regionkey = re.r_regionkey WHERE re.r_name = 'ASIA'), " +
        "kk AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM seedset), " +
        "outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src), " +
        "frac AS (SELECT e.src, e.dst, e.w / o.ow AS p FROM e JOIN outw o ON e.src = o.src), " +
        "s0 AS (SELECT n.node, CASE WHEN ss.node IS NOT NULL THEN 1.0 / (SELECT k FROM kk) ELSE 0.0 END AS s " +
        "FROM nodes n LEFT JOIN seedset ss ON n.node = ss.node), " +
        "r0 AS (SELECT node, s AS r FROM s0)"
    val steps = (1 to iters).map { t =>
      val prev = s"r${t - 1}"
      s", d$t AS (SELECT COALESCE(SUM(r.r), 0) AS dm FROM $prev r " +
        "LEFT JOIN outw o ON r.node = o.src WHERE o.src IS NULL)" +
        s", r$t AS (SELECT n.node, (1 - $damping) * n.s + " +
        s"$damping * (COALESCE(c.cb, 0) + (SELECT dm FROM d$t) * n.s) AS r " +
        "FROM s0 n LEFT JOIN (SELECT f.dst, SUM(f.p * r.r) AS cb " +
        s"FROM frac f JOIN $prev r ON f.src = r.node GROUP BY f.dst) c ON n.node = c.dst)"
    }.mkString
    head + steps + s" SELECT node, ROUND(r, 6) + 0 AS pr FROM r$iters ORDER BY node"
  }

  /** Shared CTE prefix for the graph-structure oracles: the trade-edge
    * extraction (same 4-way join as the PageRank oracle) thinned to
    * above-average weight. Integer-valued counts sum exactly in double,
    * so AVG is order-independent and the `w > avg` cut is cross-engine
    * deterministic. */
  private val thinTradeCte: String =
    "WITH e AS (SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS DOUBLE) AS w " +
      "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
      "JOIN customer c ON o.o_custkey = c.c_custkey " +
      "JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
      "JOIN nation cn ON c.c_nationkey = cn.n_nationkey " +
      "JOIN nation sn ON s.s_nationkey = sn.n_nationkey GROUP BY 1, 2), " +
      "thin AS (SELECT src, dst FROM e WHERE w > (SELECT AVG(w) FROM e))"

  /** DuckDB oracle for x_triangles: id-ordered canonical enumeration —
    * each triangle {p<q<r} found exactly once via edges (p,q),(p,r),(q,r)
    * — deliberately a DIFFERENT orientation than the engine's
    * degree-ordering (Graphs.triangleCounts), which only changes WORK,
    * never the triangle set, so agreement is a real independent check. */
  private def trianglesOracleSql: String =
    thinTradeCte +
      ", canon AS (SELECT DISTINCT LEAST(src, dst) AS x, GREATEST(src, dst) AS y FROM thin WHERE src <> dst)" +
      ", nodes AS (SELECT x AS node FROM canon UNION SELECT y FROM canon)" +
      ", tri AS (SELECT a.x AS n1, a.y AS n2, b.y AS n3 FROM canon a " +
      "JOIN canon b ON a.x = b.x AND a.y < b.y " +
      "JOIN canon c ON c.x = a.y AND c.y = b.y)" +
      ", pern AS (SELECT node, COUNT(*) AS t FROM (" +
      "SELECT n1 AS node FROM tri UNION ALL SELECT n2 FROM tri UNION ALL SELECT n3 FROM tri) GROUP BY node) " +
      "SELECT n.node, COALESCE(p.t, 0) AS triangles FROM nodes n " +
      "LEFT JOIN pern p ON n.node = p.node ORDER BY n.node"

  /** DuckDB oracle for x_hits: the mutual-reinforcement recurrence
    * UNROLLED (h0 → a1/h1 → … → a`iters`/h`iters`), mirroring
    * Graphs.hitsHalfStep op-for-op (raw sum joined onto all nodes,
    * COALESCE 0, L1-normalize); summation-order ulps absorbed by the
    * 6 dp rounding — the PageRank-oracle contract.
    *
    * Plan hygiene, learned the hard way: each normalizer is a
    * `SUM() OVER ()` INSIDE its step CTE (one reference to the raw
    * frame, not a scalar subquery that doubles references), and the
    * shared graph CTEs are AS MATERIALIZED — DuckDB 1.0 inlines CTEs
    * at every reference site, so the scalar-subquery form multiplies
    * the 4-way trade join 8× PER ITERATION and never finishes. */
  private def hitsOracleSql(iters: Int): String = {
    val head =
      "WITH e AS MATERIALIZED (SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS DOUBLE) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
        "JOIN nation cn ON c.c_nationkey = cn.n_nationkey " +
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey GROUP BY 1, 2), " +
        "thin AS MATERIALIZED (SELECT src, dst FROM e WHERE w > (SELECT AVG(w) FROM e)), " +
        "ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM thin), " +
        "nodes AS MATERIALIZED (SELECT src AS node FROM ed UNION SELECT dst FROM ed), " +
        "h0 AS (SELECT node, CAST(1.0 AS DOUBLE) / COUNT(*) OVER () AS h FROM nodes)"
    val steps = (1 to iters).map { t =>
      val prev = s"h${t - 1}"
      s", a$t AS (SELECT node, raw / SUM(raw) OVER () AS a FROM (" +
        "SELECT n.node, COALESCE(x.s, 0) AS raw FROM nodes n " +
        s"LEFT JOIN (SELECT e2.dst AS node, SUM(h.h) AS s FROM ed e2 JOIN $prev h ON e2.src = h.node GROUP BY e2.dst) x " +
        "ON n.node = x.node))" +
        s", h$t AS (SELECT node, raw / SUM(raw) OVER () AS h FROM (" +
        "SELECT n.node, COALESCE(x.s, 0) AS raw FROM nodes n " +
        s"LEFT JOIN (SELECT e2.src AS node, SUM(a.a) AS s FROM ed e2 JOIN a$t a ON e2.dst = a.node GROUP BY e2.src) x " +
        "ON n.node = x.node))"
    }.mkString
    head + steps +
      s" SELECT n.node, ROUND(h.h, 6) + 0 AS hub, ROUND(a.a, 6) + 0 AS auth " +
      s"FROM nodes n JOIN h$iters h ON n.node = h.node " +
      s"JOIN a$iters a ON n.node = a.node ORDER BY n.node"
  }

  /** SCD2 from-scratch oracle: lead(ts) over ALL changes (deletes close
    * intervals), delete rows filtered after — same op order as
    * ChangeData.scd2History. Shared by x_scd2 and x_scd2_merge (the
    * incremental merge must reproduce the rebuild row-for-row). */
  private val scd2OracleSqlText: String =
    "WITH log AS (SELECT user_id, ts, event_id, " +
      "CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op, value FROM events), " +
      "h AS (SELECT *, ts AS valid_from, " +
      "LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to FROM log) " +
      "SELECT user_id, ts, event_id, op, value, valid_from, valid_to, " +
      "(valid_to IS NULL) AS is_current FROM h WHERE op <> 'd' " +
      "ORDER BY user_id, ts, event_id"

  /** DuckDB oracle for x_communities: the synchronous min-tie-break LPA
    * recurrence unrolled; the winner pick is a ROW_NUMBER replay of the
    * engine's min_by over (−count, label). All-string output — no
    * float tolerance at all. Base CTEs AS MATERIALIZED (the x_hits
    * inlining lesson); l${t-1} is referenced twice per round, so 2^t
    * inlining is bounded by materializing each round too. */
  private def lpaOracleSql(iters: Int): String = {
    val head =
      "WITH e AS MATERIALIZED (SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS DOUBLE) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
        "JOIN nation cn ON c.c_nationkey = cn.n_nationkey " +
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey GROUP BY 1, 2), " +
        "thin AS MATERIALIZED (SELECT src, dst FROM e WHERE w > (SELECT AVG(w) FROM e)), " +
        "canon AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS x, GREATEST(src, dst) AS y FROM thin WHERE src <> dst), " +
        "nbrs AS MATERIALIZED (SELECT x AS node, y AS nbr FROM canon UNION ALL SELECT y, x FROM canon), " +
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM nbrs), " +
        "l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"
    val steps = (1 to iters).map { t =>
      val prev = s"l${t - 1}"
      s", l$t AS MATERIALIZED (SELECT n.node, COALESCE(w.label, pl.label) AS label FROM nodes n " +
        "LEFT JOIN (SELECT node, label FROM (SELECT node, label, " +
        "ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn FROM (" +
        s"SELECT nb.node, l.label, COUNT(*) AS c FROM nbrs nb JOIN $prev l ON nb.nbr = l.node " +
        "GROUP BY nb.node, l.label)) WHERE rn = 1) w ON n.node = w.node " +
        s"JOIN $prev pl ON n.node = pl.node)"
    }.mkString
    head + steps +
      s" SELECT node, label FROM l$iters ORDER BY node"
  }

  /** DuckDB oracle for x_kcore: `rounds` peel applications unrolled,
    * every round MATERIALIZED (the CTE-inlining lesson); the engine's
    * early exit at a fixpoint is exactly equivalent because peeling a
    * fixpoint is the identity. The 1.2× cut multiplies in the same
    * order as the engine (literal × avg, both double). */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
    val head =
      "WITH e AS MATERIALIZED (SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS DOUBLE) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
        "JOIN nation cn ON c.c_nationkey = cn.n_nationkey " +
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey GROUP BY 1, 2), " +
        "thin AS MATERIALIZED (SELECT src, dst FROM e WHERE w > 1.2 * (SELECT AVG(w) FROM e)), " +
        "c0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS x, GREATEST(src, dst) AS y FROM thin WHERE src <> dst)"
    val steps = (1 to rounds).map { t =>
      val prev = s"c${t - 1}"
      s", kp$t AS MATERIALIZED (SELECT node FROM (SELECT node, COUNT(*) AS c FROM (" +
        s"SELECT x AS node FROM $prev UNION ALL SELECT y FROM $prev) GROUP BY node) WHERE c >= $k)" +
        s", c$t AS MATERIALIZED (SELECT x, y FROM $prev " +
        s"WHERE x IN (SELECT node FROM kp$t) AND y IN (SELECT node FROM kp$t))"
    }.mkString
    head + steps +
      s" SELECT node, COUNT(*) AS deg FROM (SELECT x AS node FROM c$rounds " +
      s"UNION ALL SELECT y FROM c$rounds) GROUP BY node ORDER BY node"
  }

  private def semDedupOracles: Map[String, String] = scala.util.Try {
    import Queries.SemDedupFixture._
    val spark = SparkSession.active
    val sfDir = sys.props("graft.oracle.sfDir") // no default: throws if unset
    val emb = Tables.embeddings(spark, sfDir)
    val cs = graft.operators.Similarity.ivfTrain(
      emb, "vec_id", "embedding", nCells, lloydIters = lloydIters,
      trainCap = trainCap)
    crossCheckCellAssignment(emb, cs)
    val dists = cs.map { c =>
      val cc = c.map(x => x * x).sum
      s"($cc - 2*list_dot_product(e, ${c.mkString("[", ",", "]")}))"
    }.mkString("[", ",", "]")
    val cents = cs.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    val cnorms = cs.map(c => math.sqrt(c.map(x => x * x).sum))
      .mkString("[", ",", "]")
    // shared CTE prefix: cell assignment (proved-out first-min argmin),
    // rounded centroid cosine, normalized vector, and the semdedup drop
    // set d (precedence rule over ROUNDED cent_cos)
    val prefix =
      "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
        s"a AS (SELECT vec_id, e, list_position(ds, list_min(ds)) - 1 AS cell " +
        s"FROM (SELECT vec_id, e, $dists AS ds FROM v)), " +
        s"cc AS (SELECT vec_id, cell, " +
        // zero-norm guard mirrors Similarity.semDeDup: cent_cos pinned
        // to 0.0 for a zero-norm ROW or CENTROID, never 0/0 (NULL in
        // DuckDB, NaN in Spark)
        "CASE WHEN sqrt(list_dot_product(e,e)) = 0 " +
        s"OR (CAST($cnorms AS DOUBLE[]))[cell+1] = 0 THEN 0.0 ELSE " +
        s"ROUND(list_dot_product(e, (CAST($cents AS DOUBLE[][]))[cell+1]) / " +
        s"(sqrt(list_dot_product(e,e)) * (CAST($cnorms AS DOUBLE[]))[cell+1]), 4) + 0 END AS cent_cos, " +
        "CASE WHEN sqrt(list_dot_product(e,e)) = 0 THEN e " +
        "ELSE list_transform(e, x -> x / sqrt(list_dot_product(e,e))) END AS u FROM a), " +
        "d AS (SELECT DISTINCT a.vec_id FROM cc a JOIN cc b " +
        "ON a.cell = b.cell AND a.vec_id <> b.vec_id " +
        "WHERE (b.cent_cos < a.cent_cos OR (b.cent_cos = a.cent_cos AND b.vec_id < a.vec_id)) " +
        s"AND list_dot_product(a.u, b.u) >= $tau) "
    val semdedup = prefix +
      "SELECT cc.vec_id, CAST(cc.cell AS BIGINT) AS cell, cc.cent_cos, " +
      "d.vec_id IS NULL AS keep " +
      "FROM cc LEFT JOIN d ON cc.vec_id = d.vec_id ORDER BY cc.vec_id"
    // D4: per-cell prototype rank over the semdedup SURVIVORS (kept
    // rows), top ceil(0.1 · n_kept) by (cent_cos desc, id asc) → proto
    val d4 = prefix +
      ", k AS (SELECT cc.vec_id, cc.cell, cc.cent_cos FROM cc " +
      "LEFT JOIN d ON cc.vec_id = d.vec_id WHERE d.vec_id IS NULL), " +
      "r AS (SELECT vec_id, " +
      "ROW_NUMBER() OVER (PARTITION BY cell ORDER BY cent_cos DESC, vec_id) AS rk, " +
      "COUNT(*) OVER (PARTITION BY cell) AS n FROM k) " +
      "SELECT cc.vec_id, CAST(cc.cell AS BIGINT) AS cell, cc.cent_cos, " +
      "CASE WHEN d.vec_id IS NOT NULL THEN 'dup' " +
      s"WHEN r.rk <= CAST(ceil($dropFrac * r.n) AS BIGINT) THEN 'proto' " +
      "ELSE 'kept' END AS stage " +
      "FROM cc LEFT JOIN d ON cc.vec_id = d.vec_id " +
      "LEFT JOIN r ON cc.vec_id = r.vec_id ORDER BY cc.vec_id"
    Map("x_semdedup" -> semdedup, "x_d4_prune" -> d4)
  }.getOrElse(Map.empty)

  /** Dump-time guard for ivfOracleSql: assert that the SQL's cell
    * assignment (argmin of |c|²−2·e·c, first minimum) agrees with
    * `Similarity.nearestCell` for every corpus vector. The local
    * replica sums left-to-right; this ASSUMES DuckDB's
    * `list_dot_product` accumulates in the same order — if DuckDB ever
    * reorders the summation (e.g. SIMD pairwise), a near-equidistant
    * vector could pass this guard yet land in a different cell in the
    * SQL. The failure mode stays loud either way (a Verify hash
    * mismatch, never a false pass); the guard just narrows it to
    * dump time under that assumption. Collect is capped: oracle dumps
    * run at sf≤0.1 (≤5 k vectors), and a corpus past the cap throws →
    * the Try in ivfOracleSql omits the entry (driver falls back to
    * rows-only) instead of materializing an unbounded corpus on the
    * driver. */
  private def crossCheckCellAssignment(emb: DataFrame,
                                       cs: Array[Array[Double]]): Unit = {
    val cap = 100000
    val ccs = cs.map(c => c.map(x => x * x).sum)
    val rows = emb.select(
      org.apache.spark.sql.functions.col("vec_id").cast("long"),
      org.apache.spark.sql.functions.col("embedding").cast("array<double>"))
      .limit(cap + 1)
      .collect()
    require(rows.length <= cap,
      s"x_ivf_topk oracle cross-check: corpus exceeds $cap vectors — " +
        "refusing the driver-side collect; entry falls back to rows-only")
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val sparkCell = graft.operators.Similarity.nearestCell(v, cs)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var dot = 0.0; var i = 0
        val cv = cs(c)
        while (i < v.length) { dot += v(i) * cv(i); i += 1 }
        val d = ccs(c) - 2 * dot
        if (d < bestD) { bestD = d; best = c } // strictly-less = first min
        c += 1
      }
      if (best != sparkCell) {
        System.err.println(s"[oracle] x_ivf_topk cell-assignment divergence " +
          s"at vec_id=${r.getLong(0)}: spark=$sparkCell sql-form=$best — " +
          "omitting the hash oracle (driver falls back to rows-only)")
        throw new IllegalStateException("ivf oracle cell-assignment divergence")
      }
    }
  }

  /** DuckDB oracle for x_pq_topk, generated AT DUMP TIME under the same
    * contract as [[ivfOracleSql]] (active session + explicit
    * `graft.oracle.sfDir`, Try-omitted anywhere else → rows-only
    * fallback): the deterministic `Similarity.pqTrain` fold runs
    * against the dump corpus, and the per-subspace codebooks, the
    * query's ADC lookup tables (`q_s · c`, `|c|²`) and `|q|` are
    * embedded as literals. Per-subspace cell assignment uses the same
    * monotone `|c|² − 2·e_s·c` first-min form the IVF oracle proved out,
    * cross-checked against `Similarity.nearestCell` on every corpus
    * vector before the SQL is emitted (same loud-failure posture and
    * the same documented list_dot_product accumulation-order
    * assumption). All parameters come from [[Queries.PqFixture]]. */
  private def pqOracleSql: Option[(String, String)] = scala.util.Try {
    import Queries.PqFixture._
    val spark = SparkSession.active
    val sfDir = sys.props("graft.oracle.sfDir") // no default: throws if unset
    val emb = Tables.embeddings(spark, sfDir)
    val cbs = graft.operators.Similarity.pqTrain(
      emb, "vec_id", "embedding", m, ks, lloydIters = lloydIters,
      trainCap = trainCap)
    val qVec = emb.where(org.apache.spark.sql.functions.col("vec_id") === queryId)
      .select(org.apache.spark.sql.functions.col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val sub = qVec.length / m
    // ADC lookup tables, identical construction to pqTopK's
    val qDots = Array.tabulate(m) { s =>
      cbs(s).map { c =>
        var d = 0.0; var i = 0
        while (i < sub) { d += qVec(s * sub + i) * c(i); i += 1 }
        d
      }
    }
    val cNorm2 = Array.tabulate(m)(s => cbs(s).map(c => c.map(x => x * x).sum))
    val qNorm = math.sqrt(qVec.map(x => x * x).sum)
    crossCheckPqAssignment(emb, cbs)
    def dists(s: Int): String = cbs(s).map { c =>
      val cc = c.map(x => x * x).sum
      s"($cc - 2*list_dot_product(e[${s * sub + 1}:${(s + 1) * sub}], ${c.mkString("[", ",", "]")}))"
    }.mkString("[", ",", "]")
    val dsCols = (0 until m).map(s => s"${dists(s)} AS ds$s").mkString(", ")
    val cellCols = (0 until m)
      .map(s => s"list_position(ds$s, list_min(ds$s)) - 1 AS c$s").mkString(", ")
    val num = (0 until m)
      .map(s => s"list_extract(${qDots(s).mkString("[", ",", "]")}, c$s + 1)")
      .mkString(" + ")
    val n2 = (0 until m)
      .map(s => s"list_extract(${cNorm2(s).mkString("[", ",", "]")}, c$s + 1)")
      .mkString(" + ")
    val sql =
      "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
        s"d AS (SELECT vec_id, $dsCols FROM v), " +
        s"a AS (SELECT vec_id, $cellCols FROM d) " +
        s"SELECT vec_id, ROUND(CASE WHEN $qNorm * sqrt($n2) = 0 THEN 0.0 " +
        s"ELSE ($num) / ($qNorm * sqrt($n2)) END, 4) + 0 AS cos " +
        s"FROM a WHERE vec_id <> $queryId ORDER BY cos DESC, vec_id LIMIT $k"
    "x_pq_topk" -> sql
  }.toOption

  /** DuckDB oracle for x_ivfadc_topk: the [[ivfOracleSql]] coarse-cell
    * routing composed with the [[pqOracleSql]] ADC scoring, generated
    * at dump time under the same contract — both training folds re-run
    * against the dump corpus, both cross-checks applied, all literals
    * embedded. A vector scores iff its coarse cell is probed. */
  /** DuckDB oracle for x_bpe_encode, generated AT DUMP TIME (needs the
    * data: the learned merge list is a function of the corpus word
    * frequencies). The word→(toks, ids) table — built by the SAME
    * train/encode code path the operator runs, every entry round-trip
    * `require`d in [[graft.operators.Pipelines.bpeEncodingTable]] —
    * ships as a VALUES literal; the SQL then replays only the
    * distributed part (position-exploded word stream, mapping join,
    * ordered per-doc reassembly), which is exactly the part the oracle
    * exists to check. Same contract as [[ivfOracleSql]]: active session
    * + `graft.oracle.sfDir`, Try-omitted elsewhere → rows-only check. */
  /** The word→(toks, ids, n) VALUES literal all three BPE oracles share,
    * memoized per sfDir — the training fold is deterministic, so one
    * computation serves x_bpe_encode, x_bpe_roundtrip AND
    * x_bpe_fertility without re-collecting the vocabulary per entry.
    * The cache key pairs sfDir with a FINGERPRINT of the documents
    * fixture (file names + lengths + mtimes), so a long-lived session
    * that regenerates fixtures in place under the same path invalidates
    * the memo automatically instead of dumping a stale oracle. */
  private val bpeValuesCache =
    scala.collection.mutable.Map.empty[(String, Long), String]
  private def fixtureFingerprint(sfDir: String): Long = {
    def walk(f: java.io.File): Long = {
      val self = f.getName.hashCode.toLong * 31L +
        f.length * 17L + f.lastModified
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .sortBy(_.getName)
        .foldLeft(self)((acc, k) => acc * 1000003L + walk(k))
    }
    walk(new java.io.File(sfDir, "documents.parquet"))
  }
  private def bpeValuesLiteral(): String = {
    val spark = SparkSession.active
    val sfDir = sys.props("graft.oracle.sfDir") // no default: throws if unset
    bpeValuesCache.synchronized {
      bpeValuesCache.getOrElseUpdate(sfDir -> fixtureFingerprint(sfDir), {
        val docs = Tables.documents(spark, sfDir)
        val table = graft.operators.Pipelines.bpeEncodingTable(
          docs, "text", numMerges = 30)
        table.map { case (w, t, i, n) =>
          s"('${w.replace("'", "''")}', '${t.replace("'", "''")}', '$i', $n)"
        }.mkString(", ")
      })
    }
  }

  /** The distributed-replay SQL every word→encoding oracle shares
    * (BPE and unigram): position-exploded word stream, mapping join,
    * ordered per-doc reassembly — exactly the part under test; the
    * learned table itself ships as the `values` literal. */
  private def wordEncodingReplaySql(values: String): String =
    s"WITH m(word, toks, ids, nt) AS (VALUES $values), " +
      "d AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents), " +
      "ti AS (SELECT doc_id, s, UNNEST(range(1, len(s) + 1)) AS pos FROM d), " +
      "w AS (SELECT doc_id, pos, s[pos] AS word FROM ti WHERE len(s[pos]) >= 1), " +
      "j AS (SELECT doc_id, pos, toks, ids, nt FROM w JOIN m USING (word)), " +
      "a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, CAST(SUM(nt) AS BIGINT) AS n_tokens, " +
      "string_agg(toks, '|' ORDER BY pos) AS toks_str, string_agg(ids, ',' ORDER BY pos) AS ids_str " +
      "FROM j GROUP BY doc_id) " +
      "SELECT doc_id, n_words, n_tokens, toks_str, ids_str FROM a ORDER BY doc_id"

  private def bpeOracleSql: Option[(String, String)] = scala.util.Try {
    "x_bpe_encode" -> wordEncodingReplaySql(bpeValuesLiteral())
  }.toOption

  /** x_unigram_dist's dump-time oracle: the CAPPED trainer's model on
    * the same corpus as VALUES literals — the [[bpeDistOracleSql]]
    * convention for the unigram half. The entry runs the distributed
    * trainer; identical exact counts through the same driver folds make
    * even the log-probs bit-equal (both sides ROUND to 6 dp for the
    * compare). Exactness needs the vocabulary under the local trainCap,
    * asserted loudly (entry omitted → rows-only fallback past it). */
  private def unigramDistOracleSql: Option[(String, String)] = scala.util.Try {
    val spark = SparkSession.active
    val sfDir = sys.props("graft.oracle.sfDir")
    val docs = Tables.documents(spark, sfDir)
    val cap = 1000000
    val nVocab = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("__w"))
      .where(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("__w")) >= 1)
      .select("__w").distinct().count()
    require(nVocab <= cap,
      s"x_unigram_dist oracle: $nVocab distinct words exceeds the local " +
        s"trainer's cap $cap — differential not exact, omitting")
    val model = graft.operators.Pipelines.unigramTrainModel(
      docs, "text", vocabSize = Queries.UnigramFixture.vocabSize,
      maxPieceLen = Queries.UnigramFixture.maxPieceLen,
      emIters = Queries.UnigramFixture.emIters)
    require(model.pieces.nonEmpty,
      "x_unigram_dist oracle: empty model (empty VALUES is invalid " +
        "SQL), omitting")
    // pieces as the trainer's own hex transport (lossless for lone
    // surrogates on astral corpora; plain hex digits need no SQL
    // escaping); "+ 0" folds -0.0 like the Spark side
    val values = model.pieces.zipWithIndex.map { case ((p, lp), i) =>
      s"($i, '${graft.operators.Pipelines.hexUnits(p)}', $lp)"
    }.mkString(", ")
    "x_unigram_dist" ->
      (s"SELECT CAST(ord AS BIGINT) AS ord, piece_hex, " +
        s"ROUND(CAST(lp AS DOUBLE), 6) + 0 AS log_prob " +
        s"FROM (VALUES $values) AS t(ord, piece_hex, lp) ORDER BY ord")
  }.toOption

  /** x_bpe_dist_merges' dump-time oracle: the LOCAL trainer
    * ([[graft.operators.Pipelines.bpeTrainModel]]) runs on the same
    * corpus and its merge sequence ships as VALUES literals — a true
    * distributed-vs-local differential (the entry runs the distributed
    * trainer; equal sequences are the theorem under test). Exactness
    * requires the vocabulary under the local trainCap, asserted loudly
    * (entry omitted → rows-only fallback past it). */
  private def bpeDistOracleSql: Option[(String, String)] = scala.util.Try {
    val spark = SparkSession.active
    val sfDir = sys.props("graft.oracle.sfDir")
    val docs = Tables.documents(spark, sfDir)
    val cap = 1000000
    val nVocab = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("__w"))
      .where(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("__w")) >= 1)
      .select("__w").distinct().count()
    require(nVocab <= cap,
      s"x_bpe_dist_merges oracle: $nVocab distinct words exceeds the " +
        s"local trainer's cap $cap — differential not exact, omitting")
    val model = graft.operators.Pipelines.bpeTrainModel(
      docs, "text", Queries.BpeDistFixture.numMerges)
    require(model.merges.nonEmpty,
      "x_bpe_dist_merges oracle: empty merge sequence (empty VALUES is " +
        "invalid SQL), omitting")
    val values = model.merges.zipWithIndex.map { case ((a, b), i) =>
      s"(${i + 1}, '${a.replace("'", "''")}', '${b.replace("'", "''")}')"
    }.mkString(", ")
    "x_bpe_dist_merges" ->
      (s"SELECT CAST(rank AS BIGINT) AS rank, left_sym, right_sym " +
        s"FROM (VALUES $values) AS t(rank, left_sym, right_sym) " +
        "ORDER BY rank")
  }.toOption

  /** x_unigram_lm's dump-time oracle: the SAME replay SQL over a
    * word→encoding VALUES table built by the unigram train/Viterbi-
    * encode path itself ([[graft.operators.Pipelines.unigramEncodingTable]],
    * every entry round-trip `require`d), cached per (sfDir, fixture
    * fingerprint) like the BPE literal. */
  private val unigramValuesCache =
    scala.collection.mutable.Map.empty[(String, Long), String]
  private def unigramValuesLiteral(): String = {
    val spark = SparkSession.active
    val sfDir = sys.props("graft.oracle.sfDir")
    unigramValuesCache.synchronized {
      unigramValuesCache.getOrElseUpdate(sfDir -> fixtureFingerprint(sfDir), {
        val docs = Tables.documents(spark, sfDir)
        val model = graft.operators.Pipelines.unigramTrainModel(
          docs, "text", vocabSize = Queries.UnigramFixture.vocabSize,
          maxPieceLen = Queries.UnigramFixture.maxPieceLen,
          emIters = Queries.UnigramFixture.emIters)
        val table = graft.operators.Pipelines.unigramEncodingTable(
          docs, "text", model)
        table.map { case (w, t, i, n) =>
          s"('${w.replace("'", "''")}', '${t.replace("'", "''")}', '$i', $n)"
        }.mkString(", ")
      })
    }
  }

  private def unigramOracleSql: Option[(String, String)] = scala.util.Try {
    "x_unigram_lm" -> wordEncodingReplaySql(unigramValuesLiteral())
  }.toOption

  /** x_bpe_roundtrip shares x_bpe_encode's dump-time oracle verbatim:
    * the roundtrip entry encodes with a SAVED-then-LOADED model, so a
    * hash match against the same ground truth proves artifact
    * persistence is encoding-transparent. */
  private def bpeRoundtripOracleSql: Option[(String, String)] =
    bpeOracleSql.map { case (_, sql) => "x_bpe_roundtrip" -> sql }

  /** x_bpe_fertility / x_unigram_fertility: the dump-time word→encoding
    * table of the respective tokenizer, rolled up per language —
    * replays only the distributed half (word stream, mapping join,
    * lang rollup), exactly the part under test. */
  private def fertilityReplaySql(values: String): String =
    s"WITH m(word, toks, ids, nt) AS (VALUES $values), " +
      "d AS (SELECT doc_id, lang, string_split(text, ' ') AS s FROM documents), " +
      "ti AS (SELECT doc_id, lang, s, UNNEST(range(1, len(s) + 1)) AS pos FROM d), " +
      "w AS (SELECT doc_id, lang, s[pos] AS word FROM ti WHERE len(s[pos]) >= 1), " +
      "j AS (SELECT doc_id, lang, nt FROM w JOIN m USING (word)) " +
      "SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, " +
      "CAST(COUNT(*) AS BIGINT) AS n_words, CAST(SUM(nt) AS BIGINT) AS n_tokens, " +
      "ROUND(CAST(SUM(nt) AS DOUBLE) / COUNT(*), 6) AS fertility " +
      "FROM j GROUP BY lang ORDER BY lang"

  private def bpeFertilityOracleSql: Option[(String, String)] = scala.util.Try {
    "x_bpe_fertility" -> fertilityReplaySql(bpeValuesLiteral())
  }.toOption

  private def unigramFertilityOracleSql: Option[(String, String)] =
    scala.util.Try {
      "x_unigram_fertility" -> fertilityReplaySql(unigramValuesLiteral())
    }.toOption

  private def ivfadcOracleSql: Option[(String, String)] = scala.util.Try {
    val spark = SparkSession.active
    val sfDir = sys.props("graft.oracle.sfDir") // no default: throws if unset
    val emb = Tables.embeddings(spark, sfDir)
    val coarse = graft.operators.Similarity.ivfTrain(
      emb, "vec_id", "embedding", Queries.IvfFixture.nCells,
      lloydIters = Queries.IvfFixture.lloydIters,
      trainCap = Queries.IvfFixture.trainCap)
    val cbs = graft.operators.Similarity.pqTrain(
      emb, "vec_id", "embedding", Queries.PqFixture.m, Queries.PqFixture.ks,
      lloydIters = Queries.PqFixture.lloydIters,
      trainCap = Queries.PqFixture.trainCap)
    val qVec = emb.where(org.apache.spark.sql.functions.col("vec_id") === Queries.PqFixture.queryId)
      .select(org.apache.spark.sql.functions.col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val m = Queries.PqFixture.m
    val sub = qVec.length / m
    val probes = graft.operators.Similarity.ivfProbes(
      coarse, qVec, Queries.IvfFixture.nProbe)
    crossCheckCellAssignment(emb, coarse)
    crossCheckPqAssignment(emb, cbs)
    val qDots = Array.tabulate(m) { s =>
      cbs(s).map { c =>
        var d = 0.0; var i = 0
        while (i < sub) { d += qVec(s * sub + i) * c(i); i += 1 }
        d
      }
    }
    val cNorm2 = Array.tabulate(m)(s => cbs(s).map(c => c.map(x => x * x).sum))
    val qNorm = math.sqrt(qVec.map(x => x * x).sum)
    val coarseDists = coarse.map { c =>
      val cc = c.map(x => x * x).sum
      s"($cc - 2*list_dot_product(e, ${c.mkString("[", ",", "]")}))"
    }.mkString("[", ",", "]")
    def pqDists(s: Int): String = cbs(s).map { c =>
      val cc = c.map(x => x * x).sum
      s"($cc - 2*list_dot_product(e[${s * sub + 1}:${(s + 1) * sub}], ${c.mkString("[", ",", "]")}))"
    }.mkString("[", ",", "]")
    val dsCols = (0 until m).map(s => s"${pqDists(s)} AS ds$s").mkString(", ")
    val cellCols = (0 until m)
      .map(s => s"list_position(ds$s, list_min(ds$s)) - 1 AS c$s").mkString(", ")
    val num = (0 until m)
      .map(s => s"list_extract(${qDots(s).mkString("[", ",", "]")}, c$s + 1)")
      .mkString(" + ")
    val n2 = (0 until m)
      .map(s => s"list_extract(${cNorm2(s).mkString("[", ",", "]")}, c$s + 1)")
      .mkString(" + ")
    val sql =
      "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
        s"d AS (SELECT vec_id, $coarseDists AS cds, $dsCols FROM v), " +
        s"a AS (SELECT vec_id, list_position(cds, list_min(cds)) - 1 AS ccell, $cellCols FROM d) " +
        s"SELECT vec_id, ROUND(CASE WHEN $qNorm * sqrt($n2) = 0 THEN 0.0 " +
        s"ELSE ($num) / ($qNorm * sqrt($n2)) END, 4) + 0 AS cos " +
        s"FROM a WHERE ccell IN (${probes.mkString(",")}) " +
        s"AND vec_id <> ${Queries.PqFixture.queryId} " +
        s"ORDER BY cos DESC, vec_id LIMIT ${Queries.PqFixture.k}"
    "x_ivfadc_topk" -> sql
  }.toOption

  /** Dump-time guard for [[pqOracleSql]]: per subspace, the SQL's
    * first-min `|c|²−2·e_s·c` assignment must agree with
    * `Similarity.nearestCell` on every corpus vector (same capped
    * collect and same loud-omission behavior as
    * [[crossCheckCellAssignment]]). */
  private def crossCheckPqAssignment(emb: DataFrame,
                                     cbs: Array[Array[Array[Double]]]): Unit = {
    val cap = 100000
    val rows = emb.select(
      org.apache.spark.sql.functions.col("vec_id").cast("long"),
      org.apache.spark.sql.functions.col("embedding").cast("array<double>"))
      .limit(cap + 1)
      .collect()
    require(rows.length <= cap,
      s"x_pq_topk oracle cross-check: corpus exceeds $cap vectors — " +
        "refusing the driver-side collect; entry falls back to rows-only")
    val m = cbs.length
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val sub = v.length / m
      var s = 0
      while (s < m) {
        val vs = java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub)
        val sparkCell = graft.operators.Similarity.nearestCell(vs, cbs(s))
        var best = 0; var bestD = Double.MaxValue
        var ci = 0
        while (ci < cbs(s).length) {
          val c = cbs(s)(ci)
          var dot = 0.0; var i = 0
          while (i < sub) { dot += vs(i) * c(i); i += 1 }
          var cc = 0.0; i = 0
          while (i < sub) { cc += c(i) * c(i); i += 1 }
          val d = cc - 2 * dot
          if (d < bestD) { bestD = d; best = ci } // strictly-less = first min
          ci += 1
        }
        if (best != sparkCell) {
          System.err.println(s"[oracle] x_pq_topk cell-assignment divergence " +
            s"at vec_id=${r.getLong(0)} subspace=$s: spark=$sparkCell " +
            s"sql-form=$best — omitting the hash oracle")
          throw new IllegalStateException("pq oracle cell-assignment divergence")
        }
        s += 1
      }
    }
  }

  /** Per-bit simhash vote-and-set terms (Dedup.simHash, 60 md5 bits). */
  private def simhashBitsSql: String =
    (0 until graft.operators.Dedup.simHashBits).map { b =>
      s"(CASE WHEN SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0 " +
        s"THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_json_extract" -> (Queries.q1 _),
    "q02_tz_date" -> (Queries.q2 _),
    "q03_project" -> (Queries.q3 _),
    "q04_filter" -> (Queries.q4 _),
    "q05_distinct" -> (Queries.q5 _),
    "q06_case_cast" -> (Queries.q6 _),
    "q07_star_join" -> (Queries.q7 _),
    "q08_big_join" -> (Queries.q8 _),
    "q09_outer_join" -> (Queries.q9 _),
    "q10_semi_anti" -> (Queries.q10 _),
    "q11_cross_join" -> (Queries.q11 _),
    "q12_range_join" -> (Queries.q12 _),
    "q13_asof_join" -> (Queries.q13 _),
    "q14_group_agg" -> (Queries.q14 _),
    "q15_count_distinct" -> (Queries.q15 _),
    "q16_rollup" -> (Queries.q16 _),
    "q17_filtered_agg" -> (Queries.q17 _),
    "q18_collect" -> (Queries.q18 _),
    "q19_median" -> (Queries.q19 _),
    "q20_udaf_wavg" -> (Queries.q20 _),
    "q21_rank" -> (Queries.q21 _),
    "q22_lag_lead" -> (Queries.q22 _),
    "q23_running_sum" -> (Queries.q23 _),
    "q24_range_frame" -> (Queries.q24 _),
    "q25_topk_per_group" -> (Queries.q25 _),
    "q26_topk" -> (Queries.q26 _),
    "q27_union" -> (Queries.q27 _),
    "q28_set_ops" -> (Queries.q28 _),
    "q29_string_fns" -> (Queries.q29 _),
    "q30_date_fns" -> (Queries.q30 _),
    "q31_math_fns" -> (Queries.q31 _),
    "q32_json_agg" -> (Queries.q32 _),
    "q33_array_fns" -> (Queries.q33 _),
    "q34_map_fns" -> (Queries.q34 _),
    "q35_hash_fns" -> (Queries.q35 _),
    "q36_udf_tokens" -> (Queries.q36 _),
    "q37_tumbling" -> (Queries.q37 _),
    "q38_sliding" -> (Queries.q38 _),
    "q39_session" -> (Queries.q39 _),
    "q40_exact_dedup" -> (Queries.q40 _),
    "q41_jaccard_pairs" -> (Queries.q41 _),
    "q42_cosine_topk" -> (Queries.q42 _),
    "q43_text_stats" -> (Queries.q43 _),
    "q44_multimodal_join" -> (Queries.q44 _),
    "q45_cube" -> (Queries.q45 _),
    "q46_hof_arrays" -> (Queries.q46 _),
    "q47_string_fns2" -> (Queries.q47 _),
    "q48_map_fns2" -> (Queries.q48 _),
    "q49_date_fns2" -> (Queries.q49 _),
    "q50_explode_agg" -> (Queries.q50 _),
    "q51_pivot" -> (Queries.q51 _),
    "q52_window_fns2" -> (Queries.q52 _),
    "q53_chunking" -> (Queries.q53 _),
    // extras: no portable oracle → rows-only check
    "x_minhash_lsh" -> (Queries.xMinHashLsh _),
    "x_dedup_clusters" -> (Queries.xDedupClusters _),
    "x_simhash" -> (Queries.xSimHash _),
    "x_simhash_pairs" -> (Queries.xSimHashPairs _),
    "x_simhash_clusters" -> (Queries.xSimHashClusters _),
    "x_ngram_jaccard" -> (Queries.xNgramJaccard _),
    "x_ann_topk" -> (Queries.xAnnTopK _),
    "x_knn_join" -> (Queries.xKnnJoin _),
    "x_ann_knn_join" -> (Queries.xAnnKnnJoin _),
    "x_ivf_topk" -> (Queries.xIvfTopK _),
    "x_ivf_topk_loaded" -> (Queries.xIvfTopKLoaded _),
    "x_semdedup" -> (Queries.xSemDedup _),
    "x_d4_prune" -> (Queries.xD4Prune _),
    "x_embed_neardup" -> (Queries.xEmbedNearDup _),
    "x_cosine_clusters" -> (Queries.xCosineClusters _),
    "x_bm25" -> (Queries.xBm25 _),
    "x_lang_id" -> (Queries.xLangId _),
    "x_lang_id_ngram" -> (Queries.xLangIdNgram _),
    "x_url_normalize" -> (Queries.xUrlNormalize _),
    "x_domain_stats" -> (Queries.xDomainStats _),
    "x_token_stats" -> (Queries.xTokenStats _),
    "x_blocklist" -> (Queries.xBlocklist _),
    "x_html_strip" -> (Queries.xHtmlStrip _),
    "x_multimodal" -> (Queries.xMultimodal _),
    "x_media_phash" -> (Queries.xMediaPhash _),
    "x_cdc_ingest" -> (Queries.xCdcIngest _),
    "x_orc_sink" -> (Queries.xOrcSinkRoundtrip _),
    "x_tfidf" -> (Queries.xTfIdf _),
    "x_split" -> (Queries.xSplit _),
    "x_sample" -> (Queries.xSample _),
    "x_pii_scrub" -> (Queries.xPiiScrub _),
    "x_bigram_topk" -> (Queries.xBigramTopK _),
    "x_embed_quant" -> (Queries.xEmbedQuant _),
    "x_winnow" -> (Queries.xWinnow _),
    "x_winnow_pairs" -> (Queries.xWinnowPairs _),
    "x_decontam" -> (Queries.xDecontam _),
    "x_incremental_dedup" -> (Queries.xIncrementalDedup _),
    "x_frame_sample" -> (Queries.xFrameSample _),
    "x_dedup_best" -> (Queries.xDedupBest _),
    "x_repetition" -> (Queries.xRepetition _),
    "x_gopher" -> (Queries.xGopher _),
    "x_pack" -> (Queries.xPack _),
    "x_mixture" -> (Queries.xMixture _),
    "x_pq_topk" -> (Queries.xPqTopK _),
    "x_pq_topk_loaded" -> (Queries.xPqTopKLoaded _),
    "x_ivfadc_topk" -> (Queries.xIvfAdcTopK _),
    "x_ivfadc_topk_loaded" -> (Queries.xIvfAdcTopKLoaded _),
    "x_shuffle" -> (Queries.xShuffle _),
    "x_lm_score" -> (Queries.xLmScore _),
    "x_dsir" -> (Queries.xDsir _),
    "x_source_stats" -> (Queries.xSourceStats _),
    "x_line_dedup" -> (Queries.xLineDedup _),
    "x_token_entropy" -> (Queries.xTokenEntropy _),
    "x_vocab_coverage" -> (Queries.xVocabCoverage _),
    "x_zscore" -> (Queries.xZScore _),
    "x_rrf_fusion" -> (Queries.xRrfFusion _),
    "x_quantile_cut" -> (Queries.xQuantileCut _),
    "x_norm_dedup" -> (Queries.xNormDedup _),
    "x_substring_dedup" -> (Queries.xSubstringDedup _),
    "x_ngram_novelty" -> (Queries.xNgramNovelty _),
    "x_containment" -> (Queries.xContainment _),
    "x_hard_negatives" -> (Queries.xHardNegatives _),
    "x_ppl_buckets" -> (Queries.xPplBuckets _),
    "x_kmv_overlap" -> (Queries.xKmvOverlap _),
    "x_incr_neardup" -> (Queries.xIncrementalNearDup _),
    "x_bpe_merges" -> (Queries.xBpeMerges _),
    "x_bpe_dist_merges" -> (Queries.xBpeDistMerges _),
    "x_bpe_encode" -> (Queries.xBpeEncode _),
    "x_bpe_roundtrip" -> (Queries.xBpeRoundtrip _),
    "x_unigram_lm" -> (Queries.xUnigramLm _),
    "x_unigram_dist" -> (Queries.xUnigramDist _),
    "x_unigram_fertility" -> (Queries.xUnigramFertility _),
    "x_quality_lr" -> (Queries.xQualityLr _),
    "x_cluster_split" -> (Queries.xClusterSplit _),
    "x_temperature" -> (Queries.xTemperature _),
    "x_entity_match" -> (Queries.xEntityMatch _),
    "x_entity_match_indel" -> (Queries.xEntityMatchIndel _),
    "x_pagerank" -> (Queries.xPageRank _),
    "x_ppr" -> (Queries.xPpr _),
    "x_curation_funnel" -> (Queries.xCurationFunnel _),
    "x_event_funnel" -> (Queries.xEventFunnel _),
    "x_retention" -> (Queries.xRetention _),
    "x_event_transitions" -> (Queries.xEventTransitions _),
    "x_corpus_diff" -> (Queries.xCorpusDiff _),
    "x_profile" -> (Queries.xProfile _),
    "x_quota_sample" -> (Queries.xQuotaSample _),
    "x_weighted_sample" -> (Queries.xWeightedSample _),
    "x_weighted_quota" -> (Queries.xWeightedQuota _),
    "x_histogram" -> (Queries.xHistogram _),
    "x_latest_snapshot" -> (Queries.xLatestSnapshot _),
    "x_scd2" -> (Queries.xScd2 _),
    "x_scd2_merge" -> (Queries.xScd2Merge _),
    "x_triangles" -> (Queries.xTriangles _),
    "x_hits" -> (Queries.xHits _),
    "x_communities" -> (Queries.xCommunities _),
    "x_kcore" -> (Queries.xKcore _),
    "x_cooccurrence" -> (Queries.xCooccurrence _),
    "x_assoc_rules" -> (Queries.xAssocRules _),
    "x_attribution" -> (Queries.xAttribution _),
    "x_expectations" -> (Queries.xExpectations _),
    "x_outliers" -> (Queries.xOutliers _),
    "x_skew_report" -> (Queries.xSkewReport _),
    "x_quantile_bins" -> (Queries.xQuantileBins _),
    "x_resample" -> (Queries.xResample _),
    "x_pii_redact" -> (Queries.xPiiRedact _),
    "x_collapse_runs" -> (Queries.xCollapseRuns _),
    "x_bloom_join" -> (Queries.xBloomJoin _),
    "x_ewma" -> (Queries.xEwma _),
    "x_bfs" -> (Queries.xBfs _),
    "x_winsorize" -> (Queries.xWinsorize _),
    "x_jaccard_join" -> (Queries.xJaccardJoin _),
    "x_agg_merge" -> (Queries.xAggMerge _),
    "x_drift" -> (Queries.xDrift _),
    "x_cat_drift" -> (Queries.xCatDrift _),
    "x_rfm" -> (Queries.xRfm _),
    "x_ohlc" -> (Queries.xOhlc _),
    "x_growth" -> (Queries.xGrowth _),
    "x_time_to_convert" -> (Queries.xTimeToConvert _),
    "x_session_paths" -> (Queries.xSessionPaths _),
    "x_cusum" -> (Queries.xCusum _),
    "x_adamic_adar" -> (Queries.xAdamicAdar _),
    "x_sssp" -> (Queries.xSssp _),
    "x_mutual_info" -> (Queries.xMutualInfo _),
    "x_inverted_index" -> (Queries.xInvertedIndex _),
    "q54_unpivot" -> (Queries.q54 _),
    "x_ks_drift" -> (Queries.xKsDrift _),
    "x_xcorr" -> (Queries.xXcorr _),
    "x_mnn" -> (Queries.xMnn _),
    "x_mnn_ann" -> (Queries.xMnnAnn _),
    "x_stickiness" -> (Queries.xStickiness _),
    "x_kanon" -> (Queries.xKanon _),
    "x_mad" -> (Queries.xMad _),
    "q55_grouping_sets" -> (Queries.q55 _),
    "x_sessions" -> (Queries.xSessions _),
    "x_path_ngrams" -> (Queries.xPathNgrams _),
    "x_label_centroids" -> (Queries.xLabelCentroids _),
    "x_logodds" -> (Queries.xLogOdds _),
    "x_benford" -> (Queries.xBenford _),
    "x_gini" -> (Queries.xGini _),
    "x_diversity" -> (Queries.xDiversity _),
    "x_readability" -> (Queries.xReadability _),
    "x_corr_matrix" -> (Queries.xCorrMatrix _),
    "x_pca_project" -> (Queries.xPcaProject _),
    "x_twap" -> (Queries.xTwap _),
    "x_wquantile" -> (Queries.xWeightedQuantile _),
    "x_session_window" -> (Queries.xSessionWindow _),
    "x_binned_mi" -> (Queries.xBinnedMi _),
    "x_unicode_norm" -> (Queries.xUnicodeNorm _),
    "x_corpus_export" -> (Queries.xCorpusExport _),
    "x_corpus_export_jsonl" -> (Queries.xCorpusExportJsonl _),
    "x_corpus_export_incr" -> (Queries.xCorpusExportIncr _),
    "x_webdataset" -> (Queries.xWebDataset _),
    "x_webdataset_incr" -> (Queries.xWebDatasetIncr _),
    "x_interp" -> (Queries.xInterp _),
    "x_rank_eval" -> (Queries.xRankEval _),
    "x_calibration" -> (Queries.xCalibration _),
    "x_time_split" -> (Queries.xTimeSplit _),
    "x_sem_decontam" -> (Queries.xSemDecontam _),
    "x_psi" -> (Queries.xPsi _),
    "x_kfold" -> (Queries.xKfold _),
    "x_zipf" -> (Queries.xZipf _),
    "x_roc_auc" -> (Queries.xRocAuc _),
    "x_salted_join" -> (Queries.xSaltedJoin _),
    "x_data_card" -> (Queries.xDataCard _),
    "x_int8_quant" -> (Queries.xInt8Quant _),
    "x_int8_topk" -> (Queries.xInt8Topk _),
    "x_bpe_fertility" -> (Queries.xBpeFertility _),
    "x_token_budget" -> (Queries.xTokenBudget _)
  )

  /** Bench-only entries (picked up by [[Bench]], NOT part of the
    * correctness surface — `x_orc_sink` covers the roundtrip with a real
    * oracle): the sink's write and read phases timed separately, so sink
    * throughput — the reference's entire job — is a first-class bench
    * number instead of a blended roundtrip. */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_orc_sink_write" -> (Queries.xOrcSinkWrite _),
    "x_orc_sink_read" -> (Queries.xOrcSinkRead _)
  )

  /** Table-side replay of the corpus-export manifest rollup (split =
    * md5 nibble, row hash = md5(id || text) 15-hex prefix, order-
    * independent XOR) — shared by the parquet and JSONL export entries:
    * the rollup is a pure function of the corpus CONTENT, so it must be
    * byte-identical whatever shard format carried it. */
  private val corpusExportRollupSql: String =
    "WITH h AS (SELECT " +
      "CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,1) AS BIGINT) < 14 THEN 'train' " +
      "WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,1) AS BIGINT) < 15 THEN 'val' " +
      "ELSE 'test' END AS split, " +
      "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || chr(1) || text),1,15) AS BIGINT) AS hl " +
      "FROM documents) " +
      "SELECT split, CAST(COUNT(*) AS BIGINT) AS docs, bit_xor(hl) AS content_xor " +
      "FROM h GROUP BY split ORDER BY split"

  /** x_data_card: every section replays its standalone entry's SQL
    * (x_profile's per-column arms, x_source_stats' rollup — also run
    * corpus-wide, x_gopher's signals feeding pass rates AND
    * x_curation_funnel's staged counts, x_zipf's OLS) melted to the
    * card's narrow (section, metric, key, value<double>) shape — the
    * assembled card must equal the dashboards it summarizes. */
  private val dataCardOracleSql: String = {
    val profileArms = Seq("doc_id", "text", "lang", "source", "n_chars")
      .flatMap { c => Seq(
        s"SELECT 'profile' AS section, 'n_nulls' AS metric, '$c' AS key, " +
          s"CAST(COUNT(CASE WHEN $c IS NULL THEN 1 END) AS DOUBLE) AS value FROM documents",
        s"SELECT 'profile', 'n_distinct', '$c', CAST(COUNT(DISTINCT $c) AS DOUBLE) FROM documents")
      }
    def statsArms(section: String, from: String) = Seq(
      s"SELECT '$section', 'n_docs', key, n_docs FROM $from",
      s"SELECT '$section', 'n_tokens', key, n_tokens FROM $from",
      s"SELECT '$section', 'avg_tokens', key, avg_tokens FROM $from",
      s"SELECT '$section', 'dup_frac', key, dup_frac FROM $from",
      s"SELECT '$section', 'n_langs', key, n_langs FROM $from")
    val statsSelect =
      "CAST(COUNT(*) AS DOUBLE) AS n_docs, " +
        "CAST(SUM(len(string_split(text,' '))) AS DOUBLE) AS n_tokens, " +
        "CAST(ROUND(AVG(CAST(len(string_split(text,' ')) AS DOUBLE)), 4) AS DOUBLE) AS avg_tokens, " +
        "CAST(ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS dup_frac, " +
        "CAST(COUNT(DISTINCT lang) AS DOUBLE) AS n_langs"
    val arms = profileArms ++
      statsArms("source", "srcstats") ++ statsArms("corpus", "cstats") ++ Seq(
      "SELECT 'lang', 'n_docs', key, CAST(n AS DOUBLE) FROM lstats",
      "SELECT 'lang', 'frac', key, CAST(ROUND(CAST(n AS DOUBLE) / (SELECT nt FROM ltot), 6) AS DOUBLE) FROM lstats",
      "SELECT 'gopher', 'n_docs', 'all', CAST(n AS DOUBLE) FROM gp",
      "SELECT 'gopher', 'n_pass', 'all', CAST(np AS DOUBLE) FROM gp",
      "SELECT 'gopher', 'pass_rate', 'all', CAST(ROUND(CAST(np AS DOUBLE) / n, 6) AS DOUBLE) FROM gp",
      "SELECT 'zipf', 'n_terms', 'all', CAST(n_terms AS DOUBLE) FROM zv2",
      "SELECT 'zipf', 'slope', 'all', CAST(CASE WHEN vx > 0 THEN ROUND(cxy / vx, 6) END AS DOUBLE) FROM zv2",
      "SELECT 'zipf', 'intercept', 'all', CAST(CASE WHEN vx > 0 THEN ROUND((dsy - cxy / vx * dsx) / nn, 6) END AS DOUBLE) FROM zv2",
      "SELECT 'zipf', 'r2', 'all', CAST(CASE WHEN vx > 0 AND vy > 0 THEN ROUND(cxy * cxy / (vx * vy), 6) END AS DOUBLE) FROM zv2",
      "SELECT 'funnel', 'n_raw', source, CAST(n_raw AS DOUBLE) FROM ff",
      "SELECT 'funnel', 'n_quality', source, CAST(n_quality AS DOUBLE) FROM ff",
      "SELECT 'funnel', 'n_dedup', source, CAST(n_dedup AS DOUBLE) FROM ff",
      "SELECT 'funnel', 'n_sampled', source, CAST(n_sampled AS DOUBLE) FROM ff")
    "WITH t AS (SELECT doc_id, text, source, list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
      "s AS (SELECT doc_id, text, source, CAST(len(tk) AS DOUBLE) AS nw, " +
      "COALESCE(list_sum(list_transform(tk, x -> length(x))), 0) AS wc, " +
      "length(text) - length(replace(text, '#', '')) AS hashes, " +
      "(length(text) - length(replace(text, '...', ''))) / 3 AS ell, " +
      "len(list_filter(tk, x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha, " +
      "len(list_intersect(list_distinct(list_transform(tk, x -> lower(x))), ['the','be','to','of','and','that','have','with'])) AS nstop FROM t), " +
      "p AS (SELECT doc_id, text, source, " +
      s"(nw BETWEEN ${Queries.DataCardFixture.minWords} AND 100000 AND wc / greatest(nw, 1.0) BETWEEN 3.0 AND 10.0 " +
      "AND (hashes + ell) / greatest(nw, 1.0) <= 0.1 AND alpha / greatest(nw, 1.0) >= 0.8 " +
      "AND nstop >= 2) AS passes FROM s), " +
      "k AS (SELECT MIN(doc_id) AS doc_id FROM p WHERE passes GROUP BY text), " +
      "f AS (SELECT p.doc_id, p.source, p.passes, k.doc_id IS NOT NULL AS kept FROM p LEFT JOIN k ON p.doc_id = k.doc_id), " +
      s"srcstats AS (SELECT source AS key, $statsSelect FROM documents GROUP BY source), " +
      s"cstats AS (SELECT 'all' AS key, $statsSelect FROM documents), " +
      "lstats AS (SELECT lang AS key, COUNT(*) AS n FROM documents GROUP BY lang), " +
      "ltot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nt FROM documents), " +
      "gp AS (SELECT COUNT(*) AS n, COUNT(CASE WHEN passes THEN 1 END) AS np FROM p), " +
      "ff AS (SELECT source, COUNT(*) AS n_raw, " +
      "COUNT(CASE WHEN passes THEN 1 END) AS n_quality, " +
      "COUNT(CASE WHEN kept THEN 1 END) AS n_dedup, " +
      s"COUNT(CASE WHEN kept AND CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) < ${Queries.DataCardFixture.keep256} THEN 1 END) AS n_sampled " +
      "FROM f GROUP BY source), " +
      "ztok AS (SELECT tok FROM documents, UNNEST(string_split(text, ' ')) AS u(tok) WHERE len(tok) > 0), " +
      "zc AS (SELECT tok, COUNT(*) AS n FROM ztok GROUP BY 1), " +
      s"ztop AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rk FROM zc ORDER BY n DESC, tok LIMIT ${Queries.DataCardFixture.zipfTopN}), " +
      "zs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_terms, " +
      "SUM(CAST(ROUND(ln(CAST(rk AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS sx, " +
      "SUM(CAST(ROUND(ln(CAST(n AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS sy, " +
      "SUM(CAST(ROUND(ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS sxx, " +
      "SUM(CAST(ROUND(ln(CAST(n AS DOUBLE)) * ln(CAST(n AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS syy, " +
      "SUM(CAST(ROUND(ln(CAST(rk AS DOUBLE)) * ln(CAST(n AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS sxy FROM ztop), " +
      "zv AS (SELECT n_terms, CAST(n_terms AS DOUBLE) AS nn, CAST(sx AS DOUBLE) / 1e12 AS dsx, CAST(sy AS DOUBLE) / 1e12 AS dsy, " +
      "CAST(sxx AS DOUBLE) / 1e12 AS dsxx, CAST(syy AS DOUBLE) / 1e12 AS dsyy, CAST(sxy AS DOUBLE) / 1e12 AS dsxy FROM zs), " +
      "zv2 AS (SELECT n_terms, nn, dsx, dsy, nn * dsxx - dsx * dsx AS vx, nn * dsyy - dsy * dsy AS vy, nn * dsxy - dsx * dsy AS cxy FROM zv) " +
      s"SELECT section, metric, key, value FROM (${arms.mkString(" UNION ALL ")}) " +
      "ORDER BY section, metric, key"
  }

  def oracleSql: Map[String, String] = Map(
    "x_data_card" -> dataCardOracleSql,
    "q01_json_extract" ->
      "SELECT event_id, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k FROM events WHERE event_type = 'signup' ORDER BY event_id",
    "q02_tz_date" ->
      "SELECT event_id, CAST(ts + INTERVAL 8 HOUR AS DATE) AS d FROM events ORDER BY event_id",
    "q03_project" ->
      "SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice * (1 - l_discount), 4) AS net FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q04_filter" ->
      "SELECT o_orderkey FROM orders WHERE o_orderstatus IN ('F','O') AND o_totalprice BETWEEN 1000 AND 100000 AND o_orderpriority LIKE '1%' AND o_orderdate IS NOT NULL ORDER BY o_orderkey",
    "q05_distinct" ->
      "SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type",
    "q06_case_cast" ->
      "SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS band, COALESCE(NULLIF(c_mktsegment,''),'NONE') AS seg, CAST(TRUNC(c_acctbal) AS BIGINT) AS bal_i FROM customer ORDER BY c_custkey",
    "q07_star_join" ->
      "SELECT n_name, COUNT(*) AS orders_cnt, ROUND(SUM(o_totalprice),4) AS total FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    "q08_big_join" ->
      "SELECT o_orderstatus, COUNT(*) AS li_cnt, ROUND(SUM(l_extendedprice),4) AS gross FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderstatus ORDER BY o_orderstatus",
    "q09_outer_join" ->
      "SELECT c_custkey, COUNT(o_orderkey) AS cnt FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey ORDER BY c_custkey",
    "q10_semi_anti" ->
      "SELECT c_custkey, EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_order FROM customer ORDER BY c_custkey",
    "q11_cross_join" ->
      "SELECT n_name, r_name FROM nation CROSS JOIN region WHERE n_regionkey <> r_regionkey ORDER BY n_name, r_name",
    "q12_range_join" ->
      "SELECT e1.event_id, COUNT(*) AS followers FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 10 MINUTE GROUP BY e1.event_id ORDER BY e1.event_id",
    "q13_asof_join" ->
      "SELECT e1.event_id, (SELECT MAX(e2.ts) FROM events e2 WHERE e2.user_id = e1.user_id AND e2.ts < e1.ts) AS prev_ts FROM events e1 ORDER BY e1.event_id",
    "q14_group_agg" ->
      "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity),4) AS sum_qty, ROUND(SUM(l_extendedprice),4) AS sum_price, ROUND(AVG(l_discount),4) AS avg_disc, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q15_count_distinct" ->
      "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS parts FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q16_rollup" ->
      "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    "q17_filtered_agg" ->
      "SELECT user_id, ROUND(SUM(CASE WHEN event_type='purchase' THEN value ELSE 0 END),4) AS purchase_val, COUNT(CASE WHEN event_type='error' THEN 1 END) AS errors FROM events GROUP BY user_id ORDER BY user_id",
    "q18_collect" ->
      "SELECT c_nationkey, array_to_string(list_sort(list(c_mktsegment)), ',') AS segs FROM customer GROUP BY c_nationkey ORDER BY c_nationkey",
    "q19_median" ->
      "SELECT l_returnflag, ROUND(MEDIAN(l_quantity),4) AS med FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q20_udaf_wavg" ->
      "SELECT l_returnflag, ROUND(SUM(l_extendedprice*l_quantity)/SUM(l_quantity),4) AS wavg FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q21_rank" ->
      "SELECT c_mktsegment, c_custkey, ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) ORDER BY c_mktsegment, rn",
    "q22_lag_lead" ->
      "SELECT event_id, ROUND(LAG(value) OVER w,4) AS prev_v, ROUND(LEAD(value) OVER w,4) AS next_v FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) ORDER BY event_id",
    "q23_running_sum" ->
      "SELECT event_id, ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),4) AS run FROM events ORDER BY event_id",
    "q24_range_frame" ->
      "SELECT event_id, ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT) RANGE BETWEEN 600 PRECEDING AND CURRENT ROW),4) AS win10m FROM events ORDER BY event_id",
    "q25_topk_per_group" ->
      "SELECT o_custkey, o_orderkey, rn FROM (SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t WHERE rn <= 2 ORDER BY o_custkey, rn",
    "q26_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20",
    "q27_union" ->
      "SELECT k, COUNT(*) AS c FROM (SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier) t GROUP BY k ORDER BY k",
    "q28_set_ops" ->
      "SELECT tag, k FROM (SELECT 'both' AS tag, k FROM (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier) t1 UNION ALL SELECT 'cust_only' AS tag, k FROM (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey AS k FROM supplier) t2) u ORDER BY tag, k",
    "q29_string_fns" ->
      "SELECT p_partkey, UPPER(p_brand) AS brand_u, LOWER(p_type) AS type_l, TRIM(p_name) AS name_t, SUBSTRING(p_name,1,5) AS name_s5, LENGTH(p_name) AS name_len, CONCAT_WS('-', p_brand, CAST(p_size AS VARCHAR)) AS brand_size, REPLACE(p_type,' ','_') AS type_us FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey",
    "q30_date_fns" ->
      "SELECT o_orderkey, YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS mo, DATE_TRUNC('month', o_orderdate) AS m, DATE_DIFF('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS dd FROM orders ORDER BY o_orderkey",
    "q31_math_fns" ->
      "SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice,1) AS price_r, ROUND(ABS(l_discount-0.05),4) AS disc_abs, CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil, CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor, l_orderkey % 7 AS mod7, ROUND(POW(l_tax+1,2),4) AS tax_pow, ROUND(SQRT(l_extendedprice),4) AS price_sqrt FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q32_json_agg" ->
      "SELECT CAST(json_extract_string(props,'$.k') AS BIGINT) % 10 AS kb, COUNT(*) AS c FROM events GROUP BY 1 ORDER BY kb",
    "q33_array_fns" ->
      "SELECT vec_id, len(embedding) AS dim, ROUND(CAST(embedding[1] AS DOUBLE),4) + 0 AS e1, ROUND(CAST(embedding[64] AS DOUBLE),4) + 0 AS e64 FROM embeddings ORDER BY vec_id",
    "q34_map_fns" ->
      "SELECT event_id, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k FROM events ORDER BY event_id",
    "q35_hash_fns" ->
      "SELECT COUNT(*) AS n, COUNT(DISTINCT md5(text)) AS n_distinct FROM documents",
    "q36_udf_tokens" ->
      "SELECT doc_id, len(string_split(text,' ')) AS ntok FROM documents ORDER BY doc_id",
    "q37_tumbling" ->
      "SELECT make_timestamp(CAST(FLOOR(epoch(ts)/600)*600 AS BIGINT)*1000000) AS w_start, COUNT(*) AS c, ROUND(SUM(value),4) AS s FROM events GROUP BY 1 ORDER BY w_start",
    "q38_sliding" ->
      "SELECT make_timestamp(CAST(FLOOR((epoch(ts)-o.off)/600)*600+o.off AS BIGINT)*1000000) AS w_start, COUNT(*) AS c FROM events CROSS JOIN (SELECT 0 AS off UNION ALL SELECT 300) o GROUP BY 1 ORDER BY w_start",
    "q39_session" ->
      "WITH g AS (SELECT user_id, ts, event_id, value, CASE WHEN LAG(ts) OVER w IS NULL OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), s AS (SELECT user_id, value, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM g) SELECT user_id, sid, COUNT(*) AS c, ROUND(SUM(value),4) AS v FROM s GROUP BY user_id, sid ORDER BY user_id, sid",
    "q40_exact_dedup" ->
      "SELECT lang, COUNT(DISTINCT md5(text)) AS uniq_docs FROM documents GROUP BY lang ORDER BY lang",
    "q41_jaccard_pairs" ->
      "WITH t AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS tok FROM documents WHERE doc_id < 50), p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, len(list_intersect(a.tok,b.tok))/CAST(len(list_distinct(list_concat(a.tok,b.tok))) AS DOUBLE) AS jr FROM t a JOIN t b ON a.doc_id < b.doc_id) SELECT d1, d2, ROUND(jr,4) AS j FROM p WHERE jr >= 0.6 ORDER BY d1, d2",
    "q42_cosine_topk" ->
      "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0) SELECT e.vec_id, ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)/(SQRT(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))*SQRT(list_dot_product(q.qv,q.qv))),4) + 0 AS cos FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0 ORDER BY cos DESC, e.vec_id LIMIT 10",
    "q43_text_stats" ->
      "SELECT lang, COUNT(*) AS docs, ROUND(AVG(n_chars),4) AS avg_chars, ROUND(AVG(len(string_split(text,' '))),4) AS avg_toks FROM documents GROUP BY lang ORDER BY lang",
    "q44_multimodal_join" ->
      "SELECT d.doc_id, d.lang, e.label, len(e.embedding) AS dim, d.n_chars FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id WHERE d.lang = 'en' ORDER BY d.doc_id",
    "q45_cube" ->
      "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c, ROUND(SUM(o_totalprice),4) AS sp FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    "q46_hof_arrays" ->
      "WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), s AS (SELECT vec_id, v, list_reverse_sort(v) AS vs FROM t) SELECT vec_id, ROUND(list_sum(v),4) + 0 AS vsum, ROUND(list_sum(list_transform(v, x -> x*x)),4) AS sumsq, ROUND(vs[1],4) + 0 AS t1, ROUND(vs[2],4) + 0 AS t2, ROUND(vs[3],4) + 0 AS t3 FROM s ORDER BY vec_id",
    "q47_string_fns2" ->
      "SELECT p_partkey, regexp_extract(p_type,'([A-Z]+)$',1) AS last_w, LPAD(p_brand,12,'*') AS brand_pad, array_to_string(string_split(p_name,' '),'|') AS name_bar FROM part ORDER BY p_partkey",
    "q48_map_fns2" ->
      "SELECT event_id, array_to_string(json_keys(props),',') AS ks, CAST(json_extract_string(props,'$.k') AS BIGINT) + 1 AS kv1 FROM events ORDER BY event_id",
    "q49_date_fns2" ->
      "SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS d30, CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS uts, QUARTER(o_orderdate) AS qr, DAYOFWEEK(o_orderdate) + 1 AS dow FROM orders ORDER BY o_orderkey",
    "q50_explode_agg" ->
      "SELECT t AS token, COUNT(*) AS c FROM documents, UNNEST(string_split(text,' ')) AS u(t) GROUP BY t ORDER BY c DESC, token LIMIT 20",
    "q51_pivot" ->
      "SELECT user_id, COUNT(*) FILTER (event_type='click') AS click, COUNT(*) FILTER (event_type='error') AS error, COUNT(*) FILTER (event_type='purchase') AS purchase, COUNT(*) FILTER (event_type='signup') AS signup, COUNT(*) FILTER (event_type='view') AS view FROM events GROUP BY user_id ORDER BY user_id",
    "q52_window_fns2" ->
      "SELECT c_mktsegment, c_custkey, NTILE(4) OVER w AS quartile, ROUND(PERCENT_RANK() OVER w,4) AS pr, ROUND(CUME_DIST() OVER w,4) AS cd, FIRST_VALUE(c_custkey) OVER wf AS top_cust, LAST_VALUE(c_custkey) OVER wf AS bottom_cust FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey), wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) ORDER BY c_mktsegment, c_custkey",
    "q53_chunking" ->
      "WITH t AS (SELECT doc_id, string_split(text,' ') AS s FROM documents WHERE doc_id < 100), st AS (SELECT doc_id, s, UNNEST(range(1, GREATEST(len(s) - 4, 1) + 1, 12)) AS b FROM t) SELECT doc_id, CAST((b - 1) / 12 AS BIGINT) AS chunk_id, array_to_string(s[b : b + 15], ' ') AS chunk, len(s[b : b + 15]) AS n_tokens FROM st ORDER BY doc_id, chunk_id",
    // ---- x_* oracles (round 2): the former rows-only blind spot --------
    // minHash-LSH candidates are exact-Jaccard-verified, and recall at
    // tau=0.6 with 32 bands x r=2 is ~1.0 — the output must equal the
    // exhaustive q41 form (OperatorsSuite asserts the same equality)
    "x_minhash_lsh" ->
      "WITH t AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS tok FROM documents WHERE doc_id < 50), p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, len(list_intersect(a.tok,b.tok))/CAST(len(list_distinct(list_concat(a.tok,b.tok))) AS DOUBLE) AS jr FROM t a JOIN t b ON a.doc_id < b.doc_id) SELECT d1, d2, ROUND(jr,4) AS j FROM p WHERE jr >= 0.6 ORDER BY d1, d2",
    // transitive closure via recursive CTE (reach set per doc, then min);
    // the Spark side generates pairs with LSH — proven pair-identical to
    // this exact form at tau=0.8/doc_id<200 (OperatorsSuite recall test)
    "x_dedup_clusters" ->
      ("WITH RECURSIVE t AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS tok FROM documents WHERE doc_id < 200), " +
        "p AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM t a JOIN t b ON a.doc_id < b.doc_id " +
        "WHERE len(list_intersect(a.tok,b.tok))/CAST(len(list_distinct(list_concat(a.tok,b.tok))) AS DOUBLE) >= 0.8), " +
        "e AS (SELECT d1 AS a, d2 AS b FROM p UNION SELECT d2, d1 FROM p), " +
        "r AS (SELECT doc_id AS src, doc_id AS dst FROM t UNION SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a), " +
        "c AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM r GROUP BY src) " +
        "SELECT c.doc_id, c.cluster_id, CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT) AS csize " +
        "FROM c ORDER BY c.doc_id"),
    "x_ngram_jaccard" ->
      "WITH t AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(s) - 2, 0) + 1), i -> array_to_string(s[i : i + 2], ' '))) AS tok FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents WHERE doc_id < 50)), tt AS (SELECT doc_id, tok FROM t WHERE len(tok) > 0), p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, len(list_intersect(a.tok,b.tok))/CAST(len(list_distinct(list_concat(a.tok,b.tok))) AS DOUBLE) AS jr FROM tt a JOIN tt b ON a.doc_id < b.doc_id) SELECT d1, d2, ROUND(jr,4) AS j FROM p WHERE jr >= 0.01 ORDER BY d1, d2",
    "x_embed_neardup" ->
      "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), n AS (SELECT vec_id, CASE WHEN sqrt(list_dot_product(e,e)) = 0 THEN e ELSE list_transform(e, x -> x / sqrt(list_dot_product(e,e))) END AS u FROM v), p AS (SELECT a.vec_id AS v1, b.vec_id AS v2, list_dot_product(a.u,b.u) AS d FROM n a JOIN n b ON a.vec_id < b.vec_id) SELECT v1, v2, ROUND(d,4) AS cos FROM p WHERE d >= 0.4 ORDER BY v1, v2",
    // cosine clusters: brute pairs at the same tau (as x_embed_neardup)
    // + the same recursive transitive closure as x_dedup_clusters;
    // vertex base = ALL vectors (singletons label themselves)
    "x_cosine_clusters" ->
      ("WITH RECURSIVE v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
        "n AS (SELECT vec_id, CASE WHEN sqrt(list_dot_product(e,e)) = 0 THEN e ELSE list_transform(e, x -> x / sqrt(list_dot_product(e,e))) END AS u FROM v), " +
        "p AS (SELECT a.vec_id AS d1, b.vec_id AS d2 FROM n a JOIN n b ON a.vec_id < b.vec_id WHERE list_dot_product(a.u,b.u) >= 0.4), " +
        "e AS (SELECT d1 AS a, d2 AS b FROM p UNION SELECT d2, d1 FROM p), " +
        "r AS (SELECT vec_id AS src, vec_id AS dst FROM v UNION SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a), " +
        "c AS (SELECT src AS vec_id, MIN(dst) AS cluster_id FROM r GROUP BY src) " +
        "SELECT c.vec_id, c.cluster_id, CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT) AS csize " +
        "FROM c ORDER BY vec_id"),
    // BM25: same whitespace split as x_tfidf; constants inline the
    // Scala defaults k1=1.2, b=0.75 (so k1+1 = 2.2); idf is the
    // always-positive ln(1 + (N-df+0.5)/(df+0.5)) form
    "x_bm25" ->
      ("WITH d AS (SELECT doc_id, string_split(text,' ') AS s FROM documents), " +
        "l AS (SELECT doc_id, CAST(len(s) AS DOUBLE) AS dl FROM d), " +
        "g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM l), " +
        "tf AS (SELECT doc_id, t AS term, CAST(COUNT(*) AS DOUBLE) AS tf FROM d, UNNEST(s) AS u(t) WHERE t IN ('vector','stream','merge') GROUP BY doc_id, t), " +
        "df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term), " +
        "c AS (SELECT tf.doc_id, ln(1 + (g.n - df.df + 0.5)/(df.df + 0.5)) * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / g.avgdl)) AS c FROM tf JOIN df USING(term) JOIN l USING(doc_id) CROSS JOIN g), " +
        "r AS (SELECT doc_id, ROUND(SUM(c),4) AS score FROM c GROUP BY doc_id), " +
        "rr AS (SELECT doc_id, score, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk FROM r) " +
        "SELECT doc_id, score, rr.rk FROM rr WHERE rk <= 10 ORDER BY rk"),
    "x_ann_topk" ->
      s"WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), b AS (SELECT vec_id, e, ${annBucketSql(8, 64)} AS bucket FROM v), q AS (SELECT e AS qe, bucket AS qb FROM b WHERE vec_id = 0) SELECT b.vec_id, ROUND(list_dot_product(b.e,q.qe)/(sqrt(list_dot_product(b.e,b.e))*sqrt(list_dot_product(q.qe,q.qe))),4) + 0 AS cos FROM b, q WHERE b.vec_id <> 0 AND bit_count(xor(b.bucket, q.qb)) <= 1 ORDER BY cos DESC, b.vec_id LIMIT 10",
    "x_knn_join" ->
      "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5), s AS (SELECT q.qid, v.vec_id, ROUND(list_dot_product(v.e,q.qe)/(SQRT(list_dot_product(v.e,v.e))*SQRT(list_dot_product(q.qe,q.qe))),4) + 0 AS cos FROM v CROSS JOIN q WHERE v.vec_id <> q.qid), r AS (SELECT qid, vec_id, cos, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk FROM s) SELECT qid, vec_id, cos, rk FROM r WHERE rk <= 5 ORDER BY qid, rk",
    // ANN knn join: same seed-pinned hyperplane buckets as x_ann_topk
    // (annBucketSql), probe at hamming <= 1, exact re-rank per query
    "x_ann_knn_join" ->
      s"WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), b AS (SELECT vec_id, e, ${annBucketSql(8, 64)} AS bucket FROM v), q AS (SELECT vec_id AS qid, e AS qe, bucket AS qb FROM b WHERE vec_id < 3), s AS (SELECT q.qid, b.vec_id, ROUND(list_dot_product(b.e,q.qe)/(SQRT(list_dot_product(b.e,b.e))*SQRT(list_dot_product(q.qe,q.qe))),4) + 0 AS cos FROM b, q WHERE b.vec_id <> q.qid AND bit_count(xor(b.bucket, q.qb)) <= 1), r AS (SELECT qid, vec_id, cos, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk FROM s) SELECT qid, vec_id, cos, rk FROM r WHERE rk <= 5 ORDER BY qid, rk",
    "x_simhash" ->
      s"WITH tok AS (SELECT doc_id, UNNEST(list_distinct(string_split(text,' '))) AS t FROM documents), h AS (SELECT doc_id, CAST('0x' || substring(md5(t),1,15) AS BIGINT) AS h FROM tok) SELECT doc_id, $simhashBitsSql AS simhash FROM h GROUP BY doc_id ORDER BY doc_id",
    // brute all-pairs hamming over the same simhash CTE — the banded
    // Spark form is exact at maxHamming 3 < 6 blocks (pigeonhole over
    // the Manku combination tables), so outputs match
    "x_simhash_pairs" ->
      s"WITH tok AS (SELECT doc_id, UNNEST(list_distinct(string_split(text,' '))) AS t FROM documents), h AS (SELECT doc_id, CAST('0x' || substring(md5(t),1,15) AS BIGINT) AS h FROM tok), s AS (SELECT doc_id, $simhashBitsSql AS sh FROM h GROUP BY doc_id) SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hd FROM s a, s b WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh, b.sh)) <= 3 ORDER BY d1, d2",
    // hamming clusters: simhash CTE (as x_simhash_pairs, capped at 200
    // docs) + the same recursive transitive closure as x_dedup_clusters
    "x_simhash_clusters" ->
      (s"WITH RECURSIVE tok AS (SELECT doc_id, UNNEST(list_distinct(string_split(text,' '))) AS t FROM documents WHERE doc_id < 200), " +
        s"h AS (SELECT doc_id, CAST('0x' || substring(md5(t),1,15) AS BIGINT) AS h FROM tok), " +
        s"s AS (SELECT doc_id, $simhashBitsSql AS sh FROM h GROUP BY doc_id), " +
        "p AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM s a, s b WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sh,b.sh)) <= 3), " +
        "e AS (SELECT d1 AS a, d2 AS b FROM p UNION SELECT d2, d1 FROM p), " +
        // vertex base = ALL docs under the cap (labelClusters labels every
        // input doc), NOT the simhash CTE `s` — a token-less doc has no
        // fingerprint rows but must still appear as a singleton
        "r AS (SELECT doc_id AS src, doc_id AS dst FROM documents WHERE doc_id < 200 UNION SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a), " +
        "c AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM r GROUP BY src) " +
        "SELECT c.doc_id, c.cluster_id, CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT) AS csize " +
        "FROM c ORDER BY doc_id"),
    "x_tfidf" ->
      "WITH tf AS (SELECT doc_id, t AS term, COUNT(*) AS tf FROM documents, UNNEST(string_split(text,' ')) AS u(t) GROUP BY doc_id, t), df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents), s AS (SELECT tf.doc_id, tf.term, ROUND(tf.tf * ln((nd.n + 1.0)/(df.df + 1)),4) AS score FROM tf JOIN df USING(term) CROSS JOIN nd), r AS (SELECT doc_id, term, score, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM s) SELECT doc_id, term, score, rk FROM r WHERE rk <= 5 ORDER BY doc_id, rk",
    "x_token_stats" ->
      s"WITH t AS (SELECT doc_id, text, CAST(len(string_split(text,' ')) AS DOUBLE) AS __nt, list_distinct(string_split(lower(text),' ')) AS __toks FROM documents), s AS (SELECT doc_id, text, __nt, CAST(__nt AS BIGINT) AS ws_tokens, CAST($bpeishCountSql AS BIGINT) AS bpeish_tokens, CAST(length(text) AS BIGINT) AS chars, $langScoreCols FROM t) SELECT doc_id, ws_tokens, bpeish_tokens, chars, $qualitySql AS quality, $langPredCase AS lang_pred FROM s ORDER BY doc_id",
    "x_lang_id" ->
      s"WITH t AS (SELECT lang, list_distinct(string_split(lower(text),' ')) AS __toks FROM documents), s AS (SELECT lang, $langScoreCols FROM t) SELECT lang, $langPredCase AS lang_pred, COUNT(*) AS n FROM s GROUP BY lang, lang_pred ORDER BY lang, lang_pred",
    // C4 bad-word screen: same 3-word list as Queries.blocklistWords;
    // instance hits via list filter, distinct hits via list_intersect
    "x_blocklist" ->
      ("WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS __toks FROM documents) " +
        "SELECT doc_id, " +
        "CAST(len(list_filter(__toks, t -> list_contains(['dup','slow','spill'], t))) AS BIGINT) AS n_hits, " +
        "CAST(len(list_intersect(list_distinct(__toks), ['dup','slow','spill'])) AS BIGINT) AS n_hit_types, " +
        "len(list_filter(__toks, t -> list_contains(['dup','slow','spill'], t))) <= 0 AS keep " +
        "FROM t ORDER BY doc_id"),
    // markup strip: same synthesized page and the same RE2-compatible
    // pattern chain as Pipelines.stripMarkup (script/style with content,
    // comments, tags, entities with amp LAST, whitespace collapse)
    "x_html_strip" ->
      ("WITH h AS (SELECT doc_id, '<html><head><style>p { color: red; }</style>" +
        "<script type=\"text/javascript\">if (1 < 2) { alert(\"x\"); }</script>" +
        "</head><body><!-- boilerplate --><h1>Doc ' || CAST(doc_id AS VARCHAR) || " +
        "'</h1><p class=\"body\">' || substring(text, 1, 60) || " +
        "' &amp; tail&nbsp;&lt;b&gt; &amp;lt;no-tag&amp;gt;</p></body></html>' AS raw FROM documents) " +
        "SELECT doc_id, trim(regexp_replace(" +
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        "raw, '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g'), " +
        "'(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g'), " +
        "'(?s)<!--.*?-->', ' ', 'g'), " +
        "'(?s)<[^>]+>', ' ', 'g'), " +
        "'&nbsp;', ' ', 'g'), '&quot;', '\"', 'g'), '&#39;', '''', 'g'), " +
        "'&lt;', '<', 'g'), '&gt;', '>', 'g'), '&amp;', '&', 'g'), " +
        "'\\s+', ' ', 'g')) AS clean FROM h ORDER BY doc_id"),
    // trained trigram naive-Bayes lang-id: ONE count CTE from the train
    // slice (totals/vocab re-agg the profile-sized count table, mirroring
    // TextAnalysis.langIdNgram), FIXED-POINT log-probs quantized in the
    // profile — lpfx = round(lp·1e9) BIGINT — then per-(doc, lang) sums
    // of m·lpfx: integer arithmetic is order-free, so plain SUM matches
    // the engine's position-level plain SUM exactly (the 1e-9 log-prob
    // quantization is declared semantics on both sides), argmax window
    "x_lang_id_ngram" ->
      (s"WITH aug AS ($langMarkedSql), " +
        "tr AS (SELECT lang, lower(text) AS t FROM aug WHERE doc_id % 5 = 1), " +
        "tri_t AS (SELECT lang, substring(t, pos, 3) AS tri FROM (SELECT lang, t, UNNEST(range(1, greatest(len(t) - 2, 0) + 1)) AS pos FROM tr)), " +
        "c AS (SELECT lang, tri, CAST(COUNT(*) AS DOUBLE) AS c FROM tri_t GROUP BY lang, tri), " +
        "n AS (SELECT lang, CAST(SUM(c) AS DOUBLE) AS n FROM c GROUP BY lang), " +
        "v AS (SELECT CAST(COUNT(DISTINCT tri) AS DOUBLE) AS v FROM c), " +
        "dt AS (SELECT doc_id, tri, CAST(COUNT(*) AS BIGINT) AS m FROM (SELECT doc_id, substring(t, pos, 3) AS tri FROM (SELECT doc_id, lower(text) AS t FROM aug), UNNEST(range(1, greatest(len(t) - 2, 0) + 1)) AS u(pos)) GROUP BY doc_id, tri), " +
        "sc AS (SELECT doc_id, dt.tri, n.lang, m, m * CAST(ROUND(ln((COALESCE(c.c, 0) + 1.0) / (n.n + v.v)) * 1e9) AS BIGINT) AS mlp " +
        "FROM dt CROSS JOIN n LEFT JOIN c ON c.lang = n.lang AND c.tri = dt.tri CROSS JOIN v), " +
        "a AS (SELECT doc_id, lang, CAST(SUM(m) AS BIGINT) AS nt, CAST(SUM(mlp) AS BIGINT) AS sm FROM sc GROUP BY doc_id, lang), " +
        "b AS (SELECT doc_id, nt, lang, sm, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sm DESC, lang) AS rn FROM a) " +
        "SELECT d.doc_id, COALESCE(b.nt, 0) AS n_trigrams, COALESCE(b.lang, 'und') AS lang_pred, ROUND(CAST(b.sm AS DOUBLE) / 1e9 / b.nt, 4) + 0.0 AS nb_score " +
        "FROM documents d LEFT JOIN (SELECT * FROM b WHERE rn = 1) b USING (doc_id) ORDER BY doc_id"),
    // URL canonicalization: shared nrm CTE chain over the synthetic URLs
    "x_url_normalize" ->
      (s"WITH u AS (SELECT doc_id, $syntheticUrlSql AS url FROM documents), " +
        urlNormCteSql +
        " SELECT doc_id, url, url_norm, domain FROM nrm ORDER BY doc_id"),
    "x_domain_stats" ->
      (s"WITH u AS (SELECT doc_id, text, lang, $syntheticUrlSql AS url FROM documents), " +
        urlNormCteSql +
        " SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(COUNT(DISTINCT url_norm) AS BIGINT) AS n_urls, " +
        "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens, " +
        "ROUND(AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS avg_tokens, " +
        "ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 4) AS dup_frac, " +
        "CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs " +
        "FROM nrm GROUP BY domain ORDER BY domain"),
    "x_multimodal" ->
      "SELECT doc_id, 'image/stub' AS kind, CAST(octet_length(encode(text)) AS BIGINT) AS bytes, CAST(16 AS BIGINT) AS feat_dim FROM documents ORDER BY doc_id",
    // media pHash pairs: brute all-pairs hamming over the chunk-simhash
    // fingerprint (the banded Spark form is exact at hamming 3 < 6
    // blocks); hex staging keeps the chunking byte-exact with only
    // varchar substring + md5 — 64 hex chars = the 32-byte chunk
    "x_media_phash" ->
      (s"WITH p AS (SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS hx FROM documents), " +
        "c AS (SELECT doc_id, substring(hx, 1 + i*64, 64) AS chunk " +
        "FROM p, UNNEST(range(0, CAST(ceil(length(hx)/64.0) AS INT))) AS u(i)), " +
        "h AS (SELECT doc_id, CAST('0x' || substring(md5(chunk),1,15) AS BIGINT) AS h FROM c), " +
        s"s AS (SELECT doc_id, $simhashBitsSql AS ph FROM h GROUP BY doc_id) " +
        "SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(bit_count(xor(a.ph,b.ph)) AS BIGINT) AS hd " +
        "FROM s a, s b WHERE a.doc_id < b.doc_id AND bit_count(xor(a.ph,b.ph)) <= 3 ORDER BY d1, d2"),
    "x_orc_sink" ->
      "SELECT strftime(ts, '%Y-%m-%d') AS c_date, COUNT(*) AS n FROM events GROUP BY c_date ORDER BY c_date",
    "x_cdc_ingest" ->
      "SELECT CAST(n_nationkey AS BIGINT) AS ref, CAST(n_regionkey AS BIGINT) AS city_id, LOWER(n_name) AS city_name, strftime(make_timestamp((1704067200000 + CAST(n_nationkey AS BIGINT) * 86400000) * 1000) + INTERVAL 8 HOUR, '%Y-%m-%d') AS c_date FROM nation ORDER BY ref",
    // md5-prefix split: first hex nibble → bucket, same '0x'||hex cast
    // trick as the simhash oracle; cut-points inline the Scala defaults
    "x_split" ->
      "SELECT doc_id, CASE WHEN b < 14 THEN 'train' WHEN b < 15 THEN 'val' ELSE 'test' END AS split FROM (SELECT doc_id, CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,1) AS BIGINT) AS b FROM documents) ORDER BY doc_id",
    "x_sample" ->
      "SELECT doc_id, lang FROM documents WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,2) AS BIGINT) < 64 ORDER BY doc_id",
    // PII scrub: same four patterns, same order (email, url, phone,
    // ssn) as Pipelines.piiPatterns — innermost regexp applies first;
    // 'g' flag matches Spark's replace-all default
    "x_pii_scrub" ->
      ("SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        "'contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com or https://ex.example/p/' || CAST(doc_id AS VARCHAR) || '?q=1 call 555-123-4567 ssn 123-45-6789 :: ' || substr(text,1,40), " +
        "'[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'), " +
        "'https?://[^\\s]+', '<URL>', 'g'), " +
        "'\\b(?:\\+?\\d{1,3}[ -]?)?(?:\\(\\d{2,4}\\)[ -]?)?\\d{3,4}[ -]\\d{3,4}\\b', '<PHONE>', 'g'), " +
        "'\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g') AS clean FROM documents ORDER BY doc_id"),
    "x_bigram_topk" ->
      "WITH t AS (SELECT string_split(text,' ') AS s FROM documents), b AS (SELECT UNNEST(list_transform(range(1, len(s)), i -> s[i] || ' ' || s[i+1])) AS bigram FROM t) SELECT bigram, COUNT(*) AS c FROM b GROUP BY bigram ORDER BY c DESC, bigram LIMIT 20",
    // int8 quantization: identical IEEE expression structure on both
    // sides (cast-to-double first, then maxabs/scale/round) so every
    // intermediate double is bit-equal and the 4-decimal rounds agree
    "x_embed_quant" ->
      "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), m AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS ma FROM v), s AS (SELECT vec_id, e, CASE WHEN ma = 0 THEN 1.0 ELSE 127.0 / ma END AS sc FROM m), q AS (SELECT vec_id, e, sc, list_transform(e, x -> CAST(round(x * sc) AS BIGINT)) AS q FROM s) SELECT vec_id, CAST(list_sum(q) AS BIGINT) AS qsum, CAST(list_min(q) AS BIGINT) AS qmin, CAST(list_max(q) AS BIGINT) AS qmax, ROUND(sc, 4) AS scale_r, ROUND(list_max(list_transform(range(1, len(e)+1), i -> abs(e[i] - q[i] / sc))), 4) AS maxerr FROM q ORDER BY vec_id",
    // winnowing: k=8 char grams md5'd, w=4 window minima (lexicographic
    // min over lowercase-hex md5 = binary min on both engines)
    "x_winnow" ->
      "WITH g AS (SELECT doc_id, list_transform(range(1, GREATEST(length(text) - 7, 1) + 1), i -> md5(substr(text, i, 8))) AS gr FROM documents WHERE doc_id < 100), w AS (SELECT doc_id, list_distinct(list_transform(range(1, GREATEST(len(gr) - 3, 1) + 1), j -> list_min(gr[j : j + 3]))) AS fps FROM g) SELECT doc_id, UNNEST(fps) AS fp FROM w ORDER BY doc_id, fp",
    // winnow pairs: same fingerprint CTE as x_winnow, stop-gram cut at
    // doc-freq 50, pair counts via fingerprint self-join, n_shared >= 3
    "x_winnow_pairs" ->
      ("WITH g AS (SELECT doc_id, list_transform(range(1, GREATEST(length(text) - 7, 1) + 1), i -> md5(substr(text, i, 8))) AS gr FROM documents WHERE doc_id < 100), " +
        "w AS (SELECT doc_id, list_distinct(list_transform(range(1, GREATEST(len(gr) - 3, 1) + 1), j -> list_min(gr[j : j + 3]))) AS fps FROM g), " +
        "f AS (SELECT doc_id, UNNEST(fps) AS fp FROM w), " +
        "r AS (SELECT fp FROM f GROUP BY fp HAVING COUNT(*) <= 50), " +
        "fr AS (SELECT f.doc_id, f.fp FROM f JOIN r USING(fp)), " +
        "p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_shared FROM fr a JOIN fr b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id) " +
        "SELECT d1, d2, n_shared FROM p WHERE n_shared >= 3 ORDER BY d1, d2"),
    // frame sampling: payload = utf8 bytes of text (as x_multimodal),
    // 64-byte frames, every 2nd full frame; DuckDB can't slice BLOBs,
    // so both sides compare the frame as hex (2 chars per byte)
    "x_frame_sample" ->
      ("WITH p AS (SELECT doc_id, hex(encode(text)) AS ph FROM documents WHERE doc_id < 50), " +
        "n AS (SELECT doc_id, ph, CAST(FLOOR(length(ph) / 128) AS INT) AS nf FROM p), " +
        "i AS (SELECT doc_id, ph, CAST(UNNEST(range(0, nf, 2)) AS INT) AS frame_idx FROM n WHERE nf > 0) " +
        "SELECT doc_id, frame_idx, substring(ph, frame_idx * 128 + 1, 128) AS frame_hex FROM i ORDER BY doc_id, frame_idx"),
    // incremental dedup: delta (fresh >= 400 + re-crawled copies of
    // 100-149) anti-joined on content hash against seen (< 400); the
    // Spark side's bloom prefilter is output-invisible (exact verify)
    "x_incremental_dedup" ->
      ("WITH seen AS (SELECT md5(text) AS h FROM documents WHERE doc_id < 400), " +
        "delta AS (SELECT doc_id, text FROM documents WHERE doc_id >= 400 UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id BETWEEN 100 AND 149) " +
        "SELECT doc_id FROM delta WHERE md5(text) NOT IN (SELECT h FROM seen) ORDER BY doc_id"),
    // decontamination: winnow fps of eval (id<20) vs train (20<=id<200)
    // slices, fingerprint join, n_shared >= 3
    "x_decontam" ->
      ("WITH g AS (SELECT doc_id, list_transform(range(1, GREATEST(length(text) - 7, 1) + 1), i -> md5(substr(text, i, 8))) AS gr FROM documents WHERE doc_id < 200), " +
        "w AS (SELECT doc_id, list_distinct(list_transform(range(1, GREATEST(len(gr) - 3, 1) + 1), j -> list_min(gr[j : j + 3]))) AS fps FROM g), " +
        "f AS (SELECT doc_id, UNNEST(fps) AS fp FROM w), " +
        "e AS (SELECT doc_id AS eval_id, fp FROM f WHERE doc_id < 20), " +
        "c AS (SELECT doc_id AS corpus_id, fp FROM f WHERE doc_id >= 20), " +
        "p AS (SELECT eval_id, corpus_id, COUNT(*) AS n_shared FROM e JOIN c USING(fp) GROUP BY eval_id, corpus_id) " +
        "SELECT eval_id, corpus_id, n_shared FROM p WHERE n_shared >= 3 ORDER BY eval_id, corpus_id"),
    // keep-best dedup: x_dedup_clusters' recursive closure + the shared
    // qualitySql replica, argmax(quality, min id) per cluster
    "x_dedup_best" ->
      ("WITH RECURSIVE t AS (SELECT doc_id, text, list_distinct(string_split(text,' ')) AS tok FROM documents WHERE doc_id < 200), " +
        "p AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM t a JOIN t b ON a.doc_id < b.doc_id WHERE len(list_intersect(a.tok,b.tok))/CAST(len(list_distinct(list_concat(a.tok,b.tok))) AS DOUBLE) >= 0.8), " +
        "e AS (SELECT d1 AS a, d2 AS b FROM p UNION SELECT d2, d1 FROM p), " +
        "r AS (SELECT doc_id AS src, doc_id AS dst FROM t UNION SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a), " +
        "c AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM r GROUP BY src), " +
        "qq AS (SELECT doc_id, text, CAST(len(string_split(text,' ')) AS DOUBLE) AS __nt FROM t), " +
        s"qs AS (SELECT doc_id, $qualitySql AS q FROM qq), " +
        "j AS (SELECT c.doc_id, c.cluster_id, qs.q, CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT) AS csize FROM c JOIN qs USING(doc_id)), " +
        "rr AS (SELECT cluster_id, doc_id AS rep_id, q AS rep_q, csize, ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY q DESC, doc_id) AS rk FROM j) " +
        "SELECT cluster_id, rep_id, rep_q, csize FROM rr WHERE rk = 1 ORDER BY cluster_id"),
    // Gopher repetition stats over re-lined docs (4-token lines + a
    // boilerplate line top and bottom). Lining arithmetic and every
    // repetition measure are replicated as list lambdas; count ties in
    // the top-bigram argmax break to the lexicographically greatest
    // bigram on both engines (list_max / array_max on VARCHAR).
    "x_repetition" ->
      ("WITH base AS (SELECT doc_id, string_split(text,' ') AS t FROM documents WHERE doc_id < 200), " +
        "ln AS (SELECT doc_id, 'boilerplate header line' || chr(10) || " +
        "array_to_string(list_transform(range(1, greatest(len(t),1)+1, 4), i -> array_to_string(t[i:i+3], ' ')), chr(10)) || " +
        "chr(10) || 'boilerplate header line' AS lined FROM base), " +
        "st AS (SELECT doc_id, lined, list_filter(string_split(lined, chr(10)), l -> len(l) > 0) AS lines, " +
        "list_filter(regexp_split_to_array(lined, '\\s+'), x -> len(x) > 0) AS tk FROM ln), " +
        "ng AS (SELECT *, CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) ELSE CAST([] AS VARCHAR[]) END AS b, " +
        "CASE WHEN len(tk) >= 5 THEN list_transform(range(1, len(tk)-3), i -> array_to_string(tk[i:i+4], ' ')) ELSE CAST([] AS VARCHAR[]) END AS f FROM st), " +
        "mx AS (SELECT *, list_distinct(b) AS dbg, list_distinct(f) AS df5 FROM ng), " +
        "m2 AS (SELECT *, list_max(list_transform(dbg, g -> len(list_filter(b, x -> x = g)))) AS maxc FROM mx), " +
        "sel AS (SELECT *, list_max(list_filter(dbg, g -> len(list_filter(b, x -> x = g)) = maxc)) AS topg FROM m2) " +
        "SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines, " +
        "ROUND((len(lines) - len(list_distinct(lines))) / CAST(greatest(len(lines),1) AS DOUBLE), 4) AS dup_line_frac, " +
        "ROUND(COALESCE(list_sum(list_transform(lines, l -> CASE WHEN len(list_filter(lines, x -> x = l)) > 1 THEN length(l) ELSE 0 END)),0) / CAST(greatest(COALESCE(list_sum(list_transform(lines, l -> length(l))),0),1) AS DOUBLE), 4) AS dup_line_char_frac, " +
        "ROUND(COALESCE(maxc * length(topg), 0) / CAST(greatest(length(lined),1) AS DOUBLE), 4) AS top2_char_frac, " +
        "ROUND(COALESCE(list_sum(list_transform(df5, g -> (len(list_filter(f, x -> x = g)) - 1) * length(g))),0) / CAST(greatest(length(lined),1) AS DOUBLE), 4) AS dup5_char_frac " +
        "FROM sel ORDER BY doc_id"),
    // Gopher quality flags: same signals, same unrounded values inside
    // the rule comparisons (rounding only decorates the report columns)
    "x_gopher" ->
      ("WITH t AS (SELECT doc_id, text, list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "s AS (SELECT doc_id, text, CAST(len(tk) AS DOUBLE) AS nw, " +
        "COALESCE(list_sum(list_transform(tk, x -> length(x))), 0) AS wc, " +
        "length(text) - length(replace(text, '#', '')) AS hashes, " +
        "(length(text) - length(replace(text, '...', ''))) / 3 AS ell, " +
        "len(list_filter(tk, x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha, " +
        "len(list_intersect(list_distinct(list_transform(tk, x -> lower(x))), ['the','be','to','of','and','that','have','with'])) AS nstop FROM t) " +
        "SELECT doc_id, CAST(nw AS BIGINT) AS n_words, " +
        "ROUND(wc / greatest(nw, 1.0), 4) AS mean_word_len, " +
        "ROUND((hashes + ell) / greatest(nw, 1.0), 4) AS symbol_ratio, " +
        "ROUND(alpha / greatest(nw, 1.0), 4) AS alpha_word_frac, " +
        "CAST(nstop AS BIGINT) AS n_stop, " +
        "(nw BETWEEN 20 AND 100000 AND wc / greatest(nw, 1.0) BETWEEN 3.0 AND 10.0 " +
        "AND (hashes + ell) / greatest(nw, 1.0) <= 0.1 AND alpha / greatest(nw, 1.0) >= 0.8 " +
        "AND nstop >= 2) AS passes FROM s ORDER BY doc_id"),
    // sequence packing: md5-byte shard % 8, per-shard running token sum
    // in id order, 256-token window arithmetic — window sums cast from
    // DuckDB's HUGEINT back to BIGINT
    "x_pack" ->
      ("WITH t AS (SELECT doc_id, len(string_split(text,' ')) AS nt, " +
        "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,2) AS BIGINT) % 8 AS shard FROM documents), " +
        "c AS (SELECT doc_id, shard, CAST(nt AS BIGINT) AS n_tokens, " +
        "SUM(nt) OVER (PARTITION BY shard ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum " +
        "FROM t WHERE nt > 0) " +
        "SELECT doc_id, shard, n_tokens, CAST(cum - n_tokens AS BIGINT) AS gstart, " +
        "CAST(FLOOR((cum - n_tokens) / 256.0) AS BIGINT) AS start_bin, " +
        "CAST(FLOOR((cum - 1) / 256.0) AS BIGINT) AS end_bin, " +
        "CAST((cum - n_tokens) % 256 AS BIGINT) AS bin_offset " +
        "FROM c ORDER BY doc_id"),
    // mixture sampling: same md5-byte threshold as x_sample, rate keyed
    // per language (en 256, de 128, zh 64, else 192)
    "x_mixture" ->
      ("SELECT doc_id, lang FROM documents WHERE " +
        "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,2) AS BIGINT) < " +
        "(CASE WHEN lang = 'en' THEN 256 WHEN lang = 'de' THEN 128 " +
        "WHEN lang = 'zh' THEN 64 ELSE 192 END) ORDER BY doc_id"),
    // training-order shuffle: md5-byte shard + rank of the md5 within
    // the shard (lowercase-hex lexicographic = binary order on both
    // engines, id tie-break for identical hashes)
    "x_shuffle" ->
      ("SELECT doc_id, CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,2) AS BIGINT) AS shuffle_shard, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY substring(md5(CAST(doc_id AS VARCHAR)),1,2) " +
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS shuffle_pos " +
        "FROM documents ORDER BY doc_id"),
    // self-trained add-one bigram LM: counts + V from the corpus
    // itself; per-doc sum folds a position-ordered list on both
    // engines (list_reduce ≡ aggregate-with-0.0-init: 0.0+x == x)
    "x_lm_score" ->
      ("WITH t AS (SELECT doc_id, string_split(text,' ') AS s FROM documents), " +
        "ti AS (SELECT doc_id, s, UNNEST(range(1, len(s))) AS pos FROM t), " +
        "b AS (SELECT doc_id, pos, s[pos] AS w1, s[pos] || ' ' || s[pos+1] AS bg FROM ti), " +
        "db AS (SELECT doc_id, w1, bg, CAST(COUNT(*) AS DOUBLE) AS m FROM b GROUP BY doc_id, w1, bg), " +
        "c2 AS (SELECT bg, SUM(m) AS c2 FROM db GROUP BY bg), " +
        "c1 AS (SELECT w1, SUM(m) AS c1 FROM db GROUP BY w1), " +
        "v AS (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v FROM (SELECT UNNEST(s) AS tok FROM t)), " +
        "sc AS (SELECT doc_id, bg, m, m * -ln((c2.c2 + 1.0)/(c1.c1 + v.v)) AS mlp FROM db JOIN c2 USING(bg) JOIN c1 USING(w1) CROSS JOIN v), " +
        "a AS (SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_bigrams, list_reduce(list(mlp ORDER BY bg), (acc,x) -> acc + x) AS sm FROM sc GROUP BY doc_id) " +
        "SELECT doc_id, n_bigrams, ROUND(sm / n_bigrams, 4) + 0.0 AS nll FROM a ORDER BY doc_id"),
    // DSIR hashed-unigram importance weights, target = lang 'en';
    // bucket = first 4 md5 hex chars mod 1024 (the '0x'||hex cast
    // trick); LEFT JOIN + COALESCE ≡ Spark's conditional count
    "x_dsir" ->
      ("WITH t AS (SELECT doc_id, lang, string_split(text,' ') AS s FROM documents), " +
        "ti AS (SELECT doc_id, lang, s, UNNEST(range(1, len(s)+1)) AS pos FROM t), " +
        "i AS (SELECT doc_id, lang, pos, CAST('0x' || substring(md5(s[pos]),1,4) AS BIGINT) % 1024 AS b FROM ti), " +
        "cr AS (SELECT b, CAST(COUNT(*) AS DOUBLE) AS cr FROM i GROUP BY b), " +
        "ct AS (SELECT b, CAST(COUNT(*) AS DOUBLE) AS ct FROM i WHERE lang = 'en' GROUP BY b), " +
        "tot AS (SELECT (SELECT SUM(cr) FROM cr) AS r, (SELECT COALESCE(SUM(ct),0) FROM ct) AS tt), " +
        "ra AS (SELECT b, ln((COALESCE(ct,0)+1.0)/(tt+1024.0)) - ln((cr+1.0)/(r+1024.0)) AS lw FROM cr LEFT JOIN ct USING(b) CROSS JOIN tot), " +
        "sc AS (SELECT doc_id, pos, lw FROM i JOIN ra USING(b)), " +
        "a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, list_reduce(list(lw ORDER BY pos), (acc,x) -> acc + x) AS sm FROM sc GROUP BY doc_id) " +
        "SELECT doc_id, n_tokens, ROUND(sm / n_tokens, 4) + 0.0 AS dsir_w FROM a ORDER BY doc_id"),
    // per-source stats: exact integer arithmetic + exact-ratio doubles
    "x_source_stats" ->
      ("SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n_tokens, " +
        "ROUND(AVG(CAST(len(string_split(text,' ')) AS DOUBLE)), 4) AS avg_tokens, " +
        "ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 4) AS dup_frac, " +
        "CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs " +
        "FROM documents GROUP BY source ORDER BY source"),
    // line-level boilerplate removal: lined replica shared with
    // x_repetition; doc-freq over DISTINCT (doc, line), df <= 10 keep,
    // order-preserving string_agg reassembly
    "x_line_dedup" ->
      ("WITH base AS (SELECT doc_id, string_split(text,' ') AS t FROM documents WHERE doc_id < 200), " +
        "ln AS (SELECT doc_id, 'boilerplate header line' || chr(10) || " +
        "array_to_string(list_transform(range(1, greatest(len(t),1)+1, 4), i -> array_to_string(t[i:i+3], ' ')), chr(10)) || " +
        "chr(10) || 'boilerplate header line' AS lined FROM base), " +
        "s AS (SELECT doc_id, string_split(lined, chr(10)) AS ls FROM ln), " +
        "li AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS nl, ls, UNNEST(range(1, len(ls)+1)) AS pos FROM s), " +
        "l AS (SELECT doc_id, nl, pos, ls[pos] AS line FROM li), " +
        "dfq AS (SELECT line, COUNT(*) AS dfc FROM (SELECT DISTINCT doc_id, line FROM l) GROUP BY line), " +
        "k AS (SELECT doc_id, nl, pos, line FROM l JOIN dfq USING(line) WHERE dfc <= 10) " +
        "SELECT doc_id, MAX(nl) AS n_lines, CAST(COUNT(*) AS BIGINT) AS n_kept, " +
        "string_agg(line, chr(10) ORDER BY pos) AS clean FROM k GROUP BY doc_id ORDER BY doc_id"),
    // token entropy: transform-then-reduce (NOT a bare list_reduce sum
    // — DuckDB seeds the fold with the first element, which is only
    // lambda-safe when the lambda is plain addition); distinct tokens
    // sorted so both engines fold in the same order
    "x_token_entropy" ->
      ("WITH t AS (SELECT doc_id, string_split(text,' ') AS s FROM documents), " +
        "d AS (SELECT doc_id, s, list_sort(list_distinct(s)) AS ds FROM t), " +
        "c AS (SELECT doc_id, s, ds, list_transform(ds, g -> CAST(len(list_filter(s, x -> x = g)) AS DOUBLE) * ln(CAST(len(list_filter(s, x -> x = g)) AS DOUBLE))) AS xs FROM d) " +
        "SELECT doc_id, CAST(len(s) AS BIGINT) AS n_tokens, CAST(len(ds) AS BIGINT) AS n_types, " +
        "ROUND(CAST(len(ds) AS DOUBLE)/len(s), 4) AS ttr, " +
        "ROUND(ln(CAST(len(s) AS DOUBLE)) - list_reduce(xs, (a,x) -> a + x) / len(s), 4) + 0.0 AS entropy " +
        "FROM c ORDER BY doc_id"),
    // vocab coverage: exact long counts, ties broken on the token so
    // the top-k cut and the running sum agree across engines
    "x_vocab_coverage" ->
      ("WITH tok AS (SELECT UNNEST(string_split(text,' ')) AS token FROM documents), " +
        "c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token), " +
        "t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM c), " +
        "k AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 100) " +
        "SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank, token, cnt, " +
        "ROUND(CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token ROWS UNBOUNDED PRECEDING) AS DOUBLE)/tot, 4) AS cum_frac " +
        "FROM k CROSS JOIN t ORDER BY rank"),
    // per-group z-score from exact long sums (n, Σx, Σx²): μ/σ² derive
    // in ONE fixed expression — same association as the Spark side, so
    // the doubles agree bit-for-bit before rounding
    "x_zscore" ->
      ("WITH d AS (SELECT doc_id, lang, CAST(len(string_split(text,' ')) AS BIGINT) AS nt FROM documents), " +
        "s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(nt) AS BIGINT) AS s1, CAST(SUM(nt*nt) AS BIGINT) AS s2 FROM d GROUP BY lang), " +
        "j AS (SELECT doc_id, lang, nt, n, CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE) AS mean, " +
        "CASE WHEN n < 2 THEN 0.0 ELSE (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)*(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE)))/(CAST(n AS DOUBLE)-1.0) END AS var FROM d JOIN s USING(lang)) " +
        "SELECT doc_id, lang, nt, CASE WHEN var <= 0.0 THEN 0.0 ELSE ROUND((CAST(nt AS DOUBLE) - mean)/sqrt(var), 4) + 0.0 END AS z " +
        "FROM j ORDER BY doc_id"),
    // RRF hybrid fusion: bm25 top-20 CTEs (same formula as x_bm25) +
    // cosine top-20 (same formula as q42), integer ranks → exact
    // reciprocals summed in fixed order; rank ties break on id
    "x_rrf_fusion" ->
      ("WITH d AS (SELECT doc_id, string_split(text,' ') AS s FROM documents), " +
        "l AS (SELECT doc_id, CAST(len(s) AS DOUBLE) AS dl FROM d), " +
        "g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM l), " +
        "tf AS (SELECT doc_id, t AS term, CAST(COUNT(*) AS DOUBLE) AS tf FROM d, UNNEST(s) AS u(t) WHERE t IN ('vector','stream','merge') GROUP BY doc_id, t), " +
        "dfq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term), " +
        "cc AS (SELECT tf.doc_id, ln(1 + (g.n - dfq.df + 0.5)/(dfq.df + 0.5)) * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / g.avgdl)) AS c FROM tf JOIN dfq USING(term) JOIN l USING(doc_id) CROSS JOIN g), " +
        "r AS (SELECT doc_id, ROUND(SUM(c),4) AS score FROM cc GROUP BY doc_id), " +
        "lex AS (SELECT * FROM (SELECT doc_id AS id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS ra FROM r) WHERE ra <= 20), " +
        "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0), " +
        "co AS (SELECT e.vec_id AS id, ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)/(SQRT(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))*SQRT(list_dot_product(q.qv,q.qv))),4) + 0 AS cos FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0), " +
        "sem AS (SELECT * FROM (SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, id) AS BIGINT) AS rb FROM co) WHERE rb <= 20), " +
        "f AS (SELECT COALESCE(lex.id, sem.id) AS id, ROUND(COALESCE(1.0/(60.0 + CAST(ra AS DOUBLE)), 0.0) + COALESCE(1.0/(60.0 + CAST(rb AS DOUBLE)), 0.0), 6) AS rrf FROM lex FULL OUTER JOIN sem ON lex.id = sem.id), " +
        "t AS (SELECT id, rrf FROM f ORDER BY rrf DESC, id LIMIT 10) " +
        "SELECT id, rrf, CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, id) AS BIGINT) AS rank FROM t ORDER BY rank"),
    // discrete quantile cut: cumulative window over the (lang, value)
    // histogram, threshold = min value with cum >= ceil(p*n) — all
    // integer arithmetic except the one p*n product
    "x_quantile_cut" ->
      ("WITH d AS (SELECT doc_id, lang, CAST(len(string_split(text,' ')) AS BIGINT) AS nt FROM documents), " +
        "h AS (SELECT lang, nt AS v, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY lang, nt), " +
        "cu AS (SELECT lang, v, c, SUM(c) OVER (PARTITION BY lang ORDER BY v) AS cum FROM h), " +
        "t AS (SELECT lang, SUM(c) AS n FROM h GROUP BY lang), " +
        "thr AS (SELECT lang, MIN(v) AS q_thr FROM cu JOIN t USING(lang) WHERE cum >= CEIL(0.9 * CAST(n AS DOUBLE)) GROUP BY lang) " +
        "SELECT doc_id, lang, nt, q_thr, nt <= q_thr AS keep FROM d JOIN thr USING(lang) ORDER BY doc_id"),
    // normalized dedup: RE2 char-class + 'g' replace ≡ Java default
    // replace-all; variants of docs < 50 are what normalization must
    // collapse onto their bases
    "x_norm_dedup" ->
      ("WITH u AS (SELECT doc_id, text FROM documents UNION ALL " +
        "SELECT doc_id + 10000, upper(text) || ' !!' FROM documents WHERE doc_id < 50 " +
        "UNION ALL SELECT CAST(20000 AS BIGINT), CAST(NULL AS VARCHAR) " +
        "UNION ALL SELECT CAST(20001 AS BIGINT), '!!! ??? ...'), " +
        "d AS (SELECT doc_id, CASE WHEN text IS NULL OR trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) = '' THEN NULL ELSE md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) END AS norm_h FROM u), " +
        "g AS (SELECT norm_h, MIN(doc_id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS dup_count FROM d WHERE norm_h IS NOT NULL GROUP BY norm_h) " +
        "SELECT d.doc_id, d.norm_h, COALESCE(rep_id, d.doc_id) AS rep_id, CAST(COALESCE(dup_count, 1) AS BIGINT) AS dup_count, COALESCE(rep_id, d.doc_id) = d.doc_id AS keep " +
        "FROM d LEFT JOIN g ON d.norm_h = g.norm_h ORDER BY doc_id"),
    // exact substring dedup: fixed-width shingle fingerprints, window
    // count + first-occurrence rank per fp, covered-position expansion,
    // per-doc reassembly — the whole plan mirrors 1:1 (1-based slices)
    "x_substring_dedup" ->
      ("WITH u AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 30000, text || ' ' || text FROM documents WHERE doc_id < 20 " +
        "UNION ALL SELECT CAST(40000 AS BIGINT), 'aaa bbb sp1 sp2 sp3 sp4 sp5 sp6 sp7 sp8 sp9 sp10 sp11 sp12' " +
        "UNION ALL SELECT CAST(40001 AS BIGINT), 'ccc ddd sp1 sp2 sp3 sp4 sp5 sp6 sp7 sp8 sp9 sp10 sp11 sp12 eee'), " +
        "d AS (SELECT doc_id, string_split(text,' ') AS s FROM u), " +
        "ti AS (SELECT doc_id, s, UNNEST(range(1, greatest(len(s) - 7, 0) + 1)) AS pos FROM d), " +
        "st AS (SELECT doc_id, pos, md5(array_to_string(s[pos : pos + 7], ' ')) AS fp FROM ti), " +
        "dup AS (SELECT doc_id, pos FROM (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY fp) AS c, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn FROM st) WHERE c >= 2 AND rn > 1), " +
        "cov AS (SELECT DISTINCT doc_id, tp FROM (SELECT doc_id, pos + UNNEST(range(0, 8)) AS tp FROM dup)), " +
        "ti2 AS (SELECT doc_id, s, UNNEST(range(1, len(s) + 1)) AS tp FROM d), " +
        "tok AS (SELECT doc_id, len(s) AS n_tokens, tp, s[tp] AS tok FROM ti2), " +
        "j AS (SELECT t.doc_id, t.n_tokens, t.tp, t.tok, (c.tp IS NOT NULL) AS cut FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.tp = c.tp), " +
        "a AS (SELECT doc_id, CAST(MAX(n_tokens) AS BIGINT) AS n_tokens, CAST(SUM(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, string_agg(CASE WHEN NOT cut THEN tok END, ' ' ORDER BY tp) AS clean FROM j GROUP BY doc_id) " +
        "SELECT doc_id, n_tokens, n_removed, COALESCE(clean, '') AS clean FROM a ORDER BY doc_id"),
    // trigram novelty: all-integer until the one final exact-ratio
    // division; short docs survive via the left join
    "x_ngram_novelty" ->
      ("WITH d AS (SELECT doc_id, string_split(text,' ') AS s FROM documents), " +
        "t AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(s) - 2, 0) + 1), i -> array_to_string(s[i : i + 2], ' '))) AS g FROM d), " +
        "gr AS (SELECT doc_id, UNNEST(g) AS gram FROM t), " +
        "fq AS (SELECT gram, COUNT(*) AS gdf FROM gr GROUP BY gram), " +
        "p AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, CAST(SUM(CASE WHEN gdf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel FROM gr JOIN fq USING(gram) GROUP BY doc_id) " +
        "SELECT d.doc_id, COALESCE(n_grams, 0) AS n_grams, COALESCE(n_novel, 0) AS n_novel, " +
        "CASE WHEN COALESCE(n_grams, 0) = 0 THEN 0.0 ELSE ROUND(CAST(n_novel AS DOUBLE)/CAST(n_grams AS DOUBLE), 4) END AS novel_frac " +
        "FROM d LEFT JOIN p USING(doc_id) ORDER BY doc_id"),
    // containment: tau compares the UNROUNDED ratio on both engines;
    // the doc-freq cut binds the corpus side only
    "x_containment" ->
      ("WITH d AS (SELECT doc_id, string_split(text,' ') AS s FROM documents), " +
        "t AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(s) - 4, 0) + 1), i -> array_to_string(s[i : i + 4], ' '))) AS g FROM d), " +
        "e AS (SELECT doc_id AS eval_id, UNNEST(g) AS gram FROM t WHERE doc_id % 10 = 0), " +
        "c AS (SELECT doc_id AS corpus_id, UNNEST(g) AS gram FROM t WHERE doc_id % 10 <> 0), " +
        "r AS (SELECT gram FROM c GROUP BY gram HAVING COUNT(*) <= 50), " +
        "en AS (SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY eval_id), " +
        "p AS (SELECT eval_id, corpus_id, CAST(COUNT(*) AS BIGINT) AS n_shared FROM e JOIN r USING(gram) JOIN c USING(gram) GROUP BY eval_id, corpus_id) " +
        "SELECT eval_id, corpus_id, n_shared, ROUND(CAST(n_shared AS DOUBLE)/CAST(n AS DOUBLE), 4) AS containment " +
        "FROM p JOIN en USING(eval_id) WHERE CAST(n_shared AS DOUBLE)/CAST(n AS DOUBLE) >= 0.3 " +
        "ORDER BY eval_id, corpus_id"),
    // hard negatives: the x_knn_join cosine form + the label predicate;
    // rank over the ROUNDED cosine on both engines, ties by id
    "x_hard_negatives" ->
      ("WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, label AS ql, e AS qe FROM v WHERE vec_id < 5), " +
        "s AS (SELECT q.qid, v.vec_id, ROUND(list_dot_product(v.e,q.qe)/(SQRT(list_dot_product(v.e,v.e))*SQRT(list_dot_product(q.qe,q.qe))),4) + 0 AS cos " +
        "FROM v CROSS JOIN q WHERE v.vec_id <> q.qid AND v.label <> q.ql), " +
        "r AS (SELECT qid, vec_id, cos, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rk FROM s) " +
        "SELECT qid, vec_id, cos, rk FROM r WHERE rk <= 10 ORDER BY qid, rk"),
    // CCNet ppl buckets: the x_lm_score CTEs + per-source discrete
    // terciles over the rounded-NLL histogram; cut expressions are
    // ceil(n/3.0) / ceil(2.0*n/3.0) verbatim on both engines
    "x_ppl_buckets" ->
      ("WITH t AS (SELECT doc_id, source, string_split(text,' ') AS s FROM documents), " +
        "ti AS (SELECT doc_id, s, UNNEST(range(1, len(s))) AS pos FROM t), " +
        "b AS (SELECT doc_id, pos, s[pos] AS w1, s[pos] || ' ' || s[pos+1] AS bg FROM ti), " +
        "db AS (SELECT doc_id, w1, bg, CAST(COUNT(*) AS DOUBLE) AS m FROM b GROUP BY doc_id, w1, bg), " +
        "c2 AS (SELECT bg, SUM(m) AS c2 FROM db GROUP BY bg), " +
        "c1 AS (SELECT w1, SUM(m) AS c1 FROM db GROUP BY w1), " +
        "v AS (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v FROM (SELECT UNNEST(s) AS tok FROM t)), " +
        "sc AS (SELECT doc_id, bg, m, m * -ln((c2.c2 + 1.0)/(c1.c1 + v.v)) AS mlp FROM db JOIN c2 USING(bg) JOIN c1 USING(w1) CROSS JOIN v), " +
        "a AS (SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_bigrams, list_reduce(list(mlp ORDER BY bg), (acc,x) -> acc + x) AS sm FROM sc GROUP BY doc_id), " +
        "scd AS (SELECT t.doc_id, t.source, a.n_bigrams, ROUND(sm / n_bigrams, 4) + 0.0 AS nll FROM a JOIN t ON a.doc_id = t.doc_id), " +
        "h AS (SELECT source, nll AS hv, CAST(COUNT(*) AS BIGINT) AS c FROM scd GROUP BY source, nll), " +
        "cu AS (SELECT source, hv, c, SUM(c) OVER (PARTITION BY source ORDER BY hv) AS cum FROM h), " +
        "tot AS (SELECT source, SUM(c) AS n FROM h GROUP BY source), " +
        "t1 AS (SELECT source, MIN(hv) AS thr1 FROM cu JOIN tot USING(source) WHERE cum >= CEIL(CAST(n AS DOUBLE)/3.0) GROUP BY source), " +
        "t2 AS (SELECT source, MIN(hv) AS thr2 FROM cu JOIN tot USING(source) WHERE cum >= CEIL(2.0*CAST(n AS DOUBLE)/3.0) GROUP BY source) " +
        "SELECT doc_id, source, n_bigrams, nll, " +
        "CASE WHEN nll <= thr1 THEN 'head' WHEN nll <= thr2 THEN 'middle' ELSE 'tail' END AS ppl_bucket " +
        "FROM scd JOIN t1 USING(source) JOIN t2 USING(source) ORDER BY doc_id"),
    // KMV overlap: the sketch is a pure function of the item set, so
    // both engines build identical k-min lists (lowercase-hex md5
    // sorts the same under binary collation)
    "x_kmv_overlap" ->
      ("WITH d AS (SELECT source, string_split(text,' ') AS s FROM documents), " +
        "g AS (SELECT source, UNNEST(list_distinct(list_transform(range(1, greatest(len(s) - 1, 0) + 1), i -> array_to_string(s[i : i + 1], ' ')))) AS item FROM d), " +
        "h AS (SELECT DISTINCT source, md5(item) AS h FROM g), " +
        "s AS (SELECT source, (list(h ORDER BY h))[1:64] AS kmv FROM h GROUP BY source), " +
        "p AS (SELECT a.source AS g1, b.source AS g2, a.kmv AS ka, b.kmv AS kb FROM s a JOIN s b ON a.source < b.source), " +
        "u AS (SELECT g1, g2, ka, kb, list_sort(list_distinct(list_concat(ka, kb)))[1:64] AS ku FROM p) " +
        "SELECT g1, g2, CAST(len(ku) AS BIGINT) AS k_used, " +
        "ROUND(CAST(len(list_filter(ku, x -> list_contains(ka, x) AND list_contains(kb, x))) AS DOUBLE)/CAST(len(ku) AS DOUBLE), 4) AS jacc_est " +
        "FROM u ORDER BY g1, g2"),
    // incremental near-dup: exact cross-corpus pairwise oracle — the
    // Spark side's LSH front is output-invisible at these params
    // (recall ≈ 1 at j ≥ 0.8; differential-asserted in OperatorsSuite)
    "x_incr_neardup" ->
      ("WITH seen AS (SELECT doc_id AS seen_id, list_distinct(string_split(text,' ')) AS tok FROM documents WHERE doc_id < 400), " +
        "delta AS (SELECT doc_id + 10000 AS delta_id, list_distinct(string_split('re ' || text,' ')) AS tok FROM documents WHERE doc_id BETWEEN 100 AND 149 " +
        "UNION ALL SELECT doc_id, list_distinct(string_split(text,' ')) FROM documents WHERE doc_id >= 400 AND doc_id < 600), " +
        "p AS (SELECT delta_id, seen_id, len(list_intersect(d.tok, s.tok))/CAST(len(list_distinct(list_concat(d.tok, s.tok))) AS DOUBLE) AS jr FROM delta d CROSS JOIN seen s) " +
        "SELECT delta_id, seen_id, ROUND(jr, 4) AS j FROM p WHERE jr >= 0.8 ORDER BY delta_id, seen_id"),
    // BPE merge candidates: all-integer counts over the distinct word
    // table; count ties break lexicographically on both engines
    "x_bpe_merges" ->
      ("WITH t AS (SELECT UNNEST(string_split(text,' ')) AS w FROM documents), " +
        "w AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM t WHERE length(w) >= 2 GROUP BY w), " +
        "ti AS (SELECT w, c, UNNEST(range(1, length(w))) AS i FROM w), " +
        "p AS (SELECT substring(w, i, 2) AS pair, c FROM ti), " +
        "g AS (SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM p GROUP BY pair), " +
        "k AS (SELECT pair, cnt FROM g ORDER BY cnt DESC, pair LIMIT 50) " +
        "SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank, pair, cnt FROM k ORDER BY rank"),
    // leakage-free split: x_dedup_clusters' recursive closure + the
    // x_split nibble mapping, keyed on the CLUSTER id
    "x_cluster_split" ->
      ("WITH RECURSIVE t AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS tok FROM documents WHERE doc_id < 200), " +
        "p AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM t a JOIN t b ON a.doc_id < b.doc_id " +
        "WHERE len(list_intersect(a.tok,b.tok))/CAST(len(list_distinct(list_concat(a.tok,b.tok))) AS DOUBLE) >= 0.8), " +
        "e AS (SELECT d1 AS a, d2 AS b FROM p UNION SELECT d2, d1 FROM p), " +
        "r AS (SELECT doc_id AS src, doc_id AS dst FROM t UNION SELECT r.src, e.b FROM r JOIN e ON r.dst = e.a), " +
        "c AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM r GROUP BY src), " +
        "cc AS (SELECT doc_id, cluster_id, CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS csize, " +
        "CAST('0x' || substring(md5(CAST(cluster_id AS VARCHAR)),1,1) AS BIGINT) AS b FROM c) " +
        "SELECT doc_id, cluster_id, csize, " +
        "CASE WHEN b < 14 THEN 'train' WHEN b < 15 THEN 'val' ELSE 'test' END AS split " +
        "FROM cc ORDER BY doc_id"),
    // sqrt-temperature rates: sqrt is IEEE-correctly-rounded on both
    // engines (why alpha is pinned at 1/2); counts are exact longs
    "x_temperature" ->
      ("WITH s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang), " +
        "m AS (SELECT MIN(n_docs) AS mn FROM s) " +
        "SELECT lang, n_docs, ROUND(SQRT(CAST(mn AS DOUBLE)/CAST(n_docs AS DOUBLE)), 4) AS keep_frac, " +
        "LEAST(256, CAST(CEIL(SQRT(CAST(mn AS DOUBLE)/CAST(n_docs AS DOUBLE)) * 256) AS BIGINT)) AS keep256 " +
        "FROM s CROSS JOIN m ORDER BY lang"),
    // fuzzy linkage: within-nation all-pairs under the SAME equal-length
    // predicate the pigeonhole front declares — levenshtein is the
    // standard metric on both engines, so the oracle can skip the front
    // (front ≡ all-pairs under that predicate, recall asserted in suite)
    "x_entity_match" ->
      ("SELECT a.c_custkey AS id1, b.c_custkey AS id2, " +
        "CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist " +
        "FROM customer a JOIN customer b ON a.c_nationkey = b.c_nationkey " +
        "AND length(a.c_name) = length(b.c_name) AND a.c_custkey < b.c_custkey " +
        "WHERE levenshtein(a.c_name, b.c_name) <= 1 ORDER BY id1, id2"),
    // indel linkage: same all-pairs oracle WITHOUT the length predicate,
    // over customers augmented with the same deterministic planted
    // deletion typos the Spark query builds (every 7th custkey, char at
    // custkey % len + 1 removed, id + 10M)
    "x_entity_match_indel" ->
      ("WITH aug AS (" +
        "SELECT c_custkey, c_name, c_nationkey FROM customer " +
        "UNION ALL " +
        "SELECT c_custkey + 10000000, " +
        "concat(substring(c_name, 1, CAST(c_custkey % length(c_name) AS INT)), " +
        "substring(c_name, CAST(c_custkey % length(c_name) AS INT) + 2)), " +
        "c_nationkey FROM customer WHERE c_custkey % 7 = 0) " +
        "SELECT a.c_custkey AS id1, b.c_custkey AS id2, " +
        "CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist " +
        "FROM aug a JOIN aug b ON a.c_nationkey = b.c_nationkey " +
        "AND a.c_custkey < b.c_custkey " +
        "AND abs(length(a.c_name) - length(b.c_name)) <= 1 " +
        "WHERE levenshtein(a.c_name, b.c_name) <= 1 ORDER BY id1, id2"),
    "x_pagerank" -> pageRankOracleSql(5),
    "x_ppr" -> pprOracleSql(5),
    // curation funnel: x_gopher's proven quality fragment (minWords 20)
    // + min-id exemplar per text + the x_sample md5-byte threshold,
    // counted per stage with COUNT(CASE ...) ≡ Spark count(when(...))
    "x_curation_funnel" ->
      ("WITH t AS (SELECT doc_id, text, source, list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "s AS (SELECT doc_id, text, source, CAST(len(tk) AS DOUBLE) AS nw, " +
        "COALESCE(list_sum(list_transform(tk, x -> length(x))), 0) AS wc, " +
        "length(text) - length(replace(text, '#', '')) AS hashes, " +
        "(length(text) - length(replace(text, '...', ''))) / 3 AS ell, " +
        "len(list_filter(tk, x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha, " +
        "len(list_intersect(list_distinct(list_transform(tk, x -> lower(x))), ['the','be','to','of','and','that','have','with'])) AS nstop FROM t), " +
        "p AS (SELECT doc_id, text, source, " +
        "(nw BETWEEN 20 AND 100000 AND wc / greatest(nw, 1.0) BETWEEN 3.0 AND 10.0 " +
        "AND (hashes + ell) / greatest(nw, 1.0) <= 0.1 AND alpha / greatest(nw, 1.0) >= 0.8 " +
        "AND nstop >= 2) AS passes FROM s), " +
        "k AS (SELECT MIN(doc_id) AS doc_id FROM p WHERE passes GROUP BY text), " +
        "f AS (SELECT p.doc_id, p.source, p.passes, k.doc_id IS NOT NULL AS kept FROM p LEFT JOIN k ON p.doc_id = k.doc_id) " +
        "SELECT source, COUNT(*) AS n_raw, " +
        "COUNT(CASE WHEN passes THEN 1 END) AS n_quality, " +
        "COUNT(CASE WHEN kept THEN 1 END) AS n_dedup, " +
        "COUNT(CASE WHEN kept AND CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) < 192 THEN 1 END) AS n_sampled " +
        "FROM f GROUP BY source ORDER BY source"),
    // first-touch funnel: per stage the earliest qualifying instant,
    // strictly after the previous stage's and within the 48 h gap —
    // each stage CTE mirrors one funnelStages groupBy(user) min
    "x_event_funnel" ->
      ("WITH u1 AS (SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id), " +
        "u2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN u1 ON e.user_id = u1.user_id " +
        "WHERE e.event_type = 'click' AND e.ts > u1.t1 AND e.ts <= u1.t1 + INTERVAL 172800 SECOND GROUP BY e.user_id), " +
        "u3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN u2 ON e.user_id = u2.user_id " +
        "WHERE e.event_type = 'purchase' AND e.ts > u2.t2 AND e.ts <= u2.t2 + INTERVAL 172800 SECOND GROUP BY e.user_id) " +
        "SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type, (SELECT COUNT(*) FROM u1) AS n_users " +
        "UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM u2) " +
        "UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM u3) ORDER BY stage"),
    // retention: week offsets are exact multiples of 7 days (both sides
    // week-truncate first), so integer // 7 ≡ Spark floor(datediff/7)
    "x_retention" ->
      ("WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cw FROM events GROUP BY user_id), " +
        "a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events) " +
        "SELECT CAST(f.cw AS DATE) AS cohort_week, " +
        "CAST(date_diff('day', f.cw, a.aw) // 7 AS BIGINT) AS week_offset, " +
        "COUNT(*) AS n_users FROM f JOIN a ON f.user_id = a.user_id " +
        "GROUP BY 1, 2 ORDER BY cohort_week, week_offset"),
    // transition matrix: LAG over the same total (ts, event_id) order
    "x_event_transitions" ->
      ("WITH t AS (SELECT user_id, event_type, " +
        "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events) " +
        "SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n " +
        "FROM t WHERE prev IS NOT NULL GROUP BY 1, 2 ORDER BY from_type, to_type"),
    // corpus diff: the oracle compares columns DIRECTLY (IS DISTINCT
    // FROM per compare col) — equivalent to the engine's sentinel-md5
    // equality modulo md5 collisions
    "x_corpus_diff" ->
      ("WITH o AS (SELECT doc_id, text, lang FROM documents), " +
        "n AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 'v2 ' || text ELSE text END AS text, lang " +
        "FROM documents WHERE doc_id % 11 <> 0 " +
        "UNION ALL SELECT doc_id + 1000000, text, lang FROM documents WHERE doc_id % 13 = 0) " +
        "SELECT * FROM (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, " +
        "CASE WHEN o.doc_id IS NULL THEN 'added' WHEN n.doc_id IS NULL THEN 'removed' " +
        "WHEN o.text IS DISTINCT FROM n.text OR o.lang IS DISTINCT FROM n.lang THEN 'changed' " +
        "ELSE 'unchanged' END AS status FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id) " +
        "WHERE status <> 'unchanged' ORDER BY doc_id"),
    "x_profile" ->
      (Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
        s"SELECT '$c' AS col_name, COUNT(CASE WHEN $c IS NULL THEN 1 END) AS n_nulls, " +
          s"COUNT(DISTINCT $c) AS n_distinct FROM documents"
      }.mkString(" UNION ALL ") + " ORDER BY col_name"),
    "x_quota_sample" ->
      ("SELECT doc_id, source FROM (SELECT doc_id, source, " +
        "ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk " +
        "FROM documents) WHERE rk <= 30 ORDER BY doc_id"),
    // A-ES weighted sample: same md5-derived uniform ((j+0.5)/2^52 from
    // the first 13 hex nibbles), same log-space key ln(u)/w rounded to
    // 10 dp (near-equal keys become exact ties broken by doc_id), same
    // top-200
    "x_weighted_sample" ->
      ("SELECT doc_id, source, n_chars FROM (" +
        "SELECT doc_id, source, n_chars, " +
        "ROUND(ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) + 0.5) / 4503599627370496.0) " +
        "/ CAST(n_chars AS DOUBLE), 10) AS k " +
        "FROM documents WHERE CAST(n_chars AS DOUBLE) > 0 " +
        "ORDER BY k DESC, doc_id LIMIT 200) ORDER BY doc_id"),
    // per-stratum weighted quota: the same A-ES key ranked inside each
    // source by ROW_NUMBER
    "x_weighted_quota" ->
      ("SELECT doc_id, source, n_chars FROM (" +
        "SELECT doc_id, source, n_chars, " +
        "ROW_NUMBER() OVER (PARTITION BY source ORDER BY " +
        "ROUND(ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) + 0.5) / 4503599627370496.0) " +
        "/ CAST(n_chars AS DOUBLE), 10) DESC, doc_id) AS rk " +
        "FROM documents WHERE CAST(n_chars AS DOUBLE) > 0) " +
        "WHERE rk <= 30 ORDER BY doc_id"),
    // histogram: op order mirrors equiWidthHistogram exactly —
    // floor((v - lo) / ((hi - lo) / bins)), max pinned to the last
    // bucket, edges recomputed from (lo, hi, bucket) and rounded
    "x_histogram" ->
      ("WITH b AS (SELECT MIN(CAST(n_chars AS DOUBLE)) AS lo, MAX(CAST(n_chars AS DOUBLE)) AS hi FROM documents), " +
        "g AS (SELECT CASE WHEN b.hi = b.lo THEN 0 ELSE " +
        "LEAST(11, CAST(FLOOR((CAST(n_chars AS DOUBLE) - b.lo) / ((b.hi - b.lo) / 12)) AS INTEGER)) END AS bucket, " +
        "b.lo, b.hi FROM documents, b WHERE n_chars IS NOT NULL) " +
        "SELECT CAST(bucket AS BIGINT) AS bucket, " +
        "ROUND(lo + bucket * (hi - lo) / 12, 4) AS lo_edge, " +
        "ROUND(lo + (bucket + 1) * (hi - lo) / 12, 4) AS hi_edge, " +
        "COUNT(*) AS n FROM g GROUP BY bucket, lo, hi ORDER BY bucket"),
    // latest-wins compaction: row_number replay of the max_by((ts, tie))
    // pick — (ts, event_id) is a total per-key order, so both agree
    "x_latest_snapshot" ->
      ("WITH log AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op, value FROM events), " +
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM log) " +
        "SELECT user_id, ts, event_id, op, value FROM r WHERE rn = 1 AND op <> 'd' ORDER BY user_id"),
    // SCD2: lead(ts) over ALL changes (deletes close intervals), delete
    // rows filtered after — same op order as scd2History
    "x_scd2" -> scd2OracleSqlText,
    // the merge entry's oracle is the FROM-SCRATCH history over the
    // full log — hash agreement proves incremental ≡ rebuild
    "x_scd2_merge" -> scd2OracleSqlText,
    "x_triangles" -> trianglesOracleSql,
    "x_hits" -> hitsOracleSql(3),
    "x_communities" -> lpaOracleSql(3),
    "x_kcore" -> kcoreOracleSql(4, 6),
    // co-occurrence: distinct basket-item projection, degree-capped
    // baskets, basket-keyed pair join, min-support filter
    "x_cooccurrence" ->
      ("WITH b AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem), " +
        "ok AS (SELECT k FROM b GROUP BY k HAVING COUNT(*) <= 20), " +
        "bb AS (SELECT b.k, b.i FROM b JOIN ok USING (k)) " +
        "SELECT a.i AS item_a, b2.i AS item_b, COUNT(*) AS n " +
        "FROM bb a JOIN bb b2 ON a.k = b2.k AND a.i < b2.i " +
        "GROUP BY 1, 2 HAVING COUNT(*) >= 2 ORDER BY 1, 2"),
    // association rules: same capped projection; confidence/lift doubles
    // computed in the engine's exact operation order, 6 dp rounded
    "x_assoc_rules" ->
      ("WITH b AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem), " +
        "ok AS (SELECT k FROM b GROUP BY k HAVING COUNT(*) <= 20), " +
        "bb AS (SELECT b.k, b.i FROM b JOIN ok USING (k)), " +
        "p AS (SELECT a.i AS ia, b2.i AS ib, COUNT(*) AS n " +
        "FROM bb a JOIN bb b2 ON a.k = b2.k AND a.i < b2.i GROUP BY 1, 2 HAVING COUNT(*) >= 3), " +
        "it AS (SELECT i, COUNT(*) AS c FROM bb GROUP BY i), " +
        "nn AS (SELECT COUNT(DISTINCT k) AS n FROM bb), " +
        "r AS (SELECT ia AS ante, ib AS cons, n FROM p UNION ALL SELECT ib, ia, n FROM p) " +
        "SELECT r.ante, r.cons, r.n, " +
        "ROUND(CAST(r.n AS DOUBLE) / ca.c, 6) + 0 AS confidence, " +
        "ROUND(CAST(r.n AS DOUBLE) / ca.c * (SELECT n FROM nn) / cb.c, 6) + 0 AS lift " +
        "FROM r JOIN it ca ON r.ante = ca.i JOIN it cb ON r.cons = cb.i " +
        "ORDER BY r.ante, r.cons"),
    // attribution: the rangeJoin window in timestamp arithmetic
    // (micros are exact either way), last-touch via row_number replay
    // of max_by((tts, ttie)), linear credit = Σ cnt/n rounded 6 dp
    "x_attribution" ->
      ("WITH t AS (SELECT user_id AS u, event_type AS ch, ts AS tts, event_id AS ttie FROM events " +
        "WHERE event_type IN ('click', 'view')), " +
        "c AS (SELECT user_id AS cu, ts AS cts, event_id AS cid FROM events WHERE event_type = 'purchase'), " +
        "p AS (SELECT ch, tts, ttie, cid FROM t JOIN c ON u = cu AND cts > tts AND cts <= tts + INTERVAL 172800 SECOND), " +
        "pc AS (SELECT cid, ch, COUNT(*) AS cnt FROM p GROUP BY cid, ch), " +
        "pn AS (SELECT cid, SUM(cnt) AS n FROM pc GROUP BY cid), " +
        "lin AS (SELECT ch AS channel, SUM(CAST(cnt AS DOUBLE) / n) AS l FROM pc JOIN pn USING (cid) GROUP BY ch), " +
        "lt AS (SELECT ch AS channel, COUNT(*) AS c FROM (" +
        "SELECT ch, ROW_NUMBER() OVER (PARTITION BY cid ORDER BY tts DESC, ttie DESC) AS rn FROM p) WHERE rn = 1 GROUP BY ch), " +
        "chans AS (SELECT 'click' AS channel UNION ALL SELECT 'view') " +
        "SELECT ch.channel, COALESCE(lt.c, 0) AS last_touch, " +
        "ROUND(COALESCE(lin.l, 0.0), 6) + 0 AS linear FROM chans ch " +
        "LEFT JOIN lt ON ch.channel = lt.channel " +
        "LEFT JOIN lin ON ch.channel = lin.channel ORDER BY ch.channel"),
    // expectations: each metric recomputed as a ratio of exact longs
    // (checkExpectations' frac, den-0 → 1.0); passed compares the
    // UNROUNDED ratio, metric rounds to 6 dp — same as the engine
    "x_expectations" ->
      ("WITH m AS (SELECT " +
        "CASE WHEN COUNT(*) = 0 THEN 1.0 ELSE CAST(COUNT(CASE WHEN text IS NULL THEN 1 END) AS DOUBLE) / COUNT(*) END AS m0, " +
        "CASE WHEN COUNT(doc_id) = 0 THEN 1.0 ELSE CAST(COUNT(DISTINCT doc_id) AS DOUBLE) / COUNT(doc_id) END AS m1, " +
        "CASE WHEN COUNT(n_chars) = 0 THEN 1.0 ELSE CAST(COUNT(CASE WHEN CAST(n_chars AS DOUBLE) BETWEEN 100 AND 400 THEN 1 END) AS DOUBLE) / COUNT(n_chars) END AS m2, " +
        "CASE WHEN COUNT(text) = 0 THEN 1.0 ELSE CAST(COUNT(CASE WHEN regexp_matches(text, 'the') THEN 1 END) AS DOUBLE) / COUNT(text) END AS m3, " +
        "CASE WHEN COUNT(lang) = 0 THEN 1.0 ELSE CAST(COUNT(CASE WHEN lang IN ('en', 'de', 'fr') THEN 1 END) AS DOUBLE) / COUNT(lang) END AS m4 " +
        "FROM documents) " +
        "SELECT * FROM (" +
        "SELECT 'not_null' AS rule, 'text' AS col_name, ROUND(m0, 6) + 0 AS metric, CAST(0.0 AS DOUBLE) AS threshold, m0 <= 0.0 AS passed FROM m " +
        "UNION ALL SELECT 'unique', 'doc_id', ROUND(m1, 6) + 0, CAST(1.0 AS DOUBLE), m1 >= 1.0 FROM m " +
        "UNION ALL SELECT 'in_range', 'n_chars', ROUND(m2, 6) + 0, CAST(0.5 AS DOUBLE), m2 >= 0.5 FROM m " +
        "UNION ALL SELECT 'matches_regex', 'text', ROUND(m3, 6) + 0, CAST(0.5 AS DOUBLE), m3 >= 0.5 FROM m " +
        "UNION ALL SELECT 'in_set', 'lang', ROUND(m4, 6) + 0, CAST(0.8 AS DOUBLE), m4 >= 0.8 FROM m" +
        ") ORDER BY rule, col_name"),
    // outliers: quantile_cont ≡ Spark's exact interpolating percentile;
    // the flag compares the UNROUNDED score, outputs round to 6 dp;
    // MAD = 0 degenerates to value <> median, score NULL — both engines
    "x_outliers" ->
      ("WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type), " +
        "d2 AS (SELECT event_type, quantile_cont(ABS(value - med), 0.5) AS mad " +
        "FROM events JOIN m USING (event_type) GROUP BY event_type), " +
        "s AS (SELECT e.event_id, e.event_type, e.value, m.med, d2.mad, " +
        "CASE WHEN d2.mad > 0 THEN 0.6745 * (e.value - m.med) / d2.mad END AS score " +
        "FROM events e JOIN m USING (event_type) JOIN d2 USING (event_type)) " +
        "SELECT event_id, event_type, value, ROUND(med, 6) + 0 AS med, " +
        "ROUND(mad, 6) + 0 AS mad, ROUND(score, 6) + 0 AS score FROM s " +
        "WHERE (mad > 0 AND ABS(score) > 3.5) OR (mad = 0 AND value <> med) " +
        "ORDER BY event_type, event_id"),
    // skew report: ROW_NUMBER replay of the count-desc/key-asc top-k;
    // share is a ratio of exact longs rounded 6 dp
    "x_skew_report" ->
      ("WITH c AS (SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey), " +
        "t AS (SELECT SUM(n) AS tot FROM c), " +
        "r AS (SELECT l_suppkey, n, ROW_NUMBER() OVER (ORDER BY n DESC, l_suppkey) AS rank FROM c) " +
        "SELECT rank, l_suppkey, n, ROUND(CAST(n AS DOUBLE) / (SELECT tot FROM t), 6) + 0 AS share " +
        "FROM r WHERE rank <= 20 ORDER BY rank"),
    // quantile bins: boundary ulp differences can't flip a bucket — an
    // interpolated bound lies strictly between adjacent data values —
    // so the strict v > b count replays exactly
    "x_quantile_bins" ->
      ("WITH b AS (SELECT quantile_cont(n_chars, [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bs FROM documents) " +
        "SELECT doc_id, n_chars, CASE WHEN n_chars IS NULL THEN NULL " +
        "ELSE 1 + len(list_filter(bs, x -> n_chars > x)) END AS bin " +
        "FROM documents, b ORDER BY doc_id"),
    // LOCF resample: generate_series grid + bucketed last-event pick
    // (row_number replay of max_by) + IGNORE NULLS carry-forward; both
    // engines floor epoch seconds identically
    "x_resample" ->
      ("WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket, ts, event_id, value FROM events), " +
        "pb AS (SELECT user_id, bucket, value AS v FROM (" +
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, bucket ORDER BY ts DESC, event_id DESC) AS rn FROM e) WHERE rn = 1), " +
        "span AS (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM e GROUP BY user_id), " +
        "grid AS (SELECT user_id, UNNEST(generate_series(lo, hi, 86400)) AS bucket FROM span) " +
        "SELECT g.user_id, g.bucket, " +
        "LAST_VALUE(pb.v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.bucket) AS value " +
        "FROM grid g LEFT JOIN pb ON g.user_id = pb.user_id AND g.bucket = pb.bucket " +
        "ORDER BY g.user_id, g.bucket"),
    // PII redaction replay: both engines build the identical augmented
    // text (PII is a pure function of doc_id — the corpus is digit-free),
    // then count+replace in the same fixed e-mail → IP → phone order; the
    // patterns live in the Java∩RE2 regex subset (TextAnalysis scaladoc)
    "x_pii_redact" ->
      ("WITH aug AS (SELECT doc_id, text || " +
        "CASE WHEN doc_id % 3 = 0 THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END || " +
        "CASE WHEN doc_id % 4 = 0 THEN ' host 10.' || CAST(doc_id % 250 AS VARCHAR) || '.0.' || CAST((doc_id * 7) % 250 AS VARCHAR) ELSE '' END || " +
        "CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS text FROM documents), " +
        "r1 AS (SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email, " +
        "regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t FROM aug), " +
        "r2 AS (SELECT doc_id, n_email, CAST(len(regexp_extract_all(t, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS BIGINT) AS n_ip, " +
        "regexp_replace(t, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g') AS t FROM r1), " +
        "r3 AS (SELECT doc_id, n_email, n_ip, CAST(len(regexp_extract_all(t, '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b')) AS BIGINT) AS n_phone, " +
        "regexp_replace(t, '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b', '<PHONE>', 'g') AS t FROM r2) " +
        "SELECT doc_id, n_email, n_ip, n_phone, t AS clean_text FROM r3 ORDER BY doc_id"),
    // run-collapse replay: DuckDB's indexed list_filter lambda (1-based i;
    // toks[0] is NULL and TRUE OR NULL = TRUE, so the first token is safe)
    // mirrors Spark's 0-based indexed filter HOF
    "x_collapse_runs" ->
      ("WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' +') AS toks FROM documents), " +
        "k AS (SELECT doc_id, toks, list_filter(toks, (x, i) -> i = 1 OR x <> toks[i - 1]) AS kept FROM t) " +
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
        "CAST(len(toks) - len(kept) AS BIGINT) AS n_removed, " +
        "array_to_string(kept, ' ') AS clean_text FROM k ORDER BY doc_id"),
    // the bloom prefilter only prunes definite misses — the exact
    // equi-join eliminates its false positives, so the oracle is the
    // PLAIN join (that equivalence is the operator's contract)
    "x_bloom_join" ->
      ("SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_items, ROUND(SUM(l.l_extendedprice), 2) AS revenue " +
        "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
        "JOIN nation n ON s.s_nationkey = n.n_nationkey " +
        "WHERE n.n_name = 'NATION_3' GROUP BY s.s_suppkey, s.s_name ORDER BY s.s_suppkey"),
    // EWMA replay: identical left-to-right term order and power-of-two
    // weights (exact binary fractions) make the doubles bit-identical
    // before the shared ROUND(.,6)
    "x_ewma" ->
      ("WITH b AS (SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS x, " +
        "ROW_NUMBER() OVER w AS rn, " +
        (1 to 7).map(k => s"LAG(CAST(value AS DOUBLE), $k) OVER w AS x$k")
          .mkString(", ") +
        " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) " +
        "SELECT user_id, ts, event_id, x AS value, ROUND((x * 1.0 + " +
        (1 to 7).map(k => s"COALESCE(x$k, 0.0) * ${math.pow(0.5, k)}")
          .mkString(" + ") +
        ") / (1.0 + " +
        (1 to 7).map(k => s"CASE WHEN rn > $k THEN ${math.pow(0.5, k)} ELSE 0.0 END")
          .mkString(" + ") +
        "), 6) AS ewma FROM b ORDER BY event_id"),
    // BFS replay: same thinned-edge extraction as the k-core oracle
    // (1.3× here), then a bounded-depth recursive CTE — UNION dedups
    // (node, dist) states so the recursion terminates, MIN picks the
    // hop distance; the operator's empty-frontier early exit is exactly
    // the recursion running dry
    "x_bfs" ->
      ("WITH RECURSIVE e AS MATERIALIZED (SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS DOUBLE) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
        "JOIN nation cn ON c.c_nationkey = cn.n_nationkey " +
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey GROUP BY 1, 2), " +
        "thin AS MATERIALIZED (SELECT src, dst FROM e WHERE w > 1.05 * (SELECT AVG(w) FROM e)), " +
        "bb AS (SELECT 'NATION_12' AS node, CAST(0 AS BIGINT) AS dist " +
        "UNION SELECT thin.dst, bb.dist + 1 FROM bb JOIN thin ON bb.node = thin.src WHERE bb.dist < 4) " +
        "SELECT node, MIN(dist) AS dist FROM bb GROUP BY node ORDER BY node"),
    // winsorize replay: quantile_cont ≡ Spark's exact interpolating
    // percentile (the x_outliers-proven equivalence); flags compare the
    // UNROUNDED bounds on both sides
    "x_winsorize" ->
      ("WITH b AS (SELECT event_type, quantile_cont(value, 0.05) AS qlo, quantile_cont(value, 0.95) AS qhi FROM events GROUP BY event_type) " +
        "SELECT e.event_id, e.event_type, e.value, " +
        "ROUND(b.qlo, 6) + 0 AS lo, ROUND(b.qhi, 6) + 0 AS hi, " +
        "ROUND(LEAST(GREATEST(e.value, b.qlo), b.qhi), 6) + 0 AS clipped, " +
        "e.value < b.qlo AS clipped_lo, e.value > b.qhi AS clipped_hi " +
        "FROM events e JOIN b USING (event_type) ORDER BY e.event_id"),
    // the prefix-filtered join's oracle is the BRUTE-FORCE all-pairs
    // join: the hash match is the exactness proof of the candidate
    // principle (prefix filter may only add candidates the exact verify
    // then removes)
    "x_jaccard_join" ->
      ("WITH t AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS tok FROM documents WHERE doc_id < 300), " +
        "p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, " +
        "len(list_intersect(a.tok,b.tok))/CAST(len(list_distinct(list_concat(a.tok,b.tok))) AS DOUBLE) AS jr " +
        "FROM t a JOIN t b ON a.doc_id < b.doc_id) " +
        "SELECT d1, d2, ROUND(jr,4) AS j FROM p WHERE jr >= 0.9 ORDER BY d1, d2"),
    // the merge contract is mergeAggState(state(hist), state(delta)) ≡
    // aggState(hist ∪ delta), so the oracle is the FROM-SCRATCH rollup
    // over the whole table — the hash match proves the incremental path
    "x_agg_merge" ->
      ("SELECT l_suppkey, COUNT(l_quantity) AS cnt, ROUND(SUM(l_quantity), 4) AS vsum, " +
        "MIN(l_quantity) AS vmin, MAX(l_quantity) AS vmax " +
        "FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey"),
    // drift replay: identical smoothed p/q/m formulas; per-token
    // contributions quantized to round(x·1e12) BIGINTs exactly like the
    // plan (the lang-id fixed-point pattern), so the reductions are
    // order-free integer sums in both engines
    "x_drift" ->
      ("WITH ca AS (SELECT tok, COUNT(*) AS ca FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents WHERE source = 'src0') GROUP BY 1), " +
        "cb AS (SELECT tok, COUNT(*) AS cb FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents WHERE source = 'src1') GROUP BY 1), " +
        "j AS (SELECT COALESCE(ca.tok, cb.tok) AS tok, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok), " +
        "tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v, CAST(SUM(ca) AS DOUBLE) AS na, CAST(SUM(cb) AS DOUBLE) AS nb FROM j), " +
        "c AS (SELECT (CAST(ca AS DOUBLE) + 1.0) / (na + v) AS p, (CAST(cb AS DOUBLE) + 1.0) / (nb + v) AS q, v, na, nb FROM j CROSS JOIN tt), " +
        "s AS (SELECT v, na, nb, SUM(CAST(round(p * ln(p / q) * 1e12) AS BIGINT)) AS sab, " +
        "SUM(CAST(round(q * ln(q / p) * 1e12) AS BIGINT)) AS sba, " +
        "SUM(CAST(round(p * ln(p / ((p + q) / 2.0)) * 1e12) AS BIGINT)) AS spm, " +
        "SUM(CAST(round(q * ln(q / ((p + q) / 2.0)) * 1e12) AS BIGINT)) AS sqm FROM c GROUP BY v, na, nb) " +
        "SELECT CAST(v AS BIGINT) AS vocab, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "ROUND(CAST(sab AS DOUBLE) / 1e12, 6) AS kl_ab, ROUND(CAST(sba AS DOUBLE) / 1e12, 6) AS kl_ba, " +
        "ROUND(CAST(spm + sqm AS DOUBLE) / 2e12, 6) AS js FROM s"),
    // categorical JS drift: the x_drift quantized-term contract over
    // whole values (lang) instead of tokens — each category's two JS
    // terms round to 1e-12 longs before the order-free sum
    "x_cat_drift" ->
      ("WITH ca AS (SELECT lang AS k, COUNT(*) AS ca FROM documents WHERE source = 'src0' AND lang IS NOT NULL GROUP BY 1), " +
        "cb AS (SELECT lang AS k, COUNT(*) AS cb FROM documents WHERE source <> 'src0' AND lang IS NOT NULL GROUP BY 1), " +
        "j AS (SELECT COALESCE(ca.k, cb.k) AS k, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb FROM ca FULL OUTER JOIN cb ON ca.k = cb.k), " +
        "tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v, CAST(SUM(ca) AS DOUBLE) AS na, CAST(SUM(cb) AS DOUBLE) AS nb FROM j), " +
        "c AS (SELECT (CAST(ca AS DOUBLE) + 1.0) / (na + v) AS p, (CAST(cb AS DOUBLE) + 1.0) / (nb + v) AS q, v, na, nb FROM j CROSS JOIN tt), " +
        "s AS (SELECT v, na, nb, SUM(CAST(round(p * ln(p / ((p + q) / 2.0)) * 1e12) AS BIGINT)) AS spm, " +
        "SUM(CAST(round(q * ln(q / ((p + q) / 2.0)) * 1e12) AS BIGINT)) AS sqm FROM c GROUP BY v, na, nb) " +
        "SELECT CAST(v AS BIGINT) AS n_cats, CAST(na AS BIGINT) AS n_ref, CAST(nb AS BIGINT) AS n_cur, " +
        "ROUND(CAST(spm + sqm AS DOUBLE) / 2e12, 6) AS js FROM s"),
    // RFM replay: exact integer-microsecond day division (no
    // truncation-vs-fraction seam), quantile_cont boundaries ≡ Spark's
    // exact percentile, strict-greater bin counts, inverted r_score
    "x_rfm" ->
      ("WITH per AS (SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS frequency, SUM(value) AS monetary FROM events GROUP BY user_id), " +
        "mx AS (SELECT MAX(ts) AS maxts FROM events), " +
        "base AS (SELECT user_id, (epoch_us(maxts) - epoch_us(last_ts)) // 86400000000 AS recency_days, frequency, monetary FROM per CROSS JOIN mx), " +
        "qb AS (SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rb, " +
        "quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fb, " +
        "quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mb FROM base) " +
        "SELECT user_id, recency_days, frequency, ROUND(monetary, 4) AS monetary, " +
        "6 - (1 + len(list_filter(rb, x -> recency_days > x))) AS r_score, " +
        "1 + len(list_filter(fb, x -> frequency > x)) AS f_score, " +
        "1 + len(list_filter(mb, x -> monetary > x)) AS m_score " +
        "FROM base CROSS JOIN qb ORDER BY user_id"),
    // OHLC replay: bucket floors agree (integer seconds dominate the
    // sub-second fraction), open/close via ROW_NUMBER replay of
    // min_by/max_by over the (ts, tie) total order
    "x_ohlc" ->
      ("WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts) / 21600) * 21600 AS BIGINT) AS bucket, ts, event_id, value FROM events), " +
        "o AS (SELECT user_id, bucket, value, " +
        "ROW_NUMBER() OVER (PARTITION BY user_id, bucket ORDER BY ts, event_id) AS ra, " +
        "ROW_NUMBER() OVER (PARTITION BY user_id, bucket ORDER BY ts DESC, event_id DESC) AS rd FROM e) " +
        "SELECT user_id, bucket, MAX(CASE WHEN ra = 1 THEN value END) AS open, " +
        "MAX(value) AS high, MIN(value) AS low, " +
        "MAX(CASE WHEN rd = 1 THEN value END) AS close, COUNT(*) AS n " +
        "FROM o GROUP BY user_id, bucket ORDER BY user_id, bucket"),
    // growth accounting: per-user active-day lag/lead classification;
    // churn credits the first inactive day (incl. past the final event)
    "x_growth" ->
      ("WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "c AS (SELECT user_id, day, " +
        "LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev, " +
        "LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next FROM a), " +
        "s AS (SELECT day, " +
        "CASE WHEN prev IS NULL THEN 1 ELSE 0 END AS n_new, " +
        "CASE WHEN date_diff('day', prev, day) = 1 THEN 1 ELSE 0 END AS n_retained, " +
        "CASE WHEN prev IS NOT NULL AND date_diff('day', prev, day) > 1 THEN 1 ELSE 0 END AS n_resurrected, " +
        "0 AS n_churned FROM c " +
        "UNION ALL SELECT day + 1, 0, 0, 0, 1 FROM c WHERE next IS NULL OR date_diff('day', day, next) > 1) " +
        "SELECT day, CAST(SUM(n_new) AS BIGINT) AS n_new, " +
        "CAST(SUM(n_retained) AS BIGINT) AS n_retained, " +
        "CAST(SUM(n_resurrected) AS BIGINT) AS n_resurrected, " +
        "CAST(SUM(n_churned) AS BIGINT) AS n_churned FROM s GROUP BY day ORDER BY day"),
    // conversion latency: the funnel CTEs (same first-touch semantics
    // as x_event_funnel), deltas as exact integer micros, quantile_cont
    // ≡ Spark's exact percentile interpolation
    "x_time_to_convert" ->
      ("WITH u1 AS (SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id), " +
        "u2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN u1 ON e.user_id = u1.user_id " +
        "WHERE e.event_type = 'click' AND e.ts > u1.t1 AND e.ts <= u1.t1 + INTERVAL 172800 SECOND GROUP BY e.user_id), " +
        "u3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN u2 ON e.user_id = u2.user_id " +
        "WHERE e.event_type = 'purchase' AND e.ts > u2.t2 AND e.ts <= u2.t2 + INTERVAL 172800 SECOND GROUP BY e.user_id), " +
        "d1 AS (SELECT epoch_us(u2.t2) - epoch_us(u1.t1) AS dus FROM u2 JOIN u1 ON u2.user_id = u1.user_id), " +
        "d2 AS (SELECT epoch_us(u3.t3) - epoch_us(u2.t2) AS dus FROM u3 JOIN u2 ON u3.user_id = u2.user_id) " +
        "SELECT CAST(1 AS BIGINT) AS step, 'view' AS from_type, 'click' AS to_type, COUNT(*) AS n_users, " +
        "ROUND(quantile_cont(dus, 0.5) / 1e6, 4) AS p50_sec, ROUND(quantile_cont(dus, 0.9) / 1e6, 4) AS p90_sec, " +
        "ROUND(AVG(dus) / 1e6, 4) AS avg_sec FROM d1 " +
        "UNION ALL SELECT 2, 'click', 'purchase', COUNT(*), " +
        "ROUND(quantile_cont(dus, 0.5) / 1e6, 4), ROUND(quantile_cont(dus, 0.9) / 1e6, 4), " +
        "ROUND(AVG(dus) / 1e6, 4) FROM d2 ORDER BY step"),
    // session paths: the same lag-flag running-sum sessionization, the
    // same (ts, event_id) total order, string_agg over the first 8
    "x_session_paths" ->
      ("WITH f AS (SELECT user_id, event_type, ts, event_id, " +
        "CASE WHEN LAG(ts) OVER w IS NULL OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 21600000000 THEN 1 ELSE 0 END AS newf " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "g AS (SELECT user_id, event_type, ts, event_id, " +
        "SUM(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM f), " +
        "r AS (SELECT user_id, sess, event_type, ts, event_id, " +
        "ROW_NUMBER() OVER (PARTITION BY user_id, sess ORDER BY ts, event_id) AS rk FROM g), " +
        "p AS (SELECT string_agg(event_type, '>' ORDER BY rk) AS path FROM r WHERE rk <= 8 GROUP BY user_id, sess) " +
        "SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM p GROUP BY path " +
        "HAVING COUNT(*) >= 2 ORDER BY path"),
    // CUSUM: the running-extremum closed form over the SAME sequential
    // window cumsums — integer-valued daily counts make the per-key
    // mean exact, so the prefix sums are bit-identical across engines
    "x_cusum" ->
      ("WITH s AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1, 2), " +
        "m AS (SELECT event_type, AVG(CAST(n AS DOUBLE)) AS mean FROM s GROUP BY 1), " +
        "c AS (SELECT s.event_type, s.day, s.n, " +
        "SUM(CAST(s.n AS DOUBLE) - m.mean - 1.0) OVER w AS c, " +
        "SUM(CAST(s.n AS DOUBLE) - m.mean + 1.0) OVER w AS d " +
        "FROM s JOIN m ON s.event_type = m.event_type " +
        "WINDOW w AS (PARTITION BY s.event_type ORDER BY s.day ROWS UNBOUNDED PRECEDING)), " +
        "c2 AS (SELECT event_type, day, n, c, d, MIN(c) OVER w AS mc, MAX(d) OVER w AS md FROM c " +
        "WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS UNBOUNDED PRECEDING)) " +
        "SELECT event_type, day, n, ROUND(c - LEAST(mc, 0), 6) AS cusum_pos, " +
        "ROUND(GREATEST(md, 0) - d, 6) AS cusum_neg FROM c2 ORDER BY event_type, day"),
    // Adamic-Adar: same center-keyed wedge enumeration over the thinned
    // undirected graph, same degree cap, contributions fixed-pointed to
    // picos BEFORE the sum (exact integer addition on both engines)
    "x_adamic_adar" ->
      (thinTradeCte +
        ", canon AS (SELECT DISTINCT LEAST(src, dst) AS x, GREATEST(src, dst) AS y FROM thin WHERE src <> dst)" +
        ", adj AS (SELECT x AS c, y AS node FROM canon UNION ALL SELECT y, x FROM canon)" +
        ", ctr AS (SELECT c, CAST(ROUND(1e12 / ln(COUNT(*)), 0) AS BIGINT) AS w FROM adj GROUP BY c HAVING COUNT(*) BETWEEN 2 AND 20)" +
        ", pairs AS (SELECT a.node AS node_a, b.node AS node_b, ctr.w FROM adj a JOIN adj b ON a.c = b.c AND a.node < b.node JOIN ctr ON ctr.c = a.c)" +
        ", agg AS (SELECT node_a, node_b, CAST(COUNT(*) AS BIGINT) AS n_common, CAST(SUM(w) AS BIGINT) AS s FROM pairs GROUP BY 1, 2) " +
        "SELECT agg.node_a, agg.node_b, agg.n_common, ROUND(CAST(s AS DOUBLE) / 1e12, 6) AS score " +
        "FROM agg LEFT JOIN canon ON node_a = x AND node_b = y WHERE x IS NULL ORDER BY node_a, node_b"),
    // SSSP: bounded-depth recursive enumeration — positive integer
    // weights sum exactly, cycles never improve a min, 4-hop bound
    // matches the engine's Bellman-Ford rounds
    "x_sssp" ->
      ("WITH RECURSIVE e AS (SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS BIGINT) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
        "JOIN nation cn ON c.c_nationkey = cn.n_nationkey " +
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey GROUP BY 1, 2), " +
        "thin AS (SELECT src, dst, w FROM e WHERE CAST(w AS DOUBLE) > 1.05 * (SELECT AVG(CAST(w AS DOUBLE)) FROM e)), " +
        "walk(node, dd, h) AS (" +
        "SELECT n_name, CAST(0 AS BIGINT), 0 FROM nation WHERE n_name = 'NATION_12' " +
        "UNION ALL SELECT t.dst, wk.dd + t.w, wk.h + 1 FROM walk wk JOIN thin t ON wk.node = t.src WHERE wk.h < 4) " +
        "SELECT node, MIN(dd) AS dist FROM walk GROUP BY node ORDER BY node"),
    // mutual information: identical expression shape (pxy/(px)/(py)
    // with the same left-assoc division order) so the ln argument is
    // the same double on both engines; 6 dp absorbs the ln ulp
    "x_mutual_info" ->
      ("WITH j AS (SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2), " +
        "mx AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nx FROM j GROUP BY 1), " +
        "my AS (SELECT source, CAST(SUM(n) AS BIGINT) AS ny FROM j GROUP BY 1), " +
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM j) " +
        "SELECT j.lang, j.source, j.n, " +
        "ROUND(ln(CAST(n AS DOUBLE) / nt / (CAST(nx AS DOUBLE) / nt) / (CAST(ny AS DOUBLE) / nt)), 6) AS pmi, " +
        "ROUND(CAST(n AS DOUBLE) / nt * ln(CAST(n AS DOUBLE) / nt / (CAST(nx AS DOUBLE) / nt) / (CAST(ny AS DOUBLE) / nt)), 6) AS mi_contrib " +
        "FROM j JOIN mx ON j.lang = mx.lang JOIN my ON j.source = my.source CROSS JOIN t " +
        "ORDER BY j.lang, j.source"),
    // inverted index: the two-phase shard build ≡ a direct global
    // sort-and-slice (each shard keeps its 20 smallest ids); postings
    // comma-joined so the driver canonicalization sees only scalars
    "x_inverted_index" ->
      ("WITH p AS (SELECT DISTINCT doc_id, t AS token FROM documents, UNNEST(string_split(text, ' ')) AS u(t) WHERE len(t) > 0), " +
        "g AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df, " +
        "list_slice(list_sort(list(doc_id)), 1, 20) AS postings FROM p GROUP BY token) " +
        "SELECT token, df, array_to_string(postings, ',') AS postings, df > 20 AS truncated FROM g WHERE df >= 5 ORDER BY token"),
    "q54_unpivot" ->
      ("SELECT l_orderkey, l_linenumber, m AS measure, v AS value FROM (" +
        "SELECT l_orderkey, l_linenumber, 'l_quantity' AS m, l_quantity AS v FROM lineitem " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem) " +
        "ORDER BY l_orderkey, l_linenumber, measure"),
    // KS drift: same shared equi-width grid (identical IEEE width and
    // floor arithmetic), integer bin counts ⇒ exact CDF ratios
    "x_ks_drift" ->
      ("WITH va AS (SELECT CAST(value AS DOUBLE) AS x FROM events WHERE event_type = 'view' AND value IS NOT NULL), " +
        "vb AS (SELECT CAST(value AS DOUBLE) AS x FROM events WHERE event_type = 'purchase' AND value IS NOT NULL), " +
        "bd AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM (SELECT x FROM va UNION ALL SELECT x FROM vb)), " +
        "ba AS (SELECT CASE WHEN hi = lo THEN 0 ELSE LEAST(CAST(FLOOR((x - lo) / ((hi - lo) / 64)) AS BIGINT), 63) END AS bin FROM va CROSS JOIN bd), " +
        "bb AS (SELECT CASE WHEN hi = lo THEN 0 ELSE LEAST(CAST(FLOOR((x - lo) / ((hi - lo) / 64)) AS BIGINT), 63) END AS bin FROM vb CROSS JOIN bd), " +
        "ca AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS ca FROM ba GROUP BY bin), " +
        "cb AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cb FROM bb GROUP BY bin), " +
        "h AS (SELECT COALESCE(ca.bin, cb.bin) AS bin, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin), " +
        "t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM h), " +
        "c AS (SELECT ABS(CAST(SUM(ca) OVER w AS DOUBLE) / na - CAST(SUM(cb) OVER w AS DOUBLE) / nb) AS d, na, nb " +
        "FROM h CROSS JOIN t WINDOW w AS (ORDER BY bin ROWS UNBOUNDED PRECEDING)) " +
        "SELECT na AS n_a, nb AS n_b, ROUND(MAX(d), 6) AS d_stat FROM c GROUP BY na, nb"),
    // lagged cross-correlation: all five Pearson sufficient statistics
    // are exact integer sums; only the final expression is floating
    "x_xcorr" ->
      ("WITH s AS (SELECT event_type, CAST(ts AS DATE) - DATE '1970-01-01' AS o, COUNT(*) AS n FROM events GROUP BY 1, 2), " +
        "xs AS (SELECT o, n AS x FROM s WHERE event_type = 'view'), " +
        "ys AS (SELECT o, n AS y FROM s WHERE event_type = 'purchase'), " +
        "l AS (SELECT UNNEST(generate_series(0, 7)) AS lag), " +
        "p AS (SELECT l.lag, xs.x, ys.y FROM ys CROSS JOIN l JOIN xs ON xs.o = ys.o - l.lag), " +
        "st AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy, " +
        "SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy FROM p GROUP BY lag) " +
        "SELECT lag, n, CASE WHEN SQRT(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) > 0 " +
        "THEN ROUND(CAST(n*sxy - sx*sy AS DOUBLE) / SQRT(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 6) END AS corr " +
        "FROM st ORDER BY lag"),
    // MNN: brute-force knn both directions (the x_knn_join cosine
    // formula verbatim), reciprocity via a reversed-pair self-join
    "x_mnn" ->
      ("WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 1000), " +
        "s AS (SELECT a.vec_id AS qid, b.vec_id AS vid, " +
        "ROUND(list_dot_product(b.e, a.e)/(SQRT(list_dot_product(b.e, b.e))*SQRT(list_dot_product(a.e, a.e))), 4) + 0 AS cos " +
        "FROM v a CROSS JOIN v b WHERE a.vec_id <> b.vec_id), " +
        "r AS (SELECT qid, vid, cos, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk FROM s), " +
        "kn AS (SELECT qid, vid, cos FROM r WHERE rk <= 10) " +
        "SELECT kn.qid AS id_a, kn.vid AS id_b, kn.cos FROM kn " +
        "JOIN kn k2 ON kn.qid = k2.vid AND kn.vid = k2.qid " +
        "WHERE kn.qid < kn.vid ORDER BY id_a, id_b"),
    // ANN-fronted MNN (the scale composition): the x_ann_knn_join
    // bucket CTE with the FULL corpus as the query side, then the same
    // reciprocity self-join as x_mnn
    "x_mnn_ann" ->
      (s"WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
        s"b AS (SELECT vec_id, e, ${annBucketSql(8, 64)} AS bucket FROM v), " +
        "s AS (SELECT q.vec_id AS qid, b.vec_id AS vid, " +
        "ROUND(list_dot_product(b.e, q.e)/(SQRT(list_dot_product(b.e, b.e))*SQRT(list_dot_product(q.e, q.e))), 4) + 0 AS cos " +
        "FROM b, b q WHERE b.vec_id <> q.vec_id AND bit_count(xor(b.bucket, q.bucket)) <= 1), " +
        "r AS (SELECT qid, vid, cos, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rk FROM s), " +
        "kn AS (SELECT qid, vid, cos FROM r WHERE rk <= 10) " +
        "SELECT kn.qid AS id_a, kn.vid AS id_b, kn.cos FROM kn " +
        "JOIN kn k2 ON kn.qid = k2.vid AND kn.vid = k2.qid " +
        "WHERE kn.qid < kn.vid ORDER BY id_a, id_b"),
    // stickiness: rolling distincts as "active in [day-W+1, day]" range
    // joins — equivalent to the engine's coverage expansion
    "x_stickiness" ->
      ("WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events), " +
        "g AS (SELECT DISTINCT d AS day FROM a), " +
        "d1 AS (SELECT g.day, COUNT(DISTINCT a.user_id) AS dau FROM g JOIN a ON a.d = g.day GROUP BY g.day), " +
        "d7 AS (SELECT g.day, COUNT(DISTINCT a.user_id) AS wau FROM g JOIN a ON a.d BETWEEN g.day - 6 AND g.day GROUP BY g.day), " +
        "d30 AS (SELECT g.day, COUNT(DISTINCT a.user_id) AS mau FROM g JOIN a ON a.d BETWEEN g.day - 29 AND g.day GROUP BY g.day) " +
        "SELECT day, dau, wau, mau, ROUND(CAST(dau AS DOUBLE) / mau, 6) AS stickiness " +
        "FROM d1 JOIN d7 USING(day) JOIN d30 USING(day) ORDER BY day"),
    "x_kanon" ->
      ("WITH gset AS (SELECT lang, source, n_chars, COUNT(*) AS n FROM documents GROUP BY 1, 2, 3) " +
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, " +
        "CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating, " +
        "CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_rows_at_risk, " +
        "CAST(MIN(n) AS BIGINT) AS min_k FROM gset"),
    // MAD: the same two exact-percentile passes and the same
    // left-assoc modified-z expression, so the 3.5 cut compares the
    // same double on both engines
    "x_mad" ->
      ("WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1), " +
        "md AS (SELECT e.event_type, quantile_cont(ABS(e.value - m.med), 0.5) AS mad " +
        "FROM events e JOIN m ON e.event_type = m.event_type GROUP BY e.event_type) " +
        "SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
        "ROUND(ANY_VALUE(m.med), 4) AS med, ROUND(ANY_VALUE(md.mad), 4) AS mad, " +
        "CAST(SUM(CASE WHEN md.mad > 0 AND ABS(0.6745 * (e.value - m.med) / md.mad) > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers " +
        "FROM events e JOIN m ON e.event_type = m.event_type " +
        "JOIN md ON e.event_type = md.event_type " +
        "GROUP BY e.event_type ORDER BY e.event_type"),
    "q55_grouping_sets" ->
      ("SELECT l_returnflag, l_linestatus, COUNT(*) AS n, " +
        "CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid " +
        "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) " +
        "ORDER BY gid, COALESCE(l_returnflag, ''), COALESCE(l_linestatus, '')"),
    // Fightin' Words: identical expression order per token (counts are
    // exact integers, one ln/sqrt chain per row — nothing reduces in
    // float), 6 dp rounding, the ROUNDED z gates the |z| >= 1 cut
    "x_logodds" ->
      ("WITH ta AS (SELECT t AS token FROM (SELECT text FROM documents WHERE source = 'src0'), UNNEST(string_split(text, ' ')) AS u(t) WHERE len(t) > 0), " +
        "tb AS (SELECT t AS token FROM (SELECT text FROM documents WHERE source = 'src1'), UNNEST(string_split(text, ' ')) AS u(t) WHERE len(t) > 0), " +
        "ca AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_a FROM ta GROUP BY 1), " +
        "cb AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_b FROM tb GROUP BY 1), " +
        "j AS (SELECT COALESCE(ca.token, cb.token) AS token, COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b FROM ca FULL OUTER JOIN cb ON ca.token = cb.token), " +
        "t AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n1, CAST(SUM(c_b) AS BIGINT) AS n2, CAST(COUNT(*) AS BIGINT) AS v FROM j), " +
        "s AS (SELECT token, c_a, c_b, " +
        "ROUND(ln((CAST(c_a AS DOUBLE) + 0.01) / (CAST(n1 AS DOUBLE) + 0.01 * v - CAST(c_a AS DOUBLE) - 0.01)) " +
        "- ln((CAST(c_b AS DOUBLE) + 0.01) / (CAST(n2 AS DOUBLE) + 0.01 * v - CAST(c_b AS DOUBLE) - 0.01)), 6) AS delta, " +
        "ROUND((ln((CAST(c_a AS DOUBLE) + 0.01) / (CAST(n1 AS DOUBLE) + 0.01 * v - CAST(c_a AS DOUBLE) - 0.01)) " +
        "- ln((CAST(c_b AS DOUBLE) + 0.01) / (CAST(n2 AS DOUBLE) + 0.01 * v - CAST(c_b AS DOUBLE) - 0.01))) " +
        "/ SQRT(1.0 / (c_a + 0.01) + 1.0 / (c_b + 0.01)), 6) AS z " +
        "FROM j CROSS JOIN t) " +
        "SELECT token, c_a, c_b, delta, z FROM s " +
        "WHERE ABS(z) >= 1.0 AND (c_a >= 5 OR c_b >= 5) ORDER BY token"),
    // sessionize: the same lag-flag running-sum assignment + one
    // per-session rollup; exact integer-microsecond durations
    "x_sessions" ->
      ("WITH f AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN LAG(ts) OVER w IS NULL OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 21600000000 THEN 1 ELSE 0 END AS newf " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "g AS (SELECT user_id, ts, CAST(SUM(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session FROM f) " +
        "SELECT user_id, session, MIN(ts) AS start_ts, MAX(ts) AS end_ts, " +
        "CAST(COUNT(*) AS BIGINT) AS n_events, " +
        "ROUND(CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS DOUBLE) / 1e6, 6) AS duration_sec " +
        "FROM g GROUP BY user_id, session ORDER BY user_id, session"),
    // path n-grams: LEAD within the session window — nulls past the
    // session end drop incomplete tails, exactly the engine guard
    "x_path_ngrams" ->
      ("WITH f AS (SELECT user_id, event_type, ts, event_id, " +
        "CASE WHEN LAG(ts) OVER w IS NULL OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 21600000000 THEN 1 ELSE 0 END AS newf " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "g AS (SELECT user_id, event_type, ts, event_id, " +
        "SUM(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM f), " +
        "r AS (SELECT event_type, LEAD(event_type, 1) OVER ws AS t1, LEAD(event_type, 2) OVER ws AS t2 " +
        "FROM g WINDOW ws AS (PARTITION BY user_id, sess ORDER BY ts, event_id)) " +
        "SELECT event_type || '>' || t1 || '>' || t2 AS ngram, CAST(COUNT(*) AS BIGINT) AS n_occurrences " +
        "FROM r WHERE t1 IS NOT NULL AND t2 IS NOT NULL " +
        "GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY ngram"),
    // label centroids: pico-fixed-point component sums, dim-ordered
    // assembly, the fastCosine expression shape, fixed-point cosine
    // mean — no float ever reduces in shuffle order on either engine
    "x_label_centroids" ->
      ("WITH x AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
        "ex AS (SELECT label, UNNEST(e) AS v, UNNEST(range(1, len(e) + 1)) AS d FROM x), " +
        "comp AS (SELECT label, d, SUM(CAST(ROUND(v * 1e12, 0) AS BIGINT)) AS s, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM ex GROUP BY label, d), " +
        "cent0 AS (SELECT label, MAX(n) AS n, list(CAST(s AS DOUBLE) / 1e12 ORDER BY d) AS cs FROM comp GROUP BY label), " +
        "cent AS (SELECT label, n, list_transform(cs, z -> z / n) AS c FROM cent0), " +
        "wc AS (SELECT x.label, cent.n, cent.c, " +
        "CASE WHEN list_dot_product(cent.c, cent.c) > 0 AND list_dot_product(x.e, x.e) > 0 THEN " +
        "ROUND(list_dot_product(x.e, cent.c) / (SQRT(list_dot_product(x.e, x.e)) * SQRT(list_dot_product(cent.c, cent.c))), 4) + 0 END AS cos " +
        "FROM x JOIN cent ON x.label = cent.label) " +
        "SELECT label, MAX(n) AS n, " +
        "ROUND(SQRT(ANY_VALUE(list_dot_product(c, c))), 6) AS centroid_norm, " +
        "ROUND(CAST(SUM(CAST(ROUND(cos * 1e4, 0) AS BIGINT)) AS DOUBLE) / 1e4 / MAX(n), 6) AS avg_cos, " +
        "MIN(cos) AS min_cos FROM wc GROUP BY label ORDER BY label"),
    // Benford: identical string-form leading-digit extraction (both
    // engines render doubles shortest-round-trip, and decimal and
    // scientific forms both lead with the first significant digit)
    "x_benford" ->
      ("WITH v AS (SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem WHERE l_extendedprice IS NOT NULL AND CAST(l_extendedprice AS DOUBLE) > 0), " +
        "d AS (SELECT l_returnflag, CAST(regexp_extract(CAST(x AS VARCHAR), '[1-9]') AS BIGINT) AS digit FROM v), " +
        "c AS (SELECT l_returnflag, digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1, 2), " +
        "t AS (SELECT l_returnflag, CAST(SUM(n) AS BIGINT) AS nt FROM c GROUP BY 1) " +
        "SELECT c.l_returnflag, c.digit, c.n, " +
        "ROUND(log10(1.0 + 1.0 / c.digit), 6) AS expected_p, " +
        "ROUND(POWER(CAST(c.n AS DOUBLE) - nt * log10(1.0 + 1.0 / c.digit), 2) / (nt * log10(1.0 + 1.0 / c.digit)), 6) AS chi2_term " +
        "FROM c JOIN t ON c.l_returnflag = t.l_returnflag " +
        "ORDER BY c.l_returnflag, c.digit"),
    // Gini: micro-unit fixed-point magnitudes (exact integer rank sums
    // on both engines), identical final float expression
    "x_gini" ->
      ("WITH k AS (SELECT event_type, user_id, CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE) * 1e6, 0) AS BIGINT)) AS BIGINT) AS xq " +
        "FROM events WHERE value IS NOT NULL GROUP BY 1, 2), " +
        "r AS (SELECT event_type, xq, CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY xq, user_id) AS BIGINT) AS rk FROM k), " +
        "g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_keys, SUM(CAST(xq AS HUGEINT)) AS sx, SUM(CAST(rk AS HUGEINT) * xq) AS sr FROM r GROUP BY 1) " +
        "SELECT event_type, n_keys, ROUND(CAST(sx AS DOUBLE) / 1e6, 6) AS total, " +
        "ROUND(2.0 * sr / (CAST(n_keys AS DOUBLE) * CAST(sx AS DOUBLE)) - CAST(n_keys + 1 AS DOUBLE) / n_keys, 6) AS gini " +
        "FROM g ORDER BY event_type"),
    // diversity: per-cell terms quantized to 1e-12 before the sum (the
    // tokenDrift contract); 6 dp absorbs engine ln ulps
    "x_diversity" ->
      ("WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2), " +
        "t AS (SELECT source, CAST(SUM(c) AS BIGINT) AS nt FROM c GROUP BY 1), " +
        "j AS (SELECT c.source, CAST(c.c AS DOUBLE) / nt AS p, nt FROM c JOIN t ON c.source = t.source), " +
        "g AS (SELECT source, MAX(nt) AS n, CAST(COUNT(*) AS BIGINT) AS k_classes, " +
        "CAST(SUM(CAST(ROUND((-p) * ln(p) * 1e12, 0) AS BIGINT)) AS BIGINT) AS h, " +
        "CAST(SUM(CAST(ROUND(p * p * 1e12, 0) AS BIGINT)) AS BIGINT) AS s FROM j GROUP BY source) " +
        "SELECT source, n, k_classes, " +
        "ROUND(CAST(h AS DOUBLE) / 1e12, 6) AS shannon, " +
        "ROUND(CAST(s AS DOUBLE) / 1e12, 6) AS simpson, " +
        "CASE WHEN k_classes > 1 THEN ROUND(CAST(h AS DOUBLE) / 1e12 / ln(CAST(k_classes AS DOUBLE)), 6) END AS evenness " +
        "FROM g ORDER BY source"),
    // readability: same derived sentence punctuation (global ' the '
    // → '. ' replacement), same left-assoc ratio expressions; the
    // FLOOR(x*1e4 + 0.5) quantization is pure IEEE arithmetic on the
    // identical double, so exact decimal halves (which the 2-dp Flesch
    // constants produce by construction) can't split on tie rules
    "x_readability" ->
      ("WITH p AS (SELECT doc_id, regexp_replace(text, ' the ', '. ', 'g') AS text FROM documents), " +
        "w AS (SELECT doc_id, " +
        "CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0)) AS BIGINT) AS words, " +
        "CAST(GREATEST(len(list_filter(string_split_regex(text, '[.!?]+'), t -> len(trim(t)) > 0)), 1) AS BIGINT) AS sentences, " +
        "CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syllables FROM p) " +
        "SELECT doc_id, words, sentences, syllables, " +
        "CAST(FLOOR((206.835 - 1.015 * (CAST(words AS DOUBLE) / sentences) - 84.6 * (CAST(syllables AS DOUBLE) / words)) * 10000.0 + 0.5) AS BIGINT) / 10000.0 AS ease, " +
        "CAST(FLOOR((0.39 * (CAST(words AS DOUBLE) / sentences) + 11.8 * (CAST(syllables AS DOUBLE) / words) - 15.59) * 10000.0 + 0.5) AS BIGINT) / 10000.0 AS grade " +
        "FROM w WHERE words > 0 ORDER BY doc_id"),
    // corpus export: the entry aggregates the MANIFEST; the oracle
    // recomputes the same per-split rollup from the raw table (split =
    // md5 nibble replay, row hash = md5(id || text) 15-hex prefix,
    // order-independent XOR) — equality proves every corpus row landed
    // in exactly one committed shard with unaltered content.
    "x_corpus_export" -> corpusExportRollupSql,
    // JSONL variant: SAME table-side replay — the manifest rollup must
    // be format-invariant (json.gz shards carry identical content)
    "x_corpus_export_jsonl" -> corpusExportRollupSql,
    // incremental variant: SAME table-side replay — two generation
    // appends (even then odd doc_ids) partition the corpus, so the
    // unioned manifest must roll up exactly as one overwrite export
    "x_corpus_export_incr" -> corpusExportRollupSql,
    // WebDataset tar variant: SAME table-side replay — the manifest is
    // built by PARSING the committed ustar shards back, so equality
    // proves the tar encode→commit→parse cycle row-exact
    "x_webdataset" -> corpusExportRollupSql,
    // two tar-shard generation appends partition the corpus, so the
    // unioned manifest's rollup replays from the same table-side SQL
    "x_webdataset_incr" -> corpusExportRollupSql,
    // linear-interpolation resample: x_resample's grid + the same
    // default-frame prev / forward-frame next windows; the fill is one
    // per-row double expression on long bucket indices (no float sums)
    "x_interp" ->
      ("WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket, ts, event_id, CAST(value AS DOUBLE) AS v FROM events), " +
        "pb AS (SELECT user_id, bucket, v FROM (" +
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, bucket ORDER BY ts DESC, event_id DESC) AS rn FROM e) WHERE rn = 1), " +
        "span AS (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM e GROUP BY user_id), " +
        "grid AS (SELECT user_id, UNNEST(generate_series(lo, hi, 86400)) AS bucket FROM span), " +
        "j AS (SELECT g.user_id, g.bucket, pb.v, " +
        "LAST_VALUE(pb.v IGNORE NULLS) OVER w AS pv, " +
        "LAST_VALUE(CASE WHEN pb.v IS NOT NULL THEN g.bucket END IGNORE NULLS) OVER w AS pbk, " +
        "FIRST_VALUE(pb.v IGNORE NULLS) OVER wf AS nv, " +
        "FIRST_VALUE(CASE WHEN pb.v IS NOT NULL THEN g.bucket END IGNORE NULLS) OVER wf AS nbk " +
        "FROM grid g LEFT JOIN pb ON g.user_id = pb.user_id AND g.bucket = pb.bucket " +
        "WINDOW w AS (PARTITION BY g.user_id ORDER BY g.bucket), " +
        "wf AS (PARTITION BY g.user_id ORDER BY g.bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT user_id, bucket, " +
        "ROUND(CASE WHEN v IS NOT NULL THEN v WHEN nv IS NULL THEN pv " +
        "ELSE pv + (nv - pv) * (CAST(bucket - pbk AS DOUBLE) / CAST(nbk - pbk AS DOUBLE)) END, 6) AS value, " +
        "CAST(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS observed " +
        "FROM j ORDER BY user_id, bucket"),
    // ranking metrics: every DCG term quantized 1e-12 before its sum
    // (the cross-engine float-sum contract); identical md5-ordered run
    "x_rank_eval" ->
      ("WITH sup AS (SELECT n_name, s_suppkey, s_name, s_acctbal FROM supplier JOIN nation ON s_nationkey = n_nationkey), " +
        "run AS (SELECT n_name AS query, s_suppkey AS doc, CAST(ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY md5(s_name), s_suppkey) AS BIGINT) AS rank FROM sup), " +
        "qrels AS (SELECT n_name AS query, s_suppkey AS doc, CAST(CASE WHEN s_acctbal > 7000 THEN 3 WHEN s_acctbal > 5000 THEN 2 ELSE 1 END AS BIGINT) AS grade FROM sup WHERE s_acctbal > 3000), " +
        "j AS (SELECT r.query, r.rank, q.grade FROM run r LEFT JOIN qrels q ON r.query = q.query AND r.doc = q.doc), " +
        "pr AS (SELECT query, CAST(COUNT(*) AS BIGINT) AS n_ret, " +
        "CAST(SUM(CASE WHEN grade IS NOT NULL AND rank <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS hits, " +
        "MIN(CASE WHEN grade IS NOT NULL THEN rank END) AS firstrel, " +
        "SUM(CASE WHEN grade IS NOT NULL AND rank <= 5 THEN CAST(ROUND((POWER(2.0, CAST(grade AS DOUBLE)) - 1.0) / (LN(CAST(rank AS DOUBLE) + 1.0) / LN(2.0)) * 1e12, 0) AS BIGINT) END) AS dcgq " +
        "FROM j GROUP BY 1), " +
        "ideal AS (SELECT query, CAST(COUNT(*) AS BIGINT) AS n_rel, " +
        "SUM(CASE WHEN irank <= 5 THEN CAST(ROUND((POWER(2.0, CAST(grade AS DOUBLE)) - 1.0) / (LN(CAST(irank AS DOUBLE) + 1.0) / LN(2.0)) * 1e12, 0) AS BIGINT) END) AS idcgq " +
        "FROM (SELECT query, grade, ROW_NUMBER() OVER (PARTITION BY query ORDER BY grade DESC, doc) AS irank FROM qrels) GROUP BY 1) " +
        // FULL outer, mirroring the engine's trec_eval parity: a judged
        // query the run never returned still gets its zero-score row
        // (coincides with the left join on this fixture — qrels queries
        // are a subset of run queries — but the CONTRACT is full-outer)
        "SELECT COALESCE(pr.query, ideal.query) AS query, COALESCE(ideal.n_rel, 0) AS n_rel, " +
        "COALESCE(pr.n_ret, 0) AS n_ret, " +
        "ROUND(CAST(COALESCE(hits, 0) AS DOUBLE) / 5, 6) AS p_at_k, " +
        "CASE WHEN n_rel > 0 THEN ROUND(CAST(COALESCE(hits, 0) AS DOUBLE) / n_rel, 6) END AS r_at_k, " +
        "CASE WHEN firstrel IS NOT NULL THEN ROUND(1.0 / firstrel, 6) ELSE 0.0 END AS rr, " +
        "CASE WHEN idcgq > 0 THEN ROUND(CAST(COALESCE(dcgq, 0) AS DOUBLE) / idcgq, 6) END AS ndcg_at_k " +
        "FROM pr FULL OUTER JOIN ideal ON pr.query = ideal.query ORDER BY 1"),
    // temporal split audit: pure integer counting per key then one row
    "x_time_split" ->
      ("WITH pk AS (SELECT CAST(FLOOR(event_id / 3) AS BIGINT) AS blk, " +
        "SUM(CASE WHEN ts < TIMESTAMP '2024-01-22 00:00:00' THEN 1 ELSE 0 END) AS tr, " +
        "SUM(CASE WHEN ts >= TIMESTAMP '2024-01-22 00:00:00' THEN 1 ELSE 0 END) AS te " +
        "FROM events GROUP BY 1) " +
        "SELECT CAST(SUM(tr) AS BIGINT) AS n_train, CAST(SUM(te) AS BIGINT) AS n_test, " +
        "CAST(SUM(CASE WHEN tr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS train_keys, " +
        "CAST(SUM(CASE WHEN te > 0 THEN 1 ELSE 0 END) AS BIGINT) AS test_keys, " +
        "CAST(SUM(CASE WHEN tr > 0 AND te > 0 THEN 1 ELSE 0 END) AS BIGINT) AS shared_keys, " +
        "CASE WHEN SUM(CASE WHEN te > 0 THEN 1 ELSE 0 END) > 0 THEN " +
        "ROUND(CAST(SUM(CASE WHEN tr > 0 AND te > 0 THEN 1 ELSE 0 END) AS DOUBLE) / SUM(CASE WHEN te > 0 THEN 1 ELSE 0 END), 6) END AS shared_key_frac, " +
        "CAST(SUM(CASE WHEN tr > 0 AND te > 0 THEN te ELSE 0 END) AS BIGINT) AS leaky_test_rows, " +
        "CASE WHEN SUM(te) > 0 THEN " +
        "ROUND(CAST(SUM(CASE WHEN tr > 0 AND te > 0 THEN te ELSE 0 END) AS DOUBLE) / SUM(te), 6) END AS leaky_row_frac " +
        "FROM pk"),
    // semantic decontam: the x_ann_knn_join bucket front flipped to a
    // per-corpus-row argmax; planted verbatim leaks share buckets at
    // probe 0, so recall on them is structural, not probabilistic
    "x_sem_decontam" ->
      (s"WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
        s"b AS (SELECT vec_id, e, ${annBucketSql(8, 64)} AS bucket FROM v), " +
        "q AS (SELECT vec_id + 1000000 AS qid, e AS qe, bucket AS qb FROM b WHERE vec_id < 8), " +
        "s AS (SELECT b.vec_id, q.qid, ROUND(list_dot_product(b.e,q.qe)/(SQRT(list_dot_product(b.e,b.e))*SQRT(list_dot_product(q.qe,q.qe))),4) + 0 AS cos " +
        "FROM b, q WHERE bit_count(xor(b.bucket, q.qb)) <= 1), " +
        "f AS (SELECT * FROM s WHERE cos >= 0.9), " +
        "r AS (SELECT vec_id, qid, cos, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, qid) AS rk, COUNT(*) OVER (PARTITION BY vec_id) AS nh FROM f) " +
        "SELECT vec_id, qid AS matched_id, cos, CAST(nh AS BIGINT) AS n_hits FROM r WHERE rk = 1 ORDER BY vec_id"),
    // Zipf fit: per-rank OLS terms on the ln scale quantized 1e-12 and
    // integer-summed over the <= topN frame; identical final algebra
    "x_zipf" ->
      ("WITH tok AS (SELECT t FROM documents, UNNEST(string_split(text, ' ')) AS u(t) WHERE len(t) > 0), " +
        "c AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY 1), " +
        "top AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rk FROM c ORDER BY n DESC, t LIMIT 500), " +
        "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_terms, " +
        "SUM(CAST(ROUND(ln(CAST(rk AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS sx, " +
        "SUM(CAST(ROUND(ln(CAST(n AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS sy, " +
        "SUM(CAST(ROUND(ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS sxx, " +
        "SUM(CAST(ROUND(ln(CAST(n AS DOUBLE)) * ln(CAST(n AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS syy, " +
        "SUM(CAST(ROUND(ln(CAST(rk AS DOUBLE)) * ln(CAST(n AS DOUBLE)) * 1e12, 0) AS BIGINT)) AS sxy FROM top), " +
        "f AS (SELECT n_terms, CAST(n_terms AS DOUBLE) AS nn, CAST(sx AS DOUBLE) / 1e12 AS dsx, CAST(sy AS DOUBLE) / 1e12 AS dsy, " +
        "CAST(sxx AS DOUBLE) / 1e12 AS dsxx, CAST(syy AS DOUBLE) / 1e12 AS dsyy, CAST(sxy AS DOUBLE) / 1e12 AS dsxy FROM s), " +
        "v AS (SELECT n_terms, nn, dsx, dsy, nn * dsxx - dsx * dsx AS vx, nn * dsyy - dsy * dsy AS vy, nn * dsxy - dsx * dsy AS cxy FROM f) " +
        "SELECT n_terms, CASE WHEN vx > 0 THEN ROUND(cxy / vx, 6) END AS slope, " +
        "CASE WHEN vx > 0 THEN ROUND((dsy - cxy / vx * dsx) / nn, 6) END AS intercept, " +
        "CASE WHEN vx > 0 AND vy > 0 THEN ROUND(cxy * cxy / (vx * vy), 6) END AS r2 FROM v"),
    // PSI: ksDrift's shared-bounds bins, Laplace +0.5 smoothing over the
    // FULL bin grid, every term quantized 1e-12 before the sum
    "x_psi" ->
      ("WITH va AS (SELECT CAST(value AS DOUBLE) AS x FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00' AND value IS NOT NULL), " +
        "vb AS (SELECT CAST(value AS DOUBLE) AS x FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' AND value IS NOT NULL), " +
        "bd AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM (SELECT x FROM va UNION ALL SELECT x FROM vb)), " +
        "ba AS (SELECT CASE WHEN hi = lo THEN CAST(0 AS BIGINT) ELSE LEAST(CAST(FLOOR((x - lo) / ((hi - lo) / 16)) AS BIGINT), 15) END AS b, COUNT(*) AS ca FROM va CROSS JOIN bd GROUP BY 1), " +
        "bb AS (SELECT CASE WHEN hi = lo THEN CAST(0 AS BIGINT) ELSE LEAST(CAST(FLOOR((x - lo) / ((hi - lo) / 16)) AS BIGINT), 15) END AS b, COUNT(*) AS cb FROM vb CROSS JOIN bd GROUP BY 1), " +
        "g AS (SELECT UNNEST(generate_series(0, 15)) AS b), " +
        "h AS (SELECT g.b, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb FROM g LEFT JOIN ba ON g.b = ba.b LEFT JOIN bb ON g.b = bb.b), " +
        "t AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM h) " +
        "SELECT CAST(na AS BIGINT) AS n_ref, CAST(nb AS BIGINT) AS n_cur, " +
        "CASE WHEN na > 0 AND nb > 0 THEN ROUND(CAST(SUM(CAST(ROUND(((CAST(ca AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + 8.0) - (CAST(cb AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 8.0)) * ln(((CAST(ca AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + 8.0)) / ((CAST(cb AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 8.0))) * 1e12, 0) AS BIGINT)) AS DOUBLE) / 1e12, 6) END AS psi " +
        "FROM h CROSS JOIN t GROUP BY na, nb"),
    // grouped k-fold: md5(group) mod k — folds partition GROUPS
    "x_kfold" ->
      ("SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_groups " +
        "FROM (SELECT user_id, CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 5 AS fold FROM events) " +
        "GROUP BY fold ORDER BY fold"),
    // token-budget mixture plan: exact long token counts; each
    // stratum's temperature weight 1e-12-quantized before the
    // cross-stratum sum (order-free exact integer), rates as single
    // double expressions over exact integers
    "x_token_budget" ->
      ("WITH s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS nt FROM documents GROUP BY lang), " +
        "t AS (SELECT CAST(SUM(nt) AS DOUBLE) AS tt FROM s), " +
        s"w AS (SELECT lang, n_docs, nt, CAST(ROUND(POWER(CAST(nt AS DOUBLE) / tt, ${Queries.TokenBudgetFixture.alpha}) * 1e12, 0) AS BIGINT) AS wq FROM s, t), " +
        "sw AS (SELECT CAST(SUM(wq) AS DOUBLE) AS swq FROM w) " +
        "SELECT lang, n_docs, nt AS n_tokens, " +
        "ROUND(wq / swq, 6) AS p_mix, " +
        s"ROUND(${Queries.TokenBudgetFixture.budgetTokens} * (wq / swq), 4) AS target_tokens, " +
        s"ROUND(LEAST(1.0, (${Queries.TokenBudgetFixture.budgetTokens} * (wq / swq)) / nt), 6) AS keep_frac, " +
        s"CAST(LEAST(256, CEIL(LEAST(1.0, (${Queries.TokenBudgetFixture.budgetTokens} * (wq / swq)) / nt) * 256)) AS BIGINT) AS keep256, " +
        s"(${Queries.TokenBudgetFixture.budgetTokens} * (wq / swq) >= CAST(nt AS DOUBLE)) AS capped " +
        "FROM w, sw ORDER BY lang"),
    // int8 quantization: scale/round/reconstruct algebra replayed
    // element-wise (err as a function of (x, s) — no list zip needed);
    // dot folds + round-4 follow the standing cosine float contract
    "x_int8_quant" ->
      ("WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
        "q AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) / 127.0 AS s FROM v), " +
        "r AS (SELECT vec_id, e, s, CASE WHEN s = 0 THEN list_transform(e, x -> 0.0) " +
        "ELSE list_transform(e, x -> ROUND(x / s, 0) * s) END AS rec FROM q) " +
        "SELECT vec_id, ROUND(s, 6) AS scale, " +
        "ROUND(list_max(list_transform(e, x -> abs(x - CASE WHEN s = 0 THEN 0.0 ELSE ROUND(x / s, 0) * s END))), 6) AS max_abs_err, " +
        "CASE WHEN s > 0 THEN ROUND(list_dot_product(e, rec) / (SQRT(list_dot_product(e, e)) * SQRT(list_dot_product(rec, rec))), 4) + 0 END AS cos_fid " +
        "FROM r ORDER BY vec_id"),
    "x_int8_topk" ->
      ("WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings), " +
        "q0 AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) / 127.0 AS s FROM v), " +
        "r AS (SELECT vec_id, CASE WHEN s = 0 THEN list_transform(e, x -> 0.0) " +
        "ELSE list_transform(e, x -> ROUND(x / s, 0) * s) END AS rec FROM q0), " +
        "qv AS (SELECT rec AS qvec FROM r WHERE vec_id = 0) " +
        "SELECT r.vec_id, ROUND(list_dot_product(r.rec, qv.qvec) / " +
        "(SQRT(list_dot_product(r.rec, r.rec)) * SQRT(list_dot_product(qv.qvec, qv.qvec))), 4) + 0 AS cos " +
        "FROM r CROSS JOIN qv WHERE r.vec_id <> 0 ORDER BY cos DESC, r.vec_id LIMIT 10"),
    // salted skew-safe join: the oracle is the PLAIN join — equality
    // proves the salt plumbing is result-transparent
    "x_salted_join" ->
      ("SELECT c_nationkey, COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_nationkey ORDER BY c_nationkey"),
    // binned ROC-AUC: exact integer Mann-Whitney numerator (ties at bin
    // resolution contribute half), one final double division
    "x_roc_auc" ->
      ("WITH s AS (SELECT CAST(CAST('0x' || substring(md5('s' || CAST(event_id AS VARCHAR)), 1, 6) AS BIGINT) AS DOUBLE) / 16777216 AS score, " +
        "CAST(CAST('0x' || substring(md5('l' || CAST(event_id AS VARCHAR)), 1, 6) AS BIGINT) AS DOUBLE) / 16777216 AS v FROM events), " +
        "b AS (SELECT LEAST(CAST(FLOOR(score * 1024) AS BIGINT), 1023) AS bin, CASE WHEN v < score * score THEN 1 ELSE 0 END AS l FROM s), " +
        "pb AS (SELECT bin, CAST(SUM(l) AS BIGINT) AS pos, CAST(COUNT(*) - SUM(l) AS BIGINT) AS neg FROM b GROUP BY 1), " +
        "c AS (SELECT pos, neg, SUM(pos) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS cp FROM pb), " +
        "t AS (SELECT CAST(SUM(pos) AS BIGINT) AS np, CAST(SUM(neg) AS BIGINT) AS nn, SUM(CAST(neg AS HUGEINT) * (2 * cp - pos)) AS num FROM c) " +
        "SELECT np AS n_pos, nn AS n_neg, " +
        "CASE WHEN np > 0 AND nn > 0 THEN ROUND(CAST(num AS DOUBLE) / (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 6) END AS auc FROM t"),
    // calibration: micro-unit integer score sums per bin, exact-integer
    // ECE numerator; the md5-uniform score/label replayed bit-for-bit
    "x_calibration" ->
      ("WITH s AS (SELECT CAST(CAST('0x' || substring(md5('s' || CAST(event_id AS VARCHAR)), 1, 6) AS BIGINT) AS DOUBLE) / 16777216 AS score, " +
        "CAST(CAST('0x' || substring(md5('l' || CAST(event_id AS VARCHAR)), 1, 6) AS BIGINT) AS DOUBLE) / 16777216 AS v FROM events), " +
        "b AS (SELECT LEAST(CAST(FLOOR(score * 10) AS BIGINT), 9) AS bin, CAST(ROUND(score * 1e6, 0) AS BIGINT) AS sq, CASE WHEN v < score * score THEN 1 ELSE 0 END AS pos FROM s), " +
        "pb AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(sq) AS BIGINT) AS sqs, CAST(SUM(pos) AS BIGINT) AS poss FROM b GROUP BY 1), " +
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(ABS(poss * 1000000 - sqs)) AS BIGINT) AS gq FROM pb) " +
        "SELECT bin, n, ROUND(CAST(sqs AS DOUBLE) / 1e6 / n, 6) AS mean_score, " +
        "ROUND(CAST(poss AS DOUBLE) / n, 6) AS frac_pos, " +
        "ROUND(CAST(poss AS DOUBLE) / n - CAST(sqs AS DOUBLE) / 1e6 / n, 6) AS gap, " +
        "ROUND(CAST(gq AS DOUBLE) / 1e6 / nt, 6) AS ece " +
        "FROM pb CROSS JOIN t ORDER BY bin"),
    // NFKC: the injected variants are a FIXED finite set, so the oracle
    // replays their known normal forms as literals (DuckDB has no NFKC
    // built-in; nfc_normalize would miss the compatibility folds) —
    // the fixture text itself is pure ASCII (NFKC-invariant) at every
    // SF, asserted by the raw_chars/norm_chars arithmetic matching.
    "x_unicode_norm" ->
      ("WITH v AS (SELECT doc_id, text, " +
        "CASE CAST(doc_id % 4 AS INT) " +
        "WHEN 0 THEN 'Graft Engine' WHEN 1 THEN 'final flight' " +
        "WHEN 2 THEN 'caf\u00E9 fran\u00E7ais' " +
        "WHEN 3 THEN 'x2 1\u20442 IX km' END AS norm_lit, " +
        "CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 12 WHEN 1 THEN 10 " +
        "WHEN 2 THEN 15 WHEN 3 THEN 8 END AS raw_len FROM documents) " +
        "SELECT doc_id, norm_lit || ' ' || text AS norm_text, " +
        "CAST(raw_len + 1 + length(text) AS BIGINT) AS raw_chars, " +
        "CAST(length(norm_lit) + 1 + length(text) AS BIGINT) AS norm_chars " +
        "FROM v ORDER BY doc_id"),
    "x_corr_matrix" -> corrMatrixOracleSql("lineitem",
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
    // TWAP: exact integer-microsecond weights × micro-unit values,
    // HUGEINT-exact weighted sum, identical final float expression
    "x_twap" ->
      ("WITH s AS (SELECT user_id, event_id, epoch_us(ts) AS us, CAST(ROUND(CAST(value AS DOUBLE) * 1e6, 0) AS BIGINT) AS vq FROM events WHERE value IS NOT NULL), " +
        "l AS (SELECT user_id, us, vq, LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt FROM s), " +
        "g AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, MAX(us) - MIN(us) AS span, " +
        "SUM(CASE WHEN nxt IS NOT NULL THEN CAST(nxt - us AS HUGEINT) * vq END) AS wv FROM l GROUP BY 1) " +
        "SELECT user_id, n_events, ROUND(CAST(span AS DOUBLE) / 1e6, 6) AS span_sec, " +
        "CASE WHEN span > 0 THEN ROUND(CAST(wv AS DOUBLE) / 1e6 / span, 6) END AS twap " +
        "FROM g ORDER BY user_id"),
    // weighted quantile: micro-unit integer cumulative weights over
    // DISTINCT values; the p·W comparison is the same double
    "x_wquantile" ->
      ("WITH v AS (SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v, CAST(ROUND(CAST(l_quantity AS DOUBLE) * 1e6, 0) AS BIGINT) AS wq FROM lineitem WHERE l_extendedprice IS NOT NULL), " +
        "pv AS (SELECT g, v, CAST(SUM(wq) AS BIGINT) AS w, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY 1, 2), " +
        "cw AS (SELECT g, v, w, SUM(w) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cwv FROM pv), " +
        "t AS (SELECT g, CAST(SUM(w) AS BIGINT) AS wt, CAST(SUM(c) AS BIGINT) AS n FROM pv GROUP BY 1) " +
        "SELECT cw.g AS l_returnflag, MAX(t.n) AS n, ROUND(CAST(MAX(wt) AS DOUBLE) / 1e6, 6) AS w_total, ROUND(MIN(v), 6) AS q " +
        "FROM cw JOIN t ON cw.g = t.g WHERE CAST(cwv AS DOUBLE) >= 0.5 * wt " +
        "GROUP BY cw.g ORDER BY l_returnflag"),
    // native session_window: the x_sessions gap assignment; the
    // built-in's window_end is last event + gap by contract
    "x_session_window" ->
      ("WITH f AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN LAG(ts) OVER w IS NULL OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 21600000000 THEN 1 ELSE 0 END AS newf " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "g AS (SELECT user_id, ts, CAST(SUM(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session FROM f) " +
        "SELECT user_id, MIN(ts) AS window_start, MAX(ts) + INTERVAL 6 HOUR AS window_end, " +
        "CAST(COUNT(*) AS BIGINT) AS n_events " +
        "FROM g GROUP BY user_id, session ORDER BY user_id, window_start"),
    // binned numeric MI: ksDrift's shared-bounds bin arithmetic on each
    // side, mutualInfo's expression shape for the fold; every entropy
    // term quantized 1e-12 before its sum (the tokenDrift contract)
    "x_binned_mi" ->
      ("WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS x, CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL), " +
        "bd AS (SELECT MIN(x) AS lox, MAX(x) AS hix, MIN(y) AS loy, MAX(y) AS hiy FROM b), " +
        "j0 AS (SELECT CASE WHEN hix = lox THEN CAST(0 AS BIGINT) ELSE LEAST(CAST(FLOOR((x - lox) / ((hix - lox) / 16)) AS BIGINT), 15) END AS bx, " +
        "CASE WHEN hiy = loy THEN CAST(0 AS BIGINT) ELSE LEAST(CAST(FLOOR((y - loy) / ((hiy - loy) / 16)) AS BIGINT), 15) END AS byy FROM b CROSS JOIN bd), " +
        "j AS (SELECT bx, byy, CAST(COUNT(*) AS BIGINT) AS c FROM j0 GROUP BY 1, 2), " +
        "mx AS (SELECT bx, CAST(SUM(c) AS BIGINT) AS cx FROM j GROUP BY 1), " +
        "my AS (SELECT byy, CAST(SUM(c) AS BIGINT) AS cy FROM j GROUP BY 1), " +
        "t AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM j), " +
        "mi AS (SELECT MAX(nt) AS n, CAST(SUM(CAST(ROUND(CAST(c AS DOUBLE) / nt * ln(CAST(c AS DOUBLE) / nt / (CAST(cx AS DOUBLE) / nt) / (CAST(cy AS DOUBLE) / nt)) * 1e12, 0) AS BIGINT)) AS BIGINT) AS q " +
        "FROM j JOIN mx USING(bx) JOIN my USING(byy) CROSS JOIN t), " +
        "hx AS (SELECT CAST(SUM(CAST(ROUND((-(CAST(cx AS DOUBLE) / nt)) * ln(CAST(cx AS DOUBLE) / nt) * 1e12, 0) AS BIGINT)) AS BIGINT) AS qx FROM mx CROSS JOIN t), " +
        "hy AS (SELECT CAST(SUM(CAST(ROUND((-(CAST(cy AS DOUBLE) / nt)) * ln(CAST(cy AS DOUBLE) / nt) * 1e12, 0) AS BIGINT)) AS BIGINT) AS qy FROM my CROSS JOIN t) " +
        "SELECT n, ROUND(CAST(q AS DOUBLE) / 1e12, 6) AS mi, " +
        "ROUND(CAST(qx AS DOUBLE) / 1e12, 6) AS h_x, " +
        "ROUND(CAST(qy AS DOUBLE) / 1e12, 6) AS h_y, " +
        "CASE WHEN LEAST(CAST(qx AS DOUBLE) / 1e12, CAST(qy AS DOUBLE) / 1e12) > 0 " +
        "THEN ROUND(CAST(q AS DOUBLE) / 1e12 / LEAST(CAST(qx AS DOUBLE) / 1e12, CAST(qy AS DOUBLE) / 1e12), 6) END AS redundancy " +
        "FROM mi CROSS JOIN hx CROSS JOIN hy")
  ) ++ ivfOracleSql.toSeq.flatMap { case (k, sql) =>
    // the loaded-artifact entry trains the SAME centroids and must
    // reproduce the same rows — one dump-time SQL serves both, so a
    // lossy ivfSave/ivfLoad round-trip fails the hash compare
    Seq(k -> sql, "x_ivf_topk_loaded" -> sql)
  } ++ semDedupOracles ++ pqOracleSql.toSeq.flatMap { case (k, sql) =>
    Seq(k -> sql, "x_pq_topk_loaded" -> sql)
  } ++
    ivfadcOracleSql.toSeq.flatMap { case (k, sql) =>
      // the mounted-IVFADC entry trains the same structures through a
      // save/load cycle — one dump-time SQL serves both
      Seq(k -> sql, "x_ivfadc_topk_loaded" -> sql)
    } ++ bpeOracleSql ++ bpeDistOracleSql ++
    bpeRoundtripOracleSql ++
    bpeFertilityOracleSql ++ unigramOracleSql ++ unigramDistOracleSql ++
    unigramFertilityOracleSql ++ qualityLrOracleSql ++ pcaOracleSql
}
