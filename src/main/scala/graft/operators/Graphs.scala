package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph dataflow over edge frames — the capability class the
  * reference's sink-only surface lacks entirely but every corpus-curation
  * stack keeps nearby (domain authority for crawl prioritization, source
  * reputation weighting, influence propagation over citation graphs).
  *
  * Everything here is plain keyed DataFrame algebra: an iteration is a
  * join on the node id plus a partial-aggregating groupBy — exactly the
  * Pregel superstep shape, expressed so Catalyst owns the physical plan
  * (broadcast for small rank frames, sort-merge for large, AQE skew
  * splits on power-law hubs).
  */
object Graphs {

  /** Weighted PageRank over an edge list (Page et al. 1999; the
    * power-iteration form):
    *
    *   r₀(v)    = 1/N
    *   rₜ₊₁(v) = (1−d)/N + d·( Σ_{u→v} w(u,v)/outw(u) · rₜ(u) + dmₜ/N )
    *
    * where `outw(u)` is u's total out-weight and `dmₜ` the dangling mass
    * (total rank on nodes with no out-edges), redistributed uniformly —
    * the standard stochastic-matrix patch that keeps Σr = 1.
    *
    * Fixed `iters` power iterations (no convergence test): the output is
    * deterministic and replayable by an unrolled-CTE SQL oracle, which a
    * tolerance-based stop would break. Final ranks are rounded to
    * `roundDp` decimals (both engines round the same way on doubles that
    * differ only in accumulation-order ulps).
    *
    * Scale shape: per iteration, one equi-join of the edge-fraction
    * frame (src, dst, p = w/outw — computed ONCE, reused every round)
    * against the rank frame on `src`, one partial-aggregating groupBy on
    * `dst`, one left join back onto the node set, and one scalar
    * aggregate for the dangling mass. The node and fraction frames are
    * `localCheckpoint`'d up front and each iteration's rank frame is
    * checkpointed too — power iteration's lineage otherwise grows
    * linearly in `iters` and re-executes the whole prefix at every
    * action. Rank frames are (node, double) — tiny next to the edge
    * frame — so at cluster scale the rank side of the join broadcasts
    * while edges never move twice: the fraction frame is shuffled onto
    * `src` once and stays put. The dangling mass is a broadcast 1-row
    * aggregate inside the superstep plan, so each iteration is ONE
    * Spark job (the checkpoint) — driver traffic is just the single
    * node `count` up front.
    *
    * Output: (node, pr) for every node, `pr` rounded to `roundDp`. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, iters: Int, damping: Double = 0.85,
               roundDp: Int = 6): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(damping > 0.0 && damping < 1.0, "damping must be in (0, 1)")
    // checkpoint the projected edge frame FIRST: nodes, outw, frac and
    // srcs all derive from it, and without the checkpoint each of their
    // (eager) checkpoints re-executes the caller's whole edge-extraction
    // plan — for x_pagerank that was the 4-way TPC-H join running 4×
    val e = projectEdges(edges, srcCol, dstCol, weightCol)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count().toDouble
    val outw = e.groupBy("src").agg(sum("w").as("ow"))
    val frac = e.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("p"))
      .localCheckpoint()
    val srcs = outw.select(col("src").as("node")).localCheckpoint()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("r"))
      .localCheckpoint()
    var t = 0
    while (t < iters) {
      ranks = superstep(nodes, frac, srcs, ranks, n, damping).localCheckpoint()
      t += 1
    }
    ranks.select(col("node"), (round(col("r"), roundDp) + 0.0).as("pr"))
  }

  /** Personalized PageRank (seed-restart random walk — Page et al.
    * 1999 §6's personalized vector; the crawl-frontier / domain-
    * expansion scorer next to [[pageRank]]):
    *
    *   s(v)     = 1/|S| for v ∈ S, else 0   (S = seed nodes in graph)
    *   r₀(v)    = s(v)
    *   rₜ₊₁(v) = (1−d)·s(v) + d·( Σ_{u→v} w/outw · rₜ(u) + dmₜ·s(v) )
    *
    * i.e. the uniform teleport AND the dangling redistribution both
    * return to the seed distribution instead of 1/N — rank measures
    * proximity to the seeds, Σr = 1 throughout (conservation asserted
    * in OperatorsSuite). Seeds not present in the graph are ignored;
    * at least one seed must survive.
    *
    * Same superstep scale shape, checkpointing discipline, fixed-iters
    * determinism and `roundDp` contract as [[pageRank]] — replayable
    * by an unrolled-CTE oracle.
    *
    * Output: (node, pr) for every node. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           weightCol: String, seeds: DataFrame,
                           seedCol: String, iters: Int,
                           damping: Double = 0.85,
                           roundDp: Int = 6): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(damping > 0.0 && damping < 1.0, "damping must be in (0, 1)")
    val e = projectEdges(edges, srcCol, dstCol, weightCol)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val seedNodes = seeds.select(col(seedCol).as("node")).distinct()
      .join(nodes, "node")
      .localCheckpoint()
    val k = seedNodes.count().toDouble
    require(k > 0, "personalizedPageRank: no seed appears in the graph")
    val outw = e.groupBy("src").agg(sum("w").as("ow"))
    val frac = e.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("p"))
      .localCheckpoint()
    val srcs = outw.select(col("src").as("node")).localCheckpoint()
    // node frame CARRIES its restart probability: the seed indicator
    // join happens once, not once per iteration
    val nodesS = nodes
      .join(seedNodes.withColumn("__isSeed", lit(1)), Seq("node"), "left")
      .select(col("node"),
        when(col("__isSeed").isNotNull, lit(1.0 / k)).otherwise(lit(0.0))
          .as("s"))
      .localCheckpoint()
    var ranks = nodesS.select(col("node"), col("s").as("r")).localCheckpoint()
    var t = 0
    while (t < iters) {
      ranks = pprSuperstep(nodesS, frac, srcs, ranks, damping).localCheckpoint()
      t += 1
    }
    ranks.select(col("node"), (round(col("r"), roundDp) + 0.0).as("pr"))
  }

  /** One un-checkpointed PPR step (see [[Graphs.superstep]] for the
    * plan-shape rationale — identical join/agg skeleton, with the
    * restart column riding on the node frame and the dangling mass
    * teleporting to the seeds): r = (1−d)·s + d·(cb + dm·s). */
  private[graft] def pprSuperstep(nodesS: DataFrame, frac: DataFrame,
                                  srcs: DataFrame, ranks: DataFrame,
                                  damping: Double): DataFrame = {
    val dmDf = ranks.join(srcs, Seq("node"), "left_anti")
      .agg(coalesce(sum("r"), lit(0.0)).as("dm"))
    val contrib = frac.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
      .groupBy("dst").agg(sum(col("p") * col("r")).as("cb"))
    nodesS
      .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
      .crossJoin(broadcast(dmDf))
      .select(col("node"), col("s"),
        (lit(1.0 - damping) * col("s") + lit(damping) *
          (coalesce(col("cb"), lit(0.0)) + col("dm") * col("s"))).as("r"))
  }

  /** Shared edge projection: non-positive-weight edges are DROPPED —
    * they carry no rank mass, and keeping them would admit a source
    * whose out-weight sums to 0, whose w/outw fractions are NaN/∞ in
    * Spark but NULL in an independent SQL engine (the cross-engine
    * divergence class the zero-norm cosine guard also closes). A node
    * whose every out-edge is dropped is simply dangling, which both
    * recurrences already redistribute. A dropped edge contributes
    * nothing at all — including its endpoints' node membership. */
  private def projectEdges(edges: DataFrame, srcCol: String, dstCol: String,
                           weightCol: String): DataFrame =
    edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w"))
      .where(col("w") > 0.0)
      .localCheckpoint()

  /** Per-node triangle counts over the undirected simple graph induced
    * by the edge list (self-loops dropped, direction and multiplicity
    * ignored). The local clustering signal behind community/spam
    * structure scoring on link graphs.
    *
    * Scale shape — the degree-ordered orientation (Schank & Wagner
    * 2005, the MapReduce-folklore form): every canonical edge is
    * oriented from its lower-(degree, id) endpoint to the higher, which
    * bounds every node's OUT-degree by O(√m) however skewed the raw
    * degree distribution is. The wedge enumeration is then a self
    * equi-join of the oriented edges on their source — work
    * Σ outdeg(u)² = O(m^1.5) worst case, NOT the Σ deg(u)² a naive
    * neighbor join pays (catastrophic on power-law hubs) — and each
    * wedge (v, w) is closed by one more equi-join against the oriented
    * edge set. Every join is keyed (hash/SMJ eligible); no node's
    * adjacency list is ever collected.
    *
    * The orientation affects WORK ONLY: the triangle set is orientation
    * -independent, so an independent oracle may enumerate with plain
    * id-ordering and must agree.
    *
    * Output: (node, triangles) for every node of the graph, zeros
    * included. */
  def triangleCounts(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    Joins.requireFreeColumns("triangleCounts", Seq(srcCol, dstCol),
      "__x", "__y", "__u", "__v", "__du", "__dv", "node", "triangles")
    val canon = edges
      .where(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("__x"),
        greatest(col(srcCol), col(dstCol)).as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .distinct()
      .localCheckpoint()
    val deg = canon.select(col("__x").as("node"))
      .union(canon.select(col("__y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("__d"))
    val nodes = deg.select("node").localCheckpoint()
    // attach both endpoint degrees, then orient low-(deg, id) → high
    val dx = deg.select(col("node").as("__x"), col("__d").as("__dx"))
    val dy = deg.select(col("node").as("__y"), col("__d").as("__dy"))
    val lowFirst = col("__dx") < col("__dy") ||
      (col("__dx") === col("__dy") && col("__x") < col("__y"))
    val oriented = canon.join(dx, "__x").join(dy, "__y")
      .select(
        when(lowFirst, col("__x")).otherwise(col("__y")).as("__u"),
        when(lowFirst, col("__y")).otherwise(col("__x")).as("__v"),
        when(lowFirst, col("__dy")).otherwise(col("__dx")).as("__dv"))
      .localCheckpoint()
    val o1 = oriented.select(col("__u"), col("__v").as("__v1"),
      col("__dv").as("__dv1"))
    val o2 = oriented.select(col("__u"), col("__v").as("__v2"),
      col("__dv").as("__dv2"))
    // wedge (v1, v2) ordered by (deg, id) — the same order `oriented`
    // uses, so closure is a direct equi-join on (src, dst)
    val wedges = o1.join(o2, "__u")
      .where(col("__dv1") < col("__dv2") ||
        (col("__dv1") === col("__dv2") && col("__v1") < col("__v2")))
      .select(col("__u"), col("__v1"), col("__v2"))
    val tris = wedges.join(oriented
        .select(col("__u").as("__v1"), col("__v").as("__v2")),
        Seq("__v1", "__v2"))
      .localCheckpoint()
    val perNode = tris.select(col("__u").as("node"))
      .union(tris.select(col("__v1").as("node")))
      .union(tris.select(col("__v2").as("node")))
      .groupBy("node").agg(count(lit(1)).as("__t"))
    nodes.join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("__t"), lit(0L)).as("triangles"))
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) with L1 normalization,
    * fixed `iters` mutual-reinforcement rounds over the DISTINCT edge
    * set (standard HITS is unweighted; multiplicity is ignored):
    *
    *   h₀(u)    = 1/N
    *   aᵣₐᵥ(v) = Σ_{u→v} hₜ₋₁(u);   aₜ = aᵣₐᵥ / Σ aᵣₐᵥ
    *   hᵣₐᵥ(u) = Σ_{u→v} aₜ(v);     hₜ = hᵣₐᵥ / Σ hᵣₐᵥ
    *
    * L1 (sum) normalization instead of the textbook L2: it is exactly
    * replayable in portable SQL (an unrolled-CTE oracle, like
    * [[pageRank]]'s) and yields identical rankings — normalization in
    * HITS only fixes the scale. Fixed iteration count and `roundDp`
    * rounding for the same determinism contract as [[pageRank]].
    *
    * Scale shape per iteration: two keyed join + partial-agg groupBy
    * passes (edges ⋈ hubs on src, edges ⋈ auths on dst) with each
    * normalization sum riding in-plan as a broadcast 1-row aggregate —
    * ONE Spark job per iteration (the checkpoint), no driver collects.
    * Score frames are (node, double) — broadcastable at cluster scale
    * while the edge frame never moves twice.
    *
    * Output: (node, hub, auth) for every node, rounded to `roundDp`. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
           roundDp: Int = 6): DataFrame = {
    require(iters >= 1, "hits needs at least one iteration")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count().toDouble
    require(n > 0, "hits: empty graph")
    var hubs = nodes.select(col("node"), lit(1.0 / n).as("h"))
      .localCheckpoint()
    var auths = hubs.select(col("node"), lit(0.0).as("a")) // overwritten in round 1
    var t = 0
    while (t < iters) {
      // the half-step checkpoints its RAW propagation internally (the
      // normalizer and the output both read it — without that the
      // edge⋈scores join would run twice per half-step); the returned
      // frame is checkpoint-scan + broadcast-normalize, already O(1)
      // lineage, so no outer checkpoint is needed
      auths = hitsHalfStep(nodes, e, hubs, "src", "dst", "h", "a")
      hubs = hitsHalfStep(nodes, e, auths, "dst", "src", "a", "h")
      t += 1
    }
    nodes
      .join(hubs, "node").join(auths, "node")
      .select(col("node"), (round(col("h"), roundDp) + 0.0).as("hub"),
        (round(col("a"), roundDp) + 0.0).as("auth"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007, made
    * deterministic): community detection over the undirected simple
    * graph. Every node starts labeled with itself; each round, every
    * node adopts the most frequent label among its neighbors, ties
    * broken by the SMALLEST label — the synchronous min-tie-break
    * variant, so the result is a pure function of the graph and `iters`
    * (classic LPA's random update order is deliberately dropped: it
    * cannot be oracled and cannot be reproduced across runs). The node
    * set is derived from the simple graph, so a node with no non-loop
    * edges does not appear — an isolated node is its own community by
    * definition and carries no information for the propagation.
    *
    * Scale shape per round: one equi-join of the (≤2m)-row undirected
    * neighbor frame against the (n)-row label frame, one
    * partial-aggregating (node, label) count, and one min_by groupBy —
    * all keyed, no windows; the label frame localCheckpoints per round
    * (O(1) lineage, same discipline as [[pageRank]]). Power-law hubs
    * cost Σdeg — the same bound as any message-passing round — and AQE
    * skew-splits the hot node's count.
    *
    * Output: (node, label) for every node after `iters` rounds. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int): DataFrame = {
    require(iters >= 0, "labelPropagation needs iters >= 0")
    val canon = edges
      .where(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("__x"),
        greatest(col(srcCol), col(dstCol)).as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .distinct()
      .localCheckpoint()
    // both directions: each undirected edge delivers a label both ways
    val nbrs = canon.select(col("__x").as("node"), col("__y").as("nbr"))
      .union(canon.select(col("__y").as("node"), col("__x").as("nbr")))
      .localCheckpoint()
    val nodes = nbrs.select("node").distinct().localCheckpoint()
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint()
    var t = 0
    while (t < iters) {
      labels = lpaRound(nodes, nbrs, labels).localCheckpoint()
      t += 1
    }
    labels
  }

  /** k-core decomposition (Seidman 1983): iteratively peel nodes of
    * degree < k from the undirected simple graph until none remain —
    * the surviving subgraph is the k-core, the density filter behind
    * link-spam screens and community seeding. Returns (node, degree)
    * over the surviving subgraph; empty when the graph has no k-core.
    *
    * Fixed `maxRounds` bounds the loop for the oracle-determinism
    * contract; peeling a fixpoint is the identity, so an early exit
    * when no node was removed is EXACTLY equivalent to running all
    * rounds — the result is a pure function of (graph, k, maxRounds),
    * and converged whenever maxRounds ≥ the peel depth (≤ n, in
    * practice a handful: each round removes every currently-light
    * node at once).
    *
    * Scale shape per round: one partial-agg degree count over the
    * surviving edge frame + two semi-joins (both endpoints must
    * survive); the edge frame localCheckpoints per round — O(1)
    * lineage, shrinking input. The early-exit count rides on the
    * already-checkpointed survivor frame. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxRounds: Int = 20): DataFrame = {
    require(k >= 1, "kCore needs k >= 1")
    require(maxRounds >= 1, "kCore needs maxRounds >= 1")
    var canon = edges
      .where(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("__x"),
        greatest(col(srcCol), col(dstCol)).as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .distinct()
      .localCheckpoint()
    def degrees(c: DataFrame): DataFrame = c
      .select(col("__x").as("node")).union(c.select(col("__y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    var prevNodes = -1L
    var t = 0
    var done = false
    while (t < maxRounds && !done) {
      val keep = degrees(canon).where(col("deg") >= k).localCheckpoint()
      val m = keep.count()
      if (m == prevNodes) done = true // fixpoint: further peels are identity
      else {
        canon = canon
          .join(keep.select(col("node").as("__x")), Seq("__x"), "left_semi")
          .join(keep.select(col("node").as("__y")), Seq("__y"), "left_semi")
          .localCheckpoint()
        prevNodes = m
        t += 1
      }
    }
    degrees(canon).select(col("node"), col("deg"))
  }

  /** One un-checkpointed LPA round (exposed for PlanShapeSuite): join
    * neighbor frame to labels on the SENDING endpoint, count received
    * labels per node, adopt the (max count, min label) winner; nodes
    * with no neighbors (can't occur here — nodes is derived from nbrs)
    * would keep their label via the left join. */
  private[graft] def lpaRound(nodes: DataFrame, nbrs: DataFrame,
                              labels: DataFrame): DataFrame = {
    val received = nbrs
      .join(labels.withColumnRenamed("node", "nbr"), Seq("nbr"))
      .groupBy("node", "label").agg(count(lit(1)).as("__c"))
    // min over (−count, label): the most frequent label, smallest wins
    // ties — a total order, so the round is deterministic
    val winner = received.groupBy("node")
      .agg(min_by(col("label"), struct(-col("__c"), col("label")))
        .as("__w"))
    nodes.join(winner, Seq("node"), "left")
      .join(labels, Seq("node"))
      .select(col("node"), coalesce(col("__w"), col("label")).as("label"))
  }

  /** One HITS half-step (exposed for PlanShapeSuite): propagate
    * `scores` across the edges from `fromCol` to `toCol`, partial-agg
    * groupBy on the receiving endpoint, left join back onto the node
    * set, L1-normalize by an in-plan broadcast 1-row sum. The raw
    * propagation frame is localCheckpoint'd (unless `checkpoint =
    * false`, the plan-inspection path): BOTH the normalizer and the
    * output consume it, and un-materialized that reference duplication
    * re-runs the edge⋈scores join — the half-step's only big-data work
    * — twice. The checkpoint also leaves the returned frame with O(1)
    * lineage, so the iteration loop needs no checkpoints of its own.
    * Zero-sum cannot occur mid-iteration: scores start strictly
    * positive and every edge endpoint is a node. */
  private[graft] def hitsHalfStep(nodes: DataFrame, e: DataFrame,
                                  scores: DataFrame, fromCol: String,
                                  toCol: String, inCol: String,
                                  outCol: String,
                                  checkpoint: Boolean = true): DataFrame = {
    val raw = e.join(scores.withColumnRenamed("node", fromCol), Seq(fromCol))
      .groupBy(col(toCol).as("node")).agg(sum(col(inCol)).as("__raw"))
    val lazyJoined = nodes.join(raw, Seq("node"), "left")
      .select(col("node"), coalesce(col("__raw"), lit(0.0)).as("__raw"))
    val joined = if (checkpoint) lazyJoined.localCheckpoint() else lazyJoined
    val total = joined.agg(sum("__raw").as("__s"))
    joined.crossJoin(broadcast(total))
      .select(col("node"), (col("__raw") / col("__s")).as(outCol))
  }

  /** One un-checkpointed power-iteration step (exposed so PlanShapeSuite
    * can assert the superstep's physical plan — the public path
    * checkpoints each round, which truncates the visible plan to a
    * scan): edge-fraction ⋈ ranks on src, partial-agg groupBy(dst),
    * left join back onto the node set, the rank recurrence applied.
    * The dangling mass rides IN the plan as a broadcast 1-row aggregate
    * (anti-join of ranks against the out-edge sources) instead of a
    * per-iteration driver collect — one Spark job per superstep, not
    * two; at cluster scale that halves the scheduler round-trips of the
    * whole power iteration. */
  /** Multi-source BFS hop distances: shortest directed hop count from
    * ANY seed to every reachable node, capped at `maxHops`. The
    * reachability/proximity primitive under crawl-frontier expansion,
    * link-graph blast-radius, and lineage-impact queries.
    *
    * Scale shape — level-synchronous frontier expansion, the standard
    * distributed BFS: per hop ONE keyed equi-join (frontier ⋈ edges on
    * src) + a distinct + a left-anti join against the visited set, all
    * hash-partitioned on the node id; work per hop ∝ edges out of the
    * frontier, never the whole graph re-walked. Each level
    * localCheckpoints — O(1) lineage however deep the graph. Early exit
    * on an empty frontier is EXACT (expanding an empty frontier is the
    * identity), so the result is a pure function of (graph, seeds,
    * maxHops) and an independent bounded-depth recursive oracle must
    * agree. Seeds are dist 0 whether or not they touch any edge.
    *
    * Output: (node, dist) for every node within `maxHops` of a seed. */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "bfsHops needs maxHops >= 0")
    Joins.requireFreeColumns("bfsHops", Seq(srcCol, dstCol, seedCol),
      "node", "dist", "__src", "__dst")
    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
      .distinct()
      .localCheckpoint()
    var dist = seeds.select(col(seedCol).as("node"))
      .where(col("node").isNotNull).distinct()
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = dist.select("node")
    var h = 1L
    while (h <= maxHops && !frontier.isEmpty) {
      val nxt = frontier.join(e, col("node") === col("__src"))
        .select(col("__dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .select(col("node"), lit(h).as("dist"))
        .localCheckpoint()
      dist = dist.unionByName(nxt).localCheckpoint()
      frontier = nxt.select("node")
      h += 1
    }
    dist
  }

  /** Adamic-Adar link prediction (Adamic & Adar 2003): for every
    * NON-adjacent node pair {a, b} with at least one common neighbor,
    *
    *   score(a, b) = Σ_{c ∈ N(a) ∩ N(b)} 1 / ln(deg(c))
    *
    * over the undirected simple graph — rare shared neighbors count
    * more than promiscuous ones. The classic "who should link next"
    * feature for crawl-frontier expansion and related-entity mining.
    *
    * Scale shape: wedges are enumerated FROM THE CENTER — one self
    * equi-join of the adjacency list keyed on the shared neighbor c,
    * emitting each unordered endpoint pair once (id-ordered) with
    * weight 1/ln(deg(c)). Centers with deg(c) > `maxDegree` are
    * EXCLUDED up front (their wedge fan-out is O(deg²) while their
    * contribution per pair → 0 — the same mega-hub cap as
    * [[EventAnalytics.cooccurrence]], part of the contract), so total
    * wedge work is ≤ maxDegree · Σ deg — linear. The pair sum is a
    * map-side-combining groupBy; existing edges are removed with one
    * anti-join. Degree-1 centers produce no wedge, so ln(deg) ≥ ln 2
    * wherever it is evaluated. Contributions are fixed-pointed to
    * picos (×1e12 longs, the tokenDrift contract) BEFORE the sum, so
    * the pair score is an exact integer sum — order-independent across
    * engines — and only the final /1e12 is floating.
    *
    * Output: (node_a, node_b, n_common, score) with node_a < node_b. */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
                 maxDegree: Int, roundDp: Int = 6): DataFrame = {
    require(maxDegree >= 2, "adamicAdar needs maxDegree >= 2")
    Joins.requireFreeColumns("adamicAdar", Seq(srcCol, dstCol),
      "__x", "__y", "__c", "__d", "__w", "node_a", "node_b", "n_common",
      "score")
    val canon = edges
      .where(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("__x"),
        greatest(col(srcCol), col(dstCol)).as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .distinct()
      .localCheckpoint() // adjacency + degree + the final anti-join probe
    val adj = canon.select(col("__x").as("__c"), col("__y").as("node"))
      .unionByName(canon.select(col("__y").as("__c"),
        col("__x").as("node")))
    val deg = adj.groupBy("__c").agg(count(lit(1)).as("__d"))
      .where(col("__d") <= maxDegree && col("__d") >= 2)
      .select(col("__c"),
        round(lit(1.0) / log(col("__d")) * 1e12, 0).cast("long").as("__w"))
    val centered = adj.join(deg, "__c").localCheckpoint()
    val a = centered.select(col("__c"), col("node").as("node_a"), col("__w"))
    val b = centered.select(col("__c"), col("node").as("node_b"))
    a.join(b, Seq("__c"))
      .where(col("node_a") < col("node_b"))
      .groupBy("node_a", "node_b")
      .agg(count(lit(1)).as("n_common"), sum(col("__w")).as("score"))
      .join(canon, col("node_a") === col("__x") &&
        col("node_b") === col("__y"), "left_anti")
      .select(col("node_a"), col("node_b"), col("n_common"),
        round(col("score").cast("double") / 1e12, roundDp).as("score"))
  }

  /** Bounded-hop weighted shortest paths (Bellman-Ford supersteps) from
    * a seed set: minimum total edge weight over directed paths of at
    * most `maxHops` edges. Weights must be POSITIVE INTEGERS (enforced)
    * — costs then sum exactly, so the result is a pure function of
    * (graph, seeds, maxHops) an independent bounded-depth recursive
    * oracle must reproduce bit-for-bit; there is no float seam.
    *
    * Scale shape — per hop: ONE keyed equi-join (settled frontier ⋈
    * edges on src), a map-side-combining min per destination, and a
    * min-merge with the standing distances; each round
    * localCheckpoints, so lineage is O(1) in depth. Work per hop ∝
    * edges out of the IMPROVED set only (the frontier is the rows whose
    * distance changed last round — classic delta Bellman-Ford), and
    * the early exit on an empty frontier is exact: relaxing a frontier
    * that improved nothing is the identity. With non-negative weights
    * a cycle never improves a path, so bounded-hop semantics are
    * well-defined on cyclic graphs.
    *
    * Output: (node, dist) for every node reachable within maxHops;
    * seeds at dist 0. */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
                    wCol: String, seeds: DataFrame, seedCol: String,
                    maxHops: Int): DataFrame = {
    require(maxHops >= 0, "shortestPaths needs maxHops >= 0")
    Joins.requireFreeColumns("shortestPaths", Seq(srcCol, dstCol, wCol,
      seedCol), "node", "dist", "__src", "__dst", "__w", "__nd")
    val e = edges
      .select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
        col(wCol).cast("long").as("__w"))
      .where(col("__src").isNotNull && col("__dst").isNotNull)
      .groupBy("__src", "__dst").agg(min("__w").as("__w"))
      .localCheckpoint()
    require(e.where(col("__w") <= 0L).isEmpty,
      "shortestPaths needs positive integer weights")
    var dist = seeds.select(col(seedCol).as("node"))
      .where(col("node").isNotNull).distinct()
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = dist
    var h = 1
    while (h <= maxHops && !frontier.isEmpty) {
      val cand = frontier.join(e, col("node") === col("__src"))
        .groupBy(col("__dst").as("node"))
        .agg(min(col("dist") + col("__w")).as("__nd"))
      val improved = cand.join(dist, Seq("node"), "left")
        .where(col("dist").isNull || col("__nd") < col("dist"))
        .select(col("node"), col("__nd").as("dist"))
        .localCheckpoint()
      dist = dist.join(improved.select(col("node")), Seq("node"),
          "left_anti")
        .unionByName(improved)
        .localCheckpoint()
      frontier = improved
      h += 1
    }
    dist
  }

  private[graft] def superstep(nodes: DataFrame, frac: DataFrame,
                               srcs: DataFrame, ranks: DataFrame,
                               n: Double, damping: Double): DataFrame = {
    val dmDf = ranks.join(srcs, Seq("node"), "left_anti")
      .agg(coalesce(sum("r"), lit(0.0)).as("dm"))
    val contrib = frac.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
      .groupBy("dst").agg(sum(col("p") * col("r")).as("cb"))
    nodes
      .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
      .crossJoin(broadcast(dmDf))
      .select(col("node"),
        (lit((1.0 - damping) / n) + lit(damping) *
          (coalesce(col("cb"), lit(0.0)) + col("dm") / n)).as("r"))
  }
}
