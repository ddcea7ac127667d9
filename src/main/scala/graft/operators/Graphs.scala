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
