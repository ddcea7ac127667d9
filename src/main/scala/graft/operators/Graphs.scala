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
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w"))
      .localCheckpoint()
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
