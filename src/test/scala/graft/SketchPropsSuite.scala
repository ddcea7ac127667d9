package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound property tests for the approximate sketches excluded from
  * the hash oracle (SURVEY §2 footnote: A3 HLL, A7 approx percentile). */
class SketchPropsSuite extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  test("A3: approx_count_distinct within 3×rsd of exact") {
    val li = Tables.lineitem(spark, sfDir)
    val rsd = 0.05
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 3 * rsd,
      s"exact=$exact approx=$approx")
  }

  test("profileColumns approx mode: exact nulls, distincts within 3×rsd, no Expand in plan") {
    import graft.operators.Pipelines
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_returnflag")
    val rsd = 0.05
    val exact = Pipelines.profileColumns(li, Seq("l_partkey", "l_suppkey", "l_returnflag"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val approxDf = Pipelines.profileColumns(
      li, Seq("l_partkey", "l_suppkey", "l_returnflag"), approxRsd = rsd)
    val approx = approxDf
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    exact.foreach { case (c, (nNull, nDist)) =>
      val (aNull, aDist) = approx(c)
      assert(aNull == nNull, s"$c null counts must stay exact")
      assert(math.abs(aDist - nDist).toDouble / nDist <= 3 * rsd,
        s"$c: exact=$nDist approx=$aDist")
    }
    // the scale rationale: approx mode must plan ONE plain agg pass,
    // not the multi-distinct Expand the exact mode pays
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
  }

  test("A7: percentile_approx brackets the exact median") {
    val li = Tables.lineitem(spark, sfDir)
    val r = li.agg(
      expr("percentile(l_quantity, 0.5)").as("exact"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("approx")).head()
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    // high-accuracy sketch on 6k rows: within 2% of the exact median
    assert(math.abs(approx - exact) <= math.abs(exact) * 0.02 + 1e-9,
      s"exact=$exact approx=$approx")
  }

  test("A3+: count-min token sketch never under-counts, over-counts within eps·N, deterministic") {
    import graft.functions.CountMinTokens
    val docs = Tables.documents(spark, sfDir)
    val eps = 0.01
    val cms = CountMinTokens.tokenSketch(docs, "text", eps, confidence = 0.99)
    val exact = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    assert(cms.totalCount() == n, s"sketch saw ${cms.totalCount()} of $n tokens")
    // CMS guarantee: est >= true always; est <= true + eps*N w.p. >= conf
    // (bound checked for EVERY vocab token — the margin at this eps is
    // vast, so even the 1% tail cannot plausibly cross it)
    exact.foreach { case (tok, c) =>
      val est = cms.estimateCount(tok)
      assert(est >= c, s"under-count: $tok est=$est true=$c")
      assert(est <= c + (eps * n).toLong, s"over-count: $tok est=$est true=$c")
    }
    // seeded → same sketch, same estimates on a rebuild
    val cms2 = CountMinTokens.tokenSketch(docs, "text", eps, confidence = 0.99)
    assert(exact.keys.forall(t => cms.estimateCount(t) == cms2.estimateCount(t)))
  }

  test("A8: WeightedMean Aggregator equals the SQL formulation (Q20)") {
    val viaAgg = Queries.q20(spark, sfDir).collect().map(_.toString).sorted.toSeq
    val li = Tables.lineitem(spark, sfDir)
    val viaSql = li.groupBy("l_returnflag")
      .agg(round(sum(col("l_extendedprice") * col("l_quantity"))
        / sum(col("l_quantity")), 4).as("wavg"))
      .orderBy("l_returnflag").collect().map(_.toString).sorted.toSeq
    assert(viaAgg == viaSql)
  }
}
