package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Line-level boilerplate removal and token-entropy screens: crafted
  * closed forms plus a local-reference differential.
  */
class CleaningSuite extends AnyFunSuite {
  import TestSpark.{sfDir, spark}
  import spark.implicits._

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  test("line dedup: shared header/footer stripped, content kept, all-boilerplate doc vanishes") {
    val df = Seq(
      (1L, "header\nalpha beta\nfooter"),
      (2L, "header\ngamma delta\nfooter"),
      (3L, "header\nalpha beta\nfooter"),
      (4L, "header\nfooter")).toDF("doc_id", "text")
    val out = Dedup.dropBoilerplateLines(df, "doc_id", "text", maxDocFreq = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    // header/footer occur in 4 docs > 2 → gone; "alpha beta" in 2 ≤ 2
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, "alpha beta"),
      (2L, 3L, 1L, "gamma delta"),
      (3L, 3L, 1L, "alpha beta")))
  }

  test("line dedup: a line repeated WITHIN one doc is doc-freq 1 and every instance survives in order") {
    val df = Seq(
      (1L, "x\ny\nx\nz"),
      (2L, "unrelated")).toDF("doc_id", "text")
    val out = Dedup.dropBoilerplateLines(df, "doc_id", "text", maxDocFreq = 1)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out.toSeq == Seq(
      (1L, 4L, 4L, "x\ny\nx\nz"),
      (2L, 1L, 1L, "unrelated")))
  }

  test("token entropy: closed forms (uniform, constant, half-half)") {
    val df = Seq(
      (1L, "a a a a"),
      (2L, "a b c d"),
      (3L, "a a b b")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, 4L, 1L, 0.25, 0.0),
      (2L, 4L, 4L, 1.0, round4(math.log(4.0))),
      (3L, 4L, 2L, 0.5, round4(math.log(2.0)))))
  }

  test("vocab coverage: closed form and deterministic tie-break") {
    val df = Seq((1L, "a a a b b c"), (2L, "a d")).toDF("doc_id", "text")
    val out = graft.operators.Pipelines.vocabCoverage(df, "text", k = 3)
      .orderBy("rank").as[(Long, String, Long, Double)].collect()
    // counts: a=4 b=2 c=1 d=1 (c beats d on the token tie), total 8
    assert(out.toSeq == Seq(
      (1L, "a", 4L, 0.5), (2L, "b", 2L, 0.75), (3L, "c", 1L, 0.875)))
  }

  test("vocab coverage: curve is monotone, bounded by 1, ranks contiguous on the fixture") {
    val docs = Tables.documents(spark, sfDir)
    val rows = graft.operators.Pipelines.vocabCoverage(docs, "text", k = 100)
      .orderBy("rank").as[(Long, String, Long, Double)].collect()
    // the synthetic fixture vocabulary is ~31 types — smaller than k,
    // so the whole curve is returned and must end at exactly 1.0
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.map(_._1).toSeq == (1L to rows.length.toLong))
    assert(rows.sliding(2).forall(p => p(0)._4 <= p(1)._4 && p(0)._3 >= p(1)._3))
    assert(rows.head._4 > 0.0)
    if (rows.length < 100) assert(rows.last._4 == 1.0)
    else assert(rows.last._4 <= 1.0)
  }

  test("group z-score: closed form, singleton group, constant group") {
    val df = Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L), // mean 2, var 1
      (4L, "b", 7L),                               // n=1 → z=0
      (5L, "c", 5L), (6L, "c", 5L)                 // var 0 → z=0
    ).toDF("doc_id", "g", "v")
    val out = graft.operators.Pipelines.groupZScore(df, "g", "v")
      .select("doc_id", "z").orderBy("doc_id").as[(Long, Double)].collect()
    assert(out.toSeq == Seq(1L -> -1.0, 2L -> 0.0, 3L -> 1.0,
      4L -> 0.0, 5L -> 0.0, 6L -> 0.0))
  }

  test("group z-score: equals a local reference on fixture token counts") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("nt"))
    val local = docs.as[(Long, String, Long)].collect()
    val expected = local.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val n = rows.length.toLong
      val s1 = rows.map(_._3).sum
      val s2 = rows.map(r => r._3 * r._3).sum
      val mean = s1.toDouble / n.toDouble
      val variance =
        if (n < 2) 0.0 else (s2.toDouble - s1.toDouble * mean) / (n.toDouble - 1.0)
      rows.map { r =>
        val z = if (variance <= 0.0) 0.0
          else round4((r._3.toDouble - mean) / math.sqrt(variance))
        r._1 -> z
      }
    }.toMap
    val got = graft.operators.Pipelines.groupZScore(docs, "lang", "nt")
      .select("doc_id", "z").as[(Long, Double)].collect().toMap
    assert(got == expected,
      s"mismatch: ${got.toSet.diff(expected.toSet).take(3)}")
  }

  test("RRF fusion: closed form — overlap wins, singles ranked by source rank") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a = Seq(("x", 1L), ("y", 2L)).toDF("id", "rk")
    val b = Seq(("y", 1L), ("z", 2L)).toDF("id", "rk")
    val out = graft.operators.Similarity
      .rrfFuse(a, "id", "rk", b, "id", "rk", k = 10)
      .as[(String, Double, Long)].collect().toSeq
    assert(out == Seq(
      ("y", round6(1.0 / 62 + 1.0 / 61), 1L),
      ("x", round6(1.0 / 61), 2L),
      ("z", round6(1.0 / 62), 3L)))
  }

  test("quantile cut: closed form — threshold is the smallest value reaching ceil(p*n)") {
    // group g: values 1..10, p=0.9 → ceil(9) = 9th value → thr 9
    val df = (1L to 10L).map(v => (v, "g", v)).toDF("doc_id", "lang", "v")
    val out = graft.operators.Pipelines.quantileCut(df, "lang", "v", p = 0.9)
      .select("doc_id", "q_thr", "keep").orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect()
    assert(out.forall(_._2 == 9L))
    assert(out.map(r => r._1 -> r._3).toMap ==
      (1L to 10L).map(v => v -> (v <= 9L)).toMap)
  }

  test("quantile cut: per-group keep fraction is >= p and minimal on the fixture") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("nt"))
    val rows = graft.operators.Pipelines.quantileCut(docs, "lang", "nt", p = 0.9)
      .select("lang", "nt", "q_thr", "keep")
      .as[(String, Long, Long, Boolean)].collect()
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val n = rs.length
      val kept = rs.count(_._4)
      val thr = rs.head._3
      assert(kept >= math.ceil(0.9 * n).toLong, s"$lang kept $kept of $n")
      // minimality: dropping to the next smaller observed value would
      // undershoot ceil(p*n)
      val below = rs.count(r => r._2 < thr)
      assert(below < math.ceil(0.9 * n), s"$lang threshold not minimal")
      assert(rs.forall(r => r._4 == (r._2 <= thr)))
    }
  }

  test("token entropy: equals a local reference on fixture docs") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 80)
    val local = docs.select("doc_id", "text").as[(Long, String)].collect()
    val expected = local.map { case (id, text) =>
      val t = text.split(" ", -1)
      val counts = t.distinct.sorted.map(g => t.count(_ == g).toDouble)
      val s = counts.foldLeft(0.0)((acc, x) => acc + x * math.log(x))
      id -> ((t.length.toLong, counts.length.toLong,
        round4(counts.length.toDouble / t.length),
        round4(math.log(t.length.toDouble) - s / t.length)))
    }.toMap
    val got = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expected,
      s"mismatch: ${got.toSet.diff(expected.toSet).take(3)}")
  }
}
