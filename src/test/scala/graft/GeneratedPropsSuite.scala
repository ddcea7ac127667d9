package graft

import graft.operators.Dedup
import graft.sources.CdcIngest
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests over generated corpora (SURVEY §5.5): LSH recall
  * against exact Jaccard on corpora we control, and the S5 epoch→UTC+8
  * date conversion against java.time ground truth. ScalaCheck generators
  * with a pinned seed, evaluated in one batched Spark job per property.
  */
class GeneratedPropsSuite extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def sampleN[A](gen: Gen[A], n: Int, seed: Long = 42L): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  test("LSH recall ≥ 95% of exact pairs on generated near-dup corpora") {
    // corpus: base docs + mutated near-duplicates (token replacement rate
    // 0.15 → jaccard ≳ 0.7), so exact pairs at τ=0.6 are plentiful
    val vocab = (0 until 500).map(i => s"w$i")
    val rnd = new scala.util.Random(7)
    val bases = (0 until 30).map(_ => Seq.fill(40)(vocab(rnd.nextInt(vocab.size))))
    val docs = bases.zipWithIndex.flatMap { case (toks, i) =>
      val mutated = toks.map(t =>
        if (rnd.nextDouble() < 0.15) vocab(rnd.nextInt(vocab.size)) else t)
      Seq((i * 2L, toks.mkString(" ")), (i * 2L + 1, mutated.mkString(" ")))
    }.toDF("doc_id", "text")
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.6).select("d1", "d2")
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", 0.6).select("d1", "d2")
    val nExact = exact.count()
    val missed = exact.exceptAll(lsh).count()
    assert(nExact >= 20, s"generator should produce pairs, got $nExact")
    // no false positives ever (candidates are exact-verified) …
    assert(lsh.exceptAll(exact).count() == 0)
    // … and ≥95% recall at τ=0.6 with 32 bands × r=2
    assert(missed.toDouble / nExact <= 0.05, s"missed $missed of $nExact")
  }

  test("S5 epoch-ms → UTC+8 date matches java.time for arbitrary instants") {
    // range: 2001..2090 — leap years, century boundary, month/year edges
    val ms = sampleN(Gen.choose(1_000_000_000_000L, 3_800_000_000_000L), 300)
    val got = ms.toDF("c_ms")
      .select(col("c_ms"), date_format(
        from_utc_timestamp(timestamp_millis(col("c_ms")), "+08:00"),
        "yyyy-MM-dd").as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ms.foreach { m =>
      val expected = java.time.Instant.ofEpochMilli(m)
        .atOffset(java.time.ZoneOffset.ofHours(8)).toLocalDate.toString
      assert(got(m) == expected, s"ms=$m")
    }
  }

  test("CDC parse inverts toEnvelope for arbitrary field values") {
    val genRow = for {
      ref <- Gen.choose(0L, Long.MaxValue / 2)
      cid <- Gen.choose(0L, 1000000L)
      name <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(20).mkString.toLowerCase)
      ms <- Gen.choose(1_000_000_000_000L, 2_000_000_000_000L)
    } yield (ref, cid, name, ms)
    val rows = sampleN(genRow, 60)
    val src = rows.toDF("ref", "city_id", "city_name", "c_ms")
    val out = CdcIngest.parse(CdcIngest.toEnvelope(src, "c_ms"), "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == rows.map(r => (r._1, r._2, r._3)).toSet)
  }
}
