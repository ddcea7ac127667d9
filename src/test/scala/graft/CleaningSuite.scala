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

  test("substring dedup: a planted 100-token span shared by two otherwise-distinct docs is excised from the later one only") {
    val span = (1 to 100).map(i => s"sp$i").mkString(" ")
    val pre1 = (1 to 40).map(i => s"a$i").mkString(" ")
    val post1 = (1 to 30).map(i => s"b$i").mkString(" ")
    val pre2 = (1 to 25).map(i => s"c$i").mkString(" ")
    val post2 = (1 to 35).map(i => s"d$i").mkString(" ")
    val df = Seq(
      (1L, s"$pre1 $span $post1"),
      (2L, s"$pre2 $span $post2"),
      (3L, "totally unrelated text with enough tokens to not matter"))
      .toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", k = 8)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    // doc 1 is the first occurrence: keeps everything. Doc 2 loses
    // exactly the 100 span tokens; its own prefix/suffix survive intact.
    assert(out(0) == (1L, 170L, 0L, s"$pre1 $span $post1"))
    assert(out(1) == (2L, 160L, 100L, s"$pre2 $post2"))
    assert(out(2)._3 == 0L)
  }

  test("substring dedup: within-doc repeat keeps the first copy; spans shorter than k are invisible") {
    val run = (1 to 20).map(i => s"r$i").mkString(" ")
    val shortRep = "x1 x2 x3"
    val df = Seq(
      (1L, s"$run mid1 mid2 $run"),
      (2L, s"$shortRep pad1 pad2 pad3 pad4 pad5 $shortRep")).toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", k = 8)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    // doc 1: second copy of the 20-token run is fully covered (its 13
    // in-run starts repeat the first copy's shingles); first copy and
    // the middle survive
    assert(out(0) == (1L, 42L, 20L, s"$run mid1 mid2"))
    // doc 2: the repeated 3-token span never fills an 8-token shingle
    // with identical context → no shingle repeats → untouched
    assert(out(1)._3 == 0L)
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

  test("normalized dedup: casing/punctuation variants collapse, distinct texts survive") {
    val df = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),          // same normalized form as 1
      (3L, "HELLO-WORLD."),           // same normalized form as 1
      (4L, "hello worlds"),           // distinct
      (5L, "")                        // empty stays its own group
    ).toDF("doc_id", "text")
    val out = Dedup.normalizedDedup(df, "doc_id", "text")
      .as[(Long, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(out(1L) == ((1L, 3L, true)))
    assert(out(2L) == ((1L, 3L, false)))
    assert(out(3L) == ((1L, 3L, false)))
    assert(out(4L) == ((4L, 1L, true)))
    assert(out(5L) == ((5L, 1L, true)))
    // differential on fixture docs: equals exactDedup run on the
    // pre-normalized text (keep-set comparison)
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 200)
    val kept = Dedup.normalizedDedup(docs, "doc_id", "text")
      .where(col("keep")).select("doc_id").as[Long].collect().toSet
    val viaExact = Dedup.exactDedup(
        docs.select(col("doc_id"), Dedup.normalizeText(col("text")).as("text")),
        "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == viaExact)
  }

  test("unicode normalize: NFKC folds width/ligature/combining/compat forms; codegen'd; null passthrough") {
    import graft.expressions.TextExpressions.normalizeUnicode
    val df = Seq(
      (1L, "\uFF28\uFF45\uFF4C\uFF4C\uFF4F\u3000\uFF37\uFF4F\uFF52\uFF4C\uFF44"),
      (2L, "\uFB01nal \uFB02ight"),
      (3L, "cafe\u0301 franc\u0327ais"),
      (4L, "x\u00B2 \u00BD \u2168 \u339E"),
      (5L, "plain ascii"), (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), normalizeUnicode(col("text")))
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("Hello World"))
    assert(got(2L).contains("final flight"))
    assert(got(3L).contains("caf\u00E9 fran\u00E7ais"))
    assert(got(4L).contains("x2 1\u20442 IX km"))
    assert(got(5L).contains("plain ascii")) // NFKC idempotent on ASCII
    assert(got(6L).isEmpty)
    // NFC composes but keeps compatibility chars
    assert(df.where(col("doc_id") === 2L)
      .select(normalizeUnicode(col("text"), "NFC")).as[String].head()
      == "\uFB01nal \uFB02ight")  // compat chars kept
    // SQL registry form (SparkSessionExtensions seam)
    df.where(col("doc_id") === 3L).createOrReplaceTempView("unorm_t")
    assert(spark.sql(
      "SELECT unicode_normalize(text) FROM unorm_t").as[String].head()
      == "caf\u00E9 fran\u00E7ais")
    assert(spark.sql(
      "SELECT unicode_normalize(text, 'NFD') FROM unorm_t").as[String]
      .head() == "cafe\u0301 franc\u0327ais")
    intercept[Exception] {
      graft.expressions.UnicodeNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFX")
    }
  }

  test("normalized dedup with NFKC front: width/ligature variants collapse that the plain form misses") {
    val df = Seq(
      (1L, "hello world"),
      (2L, "\uFF28\uFF45\uFF4C\uFF4C\uFF4F\u3000\uFF37\uFF4F\uFF52\uFF4C\uFF44"),
      (3L, "\uFB01ne print"), (4L, "fine print"),
      (5L, "other text")
    ).toDF("doc_id", "text")
    val nf = Dedup.normalizedDedup(df, "doc_id", "text", nfkc = true)
      .as[(Long, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(nf(1L) == ((1L, 2L, true)) && nf(2L) == ((1L, 2L, false)))
    assert(nf(3L) == ((3L, 2L, true)) && nf(4L) == ((3L, 2L, false)))
    assert(nf(5L) == ((5L, 1L, true)))
    // the plain form strips the full-width/ligature chars to spaces
    // and misses both collapses — the gap NFKC closes
    val plain = Dedup.normalizedDedup(df, "doc_id", "text")
      .as[(Long, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(plain(1L) == 1L && plain(2L) == 1L && plain(4L) == 1L)
  }

  test("ngram novelty: equals a local brute-force reference; short docs survive") {
    val df = Seq(
      (1L, "a b c d"),      // grams: "a b c", "b c d"
      (2L, "a b c x"),      // shares "a b c" with 1
      (3L, "u v w"),        // unique gram
      (4L, "p q")           // too short for trigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(df, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))   // "b c d" novel, "a b c" shared
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((1L, 1L, 1.0)))
    assert(out(4L) == ((0L, 0L, 0.0)))
    // local reference over fixture docs
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 120)
    val local = docs.select("doc_id", "text").as[(Long, String)].collect()
    val gramsOf = local.map { case (id, t) =>
      id -> t.split(" ", -1).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    }.toMap
    val freq = gramsOf.values.flatten.toSeq.groupBy(identity).map { case (g, o) => g -> o.size }
    val expected = local.map { case (id, _) =>
      val g = gramsOf(id)
      val novel = g.count(freq(_) == 1).toLong
      id -> ((g.size.toLong, novel,
        if (g.isEmpty) 0.0 else round4(novel.toDouble / g.size)))
    }.toMap
    val got = TextAnalysis.ngramNovelty(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected,
      s"mismatch: ${got.toSet.diff(expected.toSet).take(3)}")
  }

  test("containment: embedded eval doc scores 1.0; tau and the stop-gram cut bind") {
    val evalDf = Seq(
      (1L, "a b c d e f"),                 // 5-grams: "a b c d e", "b c d e f"
      (2L, "z z z z z z")                  // absent from corpus
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "x y a b c d e f g h"),        // contains eval 1 verbatim
      (11L, "a b c d e q r s t u")         // shares only "a b c d e"
    ).toDF("doc_id", "text")
    val out = TextAnalysis.containmentPairs(evalDf, corpus, "doc_id", "text",
        n = 5, tau = 0.4, maxDocFreq = 10L)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out((1L, 10L)) == ((2L, 1.0)))
    assert(out((1L, 11L)) == ((1L, 0.5)))
    assert(out.keySet == Set((1L, 10L), (1L, 11L))) // eval 2 matches nothing
    // raising tau above 0.5 drops the partial pair
    val strict = TextAnalysis.containmentPairs(evalDf, corpus, "doc_id", "text",
        n = 5, tau = 0.6, maxDocFreq = 10L)
      .as[(Long, Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(strict == Set((1L, 10L)))
    // a doc-freq-1 stop-gram cut removes "a b c d e" (df 2) from the
    // corpus side: pair (1,11) loses its only evidence and vanishes,
    // (1,10)'s containment halves — denominator unchanged
    val cut = TextAnalysis.containmentPairs(evalDf, corpus, "doc_id", "text",
        n = 5, tau = 0.4, maxDocFreq = 1L)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(cut == Map((1L, 10L) -> ((1L, 0.5))))
  }

  test("PII redaction: e-mail → IP → phone applied in order, each span tagged once, counts per type") {
    val df = Seq(
      (1L, "write to bob.smith+x@mail.example.org today"),
      (2L, "server 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call 555-123-4567 now"),
      (4L, "a@b.co at 1.2.3.4 or 555-000-1111"),
      (5L, "no pii here, just 12345 and 1.5 numbers")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 0L, 0L, "write to <EMAIL> today"),
      (2L, 0L, 2L, 0L, "server <IP> and <IP> up"),
      (3L, 0L, 0L, 1L, "call <PHONE> now"),
      (4L, 1L, 1L, 1L, "<EMAIL> at <IP> or <PHONE>"),
      (5L, 0L, 0L, 0L, "no pii here, just 12345 and 1.5 numbers")))
  }

  test("PII redaction: an IP inside an e-mail is consumed by the e-mail pass, never double-tagged") {
    val df = Seq((1L, "odd but legal u@1.2.3.4x.com plus bare 5.6.7.8")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].head()
    assert(out == ((1L, 1L, 1L, 0L, "odd but legal <EMAIL> plus bare <IP>")))
  }

  test("token-run collapse: runs cut to maxRun, order kept, non-adjacent repeats survive") {
    val df = Seq(
      (1L, "a a a b b a c c c c"),
      (2L, "x y z")).toDF("doc_id", "text")
    val r1 = TextAnalysis.collapseTokenRuns(df, "doc_id", "text", maxRun = 1)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(r1 == Seq(
      (1L, 10L, 6L, "a b a c"),
      (2L, 3L, 0L, "x y z")))
    val r2 = TextAnalysis.collapseTokenRuns(df, "doc_id", "text", maxRun = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(r2 == Seq(
      (1L, 10L, 3L, "a a b b a c c"),
      (2L, 3L, 0L, "x y z")))
  }
}
