package graft

import graft.operators.{Pipelines, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram-LM fluency score, DSIR importance weights, per-source stats:
  * closed forms, local-reference differentials, and the invariants that
  * pin the semantics (target-equals-corpus ⇒ zero weights; en-target
  * ranks en docs first).
  */
class ScoringSuite extends AnyFunSuite {
  import TestSpark.{sfDir, spark}
  import spark.implicits._

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  test("trained trigram lang-id: learns a planted signal, matches or beats the stopword heuristic on the holdout") {
    // four "languages" distinguished only by an appended marker phrase
    // (the exact situation of the x_lang_id_ngram fixture, miniature)
    val markers = Map("en" -> "the and of to", "es" -> "el la de que",
      "de" -> "der die und das", "fr" -> "le et un les")
    val df = (0L until 200L).map { i =>
      val lang = Seq("en", "es", "de", "fr")((i % 4).toInt)
      (i, lang, s"filler tok$i common words here ${markers(lang)}")
    }.toDF("doc_id", "lang", "text")
    val pred = TextAnalysis.langIdNgram(
        df, df.where(col("doc_id") % 5 =!= 0), "doc_id", "text", "lang")
      .join(df.select(col("doc_id"), col("lang")), "doc_id")
    val hold = pred.where(col("doc_id") % 5 === 0)
    val trainedAcc = hold.where(col("lang_pred") === col("lang")).count()
      .toDouble / hold.count()
    val heurHold = df.where(col("doc_id") % 5 === 0)
      .withColumn("hp", TextAnalysis.langIdGuess(col("text")))
    val heurAcc = heurHold.where(col("hp") === col("lang")).count()
      .toDouble / heurHold.count()
    assert(trainedAcc >= heurAcc,
      s"trained $trainedAcc must be >= heuristic $heurAcc")
    assert(trainedAcc > 0.9, s"trained accuracy $trainedAcc too low")
  }

  test("trained trigram lang-id: sub-trigram docs pass through as 'und' with null score") {
    val train = Seq((1L, "en", "the and of to a in common text here")).toDF("doc_id", "lang", "text")
    val docs = Seq((10L, "xx", "ab"), (11L, "xx", "the and of")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langIdNgram(docs, train, "doc_id", "text", "lang")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 0L && out(0).getString(2) == "und" && out(0).isNullAt(3))
    assert(out(1).getString(2) == "en")
  }

  test("quality LR: separates a planted signal on the holdout; training is bit-deterministic") {
    val df = (0L until 300L).map { i =>
      val pos = i % 2 == 0
      val marker = if (pos) "good solid prose here" else "spam junk click now"
      (i, pos, s"shared filler tok${i % 7} words $marker")
    }.toDF("doc_id", "label", "text")
    val train = df.where(col("doc_id") % 5 =!= 0)
    val (w1, b1) = TextAnalysis.qualityLrTrain(train, "doc_id", "text", "label")
    val (w2, b2) = TextAnalysis.qualityLrTrain(train, "doc_id", "text", "label")
    assert(w1.sameElements(w2) && b1 == b2, "training must be bit-deterministic")
    val hold = TextAnalysis.qualityLrScore(df, "doc_id", "text", w1, b1)
      .where(col("doc_id") % 5 === 0)
      .join(df.select(col("doc_id"), col("label")), "doc_id")
    val acc = hold.where(col("keep") === col("label")).count().toDouble /
      hold.count()
    assert(acc > 0.9, s"holdout accuracy $acc too low")
  }

  test("bigram LM: closed form on a hand-computable corpus") {
    // corpus {"a b", "a c"}: V=3, c(a ·)=2, c(a b)=c(a c)=1
    // ⇒ p = (1+1)/(2+3) = 0.4 for both docs' single bigram
    val df = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScoreBigram(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    val expected = round4(-math.log(0.4))
    assert(out.toSeq == Seq((1L, 1L, expected), (2L, 1L, expected)))
  }

  test("bigram LM: p=1 degenerate corpus scores exactly zero, not -0.0") {
    // single-token vocabulary: every bigram is certain under add-one
    // smoothing ((2+1)/(2+1) = 1) — the -ln 1 = -0.0 edge the +0.0
    // canonicalization exists for
    val df = Seq((1L, "a a a")).toDF("doc_id", "text")
    val Array((id, n, nll)) =
      TextAnalysis.lmScoreBigram(df, "doc_id", "text")
        .as[(Long, Long, Double)].collect()
    assert((id, n) == (1L, 2L))
    assert(nll == 0.0 &&
      java.lang.Double.doubleToRawLongBits(nll) == 0L, "must be +0.0")
  }

  test("bigram LM: equals a local reference implementation on fixture docs") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 60)
    val local = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1).toVector }
    val insts = local.flatMap { case (id, s) =>
      s.sliding(2).filter(_.size == 2).zipWithIndex
        .map { case (Vector(w1, w2), pos) => (id, pos, w1, s"$w1 $w2") }
    }
    val c2 = insts.groupBy(_._4).map { case (k, v) => k -> v.length.toDouble }
    val c1 = insts.groupBy(_._3).map { case (k, v) => k -> v.length.toDouble }
    val v = local.flatMap(_._2).distinct.length.toDouble
    val expected = insts.groupBy(_._1).map { case (id, xs) =>
      // mirror the engine's multiplicity fold: one m·lp term per
      // distinct (doc, bigram), accumulated in bigram-sorted order
      val byBg = xs.groupBy(_._4).map { case (bg, occ) =>
        (bg, occ.head._3, occ.length.toDouble) }
      val sm = byBg.toSeq.sortBy(_._1).foldLeft(0.0) {
        case (acc, (bg, w1, m)) =>
          acc + m * -math.log((c2(bg) + 1.0) / (c1(w1) + v))
      }
      id -> (xs.length.toLong, round4(sm / xs.length))
    }
    val got = TextAnalysis.lmScoreBigram(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, nll) => id -> ((n, nll)) }.toMap
    assert(got == expected,
      s"mismatch on ${got.toSet.diff(expected.toSet).take(3)}")
  }

  test("DSIR: target == whole corpus makes every weight exactly zero") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 200)
    val w = TextAnalysis.dsirWeights(docs, "doc_id", "text", lit(true))
    assert(w.count() > 0)
    assert(w.where(col("dsir_w") =!= 0.0).count() == 0,
      "ct==cr and T==R must cancel to lw=0 in every bucket")
  }

  test("DSIR: en target ranks en docs above every other language") {
    val docs = Tables.documents(spark, sfDir)
    val byLang = TextAnalysis
      .dsirWeights(docs, "doc_id", "text", col("lang") === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(avg("dsir_w").as("w"))
      .as[(String, Double)].collect().toMap
    val (en, rest) = (byLang("en"), byLang.removed("en").values)
    assert(rest.nonEmpty && rest.forall(en > _),
      s"en=$en must beat $byLang")
  }

  test("sourceStats: equals a local reference on the fixture") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sfDir)
    val local = docs.select("source", "text", "lang")
      .as[(String, String, String)].collect()
    val expected = local.groupBy(_._1).map { case (src, rows) =>
      val nts = rows.map(_._2.split(" ", -1).length.toLong)
      src -> ((rows.length.toLong, nts.sum,
        round4(nts.sum.toDouble / rows.length),
        round4(1.0 - rows.map(r => md5hex(r._2)).distinct.length.toDouble / rows.length),
        rows.map(_._3).distinct.length.toLong))
    }
    val got = Pipelines.sourceStats(docs, "source", "text", "lang")
      .as[(String, Long, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == expected)
  }

  test("ppl buckets: per-source terciles from the LM scores — local threshold reference") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextAnalysis.pplBuckets(docs, "doc_id", "text", "source")
      .as[(Long, String, Long, Double, String)].collect()
    assert(got.nonEmpty)
    // buckets partition each source and respect the NLL order
    got.groupBy(_._2).foreach { case (src, rows) =>
      val n = rows.length
      val sorted = rows.map(_._4).sorted
      val t1 = sorted(math.ceil(n / 3.0).toInt - 1)
      val t2 = sorted(math.ceil(2.0 * n / 3.0).toInt - 1)
      rows.foreach { case (id, _, _, nll, b) =>
        val expected = if (nll <= t1) "head" else if (nll <= t2) "middle" else "tail"
        assert(b == expected, s"doc $id in $src: nll=$nll t1=$t1 t2=$t2")
      }
      val heads = rows.count(_._5 == "head")
      assert(heads >= math.ceil(n / 3.0).toInt, s"$src head count $heads of $n")
    }
    // bucket scores agree with lmScoreBigram run standalone
    val nll = TextAnalysis.lmScoreBigram(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got.forall { case (id, _, _, v, _) => nll(id) == v })
  }

  test("blocklist screen: closed forms — planted hits, repeats, case, null text, maxHits slack") {
    val docs = Seq(
      (1L, "clean words only here"),
      (2L, "one bad word inside"),                    // 1 instance, 1 type
      (3L, "bad bad ugly bad"),                       // 4 instances, 2 types
      (4L, "BAD shouting Ugly mix"),                  // lowercased match
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val wl = Seq("bad", "ugly", "absent")
    val out = TextAnalysis.blocklistScreen(docs, "doc_id", "text", wl)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, true),
      (2L, 1L, 1L, false),
      (3L, 4L, 2L, false),
      (4L, 2L, 2L, false),
      (5L, 0L, 0L, true)))
    // maxHits slack: a tolerance of 2 keeps docs at ≤ 2 instances
    val lax = TextAnalysis.blocklistScreen(docs, "doc_id", "text", wl, maxHits = 2L)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(lax.map(r => r._1 -> r._4) ==
      Seq(1L -> true, 2L -> true, 3L -> false, 4L -> true, 5L -> true))
    // zero shuffle: pure projection (the 100 TB posture for a dictionary screen)
    val plan = TextAnalysis.blocklistScreen(docs, "doc_id", "text", wl)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("readabilityScores: hand-counted closed form, one-sentence default, empty-doc exclusion, zero shuffle") {
    val docs = Seq(
      (1L, "hello world. nice day"), // 4 words, 2 sentences, 6 syllables
      (2L, "no punctuation here"),   // 1-sentence convention
      (3L, ""), (4L, "   "),         // words = 0 → excluded
      (5L, "one\ntwo\tthree four")   // \s+ split: newline/tab delimit too
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readabilityScores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(got.keySet == Set(1L, 2L, 5L))
    assert(got(5L)._1 == 4L) // words split on whitespace RUNS, not ' '
    val (w, s, sy, ease, grade) = got(1L)
    assert(w == 4L && s == 2L && sy == 6L)
    assert(ease == round4(206.835 - 1.015 * 2.0 - 84.6 * 1.5))
    assert(grade == round4(0.39 * 2.0 + 11.8 * 1.5 - 15.59))
    assert(got(2L)._2 == 1L) // no [.!?] ⇒ one sentence
    val plan = TextAnalysis.readabilityScores(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
