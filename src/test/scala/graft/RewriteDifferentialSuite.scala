package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential guards for the round-10 shuffle rewrites: the
  * groupBy+join substringDedup and the multiplicity-fold langIdNgram
  * are checked row-for-row against independent brute-force references
  * on generated corpora (pinned seeds). The CleaningSuite/ScoringSuite
  * closed-form tests pin individual behaviors; these pin the WHOLE
  * function against a local implementation a reviewer can read in ten
  * lines, so a future plan rewrite can't silently drift semantics. */
class RewriteDifferentialSuite extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Local reference for substringDedup: literal O(n²) spec — count
    * every k-shingle corpus-wide, mark non-first duplicated starts,
    * excise covered tokens. */
  private def bruteSubstring(docs: Seq[(Long, String)], k: Int): Seq[(Long, Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val shingles = for {
      (id, ts) <- toks if ts.length >= k
      i <- 0 to ts.length - k
    } yield ((id, i + 1), ts.slice(i, i + k).mkString(" "))
    val byGram = shingles.groupBy(_._2)
    val dupStarts = byGram.values.collect {
      case occ if occ.length >= 2 =>
        occ.map(_._1).sortBy(identity).drop(1) // all but the (id,pos)-first
    }.flatten.toSet
    toks.map { case (id, ts) =>
      val covered = (for {
        ((did, pos), _) <- shingles if did == id && dupStarts((did, pos))
        p <- pos until pos + k
      } yield p).toSet
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !covered(i + 1) => t }
      (id, ts.length.toLong, covered.size.toLong, kept.mkString(" "))
    }
  }

  test("substringDedup ≡ brute-force spec on a generated dup-dense corpus") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => s"w$i") // small vocab → natural repeats
    val boiler = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs: Seq[(Long, String)] = (0L until 25L).map { id =>
      val body = Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      val t =
        if (id % 3 == 0) s"${body.mkString(" ")} $boiler"   // shared run
        else if (id % 7 == 0) { val b = body.mkString(" "); s"$b $b" } // self-repeat
        else body.mkString(" ")
      (id, t)
    }
    val expect = bruteSubstring(docs, k = 8).sortBy(_._1)
    val got = Dedup.substringDedup(docs.toDF("doc_id", "text"), "doc_id", "text", k = 8)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == expect)
  }

  test("langIdNgram ≡ brute-force naive-Bayes on a generated labeled corpus") {
    val rnd = new scala.util.Random(13)
    val langs = Seq("aa", "bb", "cc")
    // language-specific character inventories so the signal is learnable
    val chars = Map("aa" -> "abcde", "bb" -> "fghij", "cc" -> "klmno")
    val docs: Seq[(Long, String, String)] = (0L until 60L).map { id =>
      val lang = langs((id % 3).toInt)
      val pool = chars(lang) + "xy " // shared chars + spaces for mixing
      val txt = Seq.fill(20 + rnd.nextInt(30))(pool(rnd.nextInt(pool.length))).mkString
      (id, lang, txt)
    }
    val train = docs.filter(_._1 % 5 == 1)

    // local reference: add-one NB over char trigrams, exactly the scaladoc
    def tris(t: String): Seq[String] = {
      val lo = t.toLowerCase
      if (lo.length < 3) Seq.empty
      else (0 to lo.length - 3).map(i => lo.substring(i, i + 3))
    }
    val counts: Map[(String, String), Long] = train
      .flatMap { case (_, l, t) => tris(t).map(tr => (l, tr)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val totals: Map[String, Long] =
      counts.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val vocabN = counts.keys.map(_._2).toSet.size.toDouble
    val expect = docs.map { case (id, _, t) =>
      val ts = tris(t)
      if (ts.isEmpty) (id, 0L, "und", None)
      else {
        // mirror the engine's fold order: per-distinct-trigram m·lp,
        // accumulated in trigram-sorted order
        val m = ts.groupBy(identity).map { case (tr, v) => tr -> v.size.toDouble }
        val scored = totals.keys.toSeq.sorted.map { l =>
          val sm = m.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (tr, mm)) =>
            acc + mm * math.log((counts.getOrElse((l, tr), 0L) + 1.0) /
              (totals(l) + vocabN))
          }
          (l, sm)
        }
        // argmax with tie-break to lexicographically FIRST lang
        val best = scored.sortBy { case (l, sm) => (-sm, l) }.head
        (id, ts.size.toLong, best._1,
          Some(BigDecimal(best._2 / ts.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0))
      }
    }.sortBy(_._1)
    val got = TextAnalysis.langIdNgram(
        docs.toDF("doc_id", "lang", "text"),
        train.toDF("doc_id", "lang", "text"), "doc_id", "text", "lang")
      .orderBy("doc_id")
      .as[(Long, Long, String, Option[Double])].collect().toSeq
    // compare predictions and counts exactly; scores to 4dp (both rounded)
    assert(got.map(r => (r._1, r._2, r._3)) == expect.map(r => (r._1, r._2, r._3)))
    got.zip(expect).foreach { case (g, e) =>
      (g._4, e._4) match {
        case (Some(gs), Some(es)) =>
          assert(math.abs(gs - es) <= 1e-4 + 1e-12, s"doc ${g._1}: $gs vs $es")
        case (a, b) => assert(a == b, s"doc ${g._1}: $a vs $b")
      }
    }
  }
}
