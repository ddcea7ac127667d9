package graft

import graft.operators.Pipelines
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelinesSuite extends AnyFunSuite {
  import TestSpark.{sfDir, spark}
  import spark.implicits._

  test("splitByHash: deterministic, total, roughly proportioned") {
    val docs = Tables.documents(spark, sfDir)
    val s1 = Pipelines.splitByHash(docs, "doc_id")
    val s2 = Pipelines.splitByHash(docs, "doc_id")
    assert(s1.where(col("split").isNull).count() == 0)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 400 && counts("train") < 480, counts.toString)
    // deterministic: same assignment on re-run
    assert(s1.select("doc_id", "split").exceptAll(s2.select("doc_id", "split")).count() == 0)
  }

  test("splitByMd5Prefix: total, deterministic, nibble-proportioned, cuts validated") {
    val docs = Tables.documents(spark, sfDir)
    val s1 = Pipelines.splitByMd5Prefix(docs, "doc_id")
    assert(s1.where(col("split").isNull).count() == 0)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // 14/16 expected train share = 87.5%; the nibble is md5-uniform
    assert(counts("train") > 380 && counts("train") < 480, counts.toString)
    // per-row agreement with an independently computed nibble bucket
    val mismatch = s1.withColumn("b",
        conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10).cast("long"))
      .where((col("b") < 14 && col("split") =!= "train") ||
        (col("b") === 14 && col("split") =!= "val") ||
        (col("b") === 15 && col("split") =!= "test"))
    assert(mismatch.count() == 0)
    intercept[IllegalArgumentException] {
      Pipelines.splitByMd5Prefix(docs, "doc_id", Seq("a" -> 10, "b" -> 15))
    }
  }

  test("sampleByMd5: deterministic, append-stable, ~keep256/256 proportioned") {
    val docs = Tables.documents(spark, sfDir)
    val s64 = Pipelines.sampleByMd5(docs, "doc_id", 64)
    val n = s64.count()
    assert(n > 80 && n < 170, s"expected ~125 of 500 at 64/256, got $n")
    // content-addressed: the same rows survive on a re-run and the
    // sample of a subset is the subset of the sample (append stability)
    assert(s64.select("doc_id").exceptAll(
      Pipelines.sampleByMd5(docs, "doc_id", 64).select("doc_id")).count() == 0)
    val sub = Pipelines.sampleByMd5(docs.where(col("doc_id") < 100), "doc_id", 64)
    assert(sub.select("doc_id").exceptAll(
      s64.where(col("doc_id") < 100).select("doc_id")).count() == 0)
    // monotone in keep256: the 64-sample is contained in the 128-sample
    assert(s64.select("doc_id").exceptAll(
      Pipelines.sampleByMd5(docs, "doc_id", 128).select("doc_id")).count() == 0)
    intercept[IllegalArgumentException] {
      Pipelines.sampleByMd5(docs, "doc_id", 300)
    }
  }

  test("stratifiedSample: per-stratum downsampling is deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val langs = docs.select("lang").distinct().as[String].collect()
    val fractions = langs.map(l => l -> (if (l == "en") 0.5 else 1.0)).toMap
    val a = Pipelines.stratifiedSample(docs, "lang", fractions).count()
    val b = Pipelines.stratifiedSample(docs, "lang", fractions).count()
    assert(a == b)
    assert(a < docs.count())
  }

  test("scrubPii replaces emails, urls, phones, ssns") {
    val rows = Seq(
      "contact me at jo.doe+x@example.co.uk today",
      "see https://example.com/a?b=c and http://x.io",
      "call 555-123 4567 ok",
      "ssn 123-45-6789 end",
      "clean text stays clean"
    ).toDF("text")
    val out = rows.select(Pipelines.scrubPii(col("text")).as("t"))
      .as[String].collect().toSeq
    assert(out(0) == "contact me at <EMAIL> today")
    assert(out(1) == "see <URL> and <URL>")
    assert(out(2).contains("<PHONE>"), out(2))
    assert(out(3) == "ssn <SSN> end")
    assert(out(4) == "clean text stays clean")
  }

  test("stripMarkup: script/style content gone, tags gone, entities decoded amp-last, whitespace collapsed") {
    val rows = Seq(
      // script with < inside, style, comment, attributes, entities
      "<html><head><style>p{x:1}</style><script>if(1<2){a(\"q\")}</script></head>" +
        "<body><!-- c --><p class=\"z\">Hello &amp; bye&nbsp;&lt;b&gt;</p></body></html>",
      // double-encoded entity must NOT resurrect a tag or re-decode
      "a &amp;lt;script&amp;gt; b",
      // multi-line script block ((?s) dotall) and self-closing tag
      "x<script>\nvar y = 1;\n</script>z <br/> w",
      "plain text untouched"
    ).toDF("text")
    val out = rows.select(Pipelines.stripMarkup(col("text")).as("t"))
      .as[String].collect().toSeq
    assert(out(0) == "Hello & bye <b>")
    assert(out(1) == "a &lt;script&gt; b")
    assert(out(2) == "x z w")
    assert(out(3) == "plain text untouched")
    // zero shuffle: pure projection
    val plan = rows.select(Pipelines.stripMarkup(col("text")).as("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("shardForOutput yields the requested writer parallelism") {
    val docs = Tables.documents(spark, sfDir)
    assert(Pipelines.shardForOutput(docs, "doc_id", 7).rdd.getNumPartitions == 7)
  }

  test("chunkByTokens: overlap stitches, coverage is total, no tiny tails") {
    val doc = Seq((1L, (1 to 40).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = graft.operators.Pipelines
      .chunkByTokens(doc, "doc_id", "text", chunkSize = 16, overlap = 4)
      .orderBy("chunk_id").collect()
    // starts 1,13,25 (stop at len-overlap=36): 16,16,16 tokens
    assert(chunks.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(chunks.map(_.getLong(3)).toSeq == Seq(16L, 16L, 16L))
    // consecutive chunks share exactly the 4-token overlap
    val c0 = chunks(0).getString(2).split(" ")
    val c1 = chunks(1).getString(2).split(" ")
    assert(c0.takeRight(4).toSeq == c1.take(4).toSeq)
    // every token appears in some chunk
    val covered = chunks.flatMap(_.getString(2).split(" ")).toSet
    assert(covered == (1 to 40).map(i => s"t$i").toSet)
  }

  test("tfIdfTopTerms: rare terms outrank common ones") {
    val docs = Seq(
      (1L, "common common rare1 rare1 rare1"),
      (2L, "common filler filler"),
      (3L, "common other other")).toDF("doc_id", "text")
    val top = graft.operators.Pipelines.tfIdfTopTerms(docs, "doc_id", "text", 2)
    val d1 = top.where(col("doc_id") === 1 && col("rk") === 1).head()
    assert(d1.getString(1) == "rare1") // columns: doc_id, term, score, rk
  }

  test("dot_product is callable from SQL (GraftExtensions)") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("composed column fns are callable from SQL and equal the Column API (GraftExtensions)") {
    import graft.operators.{Dedup, TextAnalysis}
    Tables.documents(spark, sfDir).limit(50).createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, quality_score(text) AS q, lang_id_guess(text) AS l,
        |token_fingerprint(text) AS f, scrub_pii(text) AS s, simhash60(text) AS h
        |FROM sqlfn_docs ORDER BY doc_id""".stripMargin).collect()
    val viaCols = spark.table("sqlfn_docs").select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.langIdGuess(col("text")).as("l"),
        TextAnalysis.fingerprint(col("text")).as("f"),
        Pipelines.scrubPii(col("text")).as("s"),
        Dedup.simHashExpr(col("text")).as("h"))
      .orderBy("doc_id").collect()
    assert(viaSql.map(_.toString).toSeq == viaCols.map(_.toString).toSeq)
  }

  test("packSequences: windows are exactly filled, spans consistent, xxhash ≡ byShard") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("nt"))
    val packed = Pipelines.packSequences(docs, "doc_id", "nt",
      capacity = 100, shards = 4)
    val rowsOut = packed.collect().map(r => (r.getLong(1), r.getLong(0),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rowsOut.length == docs.where(col("nt") > 0).count())
    rowsOut.groupBy(_._1).foreach { case (_, shardRows) =>
      val sorted = shardRows.sortBy(_._2)
      // gstart is the running sum of earlier docs' tokens (id order)
      var cum = 0L
      sorted.foreach { case (_, _, nt, gstart, sb, eb, off) =>
        assert(gstart == cum)
        assert(sb == gstart / 100 && off == gstart % 100)
        assert(eb == (gstart + nt - 1) / 100)
        cum += nt
      }
      // every window before the shard's last is exactly filled: token
      // mass overlapping window b is `capacity` for all b < lastBin
      val lastBin = (cum - 1) / 100
      (0L until lastBin).foreach { b =>
        val mass = sorted.map { case (_, _, nt, gstart, _, _, _) =>
          val lo = math.max(gstart, b * 100)
          val hi = math.min(gstart + nt, (b + 1) * 100)
          math.max(0L, hi - lo)
        }.sum
        assert(mass == 100L, s"window $b holds $mass tokens")
      }
    }
    // the caller-shard seam reproduces the xxhash path bit-for-bit when
    // handed the same shard assignment
    val preSharded = docs.withColumn("shard",
      pmod(xxhash64(col("doc_id")), lit(4L)))
    val viaSeam = Pipelines.packSequencesByShard(preSharded, "doc_id", "nt",
      capacity = 100, shardCol = "shard")
    assert(packed.exceptAll(viaSeam).count() == 0 &&
      viaSeam.exceptAll(packed).count() == 0)
  }

  test("orderForTraining: contiguous per-shard positions, shuffled vs id order, deterministic") {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val out = Pipelines.orderForTraining(docs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == docs.count())
    // positions are 1..n contiguous within every shard
    out.groupBy(_._2).foreach { case (shard, rowsIn) =>
      assert(rowsIn.map(_._3).sorted.toSeq == (1L to rowsIn.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    // the curriculum order is actually shuffled: reading ids in
    // (shard, pos) order must not reproduce ascending id order
    val curriculum = out.sortBy(t => (t._2, t._3)).map(_._1).toSeq
    assert(curriculum != curriculum.sorted)
    // deterministic across runs
    val again = Pipelines.orderForTraining(docs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("mixtureSampleByMd5: per-stratum rates, monotone, deterministic") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang")
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    val full = Pipelines.mixtureSampleByMd5(docs, "lang", "doc_id",
      rates = Map(langs.head -> 256), default = 256)
    assert(full.count() == docs.count()) // rate 256 keeps everything
    val none = Pipelines.mixtureSampleByMd5(docs, "lang", "doc_id",
      rates = Map(langs.head -> 0), default = 256)
    assert(none.where(col("lang") === langs.head).count() == 0)
    assert(none.where(col("lang") =!= langs.head).count() ==
      docs.where(col("lang") =!= langs.head).count())
    // monotone: raising a rate only adds rows
    val lo = Pipelines.mixtureSampleByMd5(docs, "lang", "doc_id",
      rates = Map(langs.head -> 64), default = 128)
    val hi = Pipelines.mixtureSampleByMd5(docs, "lang", "doc_id",
      rates = Map(langs.head -> 128), default = 192)
    assert(lo.exceptAll(hi).count() == 0)
    // deterministic across runs
    assert(lo.exceptAll(Pipelines.mixtureSampleByMd5(docs, "lang", "doc_id",
      rates = Map(langs.head -> 64), default = 128)).count() == 0)
  }

  test("bpeMergeCandidates: closed form with within-word multiplicity; local reference on the fixture") {
    // "aaab" contributes aa×2, ab×1 per occurrence; word freq weights
    val df = Seq("aaab aaab cd", "cd x").toDF("text")
    val out = Pipelines.bpeMergeCandidates(df, "text", k = 10)
      .as[(Long, String, Long)].collect().toSeq
    // counts: aa = 2 pairs × 2 occurrences = 4; ab = 2; cd = 2; x dropped (len 1)
    assert(out == Seq((1L, "aa", 4L), (2L, "ab", 2L), (3L, "cd", 2L)))
    // local reference over fixture docs
    val docs = Tables.documents(spark, sfDir)
    val local = docs.select("text").as[String].collect()
    val counts = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    local.flatMap(_.split(" ", -1)).filter(_.length >= 2).foreach { w =>
      (0 until w.length - 1).foreach { i =>
        counts(w.substring(i, i + 2)) += 1L
      }
    }
    val expected = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
      .zipWithIndex.map { case ((p, c), i) => (i + 1L, p, c) }
    val got = Pipelines.bpeMergeCandidates(docs, "text", k = 20)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == expected)
    // the top-k must plan as TakeOrdered, never a global sort
    val plan = Pipelines.bpeMergeCandidates(docs, "text", k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("leakFreeSplit: whole clusters share a split; no near-dup pair crosses a boundary") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 200)
    val out = Pipelines.leakFreeSplit(docs, "doc_id", "text", tau = 0.8)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    assert(out.length == docs.count())
    // every cluster maps to exactly one split
    out.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).distinct.length == 1)
    }
    // and therefore no verified near-dup pair straddles a boundary
    val splitOf = out.map(r => r._1 -> r._3).toMap
    val pairs = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 0.8)
      .select("d1", "d2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b), s"pair ($a,$b) crosses splits")
    }
    // all three splits are populated on this slice (fixture property)
    assert(out.map(_._3).distinct.sorted.toSeq == Seq("test", "train", "val"))
  }

  test("sqrtTemperatureRates: closed form, smallest stratum keeps all, rates anti-monotone in size") {
    val df = (Seq.fill(100)("big") ++ Seq.fill(25)("small") ++
      Seq.fill(49)("mid")).toDF("s")
    val got = Pipelines.sqrtTemperatureRates(df, "s")
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("small") == ((25L, 1.0, 256L)))
    assert(got("mid") == ((49L, 0.7143, 183L))) // sqrt(25/49)=5/7; ceil(0.714...*256)
    assert(got("big") == ((100L, 0.5, 128L)))
    // fixture: rates strictly anti-monotone in stratum size
    val langs = Pipelines.sqrtTemperatureRates(
        Tables.documents(spark, sfDir), "lang")
      .as[(String, Long, Double, Long)].collect().sortBy(_._2)
    assert(langs.head._3 == 1.0 && langs.head._4 == 256L)
    langs.sliding(2).foreach { case Array(a, b) =>
      if (a._2 < b._2) assert(a._3 >= b._3 && a._4 >= b._4)
    }
  }

  test("kmvOverlap: equals a local sketch reference; exact when k covers the union") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // crafted: k covers every union → estimate IS the exact Jaccard
    val items = Seq(
      "A" -> Seq("x", "y", "z", "w"),
      "B" -> Seq("x", "y", "q", "r"),
      "C" -> Seq("m", "n")
    ).flatMap { case (g, is) => is.map(g -> _) }
    val df = items.toDF("g", "item")
    val exact = Pipelines.kmvOverlap(df, "g", "item", k = 100)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(exact(("A", "B")) == 0.3333) // round(2/6, 4)
    assert(exact(("A", "C")) == 0.0)
    assert(exact(("B", "C")) == 0.0)
    // fixture bigrams at k=24: equals a local replication of the
    // sketch math, hash for hash
    val docs = Tables.documents(spark, sfDir)
    val local = docs.select("source", "text").as[(String, String)].collect()
    val sets = local.groupBy(_._1).map { case (src, rows) =>
      src -> rows.flatMap(_._2.split(" ", -1).sliding(2)
        .filter(_.length == 2).map(_.mkString(" "))).toSet
    }
    val k = 24
    val sk = sets.map { case (g, s) => g -> s.map(md5hex).toSeq.sorted.take(k) }
    val expected = (for {
      (g1, ka) <- sk; (g2, kb) <- sk if g1 < g2
    } yield {
      val ku = (ka ++ kb).distinct.sorted.take(k)
      val inter = ku.count(h => ka.contains(h) && kb.contains(h))
      (g1, g2) -> ((ku.size.toLong,
        BigDecimal(inter.toDouble / ku.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }).toMap
    val bi = docs.select(col("source"), split(col("text"), " ").as("t"))
      .select(col("source"), explode(array_distinct(
        graft.operators.TextAnalysis.wordNgrams(col("t"), 2))).as("item"))
    val got = Pipelines.kmvOverlap(bi, "source", "item", k)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == expected,
      s"mismatch: ${got.toSet.diff(expected.toSet).take(3)}")
  }

  test("BPE train+encode: hand-computed merges, ids, early stop, OOV passthrough") {
    // vocab {aa×3, ab×1, b×1}: pairs (a,a)→3 beat (a,b)→1, then (a,b),
    // then nothing left → early stop despite numMerges=5
    val merges = Pipelines.bpeTrainMerges(Seq(("aa", 3L), ("ab", 1L), ("b", 1L)), 5)
    assert(merges == Seq("a" -> "a", "a" -> "b"))
    val ranks = merges.zipWithIndex.toMap
    assert(Pipelines.bpeEncodeWord("aab", ranks) == Vector("aa", "b"))
    assert(Pipelines.bpeEncodeWord("aaa", ranks) == Vector("aa", "a"))
    assert(Pipelines.bpeEncodeWord("aaaa", ranks) == Vector("aa", "aa"))
    assert(Pipelines.bpeEncodeWord("xy", ranks) == Vector("x", "y"))
    val df = Seq((1L, "aa aa ab"), (2L, "aa b")).toDF("doc_id", "text")
    val out = Pipelines.bpeEncode(df, "doc_id", "text", numMerges = 5)
      .orderBy("doc_id").as[(Long, Long, Long, String, String)].collect()
    // id layout: base chars sorted [a→0, b→1], merges aa→2, ab→3
    assert(out(0) == ((1L, 3L, 3L, "aa|aa|ab", "2,2,3")))
    assert(out(1) == ((2L, 2L, 2L, "aa|b", "2,1")))
  }

  test("bpeEncodeWord: production merge counts stay fast (O(len) per step, not O(len·numMerges))") {
    // a prefix-fusion chain over 1000 distinct CJK chars — every step
    // applies exactly one merge, so a 1000-char word walks 999 steps —
    // padded with 50k filler ranks that never apply. The pre-fix argmin
    // scanned the WHOLE 51k-entry table once per step (~5·10⁷ map
    // traversals); the O(len)-per-step form does ~10⁶ adjacent-pair
    // lookups total. The bound below is generous for the latter and a
    // regression canary for the former.
    val n = 1000
    val chars = (0 until n).map(i => (0x4E00 + i).toChar.toString)
    val chain = (1 until n).map(i => chars.take(i).mkString -> chars(i))
    val filler = (0 until 50000).map(i => s"F$i" -> s"G$i")
    val ranks = (chain ++ filler).zipWithIndex.toMap
    val w = chars.mkString
    val t0 = System.nanoTime()
    val toks = Pipelines.bpeEncodeWord(w, ranks)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(toks == Vector(w), s"expected full fusion, got ${toks.length} toks")
    assert(ms < 1000.0, s"encode of a $n-char word took $ms ms at 51k merges")
  }

  test("BPE: every fixture word round-trips through its segmentation") {
    val docs = Tables.documents(spark, sfDir)
    val table = Pipelines.bpeEncodingTable(docs, "text", numMerges = 30)
    assert(table.nonEmpty)
    table.foreach { case (w, toks, ids, n) =>
      assert(toks.split("\\|", -1).mkString == w, s"round-trip '$w'")
      assert(ids.split(",", -1).length.toLong == n)
      assert(!ids.split(",", -1).contains("-1"), s"unexpected OOV id in '$w'")
    }
  }

  test("tokenBudgetRates: closed-form two-stratum plan with a capped tail") {
    // en 90 tokens, de 10 → α=0.5 weights 3:1 (√.9 : √.1), p = .75/.25;
    // budget 50 → en target 37.5 (cut), de target 12.5 > 10 (capped)
    val df = ((1 to 9).map(i => (s"e$i", "en")) :+ (("d1", "de")))
      .map { case (id, l) => (id, Seq.fill(10)("w").mkString(" "), l) }
      .toDF("id", "text", "lang")
    val got = Pipelines.tokenBudgetRates(df, "lang", "text",
        budgetTokens = 50L)
      .collect().map(r => r.getString(0) -> r).toMap
    // local mirror of the engine's quantize-then-sum contract
    val we = math.round(math.sqrt(0.9) * 1e12)
    val wd = math.round(math.sqrt(0.1) * 1e12)
    def q(v: Double, dp: Int) =
      BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pe = we.toDouble / (we + wd)
    val en = got("en")
    assert(en.getLong(1) == 9L && en.getLong(2) == 90L)
    assert(en.getDouble(3) == q(pe, 6))
    assert(en.getDouble(4) == q(50.0 * pe, 4))
    assert(en.getDouble(5) == q(50.0 * pe / 90.0, 6) && !en.getBoolean(7))
    assert(en.getLong(6) == math.ceil(50.0 * pe / 90.0 * 256).toLong)
    val de = got("de")
    assert(de.getLong(2) == 10L && de.getDouble(5) == 1.0 &&
      de.getBoolean(7) && de.getLong(6) == 256L)
    intercept[IllegalArgumentException] {
      Pipelines.tokenBudgetRates(df, "lang", "text", budgetTokens = 0L)
    }
  }

  test("bpeFertility: hand-computed tokens-per-word by group") {
    // one merge (a,a): aa→[aa], ab→[a,b], b→[b], xyz→[x,y,z]
    val df = Seq((1L, "aa aa ab", "en"), (2L, "aa b", "fr"),
      (3L, "xyz xyz", "de")).toDF("doc_id", "text", "lang")
    val model = Pipelines.bpeTrainModel(df, "text", numMerges = 1)
    assert(model.merges == Seq("a" -> "a"))
    val got = Pipelines.bpeFertility(df, "doc_id", "text", "lang", model)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("en") == ((1L, 3L, 4L, BigDecimal(4.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got("fr") == ((1L, 2L, 2L, 1.0)))
    assert(got("de") == ((1L, 2L, 6L, 3.0))) // the 3x-cost language
  }

  test("distributed BPE trainer ≡ local trainer: merge sequence, model, and edge inputs") {
    // differential on the real fixture: same corpus, same merge count —
    // the distributed argmax loop must reproduce the local fold's
    // sequence exactly (counts, lexicographic tie-breaks, merge
    // application), and the full model (base chars included) must match
    val docs = Tables.documents(spark, sfDir)
    val n = Queries.BpeDistFixture.numMerges
    val local = Pipelines.bpeTrainModel(docs, "text", numMerges = n)
    val dist = Pipelines.bpeTrainModelDistributed(docs, "text", numMerges = n)
    assert(dist.merges == local.merges)
    assert(dist.baseChars == local.baseChars)
    assert(dist == local)

    // a hand-checked tie + repeat case: "aaa" counts (a,a) twice; after
    // the (a,a) merge the greedy pass leaves [aa, a], so round 2 sees
    // (aa, a) vs (a, b)-style leftovers exactly like the local trainer
    val tiny = Seq((1L, "aaa aaa ab"), (2L, "ab ba")).toDF("doc_id", "text")
    val wantTiny = Pipelines.bpeTrainMerges(
      Seq("aaa" -> 2L, "ab" -> 2L, "ba" -> 1L), 4)
    assert(Pipelines.bpeTrainMergesDistributed(tiny, "text", 4) == wantTiny)

    // edge trio: empty corpus → no merges (no throw); single-char words
    // only → no adjacent pair → early stop; numMerges = 0 → Nil
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Pipelines.bpeTrainMergesDistributed(empty, "text", 3) == Nil)
    val single = Seq((1L, "a b c a")).toDF("doc_id", "text")
    assert(Pipelines.bpeTrainMergesDistributed(single, "text", 3) == Nil)
    assert(Pipelines.bpeTrainMergesDistributed(docs, "text", 0) == Nil)
    // more rounds than mergeable pairs: stops at exhaustion, ≡ local
    val exhaust = Seq((1L, "ab ab")).toDF("doc_id", "text")
    assert(Pipelines.bpeTrainMergesDistributed(exhaust, "text", 5) ==
      Pipelines.bpeTrainMerges(Seq("ab" -> 2L), 5))

    // astral characters (surrogate pairs — any emoji): both trainers
    // split by CODE POINT, so symbols survive the executor's UTF8String
    // round-trip intact; two DISTINCT emoji must stay distinct symbols
    // (a per-UTF-16-unit split would mangle both to '?' and merge them)
    val g = "😀" // U+1F600
    val r = "🚀" // U+1F680
    val astral = Seq((1L, s"$g$g $g$g $r$r")).toDF("doc_id", "text")
    val wantAstral = Pipelines.bpeTrainMerges(
      Seq(s"$g$g" -> 2L, s"$r$r" -> 1L), 2)
    assert(wantAstral == Seq(g -> g, r -> r)) // distinct, count-ordered
    assert(Pipelines.bpeTrainMergesDistributed(astral, "text", 2) ==
      wantAstral)
    val mAstral = Pipelines.bpeTrainModelDistributed(astral, "text", 2)
    assert(mAstral.baseChars == Seq(g, r).sorted)
    assert(Pipelines.bpeEncodeWord(s"$g$g$r", mAstral.ranks) ==
      Vector(s"$g$g", r))
  }

  test("BPE tie-break: [U+E000,U+FFFF] vs astral symbols order by CODE POINT in both trainers") {
    // '豈' (one UTF-16 unit) vs '😀' (surrogate pair): Java's
    // String.compareTo puts the emoji FIRST (high surrogate 0xD83D <
    // 0xF900) while UTF8String/code-point order puts U+F900 first
    // (0xF900 < 0x1F600). On a count tie the two trainers must still
    // pick the SAME merge — both tie-break in code-point order.
    val f = "豈"
    val g = "😀"
    val words = Seq(s"x$f" -> 2L, s"x$g" -> 2L)
    val local = Pipelines.bpeTrainMerges(words, 1)
    assert(local == Seq("x" -> f), // the code-point-smaller pair wins
      s"local trainer broke the tie in UTF-16 order: $local")
    val df = Seq((1L, s"x$f x$g"), (2L, s"x$f x$g")).toDF("doc_id", "text")
    assert(Pipelines.bpeTrainMergesDistributed(df, "text", 1) == local)
    // the full sequences stay bit-equal past the tie round
    assert(Pipelines.bpeTrainMergesDistributed(df, "text", 3) ==
      Pipelines.bpeTrainMerges(words, 3))
    // the comparator itself: total order, prefix rule, astral boundary
    assert(Pipelines.codePointCompare(f, g) < 0)
    assert(Pipelines.codePointCompare(g, f) > 0)
    assert(Pipelines.codePointCompare("x", "x") == 0)
    assert(Pipelines.codePointCompare("x", s"x$f") < 0) // strict prefix
    assert(f.compareTo(g) > 0, // and the orders really do disagree
      "fixture no longer exercises the UTF-16 vs code-point divergence")
  }

  test("distributed unigram trainer ≡ capped trainer: fixture, astral corpus, edge params") {
    val docs = Tables.documents(spark, sfDir)
    val local = Pipelines.unigramTrainModel(docs, "text",
      vocabSize = Queries.UnigramFixture.vocabSize,
      maxPieceLen = Queries.UnigramFixture.maxPieceLen,
      emIters = Queries.UnigramFixture.emIters)
    val dist = Pipelines.unigramTrainModelDistributed(docs, "text",
      vocabSize = Queries.UnigramFixture.vocabSize,
      maxPieceLen = Queries.UnigramFixture.maxPieceLen,
      emIters = Queries.UnigramFixture.emIters)
    // bit-equal including the log-probs: identical exact counts feed
    // the same driver-side probability folds
    assert(dist == local)

    // astral corpus: the UTF-16 substring windows create LONE-surrogate
    // pieces (each half of an emoji), which a raw string column would
    // mangle to '?' in the distributed aggregation — the hex transport
    // must keep them distinct and the models equal
    val astral = Seq((1L, "😀😀 😀😀 🚀")).toDF("doc_id", "text")
    val la = Pipelines.unigramTrainModel(astral, "text",
      vocabSize = 8, maxPieceLen = 3, emIters = 2)
    val da = Pipelines.unigramTrainModelDistributed(astral, "text",
      vocabSize = 8, maxPieceLen = 3, emIters = 2)
    assert(la.pieces.exists(p =>
        p._1.length == 1 && Character.isSurrogate(p._1.charAt(0))),
      "fixture must actually exercise the lone-surrogate hazard")
    assert(da == la)

    // edges: tiny corpus, single EM round; empty corpus → empty model
    val single = Seq((1L, "a a b")).toDF("doc_id", "text")
    assert(Pipelines.unigramTrainModelDistributed(single, "text", 4, 2, 1) ==
      Pipelines.unigramTrainModel(single, "text", 4, 2, 1))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Pipelines.unigramTrainModelDistributed(empty, "text", 4, 2, 1)
      .pieces.isEmpty)
  }

  test("BPE artifact round-trip: save → fresh-session load → encode ≡ the training session") {
    val docs = Tables.documents(spark, sfDir)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpe_rt").toString
    // two versions in one table: v1 small, v2 the real model
    Pipelines.bpeSave(spark,
      Pipelines.bpeTrainModel(docs, "text", numMerges = 10), path, 1L)
    val model = Pipelines.bpeTrainModel(docs, "text", numMerges = 30)
    Pipelines.bpeSave(spark, model, path, 2L)
    // a SEPARATE job: fresh session (isolated conf), load latest
    val fresh = spark.newSession()
    val (loaded, v) = Pipelines.bpeLoad(fresh, path)
    assert(v == 2L)
    assert(loaded == model) // defining sequences round-trip exactly
    val want = Pipelines.bpeEncode(docs, "doc_id", "text", numMerges = 30)
      .orderBy("doc_id").collect().toSeq
    val got = Pipelines.bpeEncodeWith(
        Tables.documents(fresh, sfDir), "doc_id", "text", loaded)
      .orderBy("doc_id").collect().toSeq
    assert(got == want)
    // explicit-version load reaches the older artifact
    val (v1, _) = Pipelines.bpeLoad(fresh, path, Some(1L))
    assert(v1.merges.size <= 10 && v1.merges == model.merges.take(v1.merges.size))
    // re-save of an existing version replaces, never duplicates
    Pipelines.bpeSave(spark, model, path, 2L)
    assert(Pipelines.bpeLoad(fresh, path)._1 == model)
  }

  test("unigram LM: hand-checked Viterbi segmentation, longest-piece ties, OOV passthrough") {
    // vocab: chars a,b + piece "ab" with a strong probability — "abab"
    // must segment [ab, ab] (2 pieces beat 4 chars under any near-
    // uniform model); an unseen char rides through at the OOV penalty
    val model = Pipelines.UnigramModel(Seq(
      "a" -> math.log(0.2), "b" -> math.log(0.2), "ab" -> math.log(0.6)))
    assert(Pipelines.unigramEncodeWord("abab", model) == Vector("ab", "ab"))
    assert(Pipelines.unigramEncodeWord("ba", model) == Vector("b", "a"))
    assert(Pipelines.unigramEncodeWord("axb", model) == Vector("a", "x", "b"))
    assert(Pipelines.unigramEncodeWord("", model) == Vector.empty)
    // training end-to-end: repeated "ab" makes "ab" a learned piece
    val df = Seq((1L, "ab ab ab abb"), (2L, "ab ba")).toDF("doc_id", "text")
    val trained = Pipelines.unigramTrainModel(df, "text",
      vocabSize = 5, maxPieceLen = 2, emIters = 2)
    assert(trained.logProb.contains("ab"), trained.pieces.toString)
    val enc = Pipelines.unigramEncodeWith(df, "doc_id", "text", trained)
      .orderBy("doc_id").collect()
    // every word round-trips: pieces re-concatenate to the text
    assert(enc.map(r => r.getString(3).split("\\|").mkString
      .replace("|", "")).toSeq == Seq("ababababb", "abba"))
    // ids resolve within the model (no OOV on the training corpus)
    assert(enc.forall(!_.getString(4).split(",").contains("-1")))
  }

  test("unigramFertility: hand-computed tokens-per-word by group") {
    // model: "ab" a strong piece — "ab ab" segments 1 token per word
    // (fertility 1.0); "ba" has no piece, segments [b, a] (fertility 2)
    val model = Pipelines.UnigramModel(Seq(
      "a" -> math.log(0.2), "b" -> math.log(0.2), "ab" -> math.log(0.6)))
    val df = Seq((1L, "ab ab", "en"), (2L, "ba", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = Pipelines.unigramFertility(df, "doc_id", "text", "lang", model)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("en") == ((1L, 2L, 2L, 1.0)))
    assert(got("fr") == ((1L, 1L, 2L, 2.0)))
  }

  test("unigram artifact round-trip: save → fresh-session load → encode ≡ the training session") {
    val docs = Tables.documents(spark, sfDir)
    val path = java.nio.file.Files
      .createTempDirectory("graft_unigram_rt").toString
    val small = Pipelines.unigramTrainModel(docs, "text",
      vocabSize = 80, maxPieceLen = 3, emIters = 1)
    Pipelines.unigramSave(spark, small, path, 1L)
    val model = Pipelines.unigramTrainModel(docs, "text",
      vocabSize = Queries.UnigramFixture.vocabSize,
      maxPieceLen = Queries.UnigramFixture.maxPieceLen,
      emIters = Queries.UnigramFixture.emIters)
    Pipelines.unigramSave(spark, model, path, 2L)
    val fresh = spark.newSession()
    val (loaded, v) = Pipelines.unigramLoad(fresh, path)
    assert(v == 2L)
    assert(loaded == model) // defining (ord, piece, log_prob) rows exact
    val want = Pipelines.unigramEncodeWith(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect().toSeq
    val got = Pipelines.unigramEncodeWith(
        Tables.documents(fresh, sfDir), "doc_id", "text", loaded)
      .orderBy("doc_id").collect().toSeq
    assert(got == want)
    val (v1, _) = Pipelines.unigramLoad(fresh, path, Some(1L))
    assert(v1 == small)
    // idempotent re-save of an existing version
    Pipelines.unigramSave(spark, model, path, 2L)
    assert(Pipelines.unigramLoad(fresh, path)._1 == model)
  }

  test("urlNormalize: closed forms for every rule; urlDomain strips port and www") {
    val cases = Seq(
      // scheme+host lowercased, default port stripped, fragment dropped,
      // gclid dropped, surviving param kept, path case preserved
      ("HTTP://News.EXAMPLE.COM:80/A/B/?gclid=1&q=2#frag",
        "http://news.example.com/A/B?q=2", "news.example.com"),
      // https default port, utm_* dropped entirely → no '?', trailing slash
      ("https://WWW.Shop.com/items/7/?utm_campaign=c&utm_source=s",
        "https://www.shop.com/items/7", "shop.com"),
      // non-default port kept in url, stripped from domain; ref dropped
      ("https://blog.example.org:8080/p?id=3&ref=tw",
        "https://blog.example.org:8080/p?id=3", "blog.example.org"),
      // bare host, root path collapses, param order preserved
      ("https://Example.org/?b=2&a=1", "https://example.org?b=2&a=1", "example.org"),
      // :443 on http is NOT a default port → kept
      ("http://a.example:443/x/", "http://a.example:443/x", "a.example"))
    val df = cases.zipWithIndex.map { case ((u, _, _), i) => (i.toLong, u) }
      .toDF("id", "url")
    val out = df.select(col("id"), Pipelines.urlNormalize(col("url")).as("n"),
        Pipelines.urlDomain(col("url")).as("d"))
      .orderBy("id").as[(Long, String, String)].collect()
    cases.zipWithIndex.foreach { case ((_, expN, expD), i) =>
      assert(out(i)._2 == expN, s"norm case $i")
      assert(out(i)._3 == expD, s"domain case $i")
    }
  }

  test("domainStats: re-crawled URLs collapse in n_urls, not n_docs") {
    val df = Seq(
      (1L, "https://a.com/p?utm_source=x", "alpha beta", "en"),
      (2L, "https://A.com/p#f", "gamma delta", "en"),
      (3L, "https://a.com/q", "alpha beta", "fr"),
      (4L, "https://b.org/r", "epsilon", "en")).toDF("doc_id", "url", "text", "lang")
    val out = Pipelines.domainStats(df, "url", "text", "lang")
      .orderBy("domain").as[(String, Long, Long, Long, Double, Double, Long)]
      .collect()
    // a.com: 3 docs, 2 distinct normalized urls (1 and 2 collapse), one
    // verbatim text dup, two langs
    assert(out(0) == (("a.com", 3L, 2L, 6L, 2.0, 0.3333, 2L)))
    assert(out(1) == (("b.org", 1L, 1L, 1L, 1.0, 0.0, 1L)))
  }

  test("corpusDiff: added/removed/changed, null-vs-empty and split-point hashes distinct") {
    val oldV = Seq(
      (1L, Option("a"), Option("x")),   // unchanged
      (2L, Option("a"), Option("x")),   // removed
      (3L, Option("a"), Option("x")),   // changed value
      (4L, None: Option[String], Option("x")),  // null → "" must be CHANGED
      (5L, Option("a"), Option("bc"))   // ("a","bc") vs ("ab","c") must be CHANGED
    ).toDF("id", "c1", "c2")
    val newV = Seq(
      (1L, Option("a"), Option("x")),
      (3L, Option("b"), Option("x")),
      (4L, Option(""), Option("x")),
      (5L, Option("ab"), Option("c")),
      (6L, Option("a"), Option("x"))    // added
    ).toDF("id", "c1", "c2")
    val got = Pipelines.corpusDiff(oldV, newV, "id", Seq("c1", "c2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "removed", 3L -> "changed", 4L -> "changed",
      5L -> "changed", 6L -> "added"))
  }

  test("profileColumns: null and distinct counts, closed form") {
    val df = Seq(
      (Option("a"), Option(1)), (Option("a"), Option(2)),
      (Option("b"), None: Option[Int]), (None: Option[String], Option(2))
    ).toDF("s", "n")
    val got = Pipelines.profileColumns(df, Seq("s", "n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("s" -> ((1L, 2L)), "n" -> ((1L, 2L))))
  }

  test("quotaSampleByMd5: exact quota, deterministic winners, small strata kept whole") {
    val df = Seq.tabulate(40)(i => (i.toLong, if (i < 35) "big" else "small"))
      .toDF("id", "src")
    val got = Pipelines.quotaSampleByMd5(df, "src", "id", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(bySrc("big").size == 10)
    assert(bySrc("small") == (35L until 40L).toSet) // |stratum| < k: all kept
    // winners = the k smallest md5(id) per stratum, independently computed
    def h(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expBig = (0L until 35L).sortBy(i => (h(i), i)).take(10).toSet
    assert(bySrc("big") == expBig)
    // deterministic across runs
    val again = Pipelines.quotaSampleByMd5(df, "src", "id", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
  }

  test("quotaSampleByMd5TwoPhase ≡ single-window quota; plan shows per-shard partial top-k") {
    val df = Seq.tabulate(300)(i =>
      (i.toLong, if (i % 10 == 0) "small" else "mega")).toDF("id", "src")
    val single = Pipelines.quotaSampleByMd5(df, "src", "id", k = 25)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    for (shards <- Seq(1, 4, 32)) {
      val two = Pipelines.quotaSampleByMd5TwoPhase(df, "src", "id", k = 25,
          shards = shards)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(two == single, s"shards=$shards diverged")
    }
    // phase 1 must be a (stratum, shard)-partitioned window — the
    // whole point is that no single task ever sees a full mega-stratum
    val plan = Pipelines.quotaSampleByMd5TwoPhase(df, "src", "id", 25)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__shard"), s"expected sharded phase-1 window:\n$plan")
    assert("Window".r.findAllIn(plan).size >= 2, s"expected two windows:\n$plan")
  }

  test("weightedSampleByMd5: exact k, deterministic, w<=0 excluded, monotone in weight") {
    val df = Seq.tabulate(100)(i =>
      (i.toLong, if (i >= 96) 0.0 - (i - 96) else 1.0 + (i % 7))).toDF("id", "w")
    val got = Pipelines.weightedSampleByMd5(df, "id", "w", k = 20)
      .collect().map(_.getLong(0)).toSet
    assert(got.size == 20)
    assert(got.intersect((96L until 100L).toSet).isEmpty) // w <= 0 never sampled
    val again = Pipelines.weightedSampleByMd5(df, "id", "w", k = 20)
      .collect().map(_.getLong(0)).toSet
    assert(got == again)
    // A-ES matches a local reference: top-k of ln(u)/w with the same
    // md5-derived u, rounded key, id tie-break
    def u(id: Long): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h.substring(0, 13), 16) + 0.5) / 4503599627370496.0
    }
    def key(id: Long, w: Double): Double = java.math.BigDecimal
      .valueOf(math.log(u(id)) / w) // valueOf: Spark round's own path
      .setScale(10, java.math.RoundingMode.HALF_UP).doubleValue()
    val expect = Seq.tabulate(100)(i =>
        (i.toLong, if (i >= 96) 0.0 - (i - 96) else 1.0 + (i % 7)))
      .filter(_._2 > 0)
      .sortBy { case (id, w) => (-key(id, w), id) }.take(20).map(_._1).toSet
    assert(got == expect)
    // monotone: raising a WINNER's weight keeps it in the sample
    val winner = got.head
    val boosted = df.withColumn("w",
      when(col("id") === winner, col("w") * 100).otherwise(col("w")))
    val after = Pipelines.weightedSampleByMd5(boosted, "id", "w", k = 20)
      .collect().map(_.getLong(0)).toSet
    assert(after.contains(winner))
  }

  test("weightedQuotaSampleByMd5: per-stratum A-ES winners; sharded path identical") {
    val df = Seq.tabulate(120)(i =>
      (i.toLong, if (i % 3 == 0) "a" else "b",
        if (i >= 115 ) 0.0 else 1.0 + (i % 5))).toDF("id", "src", "w")
    val got = Pipelines.weightedQuotaSampleByMd5(df, "src", "id", "w", k = 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    // local reference: per-stratum top-8 by (rounded ln(u)/w desc, id)
    def u(id: Long): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h.substring(0, 13), 16) + 0.5) / 4503599627370496.0
    }
    def key(id: Long, w: Double): Double = java.math.BigDecimal
      .valueOf(math.log(u(id)) / w)
      .setScale(10, java.math.RoundingMode.HALF_UP).doubleValue()
    val expect = Seq.tabulate(120)(i =>
        (i.toLong, if (i % 3 == 0) "a" else "b",
          if (i >= 115) 0.0 else 1.0 + (i % 5)))
      .filter(_._3 > 0)
      .groupBy(_._2).toSeq.flatMap { case (src, rows) =>
        rows.sortBy { case (id, _, w) => (-key(id, w), id) }.take(8)
          .map(r => (r._1, src))
      }.sorted
    assert(got == expect)
    // the sharded escape hatch must pick identical winners
    for (shards <- Seq(4, 32)) {
      val sharded = Pipelines
        .weightedQuotaSampleByMd5(df, "src", "id", "w", k = 8, shards = shards)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(sharded == got, s"shards=$shards diverged")
    }
  }

  test("equiWidthHistogram: edges, max-in-last-bucket, degenerate and null handling") {
    val df = Seq[java.lang.Double](0.0, 1.0, 2.5, 5.0, 9.9, 10.0, null)
      .toDF("v")
    val got = Pipelines.equiWidthHistogram(df, "v", bins = 4)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSeq
    // width 2.5 over [0,10]: 0,1→b0; 2.5→b1; 5→b2; 9.9,10→b3 (max pinned)
    assert(got == Seq((0L, 0.0, 2.5, 2L), (1L, 2.5, 5.0, 1L),
      (2L, 5.0, 7.5, 1L), (3L, 7.5, 10.0, 2L)))
    // all-equal column: single bucket 0, no NaN
    val deg = Pipelines.equiWidthHistogram(
        Seq(7.0, 7.0, 7.0).toDF("v"), "v", bins = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(deg == Seq((0L, 3L)))
  }

  test("curationFunnel: stage counts match an independent recomputation") {
    val docs = Tables.documents(spark, sfDir)
    val got = Pipelines.curationFunnel(docs, "doc_id", "text", "source",
        minWords = 20, keep256 = 192)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // recompute per stage from the engine's own primitives, independently
    // composed: quality flags joined to source, exemplar ids via the
    // Dedup keep rule, sample via the md5 byte threshold
    val flags = graft.operators.TextAnalysis
      .gopherQualityFlags(docs, "doc_id", "text", minWords = 20)
      .select(col("doc_id"), col("passes"))
    val staged = docs.select("doc_id", "source").join(flags, "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val keepIds = staged.filter(_._3).groupBy(t => texts(t._1))
      .map { case (_, g) => g.map(_._1).min }.toSet
    def md5b(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((h(0).toLong & 0xff))
    }
    val exp = staged.groupBy(_._2).map { case (src, g) =>
      src -> ((g.length.toLong,
        g.count(_._3).toLong,
        g.count(t => keepIds(t._1)).toLong,
        g.count(t => keepIds(t._1) && md5b(t._1) < 192).toLong))
    }
    assert(got == exp)
    // funnel is monotone per source
    got.values.foreach { case (a, b, c, d) =>
      assert(a >= b && b >= c && c >= d)
    }
  }

  test("quantileBins: equal-population buckets, boundary ties go low, NULL in, approx agrees") {
    // 8 values into 4 bins: quartile bounds interpolate at 2.75/4.5/6.25
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0).map(Option(_))
      :+ Option.empty[Double])
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Pipelines.quantileBins(df, "v", nBins = 4)
      .orderBy("id").collect()
      .map(r => Option(r.get(2)).map(_.asInstanceOf[Int])).toSeq
    assert(got == Seq(Some(1), Some(1), Some(2), Some(2), Some(3),
      Some(3), Some(4), Some(4), None))
    // each non-degenerate bin holds n/nBins rows — the defining property
    val bins = Pipelines.quantileBins(
      (1 to 400).map(i => (i.toLong, (i * 7919 % 1000).toDouble))
        .toDF("id", "v"), "v", nBins = 8)
    val sizes = bins.groupBy("bin").count()
      .collect().map(_.getLong(1)).toSeq
    assert(sizes.length == 8 && sizes.forall(s => s >= 48 && s <= 52),
      sizes.toString)
    // a boundary that lands ON a repeated value sends ties to the
    // LOWER bin (strict v > b)
    // median position 3.5 sits between two 2.0s → boundary = 2.0 EXACTLY
    val tied = Seq(1.0, 2.0, 2.0, 2.0, 2.0, 9.0, 9.5, 9.9)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val tiedBins = Pipelines.quantileBins(tied, "v", nBins = 2)
      .orderBy("id").collect().map(_.getInt(2)).toSeq
    assert(tiedBins == Seq(1, 1, 1, 1, 1, 2, 2, 2))
    // approx mode classifies this well-separated fixture identically
    val approx = Pipelines.quantileBins(tied, "v", nBins = 2,
      approxAcc = 1000).orderBy("id").collect().map(_.getInt(2)).toSeq
    assert(approx == tiedBins)
  }

  test("skewReport: top-k heaviest keys, deterministic tie-break, exact shares") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm2") ++
      Seq.fill(3)("warm1") ++ Seq("cold1", "cold2"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "pay")
    val got = Pipelines.skewReport(df, Seq("k"), topK = 3)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
      .sortBy(_._1)
    // ties (warm1/warm2 at 3) break by key ASC; shares are n/14
    assert(got == Seq(
      (1, "hot", 6L, math.rint(6.0 / 14 * 1e6) / 1e6),
      (2, "warm1", 3L, math.rint(3.0 / 14 * 1e6) / 1e6),
      (3, "warm2", 3L, math.rint(3.0 / 14 * 1e6) / 1e6)))
  }

  test("robustOutliers: closed form, MAD-0 degenerate, approx mode agrees on clear outliers") {
    // group g: median 5, MAD 1 → 0.6745·(25−5)/1 = 13.49 flags; 6 stays
    val g = Seq(1.0, 3.0, 4.0, 5.0, 5.0, 6.0, 6.0, 7.0, 25.0).map(("g", _))
    // group c: 5 of 7 constant → MAD 0; both deviants flag, score NULL
    val c = Seq(2.0, 2.0, 2.0, 2.0, 2.0, 9.0, 0.5).map(("c", _))
    val df = (g ++ c).zipWithIndex
      .map { case ((k, v), i) => (i.toLong, k, v) }.toDF("id", "grp", "v")
    val got = Pipelines.robustOutliers(df, "grp", "v")
      .orderBy("id").collect()
      .map(r => (r.getString(1), r.getDouble(2), Option(r.get(5)))).toSeq
    assert(got.map(x => (x._1, x._2)) ==
      Seq(("g", 25.0), ("c", 9.0), ("c", 0.5)))
    val zg = got.head._3.get.asInstanceOf[Double]
    assert(math.abs(zg - 0.6745 * 20.0 / 1.0) < 1e-9)
    assert(got.tail.forall(_._3.isEmpty)) // MAD-0 scores are NULL
    // approx mode: same clear outliers on this fixture, no exact agg
    val approx = Pipelines.robustOutliers(df, "grp", "v", approxAcc = 1000)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(approx == Seq(8L, 14L, 15L))
  }

  test("checkExpectations: every rule type, exact metrics, both verdicts, empty-den convention") {
    import Pipelines.Expectation._
    val df = Seq(
      (1L, Option("a"), 1.0, "apple"),
      (2L, Option("b"), 2.0, "avocado"),
      (3L, Option.empty[String], 7.0, "banana"),
      (4L, Option("c"), 3.0, "apricot"),
      (5L, Option.empty[String], 9.0, "cherry")
    ).toDF("id", "s", "x", "txt")
      .withColumn("alln", lit(null).cast("string"))
    val got = Pipelines.checkExpectations(df, Seq(
        NotNull("s", maxNullFrac = 0.4),   // 2/5 nulls, at the edge → pass
        NotNull("s"),                      // default 0.0 → fail
        Unique("id"),                      // 5/5 → pass
        Unique("alln"),                    // 0-denominator → 1.0 → pass
        InRange("x", 0, 5, minFrac = 0.6), // 3/5 at the edge → pass
        // ANSI would THROW on cast('apple' as double); the gate must
        // not — unparseable counts as out-of-range (0/5 here)
        InRange("txt", 0, 5, minFrac = 0.5),
        MatchesRegex("txt", "^a", minFrac = 0.7), // 3/5 → fail
        InSet("txt", Seq("apple", "banana"), minFrac = 0.4))) // 2/5 → pass
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got == Seq(
      ("not_null", "s", 0.4, 0.4, true),
      ("not_null", "s", 0.4, 0.0, false),
      ("unique", "id", 1.0, 1.0, true),
      ("unique", "alln", 1.0, 1.0, true),
      ("in_range", "x", 0.6, 0.6, true),
      ("in_range", "txt", 0.0, 0.5, false),
      ("matches_regex", "txt", 0.6, 0.7, false),
      ("in_set", "txt", 0.4, 0.4, true)))
  }

  test("winsorize: interpolated band closed form, flags, singleton group untouched") {
    val df = ((1L to 100L).map(v => (v, "g", v.toDouble)) :+
      ((101L, "solo", 42.0))).toDF("id", "grp", "v")
    val out = Pipelines.winsorize(df, "grp", "v", pLo = 0.05, pHi = 0.95)
      .orderBy("id")
      .as[(Long, String, Double, Double, Double, Double, Boolean, Boolean)]
      .collect()
    // exact interpolating percentile over 1..100: p05 = 1 + 0.05·99,
    // p95 = 1 + 0.95·99
    val lo = 5.95; val hi = 95.05
    for ((id, _, v, gotLo, gotHi, clipped, fLo, fHi) <- out.take(100)) {
      assert(gotLo == lo && gotHi == hi, s"id=$id")
      assert(clipped == math.min(math.max(v, lo), hi), s"id=$id")
      assert(fLo == (v < lo) && fHi == (v > hi), s"id=$id")
    }
    assert(out.count(r => r._7) == 5 && out.count(r => r._8) == 5)
    // singleton group: band collapses to the value, nothing clips
    assert(out.last == ((101L, "solo", 42.0, 42.0, 42.0, 42.0, false, false)))
  }

  test("winsorize: approx mode clips to sketch elements, exact flags agree on well-separated data") {
    val df = (1L to 200L).map(v => (v, "g", v.toDouble)).toDF("id", "grp", "v")
    val exact = Pipelines.winsorize(df, "grp", "v", pLo = 0.05, pHi = 0.95)
    val approx = Pipelines.winsorize(df, "grp", "v", pLo = 0.05, pHi = 0.95,
      approxAcc = 10000)
    // sketch bounds are data ELEMENTS near the exact interpolated band
    val (elo, ehi) = (10.95, 190.05)
    val a = approx.select("lo", "hi").distinct().as[(Double, Double)].head()
    assert(math.abs(a._1 - elo) <= 1.0 && math.abs(a._2 - ehi) <= 1.0, a)
    assert(exact.where(col("clipped_lo")).count() == 10)
    assert(approx.where(col("clipped_lo")).count() >= 9)
  }

  test("benfordAudit: planted digits, expectation identity, exclusions") {
    // group g: values leading with 1,1,9 (0 and null excluded);
    // scientific-form value 0.00095 must lead with 9 as well
    val df = Seq(("g", Some(1.5)), ("g", Some(19.0)), ("g", Some(0.00095)),
      ("g", Some(0.0)), ("g", None), ("h", Some(2.0)))
      .toDF("grp", "v")
    val got = Pipelines.benfordAudit(df, "grp", "v")
      .orderBy("grp", "digit").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == Set(("g", 1L), ("g", 9L), ("h", 2L)))
    val (n1, p1, chi1) = got(("g", 1L))
    assert(n1 == 2L && p1 == 0.30103) // log10(2) @6dp
    // chi2 term: (2 - 3*log10(2))^2 / (3*log10(2))
    val e = 3.0 * math.log10(2.0)
    assert(math.abs(chi1 - math.pow(2.0 - e, 2) / e) < 1e-6)
    assert(got(("g", 9L))._1 == 1L)
    // expectations over all 9 digits sum to 1
    val full = Seq.tabulate(9)(d => ("z", (d + 1).toDouble)).toDF("grp", "v")
    val ps = Pipelines.benfordAudit(full, "grp", "v")
      .agg(sum("expected_p")).collect().head.getDouble(0)
    assert(math.abs(ps - 1.0) < 1e-4)
  }

  test("giniConcentration: uniform → 0, single-holder → (n−1)/n, totals exact") {
    val df = Seq(
      ("a", 1L, 2.5), ("a", 2L, 2.5), ("a", 3L, 2.5), ("a", 4L, 2.5),
      ("b", 1L, 0.0), ("b", 2L, 0.0), ("b", 3L, 0.0), ("b", 4L, 8.0),
      ("c", 1L, 3.0), ("c", 1L, 4.0) // per-key totals sum before ranking
    ).toDF("grp", "k", "v")
    val got = Pipelines.giniConcentration(df, "grp", "k", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got("a") == ((4L, 10.0, 0.0)))
    assert(got("b") == ((4L, 8.0, 0.75))) // (n-1)/n at n=4
    assert(got("c") == ((1L, 7.0, 0.0)))  // one key: no inequality
  }

  test("binnedMutualInfo: identity → MI = H and redundancy 1, independence → 0, nonlinear dependence caught") {
    val ident = (for (x <- 0 until 4; _ <- 0 until 8)
      yield (x.toDouble, x.toDouble)).toDF("x", "y")
    val r1 = Pipelines.binnedMutualInfo(ident, "x", "y").collect().head
    assert(r1.getLong(0) == 32L)
    assert(math.abs(r1.getDouble(1) - math.log(4.0)) < 1e-6)
    assert(r1.getDouble(4) == 1.0) // MI ≡ min marginal entropy
    val ind = (for (x <- 0 until 4; y <- 0 until 4; _ <- 0 until 2)
      yield (x.toDouble, y.toDouble)).toDF("x", "y")
    val r2 = Pipelines.binnedMutualInfo(ind, "x", "y").collect().head
    assert(r2.getDouble(1) == 0.0 && r2.getDouble(4) == 0.0)
    // y = (x − 1.5)²: Pearson ≈ 0, but the binned MI sees it
    val nl = (for (x <- 0 until 4; _ <- 0 until 4)
      yield (x.toDouble, (x - 1.5) * (x - 1.5))).toDF("x", "y")
    val r3 = Pipelines.binnedMutualInfo(nl, "x", "y").collect().head
    assert(math.abs(r3.getDouble(1) - math.log(2.0)) < 1e-6)
  }

  test("weightedQuantile: weight-shifted median, p binding, positive-weight guard") {
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0),
      ("g", 4.0, 7.0)).toDF("grp", "v", "w")
    def q(p: Double) = Pipelines
      .weightedQuantile(df, "grp", "v", "w", p)
      .collect().head
    val med = q(0.5)
    assert(med.getLong(1) == 4L && med.getDouble(2) == 10.0 &&
      med.getDouble(3) == 4.0) // the heavy tail owns the median
    assert(q(0.3).getDouble(3) == 3.0) // cum weights 1,2,3,10
    assert(q(0.1).getDouble(3) == 1.0)
    val bad = Seq(("g", 1.0, 0.0)).toDF("grp", "v", "w")
    intercept[Exception] {
      Pipelines.weightedQuantile(bad, "grp", "v", "w", 0.5).collect()
    }
  }

  test("twap: hold-until-next integral, zero-span NULL, null values dropped") {
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val ev = Seq(
      (1L, ts(0), 1L, Some(10.0)), (1L, ts(10), 2L, Some(20.0)),
      (1L, ts(30), 3L, Some(99.0)),          // last event: no weight
      (2L, ts(0), 4L, Some(5.0)),            // single event: zero span
      (3L, ts(0), 5L, Some(1.0)), (3L, ts(5), 6L, None), // null drops
      (3L, ts(10), 7L, Some(3.0))
    ).toDF("user_id", "ts", "event_id", "value")
    val got = graft.operators.EventAnalytics
      .twap(ev, "user_id", "ts", "event_id", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // u1: (10·10 + 20·20) / 30 = 16.666667
    assert(got(1L) == ((3L, 30.0, Some(16.666667))))
    assert(got(2L) == ((1L, 0.0, None)))
    // u3: the NULL row vanishes — value 1.0 holds the full 10 s
    assert(got(3L) == ((2L, 10.0, Some(1.0))))
  }

  test("correlationMatrix: perfect linear ±1, constant column NULL, listwise n") {
    val df = Seq(
      (Some(1.0), Some(2.0), Some(-1.0), Some(7.0)),
      (Some(2.0), Some(4.0), Some(-2.0), Some(7.0)),
      (Some(3.0), Some(6.0), Some(-3.0), Some(7.0)),
      (None, Some(9.0), Some(9.0), Some(9.0)) // dropped listwise
    ).toDF("a", "b", "c", "k")
    val got = Pipelines.correlationMatrix(df, Seq("a", "b", "c", "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got.size == 6)
    assert(got(("a", "b")) == ((3L, Some(1.0))))   // y = 2x
    assert(got(("a", "c")) == ((3L, Some(-1.0))))  // y = -x
    assert(got(("a", "k"))._2.isEmpty)             // zero variance
    assert(got(("b", "c")) == ((3L, Some(-1.0))))
  }

  test("diversityStats: uniform classes → evenness 1, single class → H 0 and NULL evenness") {
    val df = Seq(("s1", "en"), ("s1", "fr"), ("s1", "en"), ("s1", "fr"),
      ("s2", "en"), ("s2", "en")).toDF("src", "lang")
    val got = Pipelines.diversityStats(df, "src", "lang")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    val (n1, k1, h1, s1, e1) = got("s1")
    assert(n1 == 4L && k1 == 2L)
    assert(math.abs(h1 - math.log(2.0)) < 1e-6)
    assert(s1 == 0.5 && e1 == Some(1.0))
    val (n2, k2, h2, s2, e2) = got("s2")
    assert(n2 == 2L && k2 == 1L && h2 == 0.0 && s2 == 1.0 && e2.isEmpty)
  }

  test("rankingMetrics: hand-checked p/r/MRR/NDCG, unjudged query, beyond-k relevance") {
    // q1: judged docs a(g=3), b(g=1), c(g=2); run ranks b=1, x=2, a=3,
    //     c=6 (beyond k) → hits@5 = 2 (b, a), first rel at rank 1
    // q2: no judged docs → n_rel 0, r/ndcg NULL, rr 0
    val run = Seq(
      ("q1", "b", 1L), ("q1", "x", 2L), ("q1", "a", 3L), ("q1", "y", 4L),
      ("q1", "z", 5L), ("q1", "c", 6L),
      ("q2", "a", 1L), ("q2", "b", 2L)).toDF("query", "doc", "rank")
    val qrels = Seq(("q1", "a", 3L), ("q1", "b", 1L), ("q1", "c", 2L))
      .toDF("query", "doc", "grade")
    val got = Pipelines.rankingMetrics(run, qrels, "query", "doc", "rank",
        "grade", k = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getDouble(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    def dcgTerm(g: Long, r: Long): Double =
      math.round((math.pow(2.0, g.toDouble) - 1.0) /
        (math.log(r.toDouble + 1.0) / math.log(2.0)) * 1e12).toDouble
    val dcg = dcgTerm(1, 1) + dcgTerm(3, 3)          // b@1, a@3; c beyond k
    val idcg = dcgTerm(3, 1) + dcgTerm(2, 2) + dcgTerm(1, 3)
    val (nRel1, nRet1, p1, r1, rr1, ndcg1) = got("q1")
    assert(nRel1 == 3L && nRet1 == 6L)
    assert(p1 == 0.4 && r1 == Some(BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(rr1 == 1.0)
    assert(ndcg1 == Some(BigDecimal(dcg / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble), got("q1"))
    val (nRel2, nRet2, p2, r2, rr2, ndcg2) = got("q2")
    assert(nRel2 == 0L && nRet2 == 2L && p2 == 0.0 && r2.isEmpty &&
      rr2 == 0.0 && ndcg2.isEmpty)
  }

  test("calibrationBins: exact per-bin stats and ECE on a hand frame") {
    // bin 0: scores 0.0, 0.05 labels 0,0 → mean 0.025, rate 0
    // bin 9: scores 0.9, 1.0 labels 1,0 → 1.0 clamps into bin 9 (LEAST)
    val df = Seq((0.0, 0L), (0.05, 0L), (0.9, 1L), (1.0, 0L))
      .toDF("score", "label")
    val got = Pipelines.calibrationBins(df, "score", "label", bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(got.keySet == Set(0L, 9L))
    val (n0, m0, f0, g0, e0) = got(0L)
    assert(n0 == 2L && m0 == 0.025 && f0 == 0.0 && g0 == -0.025)
    val (n9, m9, f9, g9, e9) = got(9L)
    assert(n9 == 2L && m9 == 0.95 && f9 == 0.5 && g9 == -0.45)
    // ECE = (2/4)·0.025 + (2/4)·0.45 = 0.2375, identical on every row
    assert(e0 == 0.2375 && e9 == 0.2375)
  }

  test("rankingMetrics: a judged query the run never returned still gets a zero-score row") {
    // trec_eval parity: a system returning zero rows for a judged query
    // must appear with zero scores, not vanish from the macro-average
    val run = Seq(("q1", "a", 1L)).toDF("query", "doc", "rank")
    val qrels = Seq(("q1", "a", 2L), ("q3", "z", 1L))
      .toDF("query", "doc", "grade")
    val got = Pipelines.rankingMetrics(run, qrels, "query", "doc", "rank",
        "grade", k = 5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("q1", "q3"), got.toString)
    val r3 = got("q3")
    assert(r3.getLong(1) == 1L && r3.getLong(2) == 0L)  // n_rel, n_ret
    assert(r3.getDouble(3) == 0.0 && r3.getDouble(4) == 0.0) // p@k, r@k
    assert(r3.getDouble(5) == 0.0)                      // rr
    assert(r3.getDouble(6) == 0.0)                      // ndcg (idcg > 0)
    val r1 = got("q1")
    assert(r1.getLong(1) == 1L && r1.getLong(2) == 1L &&
      r1.getDouble(6) == 1.0)
  }

  test("calibrationBins/rocAuc: out-of-range scores clamp to edge bins, never negative bin ids") {
    val df = Seq((-0.5, 0L), (-0.1, 1L), (0.25, 1L), (1.2, 1L))
      .toDF("score", "label")
    val got = Pipelines.calibrationBins(df, "score", "label", bins = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3)))
      .toMap
    assert(got.keySet == Set(0L, 2L, 9L), got.toString) // no bin < 0
    assert(got(0L) == ((2L, 0.5)))   // both clamped-low rows, one positive
    assert(got(9L)._1 == 1L)
    // rocAuc: three negs and one pos tie in clamped bin 0 (half credit),
    // two clamped-high positives top the order → tie-aware AUC 15/18
    val auc = Pipelines.rocAuc(
      Seq((-0.2, 0L), (-0.2, 0L), (-0.3, 0L), (-0.1, 1L), (1.5, 1L),
        (1.5, 1L)).toDF("score", "label"),
      "score", "label", bins = 4).collect().head
    assert(auc.getLong(0) == 3L && auc.getLong(1) == 3L)
    assert(auc.getDouble(2) == BigDecimal(15.0 / 18.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, auc.toString)
  }

  test("temporalSplitAudit: straddling keys counted once, leaky rows are test-side only") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // k=1 train-only, k=2 straddles (1 train + 2 test), k=3 test-only
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-02 00:00:00")),
      (2L, ts("2024-01-03 00:00:00")), (2L, ts("2024-01-10 00:00:00")),
      (2L, ts("2024-01-11 00:00:00")),
      (3L, ts("2024-01-12 00:00:00"))).toDF("k", "t")
    val r = Pipelines.temporalSplitAudit(df, "k", "t", "2024-01-05 00:00:00")
      .collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)   // n_train, n_test
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L)   // train/test keys
    assert(r.getLong(4) == 1L && r.getDouble(5) == 0.5) // shared, frac
    assert(r.getLong(6) == 2L)                          // k=2's test rows
    assert(r.getDouble(7) == BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("psiDrift: identical sides read 0, a shifted distribution alarms, empty side is NULL") {
    val docs = Tables.documents(spark, sfDir).select(col("n_chars"))
    val same = Pipelines.psiDrift(docs, docs, "n_chars").collect().head
    assert(same.getDouble(2) == 0.0, same.toString) // p = q per bin exactly
    // current side shifted +3σ-ish: mass moves across bins, PSI > 0.25
    val shifted = Pipelines.psiDrift(docs,
      docs.select((col("n_chars") + 150L).as("n_chars")), "n_chars")
      .collect().head
    assert(shifted.getDouble(2) > 0.25, shifted.toString)
    val empty = Pipelines.psiDrift(docs.where(lit(false)), docs, "n_chars")
      .collect().head
    assert(empty.getLong(0) == 0L && empty.isNullAt(2), empty.toString)
  }

  test("groupedKFold: folds partition groups, assignment is content-addressed") {
    val ev = Tables.events(spark, sfDir)
    val folded = Pipelines.groupedKFold(ev, "user_id", k = 5)
    // no group straddles folds
    assert(folded.groupBy("user_id")
      .agg(countDistinct(col("fold")).as("nf"))
      .where(col("nf") > 1).count() == 0L)
    // total, in-range, and stable across runs
    assert(folded.where(col("fold").isNull || col("fold") < 0 ||
      col("fold") >= 5).count() == 0L)
    val again = Pipelines.groupedKFold(ev, "user_id", k = 5)
    assert(folded.select("event_id", "fold")
      .exceptAll(again.select("event_id", "fold")).count() == 0L)
    intercept[IllegalArgumentException] {
      Pipelines.groupedKFold(ev, "user_id", k = 1)
    }
  }

  test("zipfFit: exact ranks recover a planted power law; uniform corpus reads slope 0") {
    // freq(token_r) = 2^(10−r) → ln f = 10·ln2 − ln2·... no: plant
    // f(r) = round(1000 / r) for r = 1..8 → slope ≈ −1, r² ≈ 1
    val rows = (1 to 8).flatMap { r =>
      Seq.fill(1000 / r)(s"tok$r")
    }
    val df = rows.map(t => Tuple1(t)).toDF("text")
    val fit = graft.operators.TextAnalysis.zipfFit(df, "text", topN = 8)
      .collect().head
    assert(fit.getLong(0) == 8L)
    assert(math.abs(fit.getDouble(1) + 1.0) < 0.02, fit.toString) // slope ≈ −1
    assert(fit.getDouble(3) > 0.999, fit.toString)                // r² ≈ 1
    // uniform frequencies: vy = 0 → slope 0, r² NULL
    val uni = (1 to 6).flatMap(r => Seq.fill(10)(s"u$r"))
      .map(t => Tuple1(t)).toDF("text")
    val ufit = graft.operators.TextAnalysis.zipfFit(uni, "text", topN = 6)
      .collect().head
    assert(ufit.getDouble(1) == 0.0 && ufit.isNullAt(3), ufit.toString)
  }

  test("rocAuc: perfect separation reads 1, anti-separation 0, within-bin ties half") {
    // perfect: all positives above all negatives (distinct bins)
    val perfect = Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L))
      .toDF("score", "label")
    assert(Pipelines.rocAuc(perfect, "score", "label")
      .collect().head.getDouble(2) == 1.0)
    val anti = Seq((0.9, 0L), (0.8, 0L), (0.2, 1L), (0.1, 1L))
      .toDF("score", "label")
    assert(Pipelines.rocAuc(anti, "score", "label")
      .collect().head.getDouble(2) == 0.0)
    // one bin, 1 pos + 1 neg tied → AUC 0.5 (the tie-half rule);
    // single-class input → NULL
    val tied = Seq((0.5, 1L), (0.5, 0L)).toDF("score", "label")
    assert(Pipelines.rocAuc(tied, "score", "label")
      .collect().head.getDouble(2) == 0.5)
    val mono = Seq((0.5, 1L), (0.6, 1L)).toDF("score", "label")
    assert(Pipelines.rocAuc(mono, "score", "label").collect().head.isNullAt(2))
    // hand case: pos at bins {3,1}, neg at {2,0} → concordant 3,
    // discordant 1 of 4 pairs → AUC 0.75
    val hand = Seq((3.5 / 1024, 1L), (1.5 / 1024, 1L), (2.5 / 1024, 0L),
      (0.5 / 1024, 0L)).toDF("score", "label")
    assert(Pipelines.rocAuc(hand, "score", "label")
      .collect().head.getDouble(2) == 0.75)
  }

  test("calibrationBins/rankingMetrics: reserved-column clash fails loud") {
    intercept[IllegalArgumentException] {
      Pipelines.calibrationBins(
        Seq((0.1, 1L, 2L)).toDF("score", "label", "bin"),
        "score", "label")
    }
    intercept[IllegalArgumentException] {
      Pipelines.rankingMetrics(
        Seq(("q", "d", 1L, 9L)).toDF("query", "doc", "rank", "n_rel"),
        Seq(("q", "d", 1L)).toDF("query", "doc", "grade"),
        "query", "doc", "rank", "grade", k = 5)
    }
  }
}
