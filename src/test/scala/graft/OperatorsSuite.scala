package graft

import graft.operators.{Dedup, Joins, Multimodal, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-vs-SQL differential tests: each custom operator must equal a
  * straightforward (non-scalable) SQL formulation of the same semantics. */
class OperatorsSuite extends AnyFunSuite {
  import TestSpark.{sfDir, spark}
  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def eventsView(): Unit =
    Tables.events(spark, sfDir).createOrReplaceTempView("ev")

  test("J8 as-of join equals the correlated-subquery formulation (Q13)") {
    eventsView()
    val sql = spark.sql(
      """SELECT e1.event_id,
        |  (SELECT MAX(e2.ts) FROM ev e2
        |   WHERE e2.user_id = e1.user_id AND e2.ts < e1.ts) AS prev_ts
        |FROM ev e1""".stripMargin)
    assert(rows(Queries.q13(spark, sfDir)) == rows(sql))
  }

  test("J7 range join equals the theta-join formulation (Q12)") {
    eventsView()
    val sql = spark.sql(
      """SELECT e1.event_id, COUNT(*) AS followers FROM ev e1 JOIN ev e2
        |ON e1.user_id = e2.user_id AND e2.ts > e1.ts
        |  AND e2.ts <= e1.ts + INTERVAL 10 MINUTES
        |GROUP BY e1.event_id""".stripMargin)
    assert(rows(Queries.q12(spark, sfDir)) == rows(sql))
  }

  test("L2 MinHash-LSH finds every exact-Jaccard pair at tau=0.6 here") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 50)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.6)
      .select("d1", "d2")
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", 0.6)
      .select("d1", "d2")
    // LSH candidates are verified with exact Jaccard → subset always holds;
    // with 32 bands × r=2 recall at 0.6 is ~1.0 on this corpus.
    assert(lsh.exceptAll(exact).count() == 0L)
    assert(exact.exceptAll(lsh).count() == 0L)
  }

  /** In-test reference: plain union-find over an edge list. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the component MIN (union always kept the min root)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("L6 connectedComponents equals union-find on seeded random graphs") {
    import spark.implicits._
    for (seed <- Seq(42, 7)) {
      val rnd = new scala.util.Random(seed)
      val n = 300
      val edges = Seq.fill(250)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(n, edges)
      // default path (driver union-find at this size) and the forced
      // distributed pointer-jumping loop must both match the reference —
      // the differential guard for the small-graph fast path
      val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotDist = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b",
          driverEdgeCap = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // operator labels only vertices that appear in an edge
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet == touched)
      assert(gotDist == got, s"seed=$seed: distributed/fast-path labels differ")
      touched.foreach(v => assert(got(v) == expected(v), s"seed=$seed v=$v"))
    }
  }

  test("L6 connectedComponents collapses a 200-node path in O(log n) rounds") {
    import spark.implicits._
    // worst-case diameter: naive min-propagation needs 200 rounds; the
    // hub phase must collapse it within the maxIter=50 budget (the
    // require() inside the operator fails the test otherwise)
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val before = spark.sparkContext.getPersistentRDDs.size
    // driverEdgeCap = 0 forces the distributed loop — this test is ABOUT
    // the loop's round count and checkpoint hygiene, which the default
    // small-graph fast path would skip entirely
    val got = Dedup.connectedComponents(chain, "a", "b", driverEdgeCap = 0L)
      .collect()
    assert(got.length == 200 && got.forall(_.getLong(1) == 0L))
    // each round localCheckpoints; the loop must unpersist as it goes —
    // only the final labels checkpoint may stay pinned, not O(log d) of
    // them (the 200-node path runs the most rounds of any test here)
    val leaked = spark.sparkContext.getPersistentRDDs.size - before
    assert(leaked <= 1, s"connectedComponents leaked $leaked persistent RDDs")
  }

  test("L6 LSH pair recall holds at the x_dedup_clusters fixture (tau=0.8, 200 docs)") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 200)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.8).select("d1", "d2")
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", 0.8).select("d1", "d2")
    assert(lsh.exceptAll(exact).count() == 0L)
    assert(exact.exceptAll(lsh).count() == 0L)
  }

  test("L6 nearDupClusters equals union-find over exact pairs (incl. singletons)") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 200)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.8)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val uf = unionFind(ids.max.toInt + 1, pairs)
    val expLabel = ids.map(i => i -> uf(i)).toMap
    val expSize = expLabel.values.groupBy(identity).map { case (c, vs) => c -> vs.size.toLong }
    val got = Dedup.nearDupClusters(docs, "doc_id", "text", tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == ids.length)
    got.foreach { case (id, c, sz) =>
      assert(c == expLabel(id), s"doc $id cluster")
      assert(sz == expSize(c), s"doc $id csize")
    }
  }

  test("L6 cosineClusters equals union-find over cosine near-dup pairs (incl. singletons)") {
    val emb = Tables.embeddings(spark, sfDir)
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", tau = 0.4)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty, "fixture must produce at least one cosine pair at tau=0.4")
    val uf = unionFind(ids.max.toInt + 1, pairs)
    val expLabel = ids.map(i => i -> uf(i)).toMap
    val expSize = expLabel.values.groupBy(identity).map { case (c, vs) => c -> vs.size.toLong }
    val got = Similarity.cosineClusters(emb, "vec_id", "embedding", tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == ids.length)
    got.foreach { case (id, c, sz) =>
      assert(c == expLabel(id), s"vec $id cluster")
      assert(sz == expSize(c), s"vec $id csize")
    }
  }

  test("L5 mediaNearDupPairs equals brute all-pairs hamming over mediaPHash") {
    import graft.operators.Multimodal
    val docs = Multimodal.withBinaryPayload(
      Tables.documents(spark, sfDir), "text")
    val fps = Multimodal.mediaPHash(docs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fps.nonEmpty, "fingerprints must exist")
    val exp = (for {
      (d1, h1) <- fps; (d2, h2) <- fps
      if d1 < d2 && java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield (d1, d2, java.lang.Long.bitCount(h1 ^ h2).toLong)).toSet
    assert(exp.nonEmpty,
      "fixture must produce at least one pHash pair at hamming <= 3")
    val got = Multimodal.mediaNearDupPairs(docs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp, s"banded vs brute mismatch: ${(got diff exp) ++ (exp diff got)}")
  }

  test("L-semdedup semDeDup equals local brute-force within-cell prune") {
    val emb = Tables.embeddings(spark, sfDir)
    val cs = Similarity.ivfTrain(emb, "vec_id", "embedding",
      nCells = 16, lloydIters = 2, trainCap = 4096)
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val vecs = emb
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val local = vecs.map { case (id, v) =>
      val cell = Similarity.nearestCell(v, cs)
      val cv = cs(cell)
      val nrm = math.sqrt(dot(v, v))
      val u = if (nrm == 0) v else v.map(_ / nrm)
      (id, cell, round4(dot(v, cv) / (nrm * math.sqrt(dot(cv, cv)))), u)
    }
    val expDropped = local.filter { case (id, cell, cc, u) =>
      local.exists { case (id2, cell2, cc2, u2) =>
        id2 != id && cell2 == cell &&
          (cc2 < cc || (cc2 == cc && id2 < id)) && dot(u, u2) >= 0.4
      }
    }.map(_._1).toSet
    assert(expDropped.nonEmpty,
      "fixture must exercise the prune at tau=0.4 (else the test is vacuous)")
    val got = Similarity.semDeDup(emb, "vec_id", "embedding", tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.length == local.length, "one output row per input vector")
    val gotBy = got.map(t => t._1 -> t).toMap
    local.foreach { case (id, cell, cc, _) =>
      val (_, gCell, gCc, gKeep) = gotBy(id)
      assert(gCell == cell.toLong, s"vec $id cell")
      assert(gCc == cc, s"vec $id cent_cos")
      assert(gKeep == !expDropped(id), s"vec $id keep")
    }

    // D4 on the same fold: survivors ranked per cell by (cent_cos desc,
    // id asc); top ceil(0.1 · n_kept) become 'proto', dup set unchanged
    val localBy = local.map(t => t._1 -> t).toMap
    val kept = local.filter(t => !expDropped(t._1))
    val expStage: Map[Long, String] =
      kept.groupBy(_._2).toSeq.flatMap { case (_, cellRows) =>
        val n = cellRows.length
        val cut = math.ceil(0.1 * n).toLong
        cellRows.sortBy(t => (-t._3, t._1)).zipWithIndex.map {
          case ((id, _, _, _), i) =>
            id -> (if (i + 1 <= cut) "proto" else "kept")
        }
      }.toMap ++ expDropped.map(_ -> "dup").toMap
    val gotD4 = Similarity.d4Prune(emb, "vec_id", "embedding",
        tau = 0.4, dropFrac = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(gotD4.length == local.length)
    assert(gotD4.count(_._4 == "proto") > 0, "prototype cut must fire")
    gotD4.foreach { case (id, cell, cc, stage) =>
      val (_, eCell, eCc, _) = localBy.getOrElse(id,
        fail(s"unexpected vec $id"))
      assert(cell == eCell.toLong && cc == eCc, s"vec $id cell/cent_cos")
      assert(stage == expStage(id), s"vec $id stage")
    }
  }

  test("L4 bm25TopDocs equals local brute-force BM25 (scores, order, ranks)") {
    import graft.operators.TextAnalysis
    val query = Seq("vector", "stream", "merge")
    val k1 = 1.2; val b = 0.75
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    // same token semantics as the operator: split keeps empty tokens
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = docs.size.toDouble
    val avgdl = toks.values.map(_.length.toDouble).sum / n
    val df = query.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
    def score(id: Long): Double = {
      val raw = query.map { t =>
        val tf = toks(id).count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * tf * (k1 + 1.0) /
          (tf + (toks(id).length / avgdl * b + (1.0 - b)) * k1)
      }.sum
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = docs.map(_._1).filter(id => query.exists(toks(id).contains))
      .map(id => (id, score(id))).sortBy { case (id, s) => (-s, id) }
      .take(10).zipWithIndex.map { case ((id, s), i) => (id, s, i + 1L) }
    val got = TextAnalysis.bm25TopDocs(
        Tables.documents(spark, sfDir), "doc_id", "text", query, k = 10)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("L6 approx (LSH-only) clusters coarsen verified clusters at equal banding") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 200)
    val nDocs = docs.count()
    val edges = Dedup.minHashLshStarEdges(docs, "doc_id", "text",
      numHashes = 128, bands = 16)
    assert(edges.count() <= 16 * nDocs, "star edges must be O(bands × docs)")
    val approx = Dedup.nearDupClustersApprox(docs, "doc_id", "text",
        numHashes = 128, bands = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.size == nDocs)
    // every pair the verified path emits at the SAME banding shares a
    // band bucket, so the star graph connects it through that bucket's
    // min — the approx labeling may merge more, never split
    val verified = Dedup.minHashLshPairs(docs, "doc_id", "text", tau = 0.8,
        numHashes = 128, bands = 16)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(verified.nonEmpty) // fixture sanity: property must not pass vacuously
    verified.foreach { case (a, b) =>
      assert(approx(a) == approx(b), s"verified pair ($a,$b) split across approx clusters")
    }
  }

  test("L2 SimHash multi-index: 30-bit table keys collapse the random-collision front") {
    // The scale story of the Manku block-combination scheme is the KEY
    // WIDTH: random collisions run at ~n²·tables/2^(key bits), so the
    // 6-block default (C(6,3)=20 tables on 30-bit keys) pays 5x the
    // explode of the 4-block degenerate case (4 tables on 15-bit keys)
    // to cut the collision rate 2^15/5 ≈ 6500x — the difference between
    // a front that saturates at ~10^5 docs and one good to web scale.
    // Corpus: random-token docs, fingerprints ~uniform, NO true dups —
    // every candidate is a random collision. At n=4000, 15-bit keys
    // expect ~n²·4/2^16 ≈ 980 candidates; 30-bit keys expect ~0.15.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0 until 4000).map { i =>
      (i.toLong, Seq.fill(40)(rnd.nextLong().toHexString).mkString(" "))
    }.toDF("doc_id", "text")
    def front(blocks: Int): Long =
      Dedup.simHashCandidatePairs(docs, "doc_id", "text",
        maxHamming = 3, blocks = blocks).count()
    val (narrow, wide) = (front(4), front(6))
    assert(narrow > 100,
      s"fixture sanity: 15-bit keys should collide plenty, got $narrow")
    assert(wide < narrow / 20,
      s"30-bit keys should shrink the front >20x: $narrow -> $wide")
  }

  test("L2 SimHash banded pairs ≡ brute all-pairs hamming (pigeonhole exactness)") {
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 150)
    val banded = rows(Dedup.simHashNearDupPairs(docs, "doc_id", "text"))
    val sh = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (d1, h1) <- sh; (d2, h2) <- sh if d1 < d2
      hd = java.lang.Long.bitCount(h1 ^ h2) if hd <= 3
    } yield org.apache.spark.sql.Row(d1, d2, hd.toLong).toString).sorted.toSeq
    assert(banded.nonEmpty, "fixture sanity: some near-identical docs expected")
    assert(banded == brute)
  }

  test("L2 SimHash: near-identical docs collide, disjoint docs differ") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // 1 token swap
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val sh = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)))
    assert(hamming(sh(1L), sh(2L)) <= 16)
  }

  test("L3 knnJoin per query ≡ single-query cosineTopK (two-phase dominance)") {
    val emb = Tables.embeddings(spark, sfDir)
    val knn = Similarity.knnJoin(emb.where(col("vec_id") < 3), emb,
      "vec_id", "embedding", k = 7)
    for (qid <- 0L until 3L) {
      val perQuery = knn.where(col("qid") === qid).orderBy("rk")
        .select("vec_id", "cos").collect().map(_.toString).toSeq
      val single = Similarity.cosineTopK(emb, "vec_id", "embedding", qid, 7)
        .collect().map(_.toString).toSeq
      assert(perQuery == single, s"qid=$qid")
    }
  }

  test("L3q int8 quantization: code bounds, error ≤ scale/2, exact-grid identity, zero vector, fixture fidelity") {
    import spark.implicits._
    // hand vectors: an exact grid (multiples of its own scale → zero
    // error, fidelity 1), a generic vector, and the zero vector
    val hand = Seq(
      (1L, Seq(127.0, -127.0, 0.0, 63.5)),   // scale 1; 63.5 rounds HALF_UP
      (2L, Seq(0.3, -0.2, 0.05, 0.0)),
      (3L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(hand, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Byte](1), r.getDouble(2)))).toMap
    assert(q(1L)._2 == 1.0 && q(1L)._1 == Seq[Byte](127, -127, 0, 64))
    assert(q(3L)._2 == 0.0 && q(3L)._1.forall(_ == 0))
    assert(q.values.forall(_._1.forall(b => b >= -127 && b <= 127)))
    val audit = Similarity.int8QuantAudit(hand, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r).toMap
    // exact grid: 127.0/-127.0/0.0 reconstruct exactly; 63.5 → 64 errs 0.5
    assert(audit(1L).getDouble(1) == 1.0 &&
      audit(1L).getDouble(2) == 0.5)
    assert(audit(3L).getDouble(2) == 0.0 && audit(3L).isNullAt(3))
    // the contract: max_abs_err ≤ scale/2 (+ ulp), fidelity high, on
    // the real fixture corpus
    val fix = Similarity.int8QuantAudit(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding").collect()
    assert(fix.nonEmpty)
    fix.foreach { r =>
      // scale and err are both reported at 6 dp — allow the half-step
      // of that rounding on top of the analytic scale/2 bound
      assert(r.getDouble(2) <= r.getDouble(1) / 2 + 5e-7, r.toString)
      if (!r.isNullAt(3)) assert(r.getDouble(3) >= 0.999, r.toString)
    }
    // quantized retrieval holds the fixture's top-10 ranking: the int8
    // top-10 ids match the float top-10 (cos_fid ≥ 0.999 end-to-end)
    val emb = Tables.embeddings(spark, sfDir)
    val recon = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .select(col("vec_id"),
        Similarity.int8Reconstruct(col("qvec"), col("scale"))
          .as("embedding"))
    val floatTop = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val int8Top = Similarity.cosineTopK(recon, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert((floatTop & int8Top).size >= 8,
      s"int8 recall ${(floatTop & int8Top).size}/10")
  }

  test("L1i incremental near-dup vs PERSISTED bands ≡ live-banded form; generation replace is idempotent") {
    val docs = Tables.documents(spark, sfDir)
    val delta = docs.where(col("doc_id").between(100, 119))
      .select((col("doc_id") + 10000L).as("doc_id"),
        concat(lit("re "), col("text")).as("text"))
    val seenA = docs.where(col("doc_id") < 200).select("doc_id", "text")
    val seenB = docs.where(col("doc_id") >= 200 && col("doc_id") < 400)
      .select("doc_id", "text")
    val seen = seenA.unionByName(seenB)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bands").toString
    // two generation appends of the banded projection
    Dedup.writeBandKeys(seenA, "doc_id", "text", path, 0L)
    Dedup.writeBandKeys(seenB, "doc_id", "text", path, 1L)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val live = key(Dedup.incrementalNearDupPairs(
      delta, seen, "doc_id", "text", tau = 0.8))
    val persisted = key(Dedup.incrementalNearDupPairsWithBands(
      delta, "doc_id", "text", spark.read.parquet(path), seen, tau = 0.8))
    assert(persisted == live && live.nonEmpty)
    // replaying a generation's bands replaces its partition (dynamic
    // overwrite) — never duplicates candidates
    Dedup.writeBandKeys(seenB, "doc_id", "text", path, 1L)
    assert(key(Dedup.incrementalNearDupPairsWithBands(
      delta, "doc_id", "text", spark.read.parquet(path), seen,
      tau = 0.8)) == live)
    // empty band table (no generations landed yet) → no pairs
    val emptyBands = spark.read.parquet(path).where(lit(false))
    assert(key(Dedup.incrementalNearDupPairsWithBands(
      delta, "doc_id", "text", emptyBands, seen, tau = 0.8)).isEmpty)
  }

  test("L1i incremental near-dup ≡ exact cross-corpus pairwise; no within-side pairs") {
    val docs = Tables.documents(spark, sfDir)
    val delta = docs.where(col("doc_id").between(100, 119))
      .select((col("doc_id") + 10000L).as("doc_id"),
        concat(lit("re "), col("text")).as("text"))
      .unionByName(docs.where(col("doc_id") >= 400 && col("doc_id") < 450)
        .select("doc_id", "text"))
    val seen = docs.where(col("doc_id") < 400).select("doc_id", "text")
    val got = Dedup.incrementalNearDupPairs(delta, seen, "doc_id", "text",
        tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // exact reference: brute cross pairwise on collected token sets
    def tokset(s: String) = s.split(" ", -1).toSet
    val dl = delta.collect().map(r => r.getLong(0) -> tokset(r.getString(1)))
    val sn = seen.collect().map(r => r.getLong(0) -> tokset(r.getString(1)))
    val expected = (for {
      (di, dt) <- dl; (si, st) <- sn
      j = (dt & st).size.toDouble / (dt | st).size
      if j >= 0.8
    } yield (di, si,
      BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(got == expected,
      s"sym diff: ${(got diff expected).take(3)} / ${(expected diff got).take(3)}")
    assert(got.nonEmpty)
    // asymmetry: every pair is delta-on-the-left (the re-crawl ids and
    // fresh ids only), seen-on-the-right
    val deltaIds = dl.map(_._1).toSet
    assert(got.forall { case (d1, s1, _) =>
      deltaIds.contains(d1) && !deltaIds.contains(s1) })
  }

  test("L3 hardNegatives ≡ knnJoin restricted to cross-label rows; labels always differ") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where(col("vec_id") < 4)
    val got = Similarity.hardNegatives(queries, emb,
      "vec_id", "embedding", "label", k = 8)
    // labels of every (query, negative) pair differ
    val lbl = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pairs = got.select("qid", "vec_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (q, n, _) => lbl(q) != lbl(n) })
    // rk contiguous 1..k per query
    pairs.groupBy(_._1).values.foreach { ps =>
      assert(ps.map(_._3).sorted.toSeq == (1L to ps.length).toSeq)
    }
    // differential: equals knnJoin over a corpus pre-filtered to the
    // query's label complement, per query
    for (q <- 0L until 4L) {
      val mine = got.where(col("qid") === q).orderBy("rk")
        .select("vec_id", "cos").collect().map(_.toString).toSeq
      val ref = Similarity.knnJoin(queries.where(col("vec_id") === q),
          emb.where(col("label") =!= lbl(q)), "vec_id", "embedding", k = 8)
        .orderBy("rk").select("vec_id", "cos").collect().map(_.toString).toSeq
      assert(mine == ref, s"qid=$q")
    }
  }

  test("L3 annKnnJoin: candidates are a bucket-pruned subset; re-rank order matches brute on the overlap") {
    val emb = Tables.embeddings(spark, sfDir)
    // wide probing for the near-orthogonal fixture (see annTopK test)
    val ann = Similarity.annKnnJoin(emb.where(col("vec_id") < 3), emb,
      "vec_id", "embedding", k = 10, planes = 4, probeRadius = 2)
    val brute = Similarity.knnJoin(emb.where(col("vec_id") < 3), emb,
      "vec_id", "embedding", k = 10)
    for (qid <- 0L until 3L) {
      val a = ann.where(col("qid") === qid).orderBy("rk")
        .select("vec_id", "cos").collect().map(r => (r.getLong(0), r.getDouble(1)))
      val b = brute.where(col("qid") === qid).orderBy("rk")
        .select("vec_id", "cos").collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert((a.map(_._1).toSet & b.map(_._1).toSet).size >= 5, s"qid=$qid recall")
      // every ANN hit scores no better than the brute hit of the same rank
      a.zip(b).foreach { case ((_, ac), (_, bc)) =>
        assert(ac <= bc, s"qid=$qid ann cos $ac beat brute $bc") }
    }
  }

  test("L3s semanticDecontam: planted verbatim leaks caught at probe 0, orthogonal corpus stays clean") {
    val emb = Tables.embeddings(spark, sfDir)
    val bench = emb.where(col("vec_id") < 8)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val got = Similarity.semanticDecontam(emb, bench, "vec_id", "embedding",
        tau = 0.9, planes = 8, probeRadius = 1, dim = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // every planted duplicate flagged with its own re-keyed twin at 1.0
    (0L until 8L).foreach { i =>
      assert(got.get(i) == Some((1000000L + i, 1.0)), s"vec $i: ${got.get(i)}")
    }
    // the near-orthogonal rest of the corpus stays below tau = 0.9
    assert(got.keySet == (0L until 8L).toSet, got.keySet.toSeq.sorted.take(20))
    // max_by tie-break: duplicate benchmark rows (same vector twice)
    // resolve to the SMALLEST benchmark id
    val bench2 = bench.union(bench
      .select((col("vec_id") + 500L).as("vec_id"), col("embedding")))
    val tie = Similarity.semanticDecontam(emb.where(col("vec_id") < 8),
        bench2, "vec_id", "embedding", tau = 0.9, planes = 8,
        probeRadius = 1, dim = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    (0L until 8L).foreach { i =>
      assert(tie(i) == ((1000000L + i, 2L)), s"tie vec $i: ${tie(i)}")
    }
  }

  test("L3 annKnnJoin: empty query side fails fast; explicit dim equals inferred") {
    val emb = Tables.embeddings(spark, sfDir)
    val ex = intercept[IllegalArgumentException] {
      Similarity.annKnnJoin(emb.where(col("vec_id") < 0), emb,
        "vec_id", "embedding", k = 3)
    }
    assert(ex.getMessage.contains("non-empty query side"))
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val inferred = Similarity.annKnnJoin(emb.where(col("vec_id") < 2), emb,
      "vec_id", "embedding", k = 5, planes = 4, probeRadius = 2)
    val explicit = Similarity.annKnnJoin(emb.where(col("vec_id") < 2), emb,
      "vec_id", "embedding", k = 5, planes = 4, probeRadius = 2, dim = dim)
    assert(rows(inferred).nonEmpty && rows(inferred) == rows(explicit))
  }

  test("scale-replica copyTag preserves nulls and prefixes non-nulls") {
    import spark.implicits._
    val tagged = Seq(Some("hello world"), None).toDF("text")
      .select(ScaleSmoke.copyTag(col("text"), 2).as("text"))
      .collect().map(r => Option(r.getString(0))).toSet
    assert(tagged == Set(Some("c2 hello world"), None))
  }

  test("L3 ANN top-k overlaps brute-force top-k") {
    val emb = Tables.embeddings(spark, sfDir)
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // fixture embeddings are near-orthogonal (max cos ≈ 0.5), so use wide
    // probing: 4 planes, hamming ≤ 2 → ~0.9 per-item candidate probability
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", 0L, 10,
        planes = 4, probeRadius = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((brute & ann).size >= 5, s"brute=$brute ann=$ann")
  }

  test("codegen DotProduct equals the higher-order formulation bitwise") {
    import graft.expressions.VectorExpressions.fastDot
    import graft.functions.VectorFunctions
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = emb.select(
      fastDot(col("v"), col("v")).as("native"),
      VectorFunctions.dot(col("v"), col("v")).as("hof"))
    assert(both.where(col("native") =!= col("hof")).count() == 0L)
    // and it runs inside the generated code path (no interpreted fallback)
    both.collect()
  }

  test("L3 IVF top-k overlaps brute-force top-k and is deterministic") {
    val emb = Tables.embeddings(spark, sfDir)
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    def ivf() = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10,
        nCells = 8, nProbe = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val a = ivf()
    // probing half the cells on a diffuse corpus: expect solid overlap
    assert((brute & a.toSet).size >= 5, s"brute=$brute ivf=$a")
    assert(a == ivf()) // seeded training → same result every run
  }

  test("L3 versioned ANN index artifacts: save/load round-trips bit-identically; loud on corrupt/missing versions") {
    val emb = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_idx")

    // IVF: the loaded centroids are BIT-identical (doubles round-trip
    // parquet exactly) and the routed top-k matches the train-session's
    val cs = Similarity.ivfTrain(emb, "vec_id", "embedding",
      nCells = 8, lloydIters = 2, trainCap = 4096)
    Similarity.ivfSave(spark, cs, s"$dir/ivf", 1L)
    Similarity.ivfSave(spark, cs, s"$dir/ivf", 1L) // replay: idempotent
    val (csBack, v1) = Similarity.ivfLoad(spark, s"$dir/ivf")
    assert(v1 == 1L)
    assert(csBack.length == cs.length &&
      csBack.zip(cs).forall { case (a, b) => a.sameElements(b) })
    val fresh = Similarity.ivfTopKWith(emb, "vec_id", "embedding",
      0L, 10, csBack, nProbe = 4).collect().map(r =>
        (r.getLong(0), r.getDouble(1))).toSeq
    val trained = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10,
      nCells = 8, nProbe = 4).collect().map(r =>
        (r.getLong(0), r.getDouble(1))).toSeq
    assert(fresh == trained)
    // version semantics: latest wins; explicit absent version is loud
    Similarity.ivfSave(spark, cs.take(4), s"$dir/ivf", 2L)
    assert(Similarity.ivfLoad(spark, s"$dir/ivf")._1.length == 4)
    assert(Similarity.ivfLoad(spark, s"$dir/ivf", Some(1L))._1.length == 8)
    val eAbsent = intercept[IllegalArgumentException](
      Similarity.ivfLoad(spark, s"$dir/ivf", Some(9L)))
    assert(eAbsent.getMessage.contains("no rows"), eAbsent.getMessage)
    // empty input is loud at save time, not a corrupt artifact later
    intercept[IllegalArgumentException](
      Similarity.ivfSave(spark, Array.empty, s"$dir/ivf_e", 1L))

    // PQ: same contract; a RAGGED artifact (a lost codebook row) is
    // refused at load, never silently mis-scored
    val cbs = Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 4, ks = 8, lloydIters = 2, trainCap = 4096)
    Similarity.pqSave(spark, cbs, s"$dir/pq", 1L)
    val (cbsBack, _) = Similarity.pqLoad(spark, s"$dir/pq")
    assert(cbsBack.length == cbs.length && cbsBack.zip(cbs).forall {
      case (a, b) => a.zip(b).forall { case (x, y) => x.sameElements(y) }
    })
    val pqFresh = Similarity.pqTopKWith(emb, "vec_id", "embedding",
      0L, 10, cbsBack).collect().map(r =>
        (r.getLong(0), r.getDouble(1))).toSeq
    val pqTrained = Similarity.pqTopK(emb, "vec_id", "embedding", 0L, 10,
      m = 4, ks = 8).collect().map(r =>
        (r.getLong(0), r.getDouble(1))).toSeq
    assert(pqFresh == pqTrained)
    val ragged = spark.read.parquet(s"$dir/pq")
      .where(!(col("sub") === 2 && col("code") === 3))
    ragged.drop("version").write.parquet(s"$dir/pq_ragged/version=1")
    val eRagged = intercept[IllegalArgumentException](
      Similarity.pqLoad(spark, s"$dir/pq_ragged"))
    assert(eRagged.getMessage.contains("not dense"), eRagged.getMessage)

    // IVFADC through BOTH loaded structures ≡ the trained composition
    val adcFresh = Similarity.ivfadcTopKWith(emb, "vec_id", "embedding",
      0L, 10, csBack, cbsBack, nProbe = 4).collect().map(r =>
        (r.getLong(0), r.getDouble(1))).toSeq
    val adcTrained = Similarity.ivfadcTopK(emb, "vec_id", "embedding",
      0L, 10, nCells = 8, nProbe = 4, m = 4, ks = 8).collect().map(r =>
        (r.getLong(0), r.getDouble(1))).toSeq
    assert(adcFresh == adcTrained)
  }

  test("L4 fingerprint is order-sensitive (reordered tokens differ)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val fp = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"),
        (3L, "alpha beta gamma"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) != fp(2L)) // a set-hash would collide these
    assert(fp(1L) == fp(3L)) // deterministic
  }

  test("L4 winnowing: shared substring >= k+w-1 shares a fingerprint; identical docs share all") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val shared = "SHAREDSUBSTRINGXYZ" // 18 chars >= k+w-1 = 11
    val docs = Seq(
      (1L, s"aaaa quick brown $shared lazy dog"),
      (2L, s"zzzz other prefix text $shared different tail"),
      (3L, s"aaaa quick brown $shared lazy dog"), // verbatim copy of 1
      (4L, "completely unrelated content with no overlap at all"),
      (5L, "tiny")) // shorter than k=8: one gram, one window
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // winnowing guarantee: a window of w grams inside the shared region
    // exists in both docs, so its min gram hash appears in both
    assert((fps(1L) & fps(2L)).nonEmpty)
    assert(fps(1L) == fps(3L)) // deterministic, content-addressed
    assert((fps(1L) & fps(4L)).isEmpty) // disjoint texts, disjoint fps
    assert(fps(5L).size == 1) // whole-text fingerprint for short docs
  }

  test("L4 winnowNearDupPairs: overlap pairs found, boilerplate prune drops universal fps") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val shared = "COMMONBOILERPLATEHEADER" // in every doc → pruned at maxDocFreq 2
    val overlap = "UNIQUESHAREDPASSAGEHERE" // in docs 1,2 only
    val docs = Seq(
      (1L, s"$shared alpha $overlap tail one"),
      (2L, s"$shared beta $overlap tail two"),
      (3L, s"$shared gamma wholly different content here")).toDF("doc_id", "text")
    // maxDocFreq=2: fps from the 3-doc boilerplate are dropped, the
    // 2-doc overlap passage survives → only (1,2) pairs up
    val pairs = TextAnalysis.winnowNearDupPairs(docs, "doc_id", "text",
        minShared = 1, maxDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)), pairs.mkString(","))
    // without the prune, the boilerplate links all three docs
    val all = TextAnalysis.winnowNearDupPairs(docs, "doc_id", "text",
        minShared = 1, maxDocFreq = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == Set((1L, 2L), (1L, 3L), (2L, 3L)), all.mkString(","))
  }

  test("L1 incrementalExactDedup ≡ plain anti-join; bloom prefilter in plan; empty-seen passes all") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val seen = (0 until 200).map(i => (i.toLong, s"seen doc ${rnd.nextInt(120)}")).toDF("doc_id", "text")
    // delta: half fresh, half verbatim copies of seen texts under new ids
    val delta = ((0 until 50).map(i => (1000L + i, s"fresh doc $i")) ++
      (0 until 50).map(i => (2000L + i, s"seen doc ${rnd.nextInt(120)}")))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalExactDedup(delta, seen, "text", "text", 1000L)
    val want = delta.join(
      seen.select(md5(col("text")).as("__sh")).distinct(),
      md5(delta("text")) === col("__sh"), "left_anti")
    assert(got.select("doc_id").exceptAll(want.select("doc_id")).count() == 0)
    assert(want.select("doc_id").exceptAll(got.select("doc_id")).count() == 0)
    assert(got.count() > 0 && got.count() < delta.count()) // both paths live
    // the bloom probe is in the plan as a native expression, not a UDF
    // (analyzed plan: ConvertToLocalRelation pre-evaluates filters over
    // these Seq-backed inputs in the physical plan; the parquet-backed
    // fixture keeps it physical — asserted below)
    assert(got.queryExecution.analyzed.toString.contains("might_contain"),
      got.queryExecution.analyzed.toString.take(2000))
    val fixturePlan = Queries.xIncrementalDedup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(fixturePlan.contains("might_contain"), fixturePlan.take(2000))
    // empty seen corpus → everything is new
    val emptySeen = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.incrementalExactDedup(delta, emptySeen, "text", "text", 10L)
      .count() == delta.count())
    // past maxBloomItems the operator must self-switch to the keyed
    // anti-join: identical rows, and NO bloom literal in the plan
    val joined = Dedup.incrementalExactDedup(delta, seen, "text", "text",
      expectedSeen = 1000L, expectedDelta = 1L << 20, maxBloomItems = 10L)
    assert(joined.select("doc_id").exceptAll(got.select("doc_id")).count() == 0)
    assert(got.select("doc_id").exceptAll(joined.select("doc_id")).count() == 0)
    assert(!joined.queryExecution.analyzed.toString.contains("might_contain"))
    // and the public fallback is that same path
    val direct = Dedup.incrementalExactDedupJoin(delta, seen, "text", "text")
    assert(direct.select("doc_id").exceptAll(got.select("doc_id")).count() == 0)
    assert(got.select("doc_id").exceptAll(direct.select("doc_id")).count() == 0)
  }

  test("L4 decontaminationJoin flags the leaked eval doc and only it") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val leaked = "THISEXACTEVALPASSAGELEAKEDINTOTRAINING"
    val eval = Seq(
      (1L, s"eval question one $leaked end"),
      (2L, "a clean eval item with original content")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, s"scraped page blah $leaked blah footer"),
      (11L, "unrelated training document text")).toDF("doc_id", "text")
    val hits = TextAnalysis.decontaminationJoin(eval, corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSet == Set((1L, 10L)), hits.mkString(","))
  }

  test("L6 keepBestPerCluster picks argmax score, ties to min id, one row per cluster") {
    import spark.implicits._
    val clusters = Seq((1L, 1L, 3L), (2L, 1L, 3L), (5L, 1L, 3L), (7L, 7L, 1L))
      .toDF("doc_id", "cluster_id", "csize")
    val scored = Seq((1L, 0.5), (2L, 0.9), (5L, 0.9), (7L, 0.3))
      .toDF("doc_id", "q")
    val reps = Dedup.keepBestPerCluster(clusters, scored, "doc_id", "q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    // cluster 1: docs 2 and 5 tie at 0.9 → min id 2 wins; singleton keeps itself
    assert(reps.toSeq == Seq((1L, 2L, 0.9, 3L), (7L, 7L, 0.3, 1L)))
  }

  test("L3 int8 quantization: |q| <= 127 and dequant error within the half-step bound") {
    val rows = Queries.xEmbedQuant(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qmin, qmax) = (r.getLong(2), r.getLong(3))
      val scaleR = r.getDouble(4); val maxerr = r.getDouble(5)
      assert(qmin >= -127 && qmax <= 127, r.toString)
      // err <= half a quantization step (1/(2*scale)); 1e-4 absolute
      // slack because the reported maxerr is itself rounded to 4 decimals
      assert(maxerr <= 0.5 / scaleR + 1e-4, r.toString)
    }
  }

  test("L5 sampleFrames slices exact frame windows; resize hits target length deterministically") {
    import spark.implicits._
    val docs = Seq((1L, "a" * 200), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
        Multimodal.withBinaryPayload(docs, "text"), "doc_id",
        frameBytes = 64, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    // 200 bytes → 3 full frames (0,1,2), stride 2 → frames 0 and 2;
    // docs shorter than one frame yield nothing
    assert(frames.map(f => (f._1, f._2)).toSeq.sorted == Seq((1L, 0), (1L, 2)))
    assert(frames.forall(_._3.length == 64))
    assert(frames.find(f => f._2 == 2).get._3.toSeq ==
      ("a" * 200).getBytes("UTF-8").slice(128, 192).toSeq)
    val resized = Multimodal.resizePayloads(
        Multimodal.withBinaryPayload(docs, "text"), "doc_id", targetBytes = 32)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(resized(1L).length == 32 && resized(2L).length == 32)
    assert(resized(3L).length == 0) // empty stays empty
    assert(resized(2L).toSeq == Multimodal.resizeStub("xy".getBytes, 32).toSeq)
  }

  test("multimodal meta: stub width/height in range and deterministic") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val meta = Multimodal.withMeta(Multimodal.withBinaryPayload(docs, "text"))
      .select(col("meta.width").as("w"), col("meta.height").as("h"))
    val rows1 = meta.collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows1.forall { case (w, h) => w >= 1 && w <= 1920 && h >= 1 && h <= 1080 })
    val rows2 = meta.collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows1.toSeq == rows2.toSeq)
  }

  test("L3 embedding near-dup: LSH candidate front ≡ exact all-block-pairs") {
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      tau = 0.4, exactAllPairs = true)
    val front = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      tau = 0.4)
    // defaults (2 bits × 64 bands) put row-pair recall at ~1-1e-14 for
    // cos ≥ 0.4; candidates are verified exactly, so equality must hold
    assert(rows(front) == rows(exact))
  }

  test("L3 embedding near-dup: LSH front at nBlocks=4096 (past the exact-mode cap)") {
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      tau = 0.4, exactAllPairs = true)
    // the 100 TB shape: many small blocks (bounded per-task arrays); the
    // pair set is independent of the blocking, so output must be unchanged
    val front4k = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      tau = 0.4, nBlocks = 4096)
    assert(rows(front4k) == rows(exact))
    // the driver-side enumeration cap only binds the exact mode
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        tau = 0.4, nBlocks = 4096, exactAllPairs = true)
    }
  }

  test("L3 embedding near-dup: LSH front PRUNES on a clustered corpus at tau=0.7") {
    // The fixture embeddings are near-orthogonal (max cos ≈ 0.51), so the
    // prior equivalence tests never exercise the regime the docstring
    // promises: on CLUSTERED data at high tau, raising bitsPerBand makes
    // the candidate front a small fraction of all block pairs. Corpus:
    // 100 tight clusters × 20 members (dim 64, noise σ=0.005 → member
    // cosine ≈ 0.998), seeded and deterministic.
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val emb = (0 until 100).flatMap { c =>
      val center = unit(Array.fill(64)(rnd.nextGaussian()))
      (0 until 20).map { m =>
        (c * 20L + m, unit(center.map(_ + 0.005 * rnd.nextGaussian())))
      }
    }.toDF("vec_id", "embedding")
    val (nBlocks, bitsPerBand, bands) = (1024, 16, 16)
    val normed = Similarity.nearDupNormed(emb, "vec_id", "embedding",
      nBlocks, bitsPerBand, bands)
    val candidates = Similarity.lshCandidateBlockPairs(normed).count()
    val allBlockPairs = nBlocks.toLong * (nBlocks + 1) / 2
    // the scale-path claim: candidates ≪ nBlocks²/2 (here: under 10%)
    assert(candidates < allBlockPairs / 10,
      s"front did not prune: $candidates of $allBlockPairs block pairs")
    // and pruning must not cost recall: LSH output ≡ exhaustive block pairs
    val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      tau = 0.7, nBlocks = nBlocks, exactAllPairs = true)
    val lsh = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      tau = 0.7, nBlocks = nBlocks, bitsPerBand = bitsPerBand, bands = bands)
    val nExact = exact.count()
    // all 100·C(20,2) within-cluster pairs clear tau, nothing else does
    assert(nExact == 100L * 190, s"expected 19000 clustered pairs, got $nExact")
    assert(rows(lsh) == rows(exact))
  }

  test("L3 embedding near-dup: candidate front grows ~linearly when nBlocks tracks corpus size") {
    // The 100 TB sizing rule (Similarity scaladoc) is nBlocks ∝ corpus,
    // keeping per-block size — and so per-candidate cost — constant. Under
    // that rule the candidate BLOCK-PAIR count must grow ~linearly with
    // the corpus on clustered data; quadratic growth here is exactly the
    // blow-up ScaleSmoke can't see (its fixture is isotropic, where
    // pruning is impossible by semantics). 4× corpus with 4× blocks:
    // linear ⇒ ~4× candidates; assert <8× (quadratic would be ~16×).
    import spark.implicits._
    def clustered(nClusters: Int, seed: Int) = {
      val rnd = new scala.util.Random(seed)
      def unit(v: Array[Double]) = {
        val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
      }
      (0 until nClusters).flatMap { c =>
        val center = unit(Array.fill(64)(rnd.nextGaussian()))
        (0 until 20).map { m =>
          (c * 20L + m, unit(center.map(_ + 0.005 * rnd.nextGaussian())))
        }
      }.toDF("vec_id", "embedding")
    }
    def candidates(nClusters: Int, nBlocks: Int): (Long, Long) = {
      val emb = clustered(nClusters, seed = 13)
      val normed = Similarity.nearDupNormed(emb, "vec_id", "embedding",
        nBlocks, bitsPerBand = 16, bands = 16)
      val cand = Similarity.lshCandidateBlockPairs(normed).count()
      // output pair count doubles as a recall check: every within-cluster
      // pair clears tau=0.7, nothing else does, and the exact post-filter
      // admits no false positives — a lossy front would come up short
      val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        tau = 0.7, nBlocks = nBlocks, bitsPerBand = 16, bands = 16).count()
      (cand, pairs)
    }
    val (cSmall, pSmall) = candidates(50, 512)
    val (cBig, pBig) = candidates(200, 2048)
    assert(pSmall == 50L * 190, s"recall gap at 1x: $pSmall")
    assert(pBig == 200L * 190, s"recall gap at 4x: $pBig")
    val growth = cBig.toDouble / cSmall
    assert(growth < 8.0,
      s"candidate front grew ${growth}x on 4x corpus ($cSmall -> $cBig): super-linear")
  }

  test("multimodal decode: batched features are deterministic + unit-norm") {
    val docs = Tables.documents(spark, sfDir).limit(20)
    val withPayload = Multimodal.withBinaryPayload(docs, "text")
    val f1 = Multimodal.decodeFeatures(withPayload, "doc_id", dim = 16)
    val norms = f1.select(aggregate(col("feature"), lit(0.0),
        (acc, x) => acc + x * x).as("n2"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-9))
    assert(rows(f1) == rows(Multimodal.decodeFeatures(withPayload, "doc_id", 16)))
  }

  test("CDC ingest: envelope round-trip preserves fields, derives UTC+8 date") {
    val out = Queries.xCdcIngest(spark, sfDir).collect()
    assert(out.length == 25)
    val first = out.head
    assert(first.getLong(0) == 0L)
    // 2024-01-01 00:00 UTC + 8h → 2024-01-01 local date
    assert(first.getString(3) == "2024-01-01")
    // +16 days later: UTC date 2024-01-17, +8h stays 17th
    assert(out(16).getString(3) == "2024-01-17")
  }

  test("L4 repetitionStats measures crafted repetition exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb\naa bb\ncc dd"),
      (2L, "x y x y x y z"),
      (3L, "one two three four five one two three four five six")
    ).toDF("id", "t")
    val out = graft.operators.TextAnalysis.repetitionStats(docs, "id", "t")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 3 lines, "aa bb" twice → 1/3 dup lines, 10/15 dup line chars;
    // bigram "aa bb" occurs 2× (5 chars) over 17 text chars; no dup 5-gram
    assert(out(1L).getLong(1) == 3L)
    assert(out(1L).getDouble(2) == 0.3333)
    assert(out(1L).getDouble(3) == 0.6667)
    assert(out(1L).getDouble(4) == math.rint(10.0 / 17 * 1e4) / 1e4)
    assert(out(1L).getDouble(5) == 0.0)
    // doc 2: one line; "x y" 3× of 6 bigrams → 9/13 chars; all three
    // 5-grams are distinct (x y x y x / y x y x y / x y x y z)
    assert(out(2L).getLong(1) == 1L)
    assert(out(2L).getDouble(2) == 0.0)
    assert(out(2L).getDouble(4) == math.rint(9.0 / 13 * 1e4) / 1e4)
    assert(out(2L).getDouble(5) == 0.0)
    // doc 3: four bigrams tie at 2 → argmax breaks to the
    // lexicographically greatest ("two three", 9 chars → 18/51);
    // 5-gram "one two three four five" repeats (23 chars / 51)
    assert(out(3L).getDouble(4) == math.rint(18.0 / 51 * 1e4) / 1e4)
    assert(out(3L).getDouble(5) == math.rint(23.0 / 51 * 1e4) / 1e4)
  }

  test("L4 gopherQualityFlags: each rule flips on its crafted violator") {
    import spark.implicits._
    val pass = (Seq.fill(25)("hello") ++ Seq("the", "and")).mkString(" ")
    val tooShort = "the and cat"
    val symbols = (Seq.fill(24)("aaaa") ++ Seq("#", "#", "#", "#")).mkString(" ")
    val shortWords = Seq.fill(21)("ab").mkString(" ")
    val docs = Seq((1L, pass), (2L, tooShort), (3L, symbols), (4L, shortWords))
      .toDF("id", "t")
    val out = graft.operators.TextAnalysis
      .gopherQualityFlags(docs, "id", "t", minWords = 20)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 27L && out(1L).getBoolean(6))
    assert(out(1L).getLong(5) == 2L) // the, and
    assert(out(2L).getLong(1) == 3L && !out(2L).getBoolean(6))
    // 4 '#' over 28 words → 0.1429 > 0.1; alpha frac 24/28 ≥ 0.8 still
    assert(out(3L).getDouble(3) == 0.1429)
    assert(out(3L).getDouble(4) == math.rint(24.0 / 28 * 1e4) / 1e4)
    assert(!out(3L).getBoolean(6))
    // mean word length 2 < 3
    assert(out(4L).getDouble(2) == 2.0 && !out(4L).getBoolean(6))
  }

  test("L4 dupNgramCharFrac (explode form) ≡ repetitionStats' HOF measure") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val corpus = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), col("text").as("t"))
      .unionByName(Seq((9001L, "tiny doc"), (9002L, "a b c d e a b c d e"))
        .toDF("id", "t"))
    val hof = TextAnalysis.repetitionStats(corpus, "id", "t")
      .select(col("id"), col("dup5_char_frac").as("dup_char_frac"))
    val exploded = TextAnalysis.dupNgramCharFrac(corpus, "id", "t", n = 5)
    assert(hof.exceptAll(exploded).count() == 0 &&
      exploded.exceptAll(hof).count() == 0)
  }

  test("L3 ivfadcTopK ≡ IVF cell filter ∘ PQ ADC scoring (composition differential)") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val (nCells, nProbe, m, ks, iters, cap, qId, k) = (16, 4, 4, 16, 2, 4096, 0L, 10)
    val routed = Similarity.ivfadcTopK(emb, "vec_id", "embedding", qId, k,
        nCells, nProbe, m, ks, iters, cap)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // expected: the operator's own two trained structures composed by
    // hand — coarse-assign every vector, keep the probed cells, ADC-score
    // with the SAME private folds (exposed private[graft]), top-k
    val coarse = Similarity.ivfTrain(emb, "vec_id", "embedding",
      nCells, iters, cap)
    val cbs = Similarity.pqTrain(emb, "vec_id", "embedding", m, ks, iters, cap)
    val all = emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qv = all.find(_._1 == qId).get._2
    val sub = qv.length / m
    val probes = Similarity.ivfProbes(coarse, qv, nProbe).toSet
    val qDots = Array.tabulate(m)(s => cbs(s).map { c =>
      (0 until sub).map(i => qv(s * sub + i) * c(i)).sum })
    val cNorm2 = Array.tabulate(m)(s => cbs(s).map(c => c.map(x => x * x).sum))
    val qNorm = math.sqrt(qv.map(x => x * x).sum)
    val expected = all
      .filter { case (id, v) =>
        id != qId && probes.contains(Similarity.nearestCell(v, coarse)) }
      .map { case (id, v) =>
        (id, math.rint(Similarity.adcCosine(v, cbs, qDots, cNorm2, qNorm) * 1e4) / 1e4 + 0.0) }
      .sortBy { case (id, c) => (-c, id) }.take(k).toSeq
    assert(routed == expected)
    // routing really prunes: the probed candidate set is a strict subset
    val probedCount = all.count { case (_, v) =>
      probes.contains(Similarity.nearestCell(v, coarse)) }
    assert(probedCount < all.length)
  }

  test("L3 pqTopK equals a local PQ reference (train, encode, ADC score)") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val (m, ks, iters, cap, qId, k) = (4, 16, 2, 4096, 0L, 10)
    val out = Similarity.pqTopK(emb, "vec_id", "embedding", qId, k,
        m, ks, iters, cap)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // local reference: same sample rule (xxhash64 rank — read back from
    // Spark so the draw matches), then an independent Lloyd + encode +
    // ADC fold written from the PAMI'11 description
    val byHash = emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"), xxhash64(col("vec_id")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
    val sample = byHash.sortBy(t => (t._3, t._1)).take(cap).map(_._2)
    val dim = sample(0).length; val sub = dim / m
    def near(v: Array[Double], cs: Array[Array[Double]]): Int =
      cs.zipWithIndex.map { case (c, i) =>
        (c.zip(v).map { case (a, b) => (b - a) * (b - a) }.sum, i)
      }.reduceLeft((x, y) => if (y._1 < x._1) y else x)._2
    val codebooks = (0 until m).map { s =>
      val sl = sample.map(_.slice(s * sub, (s + 1) * sub))
      var cs = sl.take(ks)
      (0 until iters).foreach { _ =>
        val groups = sl.groupBy(v => near(v, cs))
        cs = cs.zipWithIndex.map { case (c, i) =>
          groups.get(i).map(g =>
            g.transpose.map(xs => xs.sum / g.length).toArray).getOrElse(c)
        }
      }
      cs
    }
    val qv = byHash.find(_._1 == qId).get._2
    val qNorm = math.sqrt(qv.map(x => x * x).sum)
    val expected = byHash.filter(_._1 != qId).map { case (id, v, _) =>
      val codes = (0 until m).map(s =>
        near(v.slice(s * sub, (s + 1) * sub), codebooks(s)))
      val numSum = (0 until m).map { s =>
        val c = codebooks(s)(codes(s))
        c.indices.map(i => qv(s * sub + i) * c(i)).sum
      }.sum
      val n2 = (0 until m).map(s =>
        codebooks(s)(codes(s)).map(x => x * x).sum).sum
      val cos = if (qNorm * math.sqrt(n2) == 0) 0.0
        else numSum / (qNorm * math.sqrt(n2))
      (id, math.rint(cos * 1e4) / 1e4 + 0.0)
    }.sortBy { case (id, c) => (-c, id) }.take(k).toSeq
    assert(out == expected)
  }

  test("editDistancePairs: pigeonhole front ≡ equal-length all-pairs brute force") {
    // varied, UNstructured names (no shared prefix) across two blocks,
    // incl. substitution pairs (caught), an indel pair (declared out of
    // scope — lengths differ), and an equal-length dist-2 pair (dropped
    // by the verifier at maxDist=1)
    val rows = Seq(
      (1L, "martha", 0), (2L, "marsha", 0), (3L, "marthe", 0),
      (4L, "marthaa", 0),                        // indel vs 1: excluded
      (5L, "bertha", 0),                         // dist 2 vs martha
      (6L, "martha", 1),                         // other block: no pair with 1
      (7L, "xanadu", 1), (8L, "xanadi", 1),
      (9L, "qq", 0), (10L, "qr", 0))             // short strings, odd split
    val df = rows.toDF("id", "nm", "blk")
    val got = graft.operators.Linkage
      .editDistancePairs(df, "id", "nm", Seq("blk"), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (i1, n1, b1) <- rows; (i2, n2, b2) <- rows
      if i1 < i2 && b1 == b2 && n1.length == n2.length
      d = levBrute(n1, n2) if d <= 1
    } yield (i1, i2, d.toLong)).toSet
    assert(got == brute)
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 3L, 1L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L)) // indel excluded
    assert(!got.exists(p => Set(p._1, p._2) == Set(1L, 5L))) // dist 2
    assert(!got.exists(p => Set(p._1, p._2) == Set(1L, 6L))) // cross-block
    assert(got.contains((9L, 10L, 1L)))
  }

  test("editDistancePairs: indels=true ≡ brute force WITHOUT the length predicate") {
    // full ed≤1 relation at k=1: substitutions (1-2, 1-3), pure indels
    // (1-4 append, 9-11 deletion, "" vs 1-char), multi-position masks
    // ("aab"→"ab" two ways, must dedup), and dist-2 still excluded
    val rows = Seq(
      (1L, "martha", 0), (2L, "marsha", 0), (3L, "marthe", 0),
      (4L, "marthaa", 0),                        // indel vs 1 AND vs 2? (vs 2: dist 2)
      (5L, "bertha", 0),                         // dist 2 vs martha
      (6L, "martha", 1),                         // other block: no pair with 1
      (7L, "aab", 1), (8L, "ab", 1),             // two masks collapse to one pair
      (9L, "qq", 0), (10L, "qr", 0), (11L, "q", 0),
      (12L, "", 0), (13L, "z", 0))               // empty vs 1-char: deletion
    val df = rows.toDF("id", "nm", "blk")
    val got = graft.operators.Linkage
      .editDistancePairs(df, "id", "nm", Seq("blk"), maxDist = 1, indels = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (i1, n1, b1) <- rows; (i2, n2, b2) <- rows
      if i1 < i2 && b1 == b2
      d = levBrute(n1, n2) if d <= 1
    } yield (i1, i2, d.toLong)).toSet
    assert(got == brute)
    assert(got.contains((1L, 4L, 1L)) && got.contains((7L, 8L, 1L)) &&
      got.contains((9L, 11L, 1L)) && got.contains((12L, 13L, 1L)))
    assert(!got.exists(p => Set(p._1, p._2) == Set(2L, 4L))) // dist 2
  }

  test("editDistancePairs: maxDist=2 segment front covers substitution pairs") {
    // maxDist ≥ 2 takes the pigeonhole-segment path: complete for
    // ≤2-substitution pairs (martha→marsha→marsho chains), incl. the
    // dist-2 pair the k=1 test excluded; dist-3 stays out
    val rows = Seq((1L, "martha", 0), (2L, "marsho", 0), (3L, "bertha", 0),
      (4L, "pppppp", 0))
    val df = rows.toDF("id", "nm", "blk")
    val got = graft.operators.Linkage
      .editDistancePairs(df, "id", "nm", Seq("blk"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // martha/marsho: subs at positions 4,6 (dist 2, split halves mar|tha
    // vs mar|sho share segment 0); martha/bertha dist 2 (ber vs mar →
    // shares segment 1 "tha"); marsho/bertha dist 4; pppppp matches none
    assert(got == Set((1L, 2L, 2L), (1L, 3L, 2L)))
  }

  private def levBrute(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("pageRank: matches local power iteration, incl. dangling mass") {
    // graph with a dangling node (4 has no out-edges) and weights —
    // exercises the dm redistribution the fixture's nation graph never
    // does (every nation has out-edges there)
    val edges = Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L),
      ("c", "a", 1L), ("b", "d", 3L)).toDF("s", "t", "w")
    val got = graft.operators.Graphs
      .pageRank(edges, "s", "t", "w", iters = 8, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // local replica: same formula, same iteration count
    val out = Map("a" -> Seq(("b", 2.0 / 3), ("c", 1.0 / 3)),
      "b" -> Seq(("c", 0.25), ("d", 0.75)), "c" -> Seq(("a", 1.0)))
    val nodes = Seq("a", "b", "c", "d")
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 8) {
      val dm = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map { v =>
        val cb = out.toSeq.flatMap { case (u, es) =>
          es.collect { case (dst, p) if dst == v => p * r(u) } }.sum
        v -> ((1.0 - 0.85) / n + 0.85 * (cb + dm / n))
      }.toMap
    }
    nodes.foreach { v =>
      // pageRank rounds to 6 dp, so allow a half-ulp of that rounding
      assert(math.abs(got(v) - r(v)) < 1e-6, s"$v: ${got(v)} vs ${r(v)}")
    }
    // total rank is conserved (the dangling patch keeps Σr = 1)
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  test("personalizedPageRank: matches local seed-restart iteration; rank concentrates at seeds") {
    // same graph incl. the dangling node; seeds {a, d} (d dangling) +
    // an out-of-graph seed that must be ignored
    val edges = Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L),
      ("c", "a", 1L), ("b", "d", 3L)).toDF("s", "t", "w")
    val seeds = Seq("a", "d", "zz_not_in_graph").toDF("seed")
    val got = graft.operators.Graphs
      .personalizedPageRank(edges, "s", "t", "w", seeds, "seed",
        iters = 8, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val out = Map("a" -> Seq(("b", 2.0 / 3), ("c", 1.0 / 3)),
      "b" -> Seq(("c", 0.25), ("d", 0.75)), "c" -> Seq(("a", 1.0)))
    val nodes = Seq("a", "b", "c", "d")
    val s = Map("a" -> 0.5, "b" -> 0.0, "c" -> 0.0, "d" -> 0.5)
    var r = s
    for (_ <- 1 to 8) {
      val dm = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map { v =>
        val cb = out.toSeq.flatMap { case (u, es) =>
          es.collect { case (dst, p) if dst == v => p * r(u) } }.sum
        v -> ((1.0 - 0.85) * s(v) + 0.85 * (cb + dm * s(v)))
      }.toMap
    }
    nodes.foreach { v =>
      assert(math.abs(got(v) - r(v)) < 1e-6, s"$v: ${got(v)} vs ${r(v)}")
    }
    // conservation: teleport + dangling both return to the seeds
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
    // personalization: the uniform walk ranks c highest (two in-edges);
    // seeding at {a, d} must rank a seed above c
    assert(got("a") > got("c"))
    // zero-weight edges are dropped, not NaN-poisoned (the w<=0 guard)
    val withZero = edges.unionByName(Seq(("e", "f", 0L)).toDF("s", "t", "w"))
    val guarded = graft.operators.Graphs
      .pageRank(withZero, "s", "t", "w", iters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(!guarded.contains("e") && guarded.values.forall(v => !v.isNaN))
  }

  test("funnelStages: strict-after and gap-boundary semantics, closed form") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // u1 converts fully; u2's click is outside the gap; u3's purchase
    // precedes the click (order violated); u4 clicks exactly AT the gap
    // boundary (inclusive <=); u5 has click at the same instant as the
    // view (strict > excludes it)
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      (2L, "view", ts(0)), (2L, "click", ts(200)),
      (3L, "view", ts(0)), (3L, "purchase", ts(5)), (3L, "click", ts(10)),
      (4L, "view", ts(0)), (4L, "click", ts(100)),
      (5L, "view", ts(0)), (5L, "click", ts(0))
    ).toDF("uid", "etype", "t")
    val got = graft.operators.EventAnalytics
      .funnelStages(ev, "uid", "etype", "t",
        Seq("view", "click", "purchase"), maxStepGapSec = 100L)
      .orderBy("stage").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // stage 1: all five viewed; stage 2: u1 (10s), u3 (10s), u4 (100s,
    // boundary inclusive) — u2 too late, u5 not strictly after;
    // stage 3: only u1 (u3's purchase is before its click)
    assert(got == Seq((1L, "view", 5L), (2L, "click", 3L),
      (3L, "purchase", 1L)))
  }

  test("transitionCounts: tie-broken total order, closed form") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1 has two events at the SAME instant (ids 10, 11): the
    // (ts, id) tie-break makes the path a → b → b → c deterministic;
    // user 2 contributes an independent a → c
    val ev = Seq(
      (1L, 9L, "a", ts(1)), (1L, 10L, "b", ts(2)),
      (1L, 11L, "b", ts(2)), (1L, 12L, "c", ts(3)),
      (2L, 20L, "a", ts(1)), (2L, 21L, "c", ts(2))
    ).toDF("uid", "eid", "etype", "t")
    val got = graft.operators.EventAnalytics
      .transitionCounts(ev, "uid", "etype", "t", "eid")
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", "b", 1L), ("a", "c", 1L),
      ("b", "b", 1L), ("b", "c", 1L)))
  }

  test("retentionCohorts: two cohorts, offsets and counts, closed form") {
    import java.sql.Timestamp
    def d(day: String) = Timestamp.valueOf(s"$day 12:00:00")
    // weeks (Monday-start): 2024-01-01, 2024-01-08, 2024-01-15.
    // u1 joins wk0, active wk0+wk2; u2 joins wk0, active wk0 only;
    // u3 joins wk1, active wk1+wk2
    val ev = Seq(
      (1L, d("2024-01-02")), (1L, d("2024-01-17")),
      (2L, d("2024-01-03")),
      (3L, d("2024-01-09")), (3L, d("2024-01-16"))
    ).toDF("uid", "t")
    val got = graft.operators.EventAnalytics
      .retentionCohorts(ev, "uid", "t")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("triangleCounts ≡ brute-force enumeration on a seeded random multigraph") {
    // seeded graph with self-loops, duplicates, and both directions —
    // exercises canonicalization; brute force ignores orientation entirely
    val rnd = new scala.util.Random(42)
    val raw = Seq.fill(160)((rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
    val got = graft.operators.Graphs
      .triangleCounts(raw.toDF("s", "t"), "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val canon = raw.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = canon.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val adj = nodes.map(n => n -> canon.collect {
      case (a, b) if a == n => b
      case (a, b) if b == n => a
    }).toMap
    val expect = nodes.map { n =>
      val nb = adj(n).toSeq
      n -> (for {
        i <- nb.indices; j <- (i + 1) until nb.size
        if canon((math.min(nb(i), nb(j)), math.max(nb(i), nb(j))))
      } yield 1).size.toLong
    }.toMap
    assert(got == expect)
    // sanity: the fixture actually has triangles to count
    assert(expect.values.sum > 0)
  }

  test("hits: matches local mutual-reinforcement iteration; L1 sums to 1") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
      ("b", "d"), ("a", "b") /* dup must not double-count */)
      .toDF("s", "t")
    val got = graft.operators.Graphs.hits(edges, "s", "t", iters = 4)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // Seq, NOT Set: collect-then-sum over a Set dedupes EQUAL scores
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("b", "d"))
    val nodes = Seq("a", "b", "c", "d")
    var h = nodes.map(_ -> 0.25).toMap
    var a = nodes.map(_ -> 0.0).toMap
    for (_ <- 1 to 4) {
      val ar = nodes.map(v => v -> e.collect {
        case (u, `v`) => h(u) }.sum).toMap
      val as = ar.values.sum
      a = ar.map { case (k, v) => k -> v / as }
      val hr = nodes.map(u => u -> e.collect {
        case (`u`, v) => a(v) }.sum).toMap
      val hs = hr.values.sum
      h = hr.map { case (k, v) => k -> v / hs }
    }
    nodes.foreach { v =>
      assert(math.abs(got(v)._1 - h(v)) < 1e-6, s"hub $v")
      assert(math.abs(got(v)._2 - a(v)) < 1e-6, s"auth $v")
    }
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-5)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-5)
    // b points at c and d; a points at b and c → a is the top hub
    assert(nodes.maxBy(v => got(v)._1) == "a")
  }

  test("cooccurrence: pair counts, duplicate-line dedup, degree cap, min support") {
    val rows = Seq(
      // basket 1: {a, b, c} — b listed twice, must count once
      (1L, "a"), (1L, "b"), (1L, "b"), (1L, "c"),
      // basket 2: {a, b}
      (2L, "a"), (2L, "b"),
      // basket 3: {a, b} again → (a,b) support 3
      (3L, "a"), (3L, "b"),
      // basket 4: a 5-item mega-basket, over the cap → contributes 0
      (4L, "a"), (4L, "b"), (4L, "c"), (4L, "d"), (4L, "e")
    ).toDF("k", "i")
    val got = graft.operators.EventAnalytics
      .cooccurrence(rows, "k", "i", maxDegree = 4, minCount = 1L)
      .orderBy("item_a", "item_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 1L)))
    // min support prunes the singles
    val sup = graft.operators.EventAnalytics
      .cooccurrence(rows, "k", "i", maxDegree = 4, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(sup == Seq(("a", "b")))
  }

  test("associationRules: confidence and lift closed form, coherent frequencies") {
    // 4 baskets: {a,b} ×3, {a,c} — n(a)=4, n(b)=3, n(c)=1, N=4
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (4L, "a"), (4L, "c")).toDF("k", "i")
    val got = graft.operators.EventAnalytics
      .associationRules(rows, "k", "i", maxDegree = 5)
      .orderBy("ante", "cons").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      ("a", "b", 3L, 0.75, 1.0),  // conf 3/4; lift (3/4)·4/3 = 1
      ("a", "c", 1L, 0.25, 1.0),  // conf 1/4; lift (1/4)·4/1 = 1
      ("b", "a", 3L, 1.0, 1.0),   // b always with a
      ("c", "a", 1L, 1.0, 1.0)))
    // a genuinely lifted pair: {x,y} in both baskets, z alone elsewhere
    val l2 = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "z"), (4L, "z")).toDF("k", "i")
    val lift = graft.operators.EventAnalytics
      .associationRules(l2, "k", "i", maxDegree = 5)
      .where(col("ante") === "x" && col("cons") === "y")
      .collect().map(r => (r.getDouble(3), r.getDouble(4))).head
    assert(lift == ((1.0, 2.0))) // conf 2/2 = 1; lift 1·4/2 = 2
  }

  test("kCore ≡ local peeling on a seeded graph; clique survives, tree dissolves") {
    val rnd = new scala.util.Random(5)
    val raw = Seq.fill(90)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    def localCore(k: Int): Map[Long, Int] = {
      var e = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.toSet
      var changed = true
      while (changed) {
        val deg = e.toSeq.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).map { case (n, xs) => n -> xs.size }
        val keep = deg.filter(_._2 >= k).keySet
        val e2 = e.filter { case (a, b) => keep(a) && keep(b) }
        changed = e2 != e; e = e2
      }
      e.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
    }
    for (k <- Seq(2, 3, 4)) {
      val got = graft.operators.Graphs
        .kCore(raw.toDF("s", "t"), "s", "t", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got == localCore(k), s"k=$k")
    }
    // closed form: a 5-clique hung with pendant nodes — the 4-core is
    // exactly the clique, every pendant peeled
    val clique = (for { i <- 0 to 4; j <- (i + 1) to 4 }
      yield (i.toLong, j.toLong)) ++
      Seq((0L, 100L), (100L, 101L), (1L, 102L))
    val core = graft.operators.Graphs
      .kCore(clique.toDF("s", "t"), "s", "t", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == (0L to 4L).map(_ -> 4L).toMap)
    // k above the max degree → empty core
    assert(graft.operators.Graphs
      .kCore(clique.toDF("s", "t"), "s", "t", k = 20).isEmpty)
  }

  test("labelPropagation ≡ local synchronous simulation; cliques converge to min labels") {
    val rnd = new scala.util.Random(11)
    val raw = Seq.fill(120)((rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
    val canon = raw.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val nbrs = canon.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    val nodes = nbrs.keySet.toSeq.sorted
    for (iters <- Seq(0, 1, 3)) {
      val got = graft.operators.Graphs
        .labelPropagation(raw.toDF("s", "t"), "s", "t", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      var lab = nodes.map(n => n -> n).toMap
      for (_ <- 1 to iters) {
        lab = nodes.map { n =>
          val cnt = nbrs(n).map(lab).groupBy(identity)
            .map { case (l, xs) => l -> xs.size }
          // max count, ties to the smallest label — the engine's order
          n -> cnt.toSeq.minBy { case (l, c) => (-c, l) }._1
        }.toMap
      }
      assert(got == lab, s"iters=$iters")
    }
    // two disjoint 4-cliques: each converges to its min node's label
    val clique = (for {
      base <- Seq(0L, 10L); i <- 0 to 3; j <- (i + 1) to 3
    } yield (base + i, base + j)).toDF("s", "t")
    val comm = graft.operators.Graphs
      .labelPropagation(clique, "s", "t", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).forall(comm(_) == 0L))
    assert((10L to 13L).forall(comm(_) == 10L))
  }

  test("latestSnapshot: max_by pick, tie-break, tombstone drop, re-insert") {
    import java.sql.Timestamp
    def d(day: String) = Timestamp.valueOf(s"2024-01-0$day 00:00:00")
    val log = Seq(
      (1L, d("1"), 1L, "u", 10.0), (1L, d("2"), 2L, "u", 11.0),
      (2L, d("1"), 3L, "u", 20.0), (2L, d("3"), 4L, "d", 0.0),
      (3L, d("1"), 5L, "u", 30.0), (3L, d("1"), 6L, "u", 31.0),
      (4L, d("1"), 7L, "d", 0.0), (4L, d("2"), 8L, "u", 40.0)
    ).toDF("k", "t", "tie", "op", "v")
    val got = graft.operators.ChangeData
      .latestSnapshot(log, Seq("k"), "t", "tie", "op")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
    // k=1 latest update wins; k=2 tombstoned; k=3 same-ts tie → higher
    // tie wins; k=4 delete-then-reinsert is live
    assert(got == Seq((1L, 2L, "u", 11.0), (3L, 6L, "u", 31.0),
      (4L, 8L, "u", 40.0)))
    // output schema: input columns, original order
    assert(graft.operators.ChangeData
      .latestSnapshot(log, Seq("k"), "t", "tie", "op")
      .columns.toSeq == Seq("k", "t", "tie", "op", "v"))
  }

  test("scd2History: intervals chain; tombstones close but emit nothing") {
    import java.sql.Timestamp
    def d(day: String) = Timestamp.valueOf(s"2024-01-0$day 00:00:00")
    val log = Seq(
      (1L, d("1"), 1L, "u", 10.0), (1L, d("2"), 2L, "u", 11.0),
      (2L, d("1"), 3L, "u", 20.0), (2L, d("3"), 4L, "d", 0.0),
      (4L, d("1"), 7L, "d", 0.0), (4L, d("2"), 8L, "u", 40.0)
    ).toDF("k", "t", "tie", "op", "v")
    val got = graft.operators.ChangeData
      .scd2History(log, Seq("k"), "t", "tie", "op")
      .orderBy("k", "t", "tie").collect()
      .map(r => (r.getLong(0), r.getLong(2),
        Option(r.getTimestamp(5)).map(_.toString).orNull,
        Option(r.getTimestamp(6)).map(_.toString).orNull,
        r.getBoolean(7)))
      .toSeq
    assert(got == Seq(
      // k=1: v1 superseded by v2; v2 open and current
      (1L, 1L, "2024-01-01 00:00:00.0", "2024-01-02 00:00:00.0", false),
      (1L, 2L, "2024-01-02 00:00:00.0", null, true),
      // k=2: interval CLOSED by the tombstone, which emits no row
      (2L, 3L, "2024-01-01 00:00:00.0", "2024-01-03 00:00:00.0", false),
      // k=4: pre-insert delete emits nothing; the re-insert is current
      (4L, 8L, "2024-01-02 00:00:00.0", null, true)))
  }

  test("resampleLocf: grid bounds, in-bucket last wins, LOCF gap fill") {
    import java.sql.Timestamp
    val day = 86400L
    def ts(d: Long, sec: Long) = new Timestamp((d * day + sec) * 1000L)
    val ev = Seq(
      // user 1: two events in day 0 (the later wins the bucket), a gap
      // at day 1, then day 2
      (1L, ts(19700, 9 * 3600), 1L, 1.0),
      (1L, ts(19700, 18 * 3600), 2L, 2.0),
      (1L, ts(19702, 100), 3L, 5.0),
      // user 2: one event → a one-row grid
      (2L, ts(19701, 50), 4L, 7.0)
    ).toDF("u", "t", "tie", "v")
    val got = graft.operators.EventAnalytics
      .resampleLocf(ev, "u", "t", "tie", "v", stepSec = day)
      .orderBy("u", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(
      (1L, 19700 * day, 2.0), // later same-bucket event wins
      (1L, 19701 * day, 2.0), // empty bucket carries forward
      (1L, 19702 * day, 5.0),
      (2L, 19701 * day, 7.0)))
  }

  test("resampleInterp: observed anchors kept, gaps take the line, tail carries") {
    import java.sql.Timestamp
    val day = 86400L
    def ts(d: Long, sec: Long) = new Timestamp((d * day + sec) * 1000L)
    val ev = Seq(
      // user 1: day 0 anchor 2.0 (later event wins the bucket), days
      // 1-2 empty, day 3 anchor 8.0 → the gap takes the 2→8 line;
      // day 5 observed then nothing → grid ends at the last bucket
      (1L, ts(19700, 9 * 3600), 1L, 1.0),
      (1L, ts(19700, 18 * 3600), 2L, 2.0),
      (1L, ts(19703, 100), 3L, 8.0),
      (1L, ts(19705, 100), 4L, 4.0),
      // user 2: one event → one observed row
      (2L, ts(19701, 50), 5L, 7.0)
    ).toDF("u", "t", "tie", "v")
    val got = graft.operators.EventAnalytics
      .resampleInterp(ev, "u", "t", "tie", "v", stepSec = day)
      .orderBy("u", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSeq
    assert(got == Seq(
      (1L, 19700 * day, 2.0, true),  // in-bucket last wins, kept verbatim
      (1L, 19701 * day, 4.0, false), // 2 + (8-2)·(1/3)
      (1L, 19702 * day, 6.0, false), // 2 + (8-2)·(2/3)
      (1L, 19703 * day, 8.0, true),
      (1L, 19704 * day, 6.0, false), // 8 + (4-8)·(1/2)
      (1L, 19705 * day, 4.0, true),
      (2L, 19701 * day, 7.0, true)), got)
  }

  test("mergeScd2 ≡ from-scratch scd2History across every split of a seeded log") {
    import java.sql.Timestamp
    val rnd = new scala.util.Random(7)
    val ops = Seq("u", "u", "u", "d") // 25% tombstones
    // globally unique, shuffled timestamps: the strictly-newer contract
    // is about ORDER, and unique ts keep every split contract-clean
    val secs = rnd.shuffle((1 to 120).toVector)
    val log = (1 to 120).map { i =>
      (rnd.nextInt(8).toLong,
        new Timestamp(1700000000000L + secs(i - 1) * 1000L),
        i.toLong, ops(rnd.nextInt(ops.size)), rnd.nextDouble())
    }.toDF("k", "t", "tie", "op", "v")
    val full = graft.operators.ChangeData
      .scd2History(log, Seq("k"), "t", "tie", "op")
      .orderBy("k", "t", "tie").collect().toSeq
    // per-key split: history = each key's first half BY (t, tie); the
    // delta is strictly newer per key — the merge contract
    for (frac <- Seq(0.0, 0.3, 0.7, 1.0)) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("t", "tie")
      val marked = log
        .withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("k")))
      val histLog = marked.where(col("__rn") <= col("__n") * frac)
        .drop("__rn", "__n")
      val delta = marked.where(col("__rn") > col("__n") * frac)
        .drop("__rn", "__n")
      val hist = graft.operators.ChangeData
        .scd2History(histLog, Seq("k"), "t", "tie", "op")
      // frac 0.0 → empty history, frac 1.0 → empty delta: both legal
      val got = graft.operators.ChangeData
        .mergeScd2(hist, delta, Seq("k"), "t", "tie", "op")
      assert(got.orderBy("k", "t", "tie").collect().toSeq == full,
        s"frac=$frac")
    }
  }

  test("mergeScd2 raises loudly when the delta is not strictly newer") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    val histLog = Seq((1L, t(100), 1L, "u", 1.0)).toDF("k", "t", "tie", "op", "v")
    val hist = graft.operators.ChangeData
      .scd2History(histLog, Seq("k"), "t", "tie", "op")
    val stale = Seq((1L, t(100), 0L, "u", 2.0)).toDF("k", "t", "tie", "op", "v")
    val ex = intercept[Exception] {
      graft.operators.ChangeData
        .mergeScd2(hist, stale, Seq("k"), "t", "tie", "op").collect()
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(_.contains("not strictly newer")), ex.toString)
  }

  test("attribution: window boundaries, last-touch pick, linear split, zero channels") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // lookback 15 s: touch qualifies iff conv-15 <= touch < conv
    val ev = Seq(
      (1L, "click", ts(10), 1L), (1L, "view", ts(20), 2L),
      (1L, "purchase", ts(25), 3L), // click@10 exactly at the 15 s edge: in
      (2L, "view", ts(100), 4L), (2L, "purchase", ts(200), 5L), // stale
      (3L, "click", ts(5), 6L), (3L, "click", ts(8), 7L),
      (3L, "purchase", ts(9), 8L),
      (5L, "view", ts(50), 9L), (5L, "purchase", ts(50), 10L) // ts==conv: out
    ).toDF("uid", "etype", "t", "eid")
    val got = graft.operators.EventAnalytics
      .attribution(ev, "uid", "etype", "t", "eid",
        touchTypes = Seq("click", "view", "email"), convType = "purchase",
        lookbackSec = 15L)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // u1: {click@10, view@20} → last view, linear ½ each
    // u3: {click@5, click@8} → last click, linear 1.0 to click
    // u2/u5 unattributed; email never touched → explicit zero row
    assert(got == Seq(("click", 1L, 1.5), ("email", 0L, 0.0),
      ("view", 1L, 0.5)))
  }

  test("bloomFilteredJoin ≡ plain join (inner + left_semi), including an empty small side") {
    import graft.operators.Joins
    val li = Tables.lineitem(spark, sfDir)
    val sup = Tables.supplier(spark, sfDir)
      .where(col("s_nationkey") % 3 === 0)
      .select(col("s_suppkey"), col("s_name"))
    for (jt <- Seq("inner", "left_semi")) {
      val bloom = Joins.bloomFilteredJoin(li, "l_suppkey", sup, "s_suppkey",
        expectedKeys = 64L, joinType = jt)
      val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"), jt)
      assert(rows(bloom) == rows(plain), s"joinType=$jt")
    }
    val empty = Joins.bloomFilteredJoin(li, "l_suppkey",
      sup.where(lit(false)), "s_suppkey", expectedKeys = 64L)
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq ==
      li.columns.toSeq ++ Seq("s_suppkey", "s_name"))
  }

  test("bloomFilteredJoin at a deliberately tiny bloom (high FPP) still matches the plain join") {
    import graft.operators.Joins
    val li = Tables.lineitem(spark, sfDir)
    val one = Tables.supplier(spark, sfDir).limit(1)
      .select(col("s_suppkey"), col("s_name"))
    // expectedKeys=1 → saturated-filter false positives are likely; the
    // equi-join must still remove every one of them
    val bloom = Joins.bloomFilteredJoin(li, "l_suppkey", one, "s_suppkey",
      expectedKeys = 1L)
    val plain = li.join(one, li("l_suppkey") === one("s_suppkey"))
    assert(rows(bloom) == rows(plain))
  }

  test("ohlcBars: open/close follow the (ts, tie) total order, bars independent per key") {
    import graft.operators.EventAnalytics
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq(
      // key 1, bucket 0: open = first by (ts, tie), close = last; a
      // same-ts pair (5, 6) resolved by the tie column
      (1L, ts(10), 1L, 5.0), (1L, ts(20), 2L, 9.0), (1L, ts(20), 3L, 2.0),
      (1L, ts(50), 5L, 4.0), (1L, ts(50), 6L, 7.0),
      // key 1, bucket 60: single event — all four stats equal
      (1L, ts(70), 7L, 3.0),
      // key 2 shares bucket 0 but must not mix with key 1
      (2L, ts(15), 8L, 100.0), (2L, ts(45), 9L, 50.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = EventAnalytics.ohlcBars(df, "user_id", "ts", "event_id",
        "value", stepSec = 60L)
      .orderBy("user_id", "bucket")
      .as[(Long, Long, Double, Double, Double, Double, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 5.0, 9.0, 2.0, 7.0, 5L),
      (1L, 60L, 3.0, 3.0, 3.0, 3.0, 1L),
      (2L, 0L, 100.0, 100.0, 50.0, 50.0, 2L)))
  }

  test("rfmSegments: closed-form median split at nBins=2, inverted recency, exact day math") {
    import graft.operators.EventAnalytics
    val day = 86400000L
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00.25").getTime
    def ts(d: Int, plusMs: Long = 0L) = new java.sql.Timestamp(base + d * day + plusMs)
    val df = Seq(
      (1L, ts(0), 10.0),
      (2L, ts(1), 20.0), (2L, ts(2), 30.0),
      (3L, ts(3), 5.0), (3L, ts(3, 1), 5.0), (3L, ts(3, 2), 5.0),
      (4L, ts(4), 100.0), (4L, ts(4, 1), 100.0), (4L, ts(4, 2), 100.0),
      (4L, ts(4, 3), 100.0)).toDF("user_id", "ts", "value")
    val out = EventAnalytics.rfmSegments(df, "user_id", "ts", "value", nBins = 2)
      .orderBy("user_id")
      .as[(Long, Long, Long, Double, Int, Int, Int)].collect().toSeq
    // recency [4,2,1,0] median 1.5; freq [1,2,3,4] median 2.5;
    // monetary [10,50,15,400] median 32.5 — r_score inverted (2 = fresh)
    assert(out == Seq(
      (1L, 4L, 1L, 10.0, 1, 1, 1),
      (2L, 2L, 2L, 50.0, 1, 1, 2),
      (3L, 1L, 3L, 15.0, 2, 2, 1),
      (4L, 0L, 4L, 400.0, 2, 2, 2)))
    // sub-day offsets never round a recency up: max ts has +3ms jitter
    assert(out.map(_._2).toSeq == Seq(4L, 2L, 1L, 0L))
  }

  test("mergeAggState of any split ≡ from-scratch aggState (exact cnt/extrema, sum to 1e-9)") {
    import graft.operators.ChangeData
    val rnd = new scala.util.Random(77)
    val rows = (1L to 500L).map(i =>
      (i, s"k${rnd.nextInt(7)}", rnd.nextDouble() * 100 - 50))
    val df = rows.toDF("id", "k", "v").cache()
    val full = ChangeData.aggState(df, Seq("k"), "v")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    for (parts <- Seq(2, 5)) {
      val states = (0 until parts).map(p =>
        ChangeData.aggState(df.where(col("id") % parts === p), Seq("k"), "v"))
      val merged = ChangeData.mergeAggState(states, Seq("k"))
        .as[(String, Long, Double, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      assert(merged.keySet == full.keySet, s"parts=$parts")
      for ((k, (_, cnt, vsum, vmin, vmax)) <- merged) {
        val (_, c0, s0, lo0, hi0) = full(k)
        assert(cnt == c0 && vmin == lo0 && vmax == hi0, s"k=$k parts=$parts")
        assert(math.abs(vsum - s0) < 1e-9, s"k=$k parts=$parts")
      }
    }
    // merging a merged state with a fresh delta composes (associativity)
    val a = ChangeData.aggState(df.where(col("id") <= 200), Seq("k"), "v")
    val b = ChangeData.aggState(
      df.where(col("id") > 200 && col("id") <= 400), Seq("k"), "v")
    val c = ChangeData.aggState(df.where(col("id") > 400), Seq("k"), "v")
    val staged = ChangeData.mergeAggState(
      Seq(ChangeData.mergeAggState(Seq(a, b), Seq("k")), c), Seq("k"))
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2, r._4, r._5)).toSet
    assert(staged == full.values.map(r => (r._1, r._2, r._4, r._5)).toSet)
    df.unpersist()
  }

  test("tokenDrift: zero on identical slices, symmetric, JS bounded by ln 2 on disjoint vocab") {
    import graft.operators.Pipelines
    val a = Seq((1L, "x y z x"), (2L, "y z")).toDF("id", "text")
    val same = Pipelines.tokenDrift(a, a, "text")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(same == ((3L, 6L, 6L, 0.0, 0.0, 0.0)))
    val b = Seq((3L, "p q r p q")).toDF("id", "text")
    val ab = Pipelines.tokenDrift(a, b, "text")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    val ba = Pipelines.tokenDrift(b, a, "text")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(ab._1 == 6L && ab._2 == 6L && ab._3 == 5L)
    assert(ab._4 > 0 && ab._5 > 0 && ab._6 > 0)
    // KL is direction-swapped under argument swap; JS is symmetric
    assert(ab._4 == ba._5 && ab._5 == ba._4 && ab._6 == ba._6)
    assert(ab._6 <= math.log(2.0) + 1e-9)
  }

  test("bfsHops: chain+cycle closed form, hop cap, exact early exit, isolated seed") {
    import graft.operators.Graphs
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 2L), (5L, 6L))
      .toDF("s", "t")
    def run(seeds: Seq[Long], cap: Int): Map[Long, Long] =
      Graphs.bfsHops(edges, "s", "t", seeds.toDF("n"), "n", cap)
        .as[(Long, Long)].collect().toMap
    // directed: 1→2→3→4, 4→2 closes a cycle the visited set must stop
    assert(run(Seq(1L), 4) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    assert(run(Seq(1L), 2) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // early exit: nothing new past hop 3 → cap 10 ≡ cap 4
    assert(run(Seq(1L), 10) == run(Seq(1L), 4))
    // multi-source: each node gets its NEAREST seed's distance
    assert(run(Seq(1L, 5L), 4) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 0L, 6L -> 1L))
    // a seed off the graph is still dist 0 (and expands to nothing)
    assert(run(Seq(99L), 4) == Map(99L -> 0L))
    assert(run(Seq(1L), 0) == Map(1L -> 0L))
  }

  test("jaccardJoinPrefix ≡ brute-force jaccardPairs on random corpora at three taus") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(1234)
    // 60 docs over a 30-token vocab, lengths 3-12 — dense enough that
    // every tau bracket has true pairs AND false candidates
    val docs = (1L to 60L).map { id =>
      val n = 3 + rnd.nextInt(10)
      (id, Seq.fill(n)(s"t${rnd.nextInt(30)}").mkString(" "))
    }.toDF("doc_id", "text")
    docs.cache().count()
    for (tau <- Seq(0.3, 0.6, 0.9)) {
      val brute = rows(Dedup.jaccardPairs(docs, "doc_id", "text", tau))
      val fast = rows(Dedup.jaccardJoinPrefix(docs, "doc_id", "text", tau))
      assert(brute.nonEmpty || tau > 0.5, s"fixture too sparse at tau=$tau")
      assert(fast == brute, s"tau=$tau")
    }
    docs.unpersist()
  }

  test("ewmaBounded matches a per-key scala fold at every row (truncated adjust=true weights)") {
    import graft.operators.EventAnalytics
    val data = Seq(
      (1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 5.0), (1L, 4L, 40.0),
      (1L, 5L, 1.0), (1L, 6L, 2.0), (1L, 7L, 3.0), (1L, 8L, 4.0),
      (1L, 9L, 100.0), (1L, 10L, 6.0), // row 9+ exercises the horizon cut
      (2L, 1L, 7.0), (2L, 2L, 7.0),
      (3L, 1L, -5.0))
    val df = data.map { case (u, i, v) =>
      (u, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$i%02d"), i, v)
    }.toDF("user_id", "ts", "event_id", "value")
    val got = EventAnalytics.ewmaBounded(df, "user_id", "ts", "event_id",
        "value", decay = 0.5, horizon = 8)
      .orderBy("user_id", "event_id")
      .as[(Long, java.sql.Timestamp, Long, Double, Double)].collect()
      .map(r => (r._1, r._3) -> r._5).toMap
    val byKey = data.groupBy(_._1)
    for (((u, i), ew) <- got) {
      val series = byKey(u).sortBy(_._2).map(_._3)
      val idx = byKey(u).sortBy(_._2).indexWhere(_._2 == i)
      val terms = (0 until math.min(8, idx + 1))
        .map(k => (series(idx - k) * math.pow(0.5, k), math.pow(0.5, k)))
      val expected = BigDecimal(terms.map(_._1).sum / terms.map(_._2).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(math.abs(ew - expected) < 1e-9, s"user=$u row=$i")
    }
    // first row of every key is the raw value; steady repeats stay put
    assert(got((2L, 1L)) == 7.0 && got((2L, 2L)) == 7.0 && got((3L, 1L)) == -5.0)
    // horizon cut: row 10 of user 1 no longer sees row 1's value
    assert(got.size == data.size)
  }

  test("fused minhash_signature equals the HOF xxhash64 formulation bit-for-bit") {
    // the LSH band keys (and through them every candidate set) depend on
    // these exact long values, so the fused codegen expression must be
    // value-identical to the reference HOF form — including null text
    // (null token array), empty-string text ([""] after split), and
    // single-token docs
    val docs = Tables.documents(spark, sfDir).limit(200)
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (900001L, null.asInstanceOf[String]),
        (900002L, ""),
        (900003L, "one"),
        (900004L, "a b c a b")).toDF("doc_id", "text"))
    val tok = array_distinct(split(col("text"), " "))
    for (numHashes <- Seq(1, 8, 64)) {
      val ref = array((0 until numHashes).map { i =>
        array_min(transform(col("__tok"), t => xxhash64(t, lit(i))))
      }: _*)
      val both = docs.select(col("doc_id"), tok.as("__tok"))
        .select(col("doc_id"),
          graft.expressions.HashExpressions.minHashSignature(col("__tok"), numHashes).as("fused"),
          ref.as("ref"))
      assert(both.where(not(col("fused") <=> col("ref"))).count() == 0L,
        s"numHashes=$numHashes")
      // result array is non-null even for null input; elements null there
      val nullDoc = both.where(col("doc_id") === 900001L).head()
      assert(!nullDoc.isNullAt(1))
      assert(nullDoc.getSeq[Any](1).forall(_ == null))
    }
  }
}
