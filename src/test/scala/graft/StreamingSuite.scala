package graft

import graft.streaming.StreamOps
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Batch-equivalence streaming tests (SURVEY §5.3): replaying the same
  * rows through MemoryStream must reproduce the batch plan's result —
  * Structured Streaming's correctness contract — plus watermark late-drop
  * and exactly-once file-sink restart (§3.3 semantics). */
class StreamingSuite extends AnyFunSuite {
  import TestSpark.{sfDir, spark}
  import spark.implicits._

  private def eventRows: Seq[Ev] =
    Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq

  /** Run `plan` over a replay of `rows` in complete mode, return result. */
  private def replay(rows: Seq[Ev], name: String)(plan: DataFrame => DataFrame): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(rows: _*)
    val q = plan(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("T2: tumbling window — stream equals batch") {
    val rows = eventRows
    val batch = StreamOps.tumblingCounts(Tables.events(spark, sfDir))
    val stream = replay(rows, "t2")(df => StreamOps.tumblingCounts(df))
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("T3: sliding window — stream equals batch") {
    val rows = eventRows
    val batch = StreamOps.slidingCounts(Tables.events(spark, sfDir))
    val stream = replay(rows, "t3")(df => StreamOps.slidingCounts(df))
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("T7: per-key running agg — stream equals batch") {
    val rows = eventRows
    val batch = StreamOps.runningTotals(Tables.events(spark, sfDir))
    val stream = replay(rows, "t7")(df => StreamOps.runningTotals(df))
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("T4: session windows on a stream equal the batch sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val base = Timestamp.valueOf("2024-01-01 10:00:00")
    def ev(id: Long, uid: Long, minOff: Int, v: Double): Ev =
      Ev(id, new Timestamp(base.getTime + minOff * 60000L), uid, "click", v)
    // user 1: two sessions (gap 45 min > 30); user 2: one session
    val rows = Seq(ev(1, 1, 0, 1.0), ev(2, 1, 10, 2.0), ev(3, 1, 55, 3.0),
      ev(4, 2, 0, 5.0))
    mem.addData(rows: _*)
    val q = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("c"), sum("value").as("v"))
      .select("user_id", "c", "v")
      .writeStream.format("memory").queryName("t4").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("t4").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 5.0)))
  }

  test("corpus-prep ops are streaming-safe: split/scrub/winnow stream equals batch") {
    // stateless projections (split, scrub) and a generate (winnow) are
    // legal in a streaming select with no watermark/state — the corpus
    // pipeline's per-row stages run unchanged on a stream
    import graft.operators.{Pipelines, TextAnalysis}
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(50)
    val rows = docs.as[(Long, String)].collect().toSeq
    // token entropy is also a stateless projection — it joins the
    // streaming-safe set (lm/DSIR/line-dedup do NOT: they need
    // corpus-global counts and are batch by semantics)
    def prep(df: DataFrame): DataFrame =
      TextAnalysis.winnowFingerprints(
        Pipelines.splitByMd5Prefix(df, "doc_id")
          .withColumn("clean", Pipelines.scrubPii(col("text")))
          .select(col("doc_id"), concat(col("split"), lit(" "), col("clean")).as("text")),
        "doc_id", "text")
        .unionByName(TextAnalysis.tokenEntropy(df, "doc_id", "text")
          .select(col("doc_id"),
            concat_ws(":", col("n_types"), col("entropy")).as("fp")))
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    val q = prep(mem.toDF().toDF("doc_id", "text")).writeStream
      .format("memory").queryName("prep_stream").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(sortedRows(spark.table("prep_stream")) == sortedRows(prep(docs)))
  }

  test("T7×A3+: streamed count-min estimates equal the batch sketch, across batch splits") {
    import graft.functions.CountMinTokens
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(100)
    val rows = docs.as[(Long, String)].collect().toSeq
    val watch = Seq("table", "data", "value", "nosuchtokenanywhere")
    val batchCms = CountMinTokens.tokenSketch(docs, "text", 0.001, 0.99)
    val want = watch.map(w => w -> batchCms.estimateCount(w)).toMap
    // feed in two uneven batches: the final estimates must not care
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows.take(30): _*)
    mem.addData(rows.drop(30): _*)
    val q = StreamOps.streamingTokenCounts(
        mem.toDF().toDF("doc_id", "text"), "text", watch, 0.001, 0.99)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // update mode emits once per batch; counts only grow, so the final
    // estimate per token is the max (robust to sink row order)
    val got = spark.table("cms_stream").collect()
      .map(r => (r.getString(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(got == want, s"got=$got want=$want")
    assert(got("nosuchtokenanywhere") == 0L)
  }

  test("T5/T6: watermark drops late rows; dedup drops repeats") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val base = Timestamp.valueOf("2024-01-01 10:00:00")
    def ev(id: Long, minOff: Int): Ev =
      Ev(id, new Timestamp(base.getTime + minOff * 60000L), 1L, "click", 1.0)
    val q = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")
      .writeStream.format("memory").queryName("t56").outputMode("append")
      .trigger(Trigger.ProcessingTime(100)).start()
    // batch 1: two events + a duplicate id; advances watermark to 50-10=40min
    mem.addData(ev(1, 0), ev(1, 0), ev(2, 50))
    q.processAllAvailable()
    // batch 2: a dup of id 1 (state still live? no - ts 0 < watermark → dropped
    // as late) and one fresh event
    mem.addData(ev(1, 0), ev(3, 55))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("t56").select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("T6×L2: token-less rows pass through simHashDedup unfingerprinted (batch + stream)") {
    import spark.implicits._
    // batch: dup texts collapse, the null-text row survives with a null
    // fingerprint (a dedup operator must not LOSE rows it can't hash)
    val batch = StreamOps.simHashDedup(
      Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
        (3L, null.asInstanceOf[String])).toDF("doc_id", "text"), "text")
    assert(batch.count() == 2)
    val nullRows = batch.where(col("text").isNull).collect()
    assert(nullRows.length == 1 && nullRows(0).getAs[Any]("simhash") == null)
    // streaming: same contract through the WithinWatermark path
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, null))
    val src = mem.toDF().toDF("doc_id", "text")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
    val q = StreamOps.simHashDedup(src, "text")
      .writeStream.format("memory").queryName("t6nulls").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("t6nulls")
    assert(streamed.count() == 2 && streamed.where(col("text").isNull).count() == 1)
  }

  test("T6×L2: streaming SimHash dedup — kept fingerprint set equals batch distinct") {
    // simHashDedup's fingerprint is a stateless projection, so the
    // streamed result must keep exactly one doc per fingerprint that a
    // batch pass over the same rows produces. Which doc survives a
    // within-batch tie is execution-order-dependent; the SET of
    // surviving fingerprints (and its size) is deterministic. The
    // stream path is dropDuplicatesWithinWatermark (bounded state), so
    // the input must carry a watermark — one event-time for all rows
    // keeps every doc inside one dedup window, i.e. batch semantics.
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 300)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    mem.addData(docs: _*)
    val src = mem.toDF().toDF("doc_id", "text")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
    val q = StreamOps.simHashDedup(src, "text")
      .writeStream.format("memory").queryName("t6l2").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("t6l2").select("simhash").as[Long].collect().sorted.toSeq
    val batch = graft.operators.Dedup.simHash(
        Tables.documents(spark, sfDir).where(col("doc_id") < 300), "doc_id", "text")
      .select("simhash").distinct().as[Long].collect().sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch)
    // and the expression form agrees with the batch groupBy form per-doc
    val exprForm = Tables.documents(spark, sfDir).where(col("doc_id") < 300)
      .where(size(graft.operators.Dedup.tokenSet(col("text"))) > 0)
      .select(col("doc_id"),
        graft.operators.Dedup.simHashExpr(col("text")).as("simhash"))
    val aggForm = graft.operators.Dedup.simHash(
      Tables.documents(spark, sfDir).where(col("doc_id") < 300), "doc_id", "text")
    assert(sortedRows(exprForm) == sortedRows(aggForm))
  }

  test("T6×L1n: streaming normalized dedup — kept hash set equals batch; null text passes through") {
    // same contract as the SimHash test, on the normalize+md5 key:
    // the SET of surviving normalized hashes is deterministic (which
    // variant survives a within-batch tie is not), and null-text rows
    // are never lost. Variants of docs < 30 guarantee real collapses.
    implicit val sqlCtx = spark.sqlContext
    val base = Tables.documents(spark, sfDir).where(col("doc_id") < 150)
      .select(col("doc_id"), col("text"))
    val withVariants = base.unionByName(
      base.where(col("doc_id") < 30).select((col("doc_id") + 5000L).as("doc_id"),
        concat(upper(col("text")), lit(" !!")).as("text")))
    val rows = withVariants.as[(Long, String)].collect().toSeq :+
      ((9999L, null.asInstanceOf[String]))
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    val src = mem.toDF().toDF("doc_id", "text")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
    val q = StreamOps.normalizedDedup(src, "text")
      .writeStream.format("memory").queryName("t6l1n").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("t6l1n")
    val streamedHashes = streamed.where(col("norm_h").isNotNull)
      .select("norm_h").as[String].collect().sorted.toSeq
    val batchHashes = withVariants
      .select(md5(graft.operators.Dedup.normalizeText(col("text"))).as("h"))
      .distinct().as[String].collect().sorted.toSeq
    assert(streamedHashes.nonEmpty && streamedHashes == batchHashes)
    // every variant collapsed onto its base's normalized form
    assert(streamedHashes.distinct.size == streamedHashes.size)
    assert(streamed.where(col("doc_id") === 9999L).count() == 1)
    assert(streamed.where(col("doc_id") === 9999L)
      .select("norm_h").collect()(0).getAs[Any]("norm_h") == null)
  }

  test("T1/S9/S10: ORC file sink is exactly-once across restart") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val src = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    def runOnce(): Unit = {
      val stream = spark.readStream.schema("id LONG").json(s"$src/*")
      val q = stream.writeStream.format("orc")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // phase 1: only the first 50 rows exist; stream stops after them
    spark.range(0, 50).toDF("id").write.json(s"$src/batch1")
    runOnce()
    assert(spark.read.orc(out).count() == 50L)
    // phase 2: more data lands; restart from checkpoint picks up ONLY the
    // new file — incremental exactly-once (offsets replay, commit log)
    spark.range(50, 100).toDF("id").write.json(s"$src/batch2")
    runOnce()
    val ids = spark.read.orc(out).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 100L), s"got ${ids.length} rows")
    // phase 3: restart with nothing new: no re-processing, no duplicates
    runOnce()
    assert(spark.read.orc(out).count() == 100L)
  }

  test("streaming curated pipeline: cross-restart dedup, no dup survivors, idempotent replay") {
    val dir = Files.createTempDirectory("graft_scp").toString
    val src = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    val cfg = graft.jobs.CorpusPipelineJob.Config(minQuality = 0.0)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema("doc_id LONG, text STRING")
        .json(s"$src/*")
      val q = graft.jobs.CorpusPipelineJob.runStreaming(
        stream, out, ckpt, cfg, Trigger.AvailableNow())
      q.awaitTermination()
    }
    def doc(i: Long) = (i, s"stream doc number $i with some body text")
    // phase 1: docs 0-49 plus an in-batch normalized variant of doc 1
    ((0L until 50L).map(doc) :+ (9001L, "STREAM DOC NUMBER 1 WITH SOME BODY TEXT!!"))
      .toDF("doc_id", "text").write.json(s"$src/batch1")
    runOnce()
    val landed1 = spark.read.orc(out)
    assert(landed1.count() == 50L, "variant must collapse in-batch")
    assert(landed1.where(col("doc_id") === 9001L).count() == 0)
    // phase 2 (restart from checkpoint): re-crawls of 40-49, a
    // normalized variant of doc 5, and genuinely new docs 60-79
    ((40L until 50L).map(doc) ++ (60L until 80L).map(doc)
      :+ (9002L, "Stream Doc Number 5, With Some Body Text?"))
      .toDF("doc_id", "text").write.json(s"$src/batch2")
    runOnce()
    val landed2 = spark.read.orc(out)
    assert(landed2.count() == 70L,
      s"only the 20 new docs may land, got ${landed2.count()}")
    assert(landed2.where(col("doc_id").isin(9002L)).count() == 0)
    // the landed corpus carries no normalized-dup pair across batches.
    // `norm_h` is a documented OUTPUT column of runStreaming (it is the
    // table's own seen-state), so drop it before re-running the batch
    // dedup, which requires norm_h to be free.
    assert(graft.operators.Dedup
      .normalizedDedup(landed2.drop("norm_h"), "doc_id", "text")
      .where(!col("keep")).count() == 0)
    // phase 3: restart with nothing new — nothing lands twice
    runOnce()
    assert(spark.read.orc(out).count() == 70L)
  }

  test("T-join: stream-stream interval join equals the batch range join") {
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows
    val batch = StreamOps.intervalJoin(
      Tables.events(spark, sfDir), Tables.events(spark, sfDir))
    val memL = MemoryStream[Ev]
    val memR = MemoryStream[Ev]
    memL.addData(rows: _*)
    memR.addData(rows: _*)
    // inner stream-stream joins emit on match (the watermark only gates
    // state cleanup), so one AvailableNow pass yields the full result
    val joined = StreamOps.intervalJoin(
      memL.toDF().withWatermark("ts", "1 minute"),
      memR.toDF().withWatermark("ts", "1 minute"))
    assert(joined.isStreaming)
    val q = joined.writeStream.format("memory").queryName("tjoin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(sortedRows(spark.table("tjoin")) == sortedRows(batch))
    assert(batch.count() > 0)
  }

  test("T7×funnel: streaming funnel equals the batch funnel across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq("view", "click", "purchase")
    val gap = 172800L
    val batch = graft.operators.EventAnalytics
      .funnelStages(Tables.events(spark, sfDir), "user_id", "event_type",
        "ts", stages, gap)
      .orderBy("stage").collect().map(_.getLong(2)).toSeq
    // feed the SAME rows in ts order split across two batches (the
    // documented in-order delivery regime); the per-user final emission
    // must reproduce the batch first-touch counts
    val rows = eventRows.sortBy(_.ts.getTime)
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val mem = MemoryStream[Ev]
    val q = StreamOps.streamingFunnel(mem.toDF(), stages, gap)
      .writeStream.format("memory").queryName("tfunnel")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // stages_reached is monotone non-decreasing per user, so the final
    // stage is simply the max — order-free, no emission-order assumption
    val finals = spark.table("tfunnel")
      .groupBy("user_id").agg(max(col("stages_reached")).as("s"))
      .select("s").as[Int].collect()
    val got = (1 to stages.size).map(k => finals.count(_ >= k).toLong)
    assert(got == batch, s"stream=$got batch=$batch")
    assert(batch.head > batch.last && batch.last > 0) // fixture discriminates
  }

  test("T7×transitions: streaming transition instances equal the batch matrix across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.EventAnalytics
      .transitionCounts(Tables.events(spark, sfDir), "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // same rows, (ts, event_id) order, split across two batches — the
    // state must bridge the cross-batch pair of every user
    val rows = eventRows.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val mem = MemoryStream[Ev]
    val q = StreamOps.streamingTransitions(mem.toDF())
      .writeStream.format("memory").queryName("ttrans")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("ttrans")
      .groupBy("from_type", "to_type").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == batch, s"stream=$got batch=$batch")
    assert(batch.size > 1) // fixture exercises several cells
  }

  test("T-join: left-outer stream-stream interval join equals batch once the watermark flushes") {
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows
    val batch = StreamOps.intervalJoinLeftOuter(
      Tables.events(spark, sfDir), Tables.events(spark, sfDir))
    val memL = MemoryStream[Ev]
    val memR = MemoryStream[Ev]
    val joined = StreamOps.intervalJoinLeftOuter(
      memL.toDF().withWatermark("ts", "1 minute"),
      memR.toDF().withWatermark("ts", "1 minute"))
    assert(joined.isStreaming)
    val q = joined.writeStream.format("memory").queryName("tojoin")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    memL.addData(rows: _*); memR.addData(rows: _*)
    q.processAllAvailable()
    // outer NULL verdicts trail the watermark: two future sentinel
    // batches (filtered out below) push it past every real row's bound
    val maxTs = rows.map(_.ts.getTime).max
    def flush(id: Long, plusDays: Int) =
      Ev(id, new Timestamp(maxTs + plusDays * 86400000L), -1L, "flush", 0.0)
    memL.addData(flush(-1L, 1)); memR.addData(flush(-1L, 1))
    q.processAllAvailable()
    memL.addData(flush(-2L, 2)); memR.addData(flush(-2L, 2))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("tojoin").where(col("l_event_id") >= 0)
    assert(sortedRows(got) == sortedRows(batch))
    // the fixture exercises both verdicts
    assert(batch.where(col("r_event_id").isNull).count() > 0)
    assert(batch.where(col("r_event_id").isNotNull).count() > 0)
  }

  test("T7×twap: streaming TWAP's final snapshot equals batch bit-for-bit across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.EventAnalytics
      .twap(Tables.events(spark, sfDir), "user_id", "ts", "event_id", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val rows = eventRows.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val mem = MemoryStream[Ev]
    val q = StreamOps.streamingTwap(mem.toDF())
      .writeStream.format("memory").queryName("ttwap")
      .outputMode("update").trigger(Trigger.ProcessingTime(100)).start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // update mode leaves one snapshot per (key, batch-touched); the
    // FINAL snapshot per key is the one with the highest n_events
    val got = spark.table("ttwap").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
    assert(got.size == batch.size, s"keys: stream=${got.size} batch=${batch.size}")
    // bit-for-bit: the streaming fold replays the batch expression's
    // quantization and rounding, so == on doubles, no tolerance
    val diff = batch.collect { case (k, v) if got.get(k) != Some(v) => k }
    assert(diff.isEmpty, s"mismatched keys: ${diff.take(5)}")
    // a key seen in both halves proves cross-batch state carry
    assert(b1.exists(e => b2.exists(_.user_id == e.user_id)))
  }

  test("T7×ewma: streaming EWMA equals the batch window bit-for-bit across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.EventAnalytics
      .ewmaBounded(Tables.events(spark, sfDir), "user_id", "ts", "event_id",
        "value", decay = 0.5, horizon = 8)
      .select("user_id", "event_id", "ewma")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = eventRows.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val mem = MemoryStream[Ev]
    val q = StreamOps.streamingEwma(mem.toDF(), decay = 0.5, horizon = 8)
      .writeStream.format("memory").queryName("tewma")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("tewma")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == batch.size)
    // bit-for-bit: the streaming fold replays the batch expression's
    // term order and rounding, so == on doubles, no tolerance
    val diff = batch.collect { case (k, v) if got.get(k) != Some(v) => k }
    assert(diff.isEmpty, s"mismatched rows: ${diff.take(5)}")
  }

  test("T2×ohlc: streaming OHLC bars equal batch once the watermark closes every bar") {
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows
    val batch = graft.operators.EventAnalytics
      .ohlcBars(Tables.events(spark, sfDir), "user_id", "ts", "event_id",
        "value", stepSec = 21600L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    val sorted = rows.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = sorted.splitAt(sorted.size / 2)
    val mem = MemoryStream[Ev]
    val q = StreamOps.streamingOhlc(mem.toDF(), stepSec = 21600L,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("tohlc")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    // bars emit in append mode only once the watermark passes their
    // end: push it with two future sentinels (user -1, filtered below)
    val maxTs = rows.map(_.ts.getTime).max
    def flush(id: Long, plusDays: Int) =
      Ev(id, new Timestamp(maxTs + plusDays * 86400000L), -1L, "flush", 0.0)
    mem.addData(flush(-1L, 1)); q.processAllAvailable()
    mem.addData(flush(-2L, 2)); q.processAllAvailable()
    q.stop()
    val got = spark.table("tohlc").where(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    assert(got == batch, s"bars: stream=${got.size} batch=${batch.size}")
    assert(batch.size > 10) // fixture produces a real bar grid
  }

  test("T7×sess: streaming sessionize equals batch row-for-row after the watermark closes every session") {
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows
    val batch = graft.operators.EventAnalytics
      .sessionize(Tables.events(spark, sfDir), "user_id", "ts",
        "event_id", gapSec = 21600L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getTimestamp(2), r.getTimestamp(3), r.getLong(4),
          r.getDouble(5))).toMap
    val sorted = rows.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = sorted.splitAt(sorted.size / 2)
    val mem = MemoryStream[Ev]
    val q = StreamOps.streamingSessionize(mem.toDF(), gapSec = 21600L,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("tsess")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    // open sessions close on the event-time timeout: two future
    // sentinels advance the watermark past every end + gap
    val maxTs = rows.map(_.ts.getTime).max
    def flush(id: Long, plusDays: Int) =
      Ev(id, new Timestamp(maxTs + plusDays * 86400000L), -1L, "flush", 0.0)
    mem.addData(flush(-1L, 2)); q.processAllAvailable()
    mem.addData(flush(-2L, 4)); q.processAllAvailable()
    q.stop()
    val got = spark.table("tsess").where(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getTimestamp(2), r.getTimestamp(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(got.size == batch.size,
      s"sessions: stream=${got.size} batch=${batch.size}")
    val diff = batch.collect { case (k, v) if got.get(k) != Some(v) => k }
    assert(diff.isEmpty, s"mismatched sessions: ${diff.take(5)}")
    assert(batch.size > 50) // the fixture splits into many sessions
  }

  test("T7×sess: a session closes on pure watermark passage — the final batches have NO events for its user") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    def ev(uid: Long, offSec: Long, id: Long) =
      Ev(id, new Timestamp(t0 + offSec * 1000L), uid, "view", 1.0)
    val mem = MemoryStream[Ev]
    val q = StreamOps.streamingSessionize(mem.toDF(), gapSec = 60L,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("tsess_timeout")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    // batch 1: the whole of user 7's session
    mem.addData(ev(7L, 0L, 1L), ev(7L, 10L, 2L)); q.processAllAvailable()
    // batches 2-3 carry ONLY user 8: batch 2 advances the watermark past
    // 7's end + gap, batch 3 fires the event-time timeout — user 7's
    // session must emit although 7 never appears again
    mem.addData(ev(8L, 500L, 3L)); q.processAllAvailable()
    mem.addData(ev(8L, 600L, 4L)); q.processAllAvailable()
    q.stop()
    val got = spark.table("tsess_timeout")
      .where(col("user_id") === 7L).collect()
    assert(got.length == 1, s"user 7 sessions: ${got.length}")
    assert(got(0).getLong(1) == 1L, "session ordinal")
    assert(got(0).getLong(4) == 2L, "event count")
    assert(got(0).getDouble(5) == 10.0, "duration")
  }

  test("T4×native: session_window agg ≡ custom sessionize in batch, and stream ≡ batch after flush") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sfDir)
    // native batch form vs the custom operator: same sessions — the
    // built-in's window_end is last_event + gap, so align by -gap
    val native = StreamOps.sessionWindowAgg(ev, gapSec = 21600L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime - 21600000L, r.getLong(3))).toSet
    val custom = graft.operators.EventAnalytics
      .sessionize(ev, "user_id", "ts", "event_id", gapSec = 21600L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(2).getTime,
        r.getTimestamp(3).getTime, r.getLong(4))).toSet
    assert(native == custom,
      s"native=${native.size} custom=${custom.size} " +
        s"diff=${(native diff custom).take(3)}")
    // streaming native form: append mode, watermark-closed sessions
    val rows = eventRows
    val sorted = rows.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = sorted.splitAt(sorted.size / 2)
    val mem = MemoryStream[Ev]
    val q = StreamOps.sessionWindowAgg(mem.toDF(), gapSec = 21600L,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("tswin")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    val maxTs = rows.map(_.ts.getTime).max
    def flush(id: Long, plusDays: Int) =
      Ev(id, new Timestamp(maxTs + plusDays * 86400000L), -1L, "flush", 0.0)
    mem.addData(flush(-1L, 2)); q.processAllAvailable()
    mem.addData(flush(-2L, 4)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tswin").where(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime - 21600000L, r.getLong(3))).toSet
    assert(streamed == custom,
      s"stream=${streamed.size} batch=${custom.size}")
    assert(custom.size > 50)
  }

  test("CDC snapshot store: stream ≡ batch compaction, idempotent replay, tombstone retention") {
    import graft.jobs.CdcSnapshotJob
    val dir = Files.createTempDirectory("graft_snap").toString
    val src = s"$dir/in"; val store = s"$dir/store"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    val cfg = CdcSnapshotJob.Config(Seq("k"), tsCol = "t", tieCol = "tie",
      opCol = "op", nBuckets = 8)
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("k LONG, t LONG, tie LONG, op STRING, v DOUBLE")
        .json(s"$src/*")
      val q = CdcSnapshotJob.runStreaming(stream, store, ckpt, cfg,
        Trigger.AvailableNow())
      q.awaitTermination()
    }
    val b1 = (1L to 20L).map(i => (i, 100L + i, i, "u", i * 1.0))
    val b2 = (1L to 5L).map(i => (i, 300L + i, 100L + i, "u", i * 10.0)) ++
      Seq((6L, 306L, 106L, "d", 0.0), (21L, 321L, 121L, "u", 21.0))
    b1.toDF("k", "t", "tie", "op", "v").write.json(s"$src/batch1")
    runOnce()
    b2.toDF("k", "t", "tie", "op", "v").write.json(s"$src/batch2")
    runOnce()
    // stream-maintained snapshot ≡ one-shot batch compaction of the log
    val fullLog = (b1 ++ b2).toDF("k", "t", "tie", "op", "v")
    val want = graft.operators.ChangeData
      .latestSnapshot(fullLog, Seq("k"), "t", "tie", "op")
      .orderBy("k").collect().toSeq
    def snap() = CdcSnapshotJob.readSnapshot(spark, store, cfg)
      .select("k", "t", "tie", "op", "v").orderBy("k")
    assert(snap().collect().toSeq == want)
    assert(snap().where(col("k") === 6L).isEmpty) // tombstoned key gone
    // replaying a landed batch merges to the identical store
    CdcSnapshotJob.mergeBatch(store,
      b2.toDF("k", "t", "tie", "op", "v"), cfg)
    assert(snap().collect().toSeq == want)
    // a LATE pre-delete update must NOT resurrect key 6: the store
    // keeps the tombstone and max_by keeps it winning
    CdcSnapshotJob.mergeBatch(store,
      Seq((6L, 200L, 50L, "u", 666.0)).toDF("k", "t", "tie", "op", "v"),
      cfg)
    assert(snap().where(col("k") === 6L).isEmpty)
    assert(snap().collect().toSeq == want)
    // the store really is bucket-partitioned parquet
    val bucketDirs = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("__bucket="))
    assert(bucketDirs.nonEmpty)
  }

  test("CDC history store: stream ≡ batch SCD2, replay no-op, time travel") {
    import graft.jobs.{CdcHistoryJob, CdcSnapshotJob}
    val dir = Files.createTempDirectory("graft_hist").toString
    val src = s"$dir/in"; val store = s"$dir/store"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    val cfg = CdcSnapshotJob.Config(Seq("k"), tsCol = "t", tieCol = "tie",
      opCol = "op", nBuckets = 8)
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("k LONG, t LONG, tie LONG, op STRING, v DOUBLE")
        .json(s"$src/*")
      val q = CdcHistoryJob.runStreaming(stream, store, ckpt, cfg,
        Trigger.AvailableNow())
      q.awaitTermination()
    }
    // b1: v1 of keys 1-10; b2: v2 of keys 1-5, delete key 6, new key 11
    val b1 = (1L to 10L).map(i => (i, 100L + i, i, "u", i * 1.0))
    val b2 = (1L to 5L).map(i => (i, 300L + i, 100L + i, "u", i * 10.0)) ++
      Seq((6L, 306L, 106L, "d", 0.0), (11L, 311L, 111L, "u", 11.0))
    def jl(r: (Long, Long, Long, String, Double)) =
      s"""{"k":${r._1},"t":${r._2},"tie":${r._3},"op":"${r._4}","v":${r._5}}"""
    Files.write(java.nio.file.Paths.get(s"$src/b1.json"),
      b1.map(jl).mkString("\n").getBytes)
    runOnce()
    Files.write(java.nio.file.Paths.get(s"$src/b2.json"),
      b2.map(jl).mkString("\n").getBytes)
    runOnce()
    val fullLog = (b1 ++ b2).toDF("k", "t", "tie", "op", "v")
    val want = graft.operators.ChangeData
      .scd2History(fullLog, Seq("k"), "t", "tie", "op")
      .orderBy("k", "t", "tie").collect().toSeq
    def hist() = CdcHistoryJob.readHistory(spark, store)
      .select("k", "t", "tie", "op", "v",
        "valid_from", "valid_to", "is_current").orderBy("k", "t", "tie")
    assert(hist().collect().toSeq == want)
    // replaying a landed batch is a no-op (events deduped, incl. the
    // tombstone via the interval it closed)
    CdcHistoryJob.mergeBatch(store,
      b2.toDF("k", "t", "tie", "op", "v"), cfg)
    assert(hist().collect().toSeq == want)
    // time travel: at t=200 every key 1-10 is at v1; at t=400 keys 1-5
    // are at v2, key 6 is deleted, key 11 exists
    val at200 = CdcHistoryJob.asOfSnapshot(spark, store, lit(200L))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(4)))
    assert(at200.toSeq == (1L to 10L).map(i => (i, i * 1.0)))
    val at400 = CdcHistoryJob.asOfSnapshot(spark, store, lit(400L))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(4)))
    assert(at400.toSeq ==
      ((1L to 5L).map(i => (i, i * 10.0)) ++
        (7L to 10L).map(i => (i, i * 1.0)) :+ ((11L, 11.0))))
    // a genuinely NEW out-of-order event still raises loudly
    val ex = intercept[Exception] {
      CdcHistoryJob.mergeBatch(store,
        Seq((7L, 50L, 999L, "u", 7.5)).toDF("k", "t", "tie", "op", "v"),
        cfg)
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(_.contains("not strictly newer")), ex.toString)
    assert(hist().collect().toSeq == want, "failed merge must not corrupt")
  }

  test("quality monitor: per-batch streaming expectation reports equal the batch gate") {
    import graft.operators.Pipelines.Expectation._
    val dir = Files.createTempDirectory("graft_qm").toString
    val src = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    val rules = Seq(NotNull("text", maxNullFrac = 0.2),
      InRange("n", 0, 50, minFrac = 0.9))
    // batch 1 clean; batch 2 null-floods text and drifts n out of range
    val b1 = (1L to 20L).map(i => (i, s"doc $i", i % 40))
    val b2 = (21L to 40L).map(i =>
      (i, if (i % 2 == 0) null else s"doc $i", 100 + i))
    // one PHYSICAL file per source batch: maxFilesPerTrigger=1 makes
    // files the batch unit, and DataFrame.write emits many parts
    def jsonLine(r: (Long, String, Long)): String = {
      val t = Option(r._2).map(s => "\"" + s + "\"").getOrElse("null")
      s"""{"id":${r._1},"text":$t,"n":${r._3}}"""
    }
    Files.write(java.nio.file.Paths.get(s"$src/b1.json"),
      b1.map(jsonLine).mkString("\n").getBytes)
    Files.write(java.nio.file.Paths.get(s"$src/b2.json"),
      b2.map(jsonLine).mkString("\n").getBytes)
    val stream = spark.readStream
      .schema("id LONG, text STRING, n LONG")
      .option("maxFilesPerTrigger", 1)
      .json(s"$src/*")
    val q = graft.jobs.QualityMonitorJob.runStreaming(
      stream, rules, out, ckpt, Trigger.AvailableNow())
    q.awaitTermination()
    val report = spark.read.parquet(out)
    val ids = report.select("batch_id").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(ids.length == 2, s"one report per micro-batch, got ${ids.toSeq}")
    assert(report.count() == 2L * rules.size)
    // each batch's report rows ≡ the batch operator on that batch's
    // rows; map report ids to source batches by the null-fraction
    // metric (file pickup order is not contractual)
    val cleanId = report
      .where(col("rule") === "not_null" && col("metric") === 0.0)
      .select("batch_id").collect().map(_.getLong(0)).toSeq
    assert(cleanId.size == 1)
    val dirtyId = ids.filterNot(_ == cleanId.head).head
    val perBatch = Map(
      cleanId.head -> b1.toDF("id", "text", "n"),
      dirtyId -> b2.toDF("id", "text", "n"))
    for ((bid, df) <- perBatch) {
      val want = graft.operators.Pipelines.checkExpectations(df, rules)
        .collect().map(_.toString).sorted.toSeq
      val got = report.where(col("batch_id") === bid).drop("batch_id")
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, s"batch $bid")
    }
    // the alarm fires where it should: clean batch passes, drifted fails
    assert(report.where(col("batch_id") === cleanId.head && !col("passed"))
      .isEmpty)
    assert(report.where(col("batch_id") === dirtyId && !col("passed"))
      .count() == 2)
  }

  test("DriftMonitorJob: per-batch PSI vs a static reference — in-distribution batch quiet, shifted batch alarms") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_drift").toString
    val (src, out, ckpt) = (s"$dir/src", s"$dir/out", s"$dir/ckpt")
    Files.createDirectories(java.nio.file.Paths.get(src))
    val reference = (1 to 1000).map(i => i.toLong).toDF("n")
    // b1 drawn from the reference's range; b2 shifted far out of it
    val b1 = (1 to 500).map(i => (i * 2).toLong)
    val b2 = (1 to 500).map(i => (i + 100000).toLong)
    Files.write(java.nio.file.Paths.get(s"$src/b1.json"),
      b1.map(v => s"""{"n":$v}""").mkString("\n").getBytes)
    Files.write(java.nio.file.Paths.get(s"$src/b2.json"),
      b2.map(v => s"""{"n":$v}""").mkString("\n").getBytes)
    val stream = spark.readStream.schema("n LONG")
      .option("maxFilesPerTrigger", 1).json(s"$src/*")
    val q = graft.jobs.DriftMonitorJob.runStreaming(
      stream, reference, Seq("n"), out, ckpt,
      trigger = Trigger.AvailableNow())
    q.awaitTermination()
    def readReport() = spark.read.parquet(out)
      .where(col("metric") === "psi")
      .select(col("col_name"), col("value"), col("batch_id").cast("long"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val report = readReport()
    assert(report.length == 2) // one PSI row per (batch, column)
    val byPsi = report.map(r => r._2 -> r._3).sortBy(_._1)
    // in-distribution batch reads under the 0.25 act threshold, the
    // shifted batch far over it
    assert(byPsi.head._1 < 0.25 && byPsi.last._1 > 1.0, byPsi.toSeq)
    // report rows ≡ the batch psiDrift on the same frames
    val wantQuiet = graft.operators.Pipelines
      .psiDrift(reference, b1.toDF("n"), "n").collect().head.getDouble(2)
    val wantLoud = graft.operators.Pipelines
      .psiDrift(reference, b2.toDF("n"), "n").collect().head.getDouble(2)
    assert(Set(byPsi.head._1, byPsi.last._1) == Set(wantQuiet, wantLoud))
    // one data file per batch (not per batch×column)
    def dataFiles() = Files.walk(java.nio.file.Paths.get(out)).iterator()
      .asScala.map(_.getFileName.toString)
      .filter(f => f.startsWith("part-") && f.endsWith(".parquet")).toSeq
    assert(dataFiles().size == 2, dataFiles().toString)
    // foreachBatch is at-least-once: a full replay (fresh checkpoint,
    // same source, same batch ids) must overwrite its own batch_id
    // partitions, never append — rows and files stay exactly as before
    val q2 = graft.jobs.DriftMonitorJob.runStreaming(
      spark.readStream.schema("n LONG")
        .option("maxFilesPerTrigger", 1).json(s"$src/*"),
      reference, Seq("n"), out, s"$dir/ckpt_replay",
      trigger = Trigger.AvailableNow())
    q2.awaitTermination()
    assert(readReport().sorted.toSeq == report.sorted.toSeq)
    assert(dataFiles().size == 2, dataFiles().toString)
  }

  test("CrawlIngestJob: quality gate + dedup-vs-landed + generation appends, replay-idempotent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_crawl").toString
    val (src, out) = (s"$dir/src", s"$dir/out")
    Files.createDirectories(java.nio.file.Paths.get(src))
    def text(i: Long) = s"the data and value of table with more row item$i"
    def doc(id: Long, t: String) =
      s"""{"doc_id":$id,"text":"$t"}"""
    // batch 1: 20 passing docs + junk (fails the word-count gate)
    val b1 = (1L to 20L).map(i => doc(i, text(i))) :+ doc(99L, "zz")
    // batch 2: 10 new docs + 5 cross-batch content dups of batch 1 +
    // 1 within-batch dup of doc 21 + junk
    val b2 = (21L to 30L).map(i => doc(i, text(i))) ++
      (1L to 5L).map(i => doc(100L + i, text(i))) :+
      doc(106L, text(21L)) :+ doc(199L, "zz")
    Files.write(java.nio.file.Paths.get(s"$src/b1.json"),
      b1.mkString("\n").getBytes)
    Files.write(java.nio.file.Paths.get(s"$src/b2.json"),
      b2.mkString("\n").getBytes)
    def run(ckpt: String) = {
      val q = graft.jobs.CrawlIngestJob.runStreaming(
        spark.readStream.schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", 1).json(s"$src/*"),
        "doc_id", "text", contentCols = Seq("doc_id", "text"),
        outDir = out, checkpoint = s"$dir/$ckpt", minWords = 5,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    run("ckpt")
    def landed() = spark.read.parquet(out)
      .select(col("doc_id"), col("gen").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
    val first = landed()
    // gate dropped the junk, dedup dropped the 5 cross-batch and 1
    // within-batch content dups: exactly ids 1-30, gen 0 then gen 1
    assert(first.map(_._1) == (1L to 30L))
    assert(first.filter(_._2 == 0L).map(_._1) == (1L to 20L))
    assert(first.filter(_._2 == 1L).map(_._1) == (21L to 30L))
    // the manifest agrees with the landed table
    val manifest = spark.read.parquet(s"$out/_manifest")
    assert(manifest.agg(sum("rows")).head().getLong(0) == 30L)
    assert(manifest.select("gen").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L))
    // a full replay (fresh checkpoint, same source, same batch ids)
    // overwrites each generation with itself — never dedups a batch
    // against its own landed rows, never duplicates
    run("ckpt_replay")
    assert(landed() == first)
    assert(spark.read.parquet(s"$out/_manifest")
      .agg(sum("rows")).head().getLong(0) == 30L)
  }

  test("CrawlIngestJob: nearDupTau drops a paraphrased cross-batch duplicate; replay stays idempotent") {
    val dir = Files.createTempDirectory("graft_crawl_nd").toString
    val (src, out) = (s"$dir/src", s"$dir/out")
    Files.createDirectories(java.nio.file.Paths.get(src))
    // per-doc texts share only 6 template tokens (pairwise J = 6/22 ≈
    // 0.27, safely below tau) so only the PLANTED paraphrase trips the
    // near-dup stage; "the"/"and" keep the Gopher stopword gate green
    def text(i: Long) = s"the document number $i talks and about " +
      s"topic$i subject$i theme$i detail$i widget$i gadget$i notion$i"
    def doc(id: Long, t: String) = s"""{"doc_id":$id,"text":"$t"}"""
    // batch 2 carries: one genuinely new doc, one PARAPHRASE of a
    // batch-1 doc (one word swapped → token Jaccard 13/15 ≈ 0.867 ≥
    // tau=0.7, but NOT byte-identical, so exact dedup alone lands it),
    // and one distant text sharing a few tokens (5/23 ≈ 0.22) that
    // must survive
    val nearDup = "the document number 1 talks and regarding " +
      "topic1 subject1 theme1 detail1 widget1 gadget1 notion1" // ≈ 0.867
    val farDup = "the document number 9 mentions and topic1 plus " +
      "wholly unrelated words in this sentence"                // ≈ 0.22
    Files.write(java.nio.file.Paths.get(s"$src/b1.json"),
      (1L to 5L).map(i => doc(i, text(i))).mkString("\n").getBytes)
    Files.write(java.nio.file.Paths.get(s"$src/b2.json"),
      Seq(doc(6L, text(6L)), doc(101L, nearDup), doc(102L, farDup))
        .mkString("\n").getBytes)
    def run(ckpt: String) = {
      val q = graft.jobs.CrawlIngestJob.runStreaming(
        spark.readStream.schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", 1).json(s"$src/*"),
        "doc_id", "text", contentCols = Seq("doc_id", "text"),
        outDir = out, checkpoint = s"$dir/$ckpt", minWords = 5,
        trigger = Trigger.AvailableNow(), nearDupTau = Some(0.7))
      q.awaitTermination()
    }
    run("ckpt")
    def landed() = spark.read.parquet(out)
      .select(col("doc_id"), col("gen").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
    val first = landed()
    // 101 (above-tau paraphrase) dropped; 102 (below-tau) landed
    assert(first.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L, 6L, 102L), first)
    assert(first.filter(_._2 == 1L).map(_._1) == Seq(6L, 102L))
    // the banded seen-state persisted per generation (the derived
    // cache the stage reads instead of re-banding the corpus)
    val bandGens = spark.read.parquet(s"$out/_bands_nh64_b32")
      .select(col("gen").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(bandGens == Set(0L, 1L), bandGens.toString)
    // full replay (fresh checkpoint): gen 1 must not dedup against its
    // own crashed write nor re-land the paraphrase — bit-stable
    run("ckpt_replay")
    assert(landed() == first)
    assert(spark.read.parquet(s"$out/_manifest")
      .agg(sum("rows")).head().getLong(0) == 7L)
    // crash-heal: a lost band cache (e.g. a crash between a data land
    // and its band append) rebuilds from the landed data — the replay
    // must still drop the paraphrase, never silently skip a generation
    val bandsDir = java.nio.file.Paths.get(s"$out/_bands_nh64_b32")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(bandsDir).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
    run("ckpt_replay2")
    assert(landed() == first)
    assert(spark.read.parquet(s"$out/_bands_nh64_b32")
      .select(col("gen").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet == Set(0L, 1L))
  }

  test("WebDataset streaming readback: a trainer-side stream sees each landed generation's members exactly once") {
    import graft.sources.WebDataset
    val dir = Files.createTempDirectory("graft_wds_stream").toString
    val (out, ckpt) = (s"$dir/out", s"$dir/ckpt")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val even = docs.where(col("doc_id") % 2 === 0)
    val odd = docs.where(col("doc_id") % 2 === 1)
    def land(df: org.apache.spark.sql.DataFrame, gen: Long) =
      WebDataset.exportWebDatasetIncremental(df, "doc_id",
        contentCols = Seq("doc_id", "text"), outDir = out,
        generation = gen, targetShardBytes = 64L * 1024)
    land(even, 0L)
    val q = WebDataset.readWebDatasetStream(spark, out)
      .select(col("member"))
      .writeStream.format("memory").queryName("wds_readback")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    q.processAllAvailable()
    def members() = spark.table("wds_readback")
      .collect().map(_.getString(0)).toSeq
    // two members per doc ({id}.doc_id + {id}.text), delivered once
    assert(members().length == 2 * even.count(), members().length)
    // a new generation lands WHILE the stream runs: its members arrive,
    // gen 0's are not re-delivered — old + new exactly once each
    land(odd, 1L)
    q.processAllAvailable()
    q.stop()
    val all = members()
    assert(all.length == 2 * docs.count(), all.length)
    assert(all.distinct.length == all.length, "stream re-delivered members")
    val wantKeys = docs.collect().map(_.getLong(0))
      .flatMap(id => Seq(s"$id.doc_id", s"$id.text")).sorted.toSeq
    assert(all.sorted == wantKeys)
  }

  test("CrawlIngestJob: first-batch crash replay (own generation landed, no band cache) does not wedge") {
    val dir = Files.createTempDirectory("graft_crawl_fb").toString
    val (src, out) = (s"$dir/src", s"$dir/out")
    Files.createDirectories(java.nio.file.Paths.get(src))
    def text(i: Long) = s"the document number $i talks and about " +
      s"topic$i subject$i theme$i detail$i widget$i gadget$i notion$i"
    Files.write(java.nio.file.Paths.get(s"$src/b1.json"),
      (1L to 3L).map(i =>
        s"""{"doc_id":$i,"text":"${text(i)}"}""").mkString("\n").getBytes)
    def run(ckpt: String) = {
      val q = graft.jobs.CrawlIngestJob.runStreaming(
        spark.readStream.schema("doc_id LONG, text STRING")
          .option("maxFilesPerTrigger", 1).json(s"$src/*"),
        "doc_id", "text", contentCols = Seq("doc_id", "text"),
        outDir = out, checkpoint = s"$dir/$ckpt", minWords = 5,
        trigger = Trigger.AvailableNow(), nearDupTau = Some(0.7))
      q.awaitTermination()
    }
    run("ckpt")
    // simulate the crash window: batch 0's data landed, the band cache
    // never written, the checkpoint lost — the replay sees its OWN
    // generation as the only landed data and must neither wedge on the
    // missing band path nor dedup itself to nothing
    val bandsDir = java.nio.file.Paths.get(s"$out/_bands_nh64_b32")
    Files.walk(bandsDir).iterator().asScala.toSeq.reverse
      .foreach(Files.delete)
    run("ckpt_replay")
    val landed = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(landed == Seq(1L, 2L, 3L), landed.toString)
    // the band cache is re-established by the replayed batch's append
    assert(spark.read.parquet(s"$out/_bands_nh64_b32")
      .select(col("gen").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("TrainFeedJob: streamed generations tokenize + pack ≡ the batch operators per landed slice") {
    import graft.operators.Pipelines
    import graft.sources.WebDataset
    val dir = Files.createTempDirectory("graft_feed").toString
    val (corpus, tok, out, ckpt) =
      (s"$dir/corpus", s"$dir/tok", s"$dir/feed", s"$dir/ckpt")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val even = docs.where(col("doc_id") % 2 === 0)
    val odd = docs.where(col("doc_id") % 2 === 1)
    // the mounted tokenizer: trained once upstream, versioned
    val model = Pipelines.bpeTrainModel(docs, "text", numMerges = 20)
    Pipelines.bpeSave(spark, model, tok, 1L)
    def land(df: org.apache.spark.sql.DataFrame, gen: Long) =
      WebDataset.exportWebDatasetIncremental(df, "doc_id",
        contentCols = Seq("doc_id", "text"), outDir = corpus,
        generation = gen, targetShardBytes = 64L * 1024)
    // land-then-drain cadence with ONE checkpoint lineage (the trainer
    // posture): each AvailableNow run consumes exactly the generations
    // committed since the last, so batch scope ≡ landed slice. (A
    // live trigger RACING an in-progress export may split one
    // generation's progressively-committed tars across batches — each
    // batch still packs correctly over its own slice, but slice
    // boundaries then follow arrival, not generations.)
    def drain(): Unit = {
      val q = graft.jobs.TrainFeedJob.runStreaming(spark, corpus, tok,
        outDir = out, checkpoint = ckpt, capacity = 64, shards = 4,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    land(even, 0L)
    drain()
    land(odd, 1L)
    drain() // checkpoint resume: only gen 1 is new → batch 1
    // per-batch feed rows ≡ the batch operators over that generation's
    // decoded docs — tokenization, packing offsets/windows, and ids
    def expected(df: org.apache.spark.sql.DataFrame) = {
      val enc = Pipelines.bpeEncodeWith(
        df.select(col("doc_id").cast("string").as("doc_id"),
          col("text")), "doc_id", "text", model)
      Pipelines.packSequences(
          enc.select(col("doc_id"), col("n_tokens").as("nt")),
          "doc_id", "nt", capacity = 64, shards = 4)
        .join(enc.select(col("doc_id"), col("ids_str")), "doc_id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getString(7))).toSet
    }
    val feed = spark.read.parquet(out)
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("gstart"),
        col("start_bin"), col("end_bin"), col("bin_offset"),
        col("ids_str"), col("batch_id").cast("long"))
    def got(b: Long) = feed.where(col("batch_id") === b).drop("batch_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getString(7))).toSet
    assert(got(0L) == expected(even) && got(0L).nonEmpty)
    assert(got(1L) == expected(odd) && got(1L).nonEmpty)
    assert(feed.select("batch_id").distinct().count() == 2)

    // the unigram family through the same feed — and through the
    // DISTRIBUTED trainer + artifact seam (train → save → mount):
    // a fresh checkpoint sees both landed generations as one batch,
    // so the pack scope is the whole corpus
    val um = Pipelines.unigramTrainModelDistributed(docs, "text",
      vocabSize = 60, maxPieceLen = 4, emIters = 2)
    Pipelines.unigramSave(spark, um, s"$dir/utok", 1L)
    val q2 = graft.jobs.TrainFeedJob.runStreaming(spark, corpus,
      s"$dir/utok", outDir = s"$dir/ufeed", checkpoint = s"$dir/uckpt",
      capacity = 64, shards = 4, tokenizer = "unigram",
      trigger = Trigger.AvailableNow())
    q2.awaitTermination()
    val encU = Pipelines.unigramEncodeWith(
      docs.select(col("doc_id").cast("string").as("doc_id"),
        col("text")), "doc_id", "text", um)
    val wantU = Pipelines.packSequences(
        encU.select(col("doc_id"), col("n_tokens").as("nt")),
        "doc_id", "nt", capacity = 64, shards = 4)
      .join(encU.select(col("doc_id"), col("ids_str")), "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getString(7))).toSet
    val gotU = spark.read.parquet(s"$dir/ufeed")
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("gstart"),
        col("start_bin"), col("end_bin"), col("bin_offset"), col("ids_str"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getString(7))).toSet
    assert(gotU == wantU && gotU.nonEmpty)

    // an unknown tokenizer family refuses loudly, before starting
    val eTok = intercept[IllegalArgumentException](
      graft.jobs.TrainFeedJob.runStreaming(spark, corpus, tok,
        outDir = s"$dir/x", checkpoint = s"$dir/xc",
        tokenizer = "word2vec"))
    assert(eTok.getMessage.contains("unknown tokenizer"), eTok.getMessage)
  }

  test("DriftMonitorJob: planted categorical shift and novel envelope field raise their alarm rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_drift_cat").toString
    val (out, ckpt) = (s"$dir/out", s"$dir/ckpt")
    def envelope(extra: String): String =
      s"""{"value": "{\\"after\\": {\\"ref\\": 1, \\"city_id\\": 10, \\"city_name\\": \\"beijing\\", \\"c_time\\": 1704067200000$extra}}"}"""
    val conforming = envelope("")
    // plain (uninterpolated) triple quotes: \" here is a literal
    // backslash-quote, the inner-JSON escape the envelope needs
    val novel = envelope(""", \"population\": 24870000""")
    val reference = (1 to 100)
      .map(i => (i.toLong, if (i % 3 == 0) "fr" else "en"))
      .toDF("n", "lang")
    // b1 in-distribution everywhere; b2: every lang a NOVEL category,
    // every envelope carrying an upstream-added field
    val b1 = (1 to 60).map(i =>
      (i.toLong, if (i % 3 == 0) "fr" else "en", conforming))
    // one undecodable envelope rides along: corruption is not drift
    // and must not dilute the schema alarm's denominator
    val b2 = (1 to 60).map(i => (i.toLong, "zz", novel)) :+
      ((61L, "zz", "not json at all"))
    val mem = MemoryStream[(Long, String, String)]
    val q = graft.jobs.DriftMonitorJob.runStreaming(
      mem.toDF().toDF("n", "lang", "payload"), reference, Seq("n"),
      out, ckpt, trigger = Trigger.ProcessingTime(100),
      catCols = Seq("lang"), envelopeCol = Some("payload"))
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val report = spark.read.parquet(out)
      .select(col("col_name"), col("metric"), col("value"),
        col("batch_id").cast("long"))
      .collect().map(r =>
        (r.getString(1), r.getLong(3)) -> ((r.getString(0), r.getDouble(2))))
      .toMap
    // one row per (batch, surface): psi + js_cat + unknown_key_rate × 2
    assert(report.size == 6, report.toString)
    // the categorical alarm: quiet on the in-distribution batch, loud
    // when every value is a never-seen category
    assert(report(("js_cat", 0L))._2 < 0.05, report.toString)
    assert(report(("js_cat", 1L))._2 > 0.3, report.toString)
    // the schema alarm: zero on conforming envelopes, 1.0 when every
    // DECODABLE row carries the upstream-added field (the planted
    // corrupt envelope is excluded from the denominator — rate would
    // read 60/61 otherwise)
    assert(report(("unknown_key_rate", 0L))._2 == 0.0)
    assert(report(("unknown_key_rate", 1L))._2 == 1.0)
    // the numeric PSI surface still reports per batch
    assert(report.contains(("psi", 0L)) && report.contains(("psi", 1L)))
    // report rows ≡ the batch categoricalDrift on the same frames
    val wantLoud = graft.operators.Pipelines
      .categoricalDrift(reference.select("lang"),
        b2.map(_._2).toDF("lang"), "lang")
      .head().getAs[Double]("js")
    assert(report(("js_cat", 1L))._2 == wantLoud)
  }

  test("DriftMonitorJob: refuses a flat-append metrics dir from the pre-partitioned layout") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_drift_guard").toString
    val (out, ckpt) = (s"$dir/out", s"$dir/ckpt")
    // a root-level part file is the old deployment's signature: batch_id
    // lived in the data, not the directory — mixing layouts would fail
    // confusingly at read time, so the job must fail fast at start
    Files.createDirectories(java.nio.file.Paths.get(out))
    Files.write(java.nio.file.Paths.get(s"$out/part-00000-old.parquet"),
      Array[Byte](1, 2, 3))
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/src"))
    val stream = spark.readStream.schema("n LONG").json(s"$dir/src")
    val e = intercept[IllegalArgumentException] {
      graft.jobs.DriftMonitorJob.runStreaming(
        stream, (1L to 10L).toDF("n"), Seq("n"), out, ckpt,
        trigger = Trigger.AvailableNow())
    }
    assert(e.getMessage.contains("flat-append"), e.getMessage)
  }

  test("T7×retention: streaming cohort activity equals the batch triangle across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.operators.EventAnalytics
      .retentionCohorts(Tables.events(spark, sfDir), "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    val rows = eventRows.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val mem = MemoryStream[Ev]
    val q = StreamOps.streamingCohortActivity(mem.toDF())
      .writeStream.format("memory").queryName("tcohort")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // each (user, offset) emits at most once, so a plain count per
    // (cohort, offset) is the triangle's n_users
    val got = spark.table("tcohort")
      .groupBy("cohort_week", "week_offset").count()
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == batch, s"stream=$got batch=$batch")
    assert(batch.size > 2) // several cohort/offset cells on the fixture
  }

  test("T7×funnel: parameterized columns wire through (renamed schema matches batch)") {
    // Timer-driven eviction is untestable deterministically — a
    // ProcessingTimeTimeout makes the trigger loop fire continuously,
    // so processAllAvailable/AvailableNow never latch; the eviction
    // branch is two lines (hasTimedOut → remove). What IS asserted:
    // the userCol/typeCol/tsCol parameters drive a renamed schema to
    // the same counts as the batch funnel.
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq("view", "click")
    val rows = eventRows.filter(_.event_id < 2000L).sortBy(_.ts.getTime)
    val renamed = rows.map(e => (e.user_id, e.event_type, e.ts))
    val mem = MemoryStream[(Long, String, Timestamp)]
    mem.addData(renamed: _*)
    val q = StreamOps.streamingFunnel(
        mem.toDF().toDF("uid", "etype", "etime"), stages, 172800L,
        userCol = "uid", typeCol = "etype", tsCol = "etime")
      .writeStream.format("memory").queryName("tfunnel_to")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batch = graft.operators.EventAnalytics
      .funnelStages(Tables.events(spark, sfDir).where(col("event_id") < 2000L),
        "user_id", "event_type", "ts", stages, 172800L)
      .orderBy("stage").collect().map(_.getLong(2)).toSeq
    val finals = spark.table("tfunnel_to")
      .groupBy("user_id").agg(max(col("stages_reached")).as("s"))
      .select("s").as[Int].collect()
    val got = (1 to stages.size).map(k => finals.count(_ >= k).toLong)
    assert(got == batch, s"stream=$got batch=$batch")
  }
}
