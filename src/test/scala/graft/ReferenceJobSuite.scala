package graft

import graft.jobs.CdcToOrcJob
import graft.sources.OrcTableSink
import graft.streaming.StreamOps
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** End-to-end re-expression of the reference's sample job (App.txt:26-73):
  * CDC envelopes stream in, a partitioned-ORC warehouse table comes out,
  * exactly-once, with the reference's directory layout — plus the S12
  * catalog registration and the T7 custom-state operator. */
class ReferenceJobSuite extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Reference-shaped envelope (FIXTURES §2): value is a JSON *string*. */
  private def envelope(ref: Long, cityId: Long, name: String, epochMs: Long): String = {
    val after = s"""{\\"ref\\": $ref, \\"city_id\\": $cityId, \\"city_name\\": \\"$name\\", \\"c_time\\": $epochMs}"""
    s"""{"value": "{\\"after\\": $after}"}"""
  }

  test("App.txt job: CDC stream → partitioned ORC warehouse, exactly-once") {
    val dir = Files.createTempDirectory("graft_job").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    // 2024-01-01T00:00Z+8h → 2024-01-01; 2024-01-01T20:00Z+8h → 2024-01-02
    mem.addData(
      envelope(1, 10, "beijing", 1704067200000L),
      envelope(2, 11, "shanghai", 1704139200000L))
    val q = CdcToOrcJob.run(mem.toDF().toDF("payload"), dir, "flink_orc",
      s"$dir/ckpt", Trigger.AvailableNow())
    q.awaitTermination()

    // reference layout: warehouse/flink_orc/c_date=YYYY-MM-DD/*.orc
    val parts = Files.list(Paths.get(dir, "flink_orc")).iterator().asScala
      .map(_.getFileName.toString).filterNot(_.startsWith("_")).toSet
    assert(parts == Set("c_date=2024-01-01", "c_date=2024-01-02"), parts.toString)

    val rows = spark.read.orc(s"$dir/flink_orc")
      .orderBy("ref")
      .select("ref", "city_id", "city_name", "c_date")
      .collect().map(_.toString).toSeq
    assert(rows == Seq("[1,10,beijing,2024-01-01]", "[2,11,shanghai,2024-01-02]"))

    // restart on the same checkpoint: no duplicate files/rows
    val q2 = CdcToOrcJob.run(mem.toDF().toDF("payload"), dir, "flink_orc",
      s"$dir/ckpt", Trigger.AvailableNow())
    q2.awaitTermination()
    assert(spark.read.orc(s"$dir/flink_orc").count() == 2L)
  }

  test("S12: warehouse dir registers as a partitioned catalog table") {
    val dir = Files.createTempDirectory("graft_cat").toString
    Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02"))
      .toDF("id", "v", "c_date")
      .write.format("orc").partitionBy("c_date").save(s"$dir/t1")
    OrcTableSink.registerTable(spark, dir, "t1", "c_date")
    try {
      assert(spark.sql("SELECT count(*) FROM t1").head().getLong(0) == 2L)
      // partition pruning works through the catalog table
      val pruned = spark.sql("SELECT id FROM t1 WHERE c_date = '2024-01-01'")
      assert(pruned.collect().map(_.getLong(0)).toSeq == Seq(1L))
      assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    } finally spark.sql("DROP TABLE IF EXISTS t1")
  }

  test("S2/S3 poison records: parse nulls them, corruptRecords quarantines exactly them") {
    import graft.sources.CdcIngest
    // one good record among every decode-failure class a CDC feed
    // produces: truncated JSON, non-JSON garbage, value not an object,
    // missing `after`, null payload — plus a decodable record carrying a
    // null FIELD, which is data (not corruption) and must NOT be flagged
    val good = envelope(1, 10, "beijing", 1704067200000L)
    val nullField =
      """{"value": "{\"after\": {\"ref\": null, \"city_id\": 12, \"city_name\": \"tianjin\", \"c_time\": 1704067200000}}"}"""
    val bad = Seq(
      """{"value": "{\"after\": {\"ref\": 7""", // truncated
      "not json at all",
      """{"value": "42"}""", // value decodes but is not an object
      """{"value": "{\"other\": 1}"}""", // no `after`
      null)
    val df = (Seq(good, nullField) ++ bad).toDF("payload")
    // a poison batch must not kill the job: every row still comes out...
    val parsed = CdcIngest.parse(df, "payload")
    assert(parsed.count() == 7)
    // ...good rows typed and correct, poison rows all-null
    assert(parsed.where(col("ref") === 1 && col("city_name") === "beijing" &&
      col("c_date") === "2024-01-01").count() == 1)
    assert(parsed.where(col("ref").isNull && col("city_id").isNull &&
      col("city_name").isNull).count() == bad.size.toLong)
    // the quarantine filter returns exactly the five undecodable rows —
    // not the null-field row, which parse surfaces with city_id=12
    val dead = CdcIngest.corruptRecords(df, "payload")
    assert(dead.count() == bad.size.toLong)
    assert(dead.where(col("payload").contains("tianjin")).count() == 0)
    assert(parsed.where(col("city_id") === 12).count() == 1)
    // goodRecords is the exact complement: the two sides partition the input
    val goodSide = CdcIngest.goodRecords(df, "payload")
    assert(goodSide.count() == 2L)
    assert(goodSide.intersect(dead).count() == 0L)
    assert(goodSide.count() + dead.count() == df.count())
  }

  test("S2/S3 schema drift: an upstream-added after-field routes loudly, declared fields still land") {
    import graft.sources.CdcIngest
    val conforming = envelope(1, 10, "beijing", 1704067200000L)
    // the producer added a column (and a nested one) without telling us
    val widened =
      """{"value": "{\"after\": {\"ref\": 2, \"city_id\": 11, \"city_name\": \"shanghai\", \"c_time\": 1704067200000, \"population\": 24870000, \"geo\": {\"lat\": 31.2}}}"}"""
    val corrupt = "not json at all"
    val df = Seq(conforming, widened, corrupt).toDF("payload")
    // drift detector: exactly the widened row, named unknown keys
    val drift = CdcIngest.schemaDriftRecords(df, "payload")
    assert(drift.count() == 1L)
    assert(drift.select(CdcIngest.unknownAfterKeys("payload"))
      .head().getSeq[String](0) == Seq("geo", "population"))
    // corruption stays corruption (never misread as drift), and the
    // conforming row is neither
    assert(CdcIngest.corruptRecords(df, "payload").count() == 1L)
    assert(CdcIngest.schemaDriftRecords(
      df.where(col("payload") === conforming), "payload").count() == 0L)
    // parse is UNCHANGED by drift: declared fields land on every
    // decodable row, the undeclared ones are simply absent
    val parsed = CdcIngest.parse(df, "payload")
    assert(parsed.where(col("ref") === 2 && col("city_name") === "shanghai" &&
      col("c_date") === "2024-01-01").count() == 1L)
    // widen mode: extras carries the new fields as JSON text, empty map
    // on conforming rows
    val evolved = CdcIngest.parseEvolved(df, "payload")
      .collect().map(r => Option(r.get(0)).map(_.toString) ->
        r.getMap[String, String](4)).toMap
    assert(evolved(Some("2")) ==
      Map("population" -> "24870000", "geo" -> """{"lat":31.2}"""))
    assert(evolved(Some("1")) == Map.empty)
    assert(evolved(None) == Map.empty) // corrupt row: all-null + empty extras
  }

  test("App.txt job survives poison records: good rows land, no null-partition dir") {
    // the reference's JSON.parseObject map + noRestart means one
    // malformed record kills the job; ours must drop it at the source —
    // neither crashing nor writing an all-null row into a
    // c_date=__HIVE_DEFAULT_PARTITION__ dir
    val dir = Files.createTempDirectory("graft_job_poison").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(
      envelope(1, 10, "beijing", 1704067200000L),
      """{"value": "{\"after\": {\"ref\": 7""", // truncated JSON
      "not json at all",
      envelope(2, 11, "shanghai", 1704139200000L))
    val q = CdcToOrcJob.run(mem.toDF().toDF("payload"), dir, "flink_orc",
      s"$dir/ckpt", Trigger.AvailableNow())
    q.awaitTermination()
    val out = spark.read.orc(s"$dir/flink_orc")
    assert(out.count() == 2L)
    assert(out.select("city_name").collect().map(_.getString(0)).toSet ==
      Set("beijing", "shanghai"))
    val partDirs = Files.list(Paths.get(dir, "flink_orc")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("c_date=")).toSet
    assert(partDirs == Set("c_date=2024-01-01", "c_date=2024-01-02"), partDirs)
  }

  test("T7 custom state: flatMapGroupsWithState accumulates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ev(id: Long, uid: Long, v: Double) = Ev(id, base, uid, "click", v)
    // ttl=None: with a processing-time timeout the engine schedules
    // timer-firing batches forever and processAllAvailable never quiesces
    val q = StreamOps.statefulRunningTotals(mem.toDF(), ttl = None)
      .writeStream.format("memory").queryName("t7s").outputMode("append")
      .trigger(Trigger.ProcessingTime(100)).start()
    mem.addData(ev(1, 1, 1.0), ev(2, 1, 2.0), ev(3, 2, 5.0))
    q.processAllAvailable()
    mem.addData(ev(4, 1, 4.0))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("t7s").groupBy("user_id")
      .agg(max("n").as("n"), max("total").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // user 1: batch1 (2, 3.0) then batch2 (3, 7.0); user 2: (1, 5.0)
    assert(last == Set((1L, 3L, 7.0), (2L, 1L, 5.0)))
  }
}
