package graft

import graft.sources.OrcTableSink
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** S12 through a real Hive metastore (local derby): the reference
  * registers its warehouse directory implicitly under HMS
  * (`HiveOrcSink.java:44,57-58,70`); these tests prove our
  * `registerTable` + `recoverPartitions` + partition-pruned reads run
  * against an actual HiveExternalCatalog, not the in-memory fallback. */
class HiveMetastoreSuite extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  test("the session catalog is a real Hive metastore") {
    assert(spark.conf.get("spark.sql.catalogImplementation") == "hive")
    val ext = spark.sharedState.externalCatalog.unwrapped.getClass.getName
    assert(ext.contains("HiveExternalCatalog"), ext)
  }

  test("registerTable + recoverPartitions discovers field=value dirs via HMS") {
    val wh = Files.createTempDirectory("graft_hms_tbl").toString
    val src = Tables.events(spark, sfDir)
      .withColumn("c_date", date_format(col("ts"), "yyyy-MM-dd"))
      .select("event_id", "user_id", "event_type", "c_date")
    OrcTableSink.writeBatch(src, wh, "hms_events", "c_date")
    spark.sql("DROP TABLE IF EXISTS hms_events")
    OrcTableSink.registerTable(spark, wh, "hms_events", "c_date")
    try {
      assert(spark.catalog.tableExists("hms_events"))
      // partitions must be visible to the metastore, not just the scan
      val parts = spark.sql("SHOW PARTITIONS hms_events").collect().map(_.getString(0))
      assert(parts.nonEmpty && parts.forall(_.startsWith("c_date=")), parts.toSeq)
      assert(spark.table("hms_events").count() == src.count())
    } finally spark.sql("DROP TABLE IF EXISTS hms_events")
  }

  test("partition pruning works through the HMS catalog table") {
    val wh = Files.createTempDirectory("graft_hms_pp").toString
    spark.range(100)
      .select(col("id"), when(col("id") % 2 === 0, "2024-01-01")
        .otherwise("2024-01-02").as("c_date"))
      .write.format("orc").partitionBy("c_date").save(s"$wh/t")
    spark.sql("DROP TABLE IF EXISTS hms_pp")
    OrcTableSink.registerTable(spark, wh, "t", "c_date")
    try {
      // table name is the dir name; re-register under a known name
      val q = spark.table("t").where(col("c_date") === "2024-01-01")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("2024-01-01"), plan)
      assert(q.count() == 50L)
    } finally spark.sql("DROP TABLE IF EXISTS t")
  }

  test("DPP: star join over the date-partitioned warehouse table prunes fact partitions at runtime") {
    // SURVEY §4.2 on the REAL artifact (not a synthetic range table):
    // the events warehouse written by OrcTableSink with c_date dirs,
    // registered through the derby HMS, joined to a file-backed dim
    // whose selective filter must reach the fact scan as a
    // dynamicpruning subquery — at 100 TB this is the difference
    // between scanning one day and scanning the whole warehouse
    val wh = Files.createTempDirectory("graft_hms_dpp").toString
    val src = Tables.events(spark, sfDir)
      .withColumn("c_date", date_format(col("ts"), "yyyy-MM-dd"))
      .select("event_id", "user_id", "event_type", "c_date")
    OrcTableSink.writeBatch(src, wh, "dpp_events", "c_date")
    spark.sql("DROP TABLE IF EXISTS dpp_events")
    OrcTableSink.registerTable(spark, wh, "dpp_events", "c_date")
    try {
      val dates = src.select("c_date").distinct()
        .orderBy("c_date").collect().map(_.getString(0))
      assert(dates.length >= 2, s"fixture needs >1 partition, got ${dates.toSeq}")
      val hot = dates.head
      spark.createDataFrame(dates.toSeq.map(d => (d, if (d == hot) "hot" else "cold")))
        .toDF("c_date", "tier")
        .write.format("orc").mode("overwrite").save(s"$wh/dim")
      val dim = spark.read.orc(s"$wh/dim")
      val joined = spark.table("dpp_events")
        .join(broadcast(dim), "c_date").where(col("tier") === "hot")
        .groupBy("c_date").agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.toLowerCase.contains("dynamicpruning"), p)
      val rows = joined.collect()
      val expect = src.where(col("c_date") === hot).count()
      assert(rows.length == 1 && rows.head.getLong(1) == expect, rows.toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS dpp_events")
  }

  test("S6×S12: streaming ORC sink composes with HMS registration + pruned read") {
    // the reference treats sink + metastore as one thing
    // (HiveOrcSink.java:57,66-71); this is the composed seam: streamWriter
    // (exactly-once _spark_metadata log) → registerTable/recoverPartitions
    // through the derby HMS → partition-pruned read off the catalog table
    val wh = Files.createTempDirectory("graft_hms_stream").toString
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-01-02"))
    val q = OrcTableSink.streamWriter(mem.toDF().toDF("id", "c_date"),
        wh, "hms_stream", "c_date", s"$wh/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.sql("DROP TABLE IF EXISTS hms_stream")
    OrcTableSink.registerTable(spark, wh, "hms_stream", "c_date")
    try {
      val parts = spark.sql("SHOW PARTITIONS hms_stream")
        .collect().map(_.getString(0)).toSet
      assert(parts == Set("c_date=2024-01-01", "c_date=2024-01-02"), parts)
      val pruned = spark.table("hms_stream").where(col("c_date") === "2024-01-01")
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("2024-01-01"), plan)
      assert(pruned.count() == 2L)
    } finally spark.sql("DROP TABLE IF EXISTS hms_stream")
  }

  test("S6×S12: registration refuses a streaming dir with uncommitted orphan files") {
    // a crashed micro-batch leaves a data file on disk that the
    // _spark_metadata log never committed; path-based reads filter it via
    // MetadataLogFileIndex, but catalog reads list directories — so
    // registerTable must reconcile and refuse until the orphan is gone
    val wh = Files.createTempDirectory("graft_hms_orphan").toString
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "2024-01-01"), (2L, "2024-01-02"))
    val q = OrcTableSink.streamWriter(mem.toDF().toDF("id", "c_date"),
        wh, "hms_orphan", "c_date", s"$wh/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // inject the orphan exactly as a crash would: a part- file in a
    // partition dir, absent from the commit log (content never read)
    val orphan = java.nio.file.Paths.get(wh, "hms_orphan",
      "c_date=2024-01-01", "part-00000-deadbeef-c000.orc")
    Files.write(orphan, Array[Byte](79, 82, 67))
    spark.sql("DROP TABLE IF EXISTS hms_orphan")
    val e = intercept[IllegalArgumentException] {
      OrcTableSink.registerTable(spark, wh, "hms_orphan", "c_date")
    }
    assert(e.getMessage.contains("deadbeef"), e.getMessage)
    // and the path-based read indeed never served it (committed rows only)
    assert(spark.read.orc(s"$wh/hms_orphan").count() == 2L)
    // orphan removed → registration proceeds and the table serves 2 rows
    Files.delete(orphan)
    OrcTableSink.registerTable(spark, wh, "hms_orphan", "c_date")
    try assert(spark.table("hms_orphan").count() == 2L)
    finally spark.sql("DROP TABLE IF EXISTS hms_orphan")
  }

  test("uncommittedDataFiles audits orphans created AFTER registration") {
    // registerTable's reconcile is registration-time only: a stream that
    // keeps writing (or crashes) after the table is registered can still
    // leave orphans that catalog reads would serve. The public audit is
    // the runtime check for that regime — clean dir → empty; orphan
    // appears post-registration → reported; removed → empty again.
    val wh = Files.createTempDirectory("graft_hms_audit").toString
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "2024-01-01"), (2L, "2024-01-02"))
    val q = OrcTableSink.streamWriter(mem.toDF().toDF("id", "c_date"),
        wh, "hms_audit", "c_date", s"$wh/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.sql("DROP TABLE IF EXISTS hms_audit")
    OrcTableSink.registerTable(spark, wh, "hms_audit", "c_date")
    try {
      assert(OrcTableSink.uncommittedDataFiles(spark, wh, "hms_audit").isEmpty)
      val orphan = java.nio.file.Paths.get(wh, "hms_audit",
        "c_date=2024-01-02", "part-00000-cafebabe-c000.orc")
      Files.write(orphan, Array[Byte](79, 82, 67))
      val found = OrcTableSink.uncommittedDataFiles(spark, wh, "hms_audit")
      assert(found.size == 1 && found.head.contains("cafebabe"), found)
      Files.delete(orphan)
      assert(OrcTableSink.uncommittedDataFiles(spark, wh, "hms_audit").isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS hms_audit")
  }

  test("uncommittedDataFiles handles a crash before the first batch commit") {
    // FileStreamSink creates _spark_metadata eagerly, so a first-batch
    // crash leaves the log present but EMPTY plus orphan part files; the
    // audit must report every data file as an orphan, not crash on the
    // unreadable (zero committed files) metadata-filtered read
    val wh = Files.createTempDirectory("graft_hms_firstcrash").toString
    val dir = java.nio.file.Paths.get(wh, "crashed", "c_date=2024-01-01")
    Files.createDirectories(dir.getParent.resolve("_spark_metadata"))
    Files.createDirectories(dir)
    Files.write(dir.resolve("part-00000-feedface-c000.orc"), Array[Byte](79, 82, 67))
    val found = OrcTableSink.uncommittedDataFiles(spark, wh, "crashed")
    assert(found.size == 1 && found.head.contains("feedface"), found)
  }

  test("tables survive a session restart against the same metastore (DDL durability)") {
    val wh = Files.createTempDirectory("graft_hms_dur").toString
    spark.range(10).select(col("id"), lit("2024-01-01").as("c_date"))
      .write.format("orc").partitionBy("c_date").save(s"$wh/dur")
    spark.sql("DROP TABLE IF EXISTS dur")
    OrcTableSink.registerTable(spark, wh, "dur", "c_date")
    try {
      // a new session over the same metastore must still see the table —
      // the property the reference gets from Hive's warehouse registration
      val s2 = spark.newSession()
      assert(s2.catalog.tableExists("dur"))
      assert(s2.table("dur").count() == 10L)
    } finally spark.sql("DROP TABLE IF EXISTS dur")
  }
}
