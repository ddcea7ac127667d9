package graft

import graft.sources.{City, OrcTableSink}
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Layout golden test (SURVEY §5.4): partitioned-ORC warehouse layout must
  * match the reference's (RowTimeBucketer.scala:18 `field=value` dirs,
  * HiveOrcSink.java:70,209-210 per-bucket ORC files). */
class SinkLayoutSuite extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def listTree(root: Path): Seq[String] =
    Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => root.relativize(p).toString).toSeq

  test("S6: City rows land as warehouse/table/c_date=YYYY-MM-DD/*.orc") {
    val warehouse = Files.createTempDirectory("graft_wh").toString
    val rows = Seq(
      City(1L, 10L, "beijing", "2024-01-01"),
      City(2L, 11L, "shanghai", "2024-01-01"),
      City(3L, 12L, "chengdu", "2024-01-02"))
    OrcTableSink.writeBatch(rows.toDF(), warehouse, "flink_orc", "c_date")

    val files = listTree(java.nio.file.Paths.get(warehouse, "flink_orc"))
      .filterNot(f => f.endsWith("_SUCCESS") || f.contains(".crc"))
    assert(files.nonEmpty)
    // every data file sits in a c_date=<value> partition dir with .orc suffix
    assert(files.forall(f => f.matches("""c_date=\d{4}-\d{2}-\d{2}/part-.*\.orc""")), files.toString)
    assert(files.map(_.split("/")(0)).toSet ==
      Set("c_date=2024-01-01", "c_date=2024-01-02"))

    // read-back: schema (modulo partition-col position) and values survive
    val back = spark.read.orc(s"$warehouse/flink_orc")
      .select("ref", "city_id", "city_name", "c_date")
      .as[City].collect().sortBy(_.ref)
    assert(back.toSeq == rows)
  }

  test("S7: maxRecordsPerFile bounds file sizes (roll policy)") {
    val warehouse = Files.createTempDirectory("graft_wh2").toString
    val df = spark.range(100).select(
      col("id").as("ref"), col("id").as("city_id"),
      concat(lit("c"), col("id")).as("city_name"), lit("2024-01-01").as("c_date"))
    OrcTableSink.writeBatch(df.coalesce(1), warehouse, "t", "c_date", maxRecordsPerFile = 30L)
    val files = listTree(java.nio.file.Paths.get(warehouse, "t"))
      .filter(_.endsWith(".orc"))
    // 100 rows / 30-per-file roll → 4 files in the single partition dir
    assert(files.size == 4, files.toString)
  }
}
