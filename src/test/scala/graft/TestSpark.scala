package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks a single JVM).
  *
  * The session is Hive-enabled with a throwaway local derby metastore:
  * `spark.sql.catalogImplementation` is a static conf fixed by the first
  * session in the JVM, so proving the reference's Hive-metastore behavior
  * (HiveOrcSink.java:44,57 — tables registered under the warehouse) needs
  * the shared session itself to run against a real HMS. Every suite's
  * catalog operation (saveAsTable, recoverPartitions, SHOW PARTITIONS)
  * therefore exercises the Hive path, not the in-memory catalog.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val dir = java.nio.file.Files.createTempDirectory("graft_hms").toString
    System.setProperty("derby.system.home", dir)
    val s = Engine.configure(
      SparkSession.builder().master("local[4]").appName("graft-test")
        .config("spark.sql.catalogImplementation", "hive")
        .config("spark.sql.warehouse.dir", s"$dir/warehouse")
        .config("javax.jdo.option.ConnectionURL",
          s"jdbc:derby:;databaseName=$dir/metastore_db;create=true"),
      shufflePartitions = 4
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
