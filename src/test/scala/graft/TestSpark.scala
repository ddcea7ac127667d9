package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks a single JVM). */
object TestSpark {
  lazy val spark: SparkSession = Engine.session("graft-test", cores = 4)
  val sfDir = "/root/testdata/sf0.001"
}
