package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspector: print `.explain("formatted")` for one
  * `SparkEntry.queries` entry — the fast path for the "is this the plan
  * you'd want at 100 TB" audit (pushdown reached the scan? broadcast
  * where expected? whole-stage codegen spans wide?).
  *
  * Usage: sbt "runMain graft.tools.ExplainOne q48_map_fns2 [sfDir]"
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q48_map_fns2")
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark: SparkSession = graft.Engine.configure(
      SparkSession.builder().master("local[4]").appName("graft-explain"),
      shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly)(name)(spark, sfDir)
      .explain("formatted")
    spark.stop()
  }
}
