package graft

import org.apache.spark.sql.SparkSession

/** One-off single-query timer for optimization work:
  *   sbt "runMain graft.TimeOne x_entity_match /root/testdata/sf0.1 3"
  * runs the named `SparkEntry.queries` entry (or benchOnly entry)
  * `samples` times with the Bench noop-write materialization and prints
  * each wall plus the min. NOT part of any gate — the certified numbers
  * come from `graft.Bench`'s interleaved passes. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeOne <query> <sfDir> [samples]")
    val (name, dir) = (args(0), args(1))
    val samples = if (args.length > 2) args(2).toInt else 3
    val all = SparkEntry.queries ++ SparkEntry.benchOnly
    val q = all.getOrElse(name,
      sys.error(s"unknown query $name (known: ${all.keys.toSeq.sorted.mkString(", ")})"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-time-one"),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val walls = (1 to samples).map { i =>
      val t0 = System.nanoTime()
      q(spark, dir).write.mode("overwrite").format("noop").save()
      val w = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[time-one] $name sample $i: $w%.3f s")
      w
    }
    println(f"""{"query":"$name","min_sec":${walls.min}%.3f,"samples":$samples}""")
    spark.stop()
  }
}
