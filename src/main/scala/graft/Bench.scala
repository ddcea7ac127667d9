package graft

import org.apache.spark.sql.SparkSession

/** Bench harness (driver-run per round → BENCH_r{N}.json).
  *
  * Times every `SparkEntry.queries` entry on SPARK_GRAFT_SF_DIR with full
  * materialization via a `noop`-format write (a bare `count()` would let
  * Catalyst prune computed columns and under-report). One untimed warmup
  * pass absorbs JIT/classloading so the timed pass measures the engine,
  * not the JVM. Prints exactly ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      shufflePartitions = cpus
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    // untimed warmup: JIT, codegen cache, file-index warm
    names.foreach { n =>
      try materialize(n)
      catch { case e: Throwable => System.err.println(s"[bench] warmup $n: ${e.getMessage}") }
    }
    val results = names.map { n =>
      val t0 = System.nanoTime()
      // failures must be loud: a swallowed throw would record its (fast)
      // failure time as a legitimate benchmark number
      try materialize(n)
      catch { case e: Throwable =>
        System.err.println(s"[bench] FAILED $n: ${e.getMessage}")
      }
      n -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
