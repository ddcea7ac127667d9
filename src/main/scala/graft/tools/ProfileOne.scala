package graft.tools

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Bench-hygiene profiler: time ONE `SparkEntry.queries` entry for K
  * passes and report per-pass wall time alongside the JVM's GC counters
  * (collection count + accumulated GC millis, deltas per pass). The
  * driver bench's TAIL-WARN separates "ambient load burst" from
  * "variance regression (GC/spill)" only statistically; this tool makes
  * the GC half observable directly — a pass whose wall blows up while
  * its GC delta stays flat is co-tenant noise, a pass whose wall tracks
  * its GC delta is allocation pressure in the query's own plan.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_DRIVER_MEM=2g \
  *   sbt "runMain graft.tools.ProfileOne q48_map_fns2 10"
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q48_map_fns2")
    val passes = args.lift(1).map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = graft.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-profile"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = (graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly)(name)
    def gc(): (Long, Long) = {
      val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
    }
    def run(): Unit = q(spark, sfDir).write.mode("overwrite").format("noop").save()
    // stage-level accounting: on a slow pass, was the time inside stages
    // (executor straggler) or between them (driver/planning/commit stall)?
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val taskMax = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val dur = te.taskInfo.duration
        val cpuMs = Option(te.taskMetrics).map(_.executorCpuTime / 1000000L).getOrElse(-1L)
        val gcMs = Option(te.taskMetrics).map(_.jvmGCTime).getOrElse(-1L)
        taskMax.merge(te.stageId, (dur, cpuMs, gcMs),
          (a, b) => if (a._1 >= b._1) a else b)
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for (s <- si.submissionTime; e <- si.completionTime) yield e - s
        val (mx, cpu, tgc) = taskMax.getOrDefault(si.stageId, (-1L, -1L, -1L))
        stages.add(f""""s${si.stageId}":{"wall":${dur.getOrElse(-1L) / 1e3}%.3f,"maxTask":${mx / 1e3}%.3f,"maxTaskCpu":${cpu / 1e3}%.3f,"maxTaskGc":${tgc / 1e3}%.3f,"nTasks":${si.numTasks}}""")
      }
    })
    run() // untimed warmup (JIT, codegen cache, file index)
    println(s"""{"profile":"$name","sf":"$sfDir","heap_mb":${Runtime.getRuntime.maxMemory() / (1 << 20)}}""")
    // JIT observability: a slow pass whose wall tracks a burst of JIT
    // compilation time (and a code-cache high-water move) is
    // deopt/recompile churn, not data-path cost
    val comp = java.lang.management.ManagementFactory.getCompilationMXBean
    def codeCacheUsedMb: Double =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(_.getUsage.getUsed).sum / 1048576.0
    (1 to passes).foreach { i =>
      stages.clear()
      taskMax.clear() // stale maxima would leak into this pass's stages
      val j0 = comp.getTotalCompilationTime
      val (c0, t0) = gc(); val w0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - w0) / 1e9; val (c1, t1) = gc()
      val jit = (comp.getTotalCompilationTime - j0) / 1e3
      // deterministic drain (not a sleep): stage-completed events must
      // all land before this pass's stats are read
      org.apache.spark.sql.graftbridge.ListenerBridge
        .drain(spark.sparkContext)
      println(f"""{"pass":$i,"wall_sec":$wall%.3f,"gc_count":${c1 - c0},"gc_sec":${(t1 - t0) / 1e3}%.3f,"jit_sec":$jit%.3f,"codecache_mb":$codeCacheUsedMb%.1f,"stages":{${stages.asScala.mkString(",")}}}""")
    }
    spark.stop()
  }
}
