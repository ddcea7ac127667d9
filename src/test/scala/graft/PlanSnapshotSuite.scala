package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard over the ENTIRE declared query surface:
  * for every `SparkEntry.queries` entry, count the physical-plan nodes
  * that decide scale behavior (shuffle exchanges, join strategies,
  * windows, cartesians) in the un-executed AQE initial plan at the test
  * SF and diff against a golden snapshot committed to the repo.
  *
  * PlanShapeSuite pins ~30 entries' shapes with intent-specific
  * asserts; this suite is the blanket tripwire for the rest — a
  * refactor or Spark upgrade that silently flips a broadcast join to a
  * sort-merge, grows an extra Exchange, or sneaks in a cartesian now
  * fails `sbt test` loudly instead of only slowing the bench.
  *
  * Regenerate after an INTENDED plan change with
  * `GRAFT_PLANSHAPES_REGEN=true sbt "testOnly graft.PlanSnapshotSuite"`
  * and review the diff like any other golden file. */
class PlanSnapshotSuite extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  /** The node kinds whose counts define a plan's scale posture.
    * `\bExchange\b` does not match inside BroadcastExchange (word
    * boundary), so shuffle and broadcast exchanges count separately. */
  private val nodeKinds = Seq("Exchange", "BroadcastExchange",
    "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct", "Window")

  private def shapeOf(plan: String): Map[String, Int] =
    nodeKinds.iterator
      .map(k => k -> ("\\b" + k + "\\b").r.findAllMatchIn(plan).size)
      .filter(_._2 > 0).toMap

  private def render(shapes: Seq[(String, Map[String, Int])]): String =
    shapes.map { case (name, m) =>
      val body = nodeKinds.filter(m.contains)
        .map(k => s"$k=${m(k)}").mkString(" ")
      s"$name $body".trim
    }.mkString("", "\n", "\n")

  private def parseGolden(text: String): Map[String, Map[String, Int]] =
    text.linesIterator.filter(_.nonEmpty).map { line =>
      val parts = line.split(" ").toSeq
      parts.head -> parts.tail.map { kv =>
        val Array(k, v) = kv.split("=")
        k -> v.toInt
      }.toMap
    }.toMap

  test("every entry's physical-plan node counts match the golden snapshot") {
    val golden = new java.io.File("src/test/resources/plan_shapes.txt")
    val shapes = SparkEntry.queries.toSeq.sortBy(_._1)
      .map { case (name, fn) =>
        val df = fn(spark, sfDir)
        name -> shapeOf(df.queryExecution.executedPlan.toString)
      }
    // Test/fork=true: -D flags on the sbt JVM don't reach the forked
    // test JVM, so the env-var form is the reliable switch
    val regen = sys.props.get("graft.planshapes.regen").contains("true") ||
      sys.env.get("GRAFT_PLANSHAPES_REGEN").contains("true")
    if (regen || !golden.exists()) {
      golden.getParentFile.mkdirs()
      java.nio.file.Files.write(golden.toPath,
        render(shapes).getBytes("UTF-8"))
      info(s"golden snapshot ${if (regen) "regenerated" else "created"} " +
        s"with ${shapes.size} entries at ${golden.getPath}")
    } else {
      val want = parseGolden(new String(
        java.nio.file.Files.readAllBytes(golden.toPath), "UTF-8"))
      val missing = want.keySet.diff(shapes.map(_._1).toSet)
      val diffs = shapes.flatMap { case (name, got) =>
        want.get(name) match {
          case None =>
            Some(s"$name: NEW ENTRY, not in golden (regen to accept): " +
              render(Seq(name -> got)).trim)
          case Some(w) if w != got =>
            Some(s"$name: expected [${render(Seq(name -> w)).trim}] " +
              s"got [${render(Seq(name -> got)).trim}]")
          case _ => None
        }
      } ++ missing.toSeq.sorted.map(n => s"$n: in golden but no longer declared")
      assert(diffs.isEmpty,
        "plan shapes drifted (regen with GRAFT_PLANSHAPES_REGEN=true " +
          "ONLY for intended changes):\n" + diffs.mkString("\n"))
    }
  }
}
