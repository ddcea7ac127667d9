package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1-shaped smoke: every declared query runs green and non-empty at
  * sf0.001, and oracle keys line up with query keys. */
class QueriesSmokeSuite extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sfDir).count() > 0, s"$name returned 0 rows")
    }
  }
}
