package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift canary: loads every table at sf0.001, forces analysis
  * (schema resolution catches loader/encoding mismatches like the r9
  * events.ts nanos→timestamp[us] drift) plus a 1-row action, so a
  * driver-side fixture regeneration fails here with a named table instead
  * of as a wall of opaque oracle misses. */
class FixtureSchemaSuite extends AnyFunSuite {
  import TestSpark.{sfDir, spark}

  private val loaders: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
    "region"     -> (() => Tables.region(spark, sfDir)),
    "nation"     -> (() => Tables.nation(spark, sfDir)),
    "customer"   -> (() => Tables.customer(spark, sfDir)),
    "supplier"   -> (() => Tables.supplier(spark, sfDir)),
    "part"       -> (() => Tables.part(spark, sfDir)),
    "orders"     -> (() => Tables.orders(spark, sfDir)),
    "lineitem"   -> (() => Tables.lineitem(spark, sfDir)),
    "events"     -> (() => Tables.events(spark, sfDir)),
    "documents"  -> (() => Tables.documents(spark, sfDir)),
    "embeddings" -> (() => Tables.embeddings(spark, sfDir))
  )

  loaders.foreach { case (name, ld) =>
    test(s"$name loads, analyzes, and yields a row at sf0.001") {
      val df = ld()
      assert(df.schema.nonEmpty, s"$name: empty schema")
      assert(df.limit(1).count() == 1L, s"$name: no rows")
    }
  }

  test("events.ts resolves to TimestampType under either fixture encoding") {
    val ts = Tables.events(spark, sfDir).schema("ts").dataType
    assert(ts == org.apache.spark.sql.types.TimestampType,
      s"events.ts resolved to $ts")
  }
}
