package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns using Catalyst
  * higher-order functions only — fully codegen-eligible, no UDFs
  * (SURVEY §2.9 L3 / FIXTURES Q42).
  *
  * Call sites should widen float arrays to `array<double>` once
  * (`toDouble`) so accumulation happens in double on every engine.
  */
object VectorFunctions {

  def toDouble(a: Column): Column = a.cast("array<double>")

  /** Sequential-order dot product: aggregate(zip_with(a,b,*), 0.0, +). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, z) => acc + z)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
