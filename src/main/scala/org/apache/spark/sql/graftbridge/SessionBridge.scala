package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic

/** Re-binds a DataFrame's logical plan to a fresh session that shares
  * the SparkContext/catalog but owns an ISOLATED SQLConf (`newSession`).
  * `Dataset.ofRows` went `private[sql]` in Spark 4 — same extension seam
  * as [[ColumnBridge]], reached from inside the sql package namespace.
  *
  * This is the safe home for conf-scoped work: a caller that needs a
  * temporary conf (e.g. a parquet writer option with no per-write knob)
  * sets it on the fresh session and runs the plan there, instead of
  * mutating the shared session's conf and racing every concurrent query
  * on it.
  */
object SessionBridge {
  /** A copy of `df` bound to `df.sparkSession.newSession()`: same logical
    * plan, same shared catalog/context, isolated runtime SQLConf. */
  def onFreshSession(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    classic.Dataset.ofRows(cs.newSession(),
      df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.logical)
  }
}
