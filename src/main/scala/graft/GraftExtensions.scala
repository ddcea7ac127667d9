package graft

import graft.expressions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the engine's native expressions
  * into the SQL function registry, so `spark.sql("… dot_product(a,b) …")`
  * works anywhere DataFrame code does. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (done by
  * `Engine.configure`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_product(a, b) takes two arrays")
        DotProduct(children.head, children(1))
      }))
  }
}
