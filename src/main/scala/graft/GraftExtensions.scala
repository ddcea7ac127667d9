package graft

import graft.expressions.DotProduct
import graft.operators.{Dedup, Pipelines, TextAnalysis}
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** SparkSessionExtensions hook: registers the engine's native expressions
  * AND its composed column functions into the SQL function registry, so
  * `spark.sql("… dot_product(a,b) …")` or `quality_score(text)` work
  * anywhere DataFrame code does. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (done by
  * `Engine.configure`).
  *
  * The composed functions are pure expression-tree builders (the same
  * trees the Column API produces, via the graftbridge seam), so SQL
  * callers get identical semantics, codegen, and pushdown behavior —
  * not a UDF wrapper.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def injectColumnFn(ext: SparkSessionExtensions, name: String,
                             arity: Int)(f: Seq[Column] => Column): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == arity, s"$name takes $arity argument(s)")
        ColumnBridge.loweredExpression(f(children.map(ColumnBridge.column)))
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_product(a, b) takes two arrays")
        DotProduct(children.head, children(1))
      }))
    injectColumnFn(ext, "quality_score", 1)(c => TextAnalysis.qualityScore(c.head))
    injectColumnFn(ext, "lang_id_guess", 1)(c => TextAnalysis.langIdGuess(c.head))
    injectColumnFn(ext, "token_fingerprint", 1)(c => TextAnalysis.fingerprint(c.head))
    injectColumnFn(ext, "scrub_pii", 1)(c => Pipelines.scrubPii(c.head))
    injectColumnFn(ext, "simhash60", 1)(c => Dedup.simHashExpr(c.head))
  }
}
