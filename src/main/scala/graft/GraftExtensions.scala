package graft

import graft.expressions.{DotProduct, UnicodeNormalize}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
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
    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1 || children.length == 2,
          "unicode_normalize(text[, form]) takes 1 or 2 arguments")
        val form = children.lift(1).map {
          case Literal(s: UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"unicode_normalize form must be a string literal, got $other")
        }.getOrElse("NFKC")
        UnicodeNormalize(children.head, form)
      }))
    injectColumnFn(ext, "quality_score", 1)(c => TextAnalysis.qualityScore(c.head))
    injectColumnFn(ext, "lang_id_guess", 1)(c => TextAnalysis.langIdGuess(c.head))
    injectColumnFn(ext, "token_fingerprint", 1)(c => TextAnalysis.fingerprint(c.head))
    injectColumnFn(ext, "scrub_pii", 1)(c => Pipelines.scrubPii(c.head))
    injectColumnFn(ext, "simhash60", 1)(c => Dedup.simHashExpr(c.head))
  }
}
