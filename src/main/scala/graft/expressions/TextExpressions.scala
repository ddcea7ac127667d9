package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization over a string column (NFC / NFD /
  * NFKC / NFKD via `java.text.Normalizer`) — the preprocessing step
  * every C4/CCNet-style pipeline runs BEFORE hashing or tokenizing:
  * full-width forms fold to ASCII (Ｇ → G), ligatures expand (ﬁ → fi),
  * combining sequences compose (e + ́ → é), compatibility characters
  * decompose (² → 2, ㎞ → km). Without it, width/ligature variants of
  * the same document hash apart and dedup misses them.
  *
  * Spark has no built-in normalizer, so this is the native-Expression
  * path (SURVEY §2.7 F8): the JDK normalizer call compiles straight
  * into generated code — no UDF boxing, no codegen fence around the
  * projection. The form is a constructor constant (validated at plan
  * time, baked into the generated source), so the hot loop carries no
  * per-row dispatch.
  *
  * Null contract: null in → null out. Already-normalized text is
  * returned unchanged (Normalizer is idempotent per form).
  */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form),
    s"unicode_normalize form must be one of " +
      s"${UnicodeNormalize.Forms.mkString(", ")}, got $form")

  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects a string input, got ${dt.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, nf))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}

object TextExpressions {
  /** Column wrapper: codegen'd Unicode normalization (default NFKC —
    * the compatibility-fold form dedup pipelines want). */
  def normalizeUnicode(c: Column, form: String = "NFKC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))
}
