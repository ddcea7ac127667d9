package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused MinHash signature: for seed i in [0, numHashes), the minimum
  * over the token array of `xxhash64(token, i)` — ONE pass over the
  * tokens instead of `numHashes` interpreted `array_min(transform(...))`
  * HOF traversals.
  *
  * Bit-equivalence contract (the LSH band keys, and through them every
  * candidate set, depend on these exact values): Spark's
  * `xxhash64(t, lit(i))` folds its children left to right from seed 42 —
  * `XXH64.hashInt(i, XXH64.hashUTF8String(t, 42))` (a null child leaves
  * the running hash untouched, so a null token contributes
  * `hashInt(i, 42)`). The inner string hash does not depend on i, so the
  * fused form hashes each token's BYTES once and derives all `numHashes`
  * seeds with the cheap int-mix tail — O(tokens · (bytes + numHashes))
  * instead of O(tokens · bytes · numHashes), inside whole-stage codegen
  * with zero per-element lambda dispatch. Verified value-identical to
  * the HOF formulation in OperatorsSuite.
  *
  * Null contract (matches `array(array_min(transform(tok, ...)) ...)`):
  * the RESULT array is never null; a null or empty token array yields an
  * array of `numHashes` null elements (array_min of an empty/null array
  * is null), which downstream `hash(element_at(...))` band keys consume
  * exactly as before.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes >= 1, s"minhash_signature needs numHashes >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got ${dt.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_signature"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val n = if (v == null) 0 else v.asInstanceOf[ArrayData].numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill[Long](numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h0 = if (arr.isNullAt(j)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashInt(i, h0)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val xxh = classOf[XXH64].getName
    val gad = classOf[GenericArrayData].getName
    val uad = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
    val mins = ctx.freshName("mins")
    val n = ctx.freshName("n")
    val j = ctx.freshName("j")
    val i = ctx.freshName("i")
    val h0 = ctx.freshName("h0")
    val h = ctx.freshName("h")
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value};
      int $n = ${childGen.isNull} ? 0 : ${childGen.value}.numElements();
      if ($n == 0) {
        ${ev.value} = new $gad(new Object[$numHashes]);
      } else {
        long[] $mins = new long[$numHashes];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        for (int $j = 0; $j < $n; $j++) {
          long $h0 = ${childGen.value}.isNullAt($j) ? 42L
            : $xxh.hashUTF8String(${childGen.value}.getUTF8String($j), 42L);
          for (int $i = 0; $i < $numHashes; $i++) {
            long $h = $xxh.hashInt($i, $h0);
            if ($h < $mins[$i]) $mins[$i] = $h;
          }
        }
        ${ev.value} = $uad.fromPrimitiveArray($mins);
      }
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object HashExpressions {
  /** Column wrapper: codegen'd fused minhash signature (array<long> of
    * length `numHashes`), value-identical to
    * `array((0 until numHashes).map(i => array_min(transform(tok, t =>
    * xxhash64(t, lit(i))))): _*)`. */
  def minHashSignature(tok: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(tok), numHashes))
}
