package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `ascii_codes(s)`: the per-character code points of a string as one
  * `array<bigint>` — the native form of `transform(split(s, ''), ch ->
  * ascii(ch))`, which the multimodal generate/decode lanes evaluated as a
  * per-character string allocation (split materializes one single-char
  * UTF8String per character, then `ascii` re-decodes each). One pass, no
  * intermediate strings, inlines into whole-stage codegen (round-17; the
  * CosineSimilarity precedent). Value contract: `element_at(ascii_codes(s),
  * i) ≡ ascii(substr(s, i, 1))` for 1 ≤ i ≤ length(s) — both are the code
  * point of the i-th character — and the array length equals `length(s)`
  * (code-point count), so folds over it reproduce the split-array folds
  * except on the empty string, where split yields `[""]` (folding ascii('')
  * = 0) and this yields `[]` — identical under every additive fold the
  * lanes use. Null iff the input is null.
  */
case class AsciiCodes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ascii_codes"

  override def nullSafeEval(a: Any): Any =
    AsciiCodes.codesOf(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.AsciiCodes.codesOf($a);")

  override protected def withNewChildInternal(newChild: Expression): AsciiCodes =
    copy(child = newChild)
}

object AsciiCodes {
  def codesOf(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val out = new Array[Long](n)
    var i = 0
    var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(k) = cp.toLong
      k += 1
      i += Character.charCount(cp)
    }
    ArrayData.toArrayData(out)
  }
}
