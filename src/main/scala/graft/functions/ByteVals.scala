package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** `byte_vals(b)`: the unsigned byte values of a binary payload as one
  * `array<bigint>` — the native form of the per-byte
  * `conv(hex(substr(payload, pos, 1)), 16, 10)` idiom the WAV decode lanes
  * used, which allocated a 1-byte binary, a hex string, and a parsed
  * number PER BYTE. One pass, inlines into whole-stage codegen (round-17).
  * Value contract: `element_at(byte_vals(b), i)` equals the old idiom's
  * value for every in-range i (both the unsigned byte), and out-of-range
  * `element_at` is null exactly where `conv(hex(''), 16, 10)` was null.
  * Null iff the input is null.
  */
case class ByteVals(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "byte_vals"

  override def nullSafeEval(a: Any): Any =
    ByteVals.valsOf(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ByteVals.valsOf($a);")

  override protected def withNewChildInternal(newChild: Expression): ByteVals =
    copy(child = newChild)
}

object ByteVals {
  def valsOf(b: Array[Byte]): ArrayData = {
    val out = new Array[Long](b.length)
    var i = 0
    while (i < b.length) {
      out(i) = java.lang.Byte.toUnsignedLong(b(i))
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
