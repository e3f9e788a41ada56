package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `rle_stream_decode(s)`: the `mm_rle_decode` byte-token automaton as ONE
  * native expression — struct(n_bytes, lit_runs, rep_runs, n_pixels,
  * luma_sum, ok), all BIGINT. The HOF form folded a 7-field struct state
  * through an interpreted 5-branch `when` cascade per payload character;
  * this is the identical automaton as a single code-point loop, inlining
  * into whole-stage codegen (round-17; the LzStreamDecode precedent, and
  * MultimodalOpsSpec pins native ≡ HOF on the generated corpus and the
  * hand-packed malformed fixtures).
  *
  * Automaton (from char 5, 1-based): a pending repeat count emits `pend`
  * copies of this byte; an open literal run consumes it as one pixel; else
  * control c ∈ [1,63] opens a literal run of c, c ∈ [64,127] schedules a
  * repeat of c−62, anything else sets `bad`. ok = `RL1\n` magic ∧ no open
  * run ∧ no pending repeat ∧ bad = 0. All counts are code points, matching
  * `length`/`ascii` on both engines. Null iff the input string is null.
  */
case class RleStreamDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = RleStreamDecode.Schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rle_stream_decode"

  override def nullSafeEval(a: Any): Any =
    RleStreamDecode.decode(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RleStreamDecode.decode($a);")

  override protected def withNewChildInternal(newChild: Expression): RleStreamDecode =
    copy(child = newChild)
}

object RleStreamDecode {
  val Schema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("lit_runs", LongType, nullable = false),
    StructField("rep_runs", LongType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("luma_sum", LongType, nullable = false),
    StructField("ok", LongType, nullable = false)))

  def decode(s: UTF8String): InternalRow = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    var litRem = 0L; var pend = 0L
    var px = 0L; var luma = 0L
    var litr = 0L; var repr = 0L; var bad = 0L
    var i = 4 // 0-based index of the 5th char
    while (i < n) {
      val b = cps(i).toLong
      if (pend > 0L) { px += pend; luma += pend * b; pend = 0L }
      else if (litRem > 0L) { litRem -= 1L; px += 1L; luma += b }
      else if (b >= 1L && b <= 63L) { litRem = b; litr += 1L }
      else if (b >= 64L && b <= 127L) { pend = b - 62L; repr += 1L }
      else bad = 1L
      i += 1
    }
    val magic = n >= 4 && cps(0) == 'R' && cps(1) == 'L' && cps(2) == '1' &&
      cps(3) == '\n'
    val ok = if (magic && litRem == 0L && pend == 0L && bad == 0L) 1L else 0L
    new GenericInternalRow(Array[Any](n.toLong, litr, repr, px, luma, ok))
  }
}
