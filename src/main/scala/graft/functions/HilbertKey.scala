package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Hilbert xy→d transform — `hilbertkey(x, y, bits)` on the
  * 2^bits × 2^bits grid.
  *
  * The declarative form ([[graft.io.HilbertCurve.withHilbertKey]]'s
  * original per-bit `withColumns` chain) is semantically fine but pays a
  * FIXED planner/codegen cost proportional to bits² expression nodes: at
  * 11 bits the a4_hilbert_prune lane spent ~20 s per run in planning and
  * whole-stage-codegen compilation — identical at sf0.1 and sf1, i.e.
  * pure overhead, the top fixed cost in the bench. This expression is the
  * same classic loop (bit test, quadrant offset d += s²·((3·rx) xor ry),
  * conditional simultaneous flip+swap) as ONE codegen'd static call, so
  * the plan carries a single node and the per-row cost is the loop itself.
  *
  * Bit-identical to the fold for every input (HilbertSpec asserts parity
  * on a full grid), so the DuckDB oracle keeps its per-bit MATERIALIZED
  * CTE chain unchanged and the lane stays hash-verified.
  */
case class HilbertKey(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == LongType && second.dataType == LongType &&
        third.dataType == IntegerType && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint x, bigint y, foldable int bits), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  override def prettyName: String = "hilbertkey"

  override def nullSafeEval(x: Any, y: Any, bits: Any): Any =
    HilbertKey.hilbert(x.asInstanceOf[Long], y.asInstanceOf[Long],
      bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, b) =>
      s"graft.functions.HilbertKey.hilbert($x, $y, $b)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): HilbertKey =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HilbertKey {
  /** The classic per-bit walk, identical step-for-step to the Column fold
    * it replaces: offsets read rx/ry BEFORE the rotation; the rotation
    * (only when ry = 0) assigns the flipped/swapped pair SIMULTANEOUSLY
    * from the pre-rotation values. Inputs mask to the low `bits` bits. */
  def hilbert(x0: Long, y0: Long, bits: Int): Long = {
    val m = (1L << bits) - 1
    var x = x0 & m
    var y = y0 & m
    var d = 0L
    var k = bits - 1
    while (k >= 0) {
      val s = 1L << k
      val rx = (x >> k) & 1L
      val ry = (y >> k) & 1L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val nx = if (rx == 1L) s - 1 - y else y
        val ny = if (rx == 1L) s - 1 - x else x
        x = nx
        y = ny
      }
      k -= 1
    }
    d
  }
}
