package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 8×8 integer DCT-II perceptual hash over a 64-sample luma array —
  * the transform half of the `mm_phash*` family, previously a ~1,100-node
  * higher-order-function expression tree (two `transform` passes of 8
  * multiply-adds per coefficient plus two `aggregate` folds) evaluated by
  * the interpreter per row. This expression runs the identical arithmetic
  * as two tight JVM loops and inlines into whole-stage codegen via a
  * static-method call, so the per-row cost is a function call instead of
  * an expression-tree walk (round-17; the CosineSimilarity precedent).
  *
  * Numeric contract (oracle parity — MultimodalOpsSpec pins native ≡ HOF
  * fold): all arithmetic is exact BIGINT in the same accumulation order as
  * the HOF form — g[i] = Σ_x px[8x+(i&7)]·CL[8(i≫3)+x] with x ascending,
  * f[i] = Σ_y g[8(i≫3)+y]·CL[8(i&7)+y] with y ascending, sumac = Σ f[1..63]
  * ascending, and bit i−1 set iff f[i]·63 > sumac (longs: wrapping add is
  * order-free, multiplication bit-identical, so the fold order argument is
  * belt-and-braces). CL is the shared ⌊cos(π(2x+1)u/16)·10⁶⌉ basis both
  * engines embed. Null if the input is null, not exactly 64 elements, or
  * any element is null — exactly the nulls the HOF chain propagates.
  */
case class DctPhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dct_phash"

  override def nullSafeEval(a: Any): Any = {
    val px = a.asInstanceOf[ArrayData]
    if (px.numElements() != 64 || DctPhash.anyNull(px)) null
    else DctPhash.hashOf(px)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |if ($a.numElements() != 64 ||
         |    graft.functions.DctPhash.anyNull($a)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.DctPhash.hashOf($a);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DctPhash =
    copy(child = newChild)
}

object DctPhash {
  /** ⌊cos(π(2x+1)u/16)·10⁶⌉ at [u*8 + x] — the identical literal array the
    * HOF form and the DuckDB oracle embed. */
  private val Cl: Array[Long] =
    (for (u <- 0 until 8; x <- 0 until 8)
      yield math.round(math.cos(math.Pi * (2 * x + 1) * u / 16.0) * 1e6)).toArray

  /** Static entry points so generated code can call straight in. */
  def anyNull(px: ArrayData): Boolean = {
    var i = 0
    while (i < 64) {
      if (px.isNullAt(i)) return true
      i += 1
    }
    false
  }

  def hashOf(px: ArrayData): Long = {
    val p = new Array[Long](64)
    var i = 0
    while (i < 64) { p(i) = px.getLong(i); i += 1 }
    hash(p)
  }

  def hash(px: Array[Long]): Long = {
    val g = new Array[Long](64)
    var i = 0
    while (i < 64) {
      val u = i >> 3
      val y = i & 7
      var s = 0L
      var x = 0
      while (x < 8) { s += px(8 * x + y) * Cl(8 * u + x); x += 1 }
      g(i) = s
      i += 1
    }
    val f = new Array[Long](64)
    i = 0
    while (i < 64) {
      val u = i >> 3
      val v = i & 7
      var s = 0L
      var y = 0
      while (y < 8) { s += g(8 * u + y) * Cl(8 * v + y); y += 1 }
      f(i) = s
      i += 1
    }
    var sumac = 0L
    i = 1
    while (i < 64) { sumac += f(i); i += 1 }
    var h = 0L
    i = 1
    while (i < 64) {
      if (f(i) * 63L > sumac) h += 1L << (i - 1)
      i += 1
    }
    h
  }
}
