package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native quality-cascade signals — one linear pass per document over the
  * token array, replacing the interpreted higher-order pipeline that
  * dominates `llm_filter_cascade` (per-distinct-token `filter` scans are
  * O(n·distinct) per doc and evaluate interpreted inside lambdas; the
  * token-count map here is O(n) with one hash probe per token).
  *
  * Returns every signal the cascade's rules consume, in one struct:
  * `n` (token count), `stop_hits` (tokens in the stopword probe set),
  * `top_cnt` (max multiplicity of any token), `tri_total`/`tri_dup`
  * (adjacent word-trigram count and duplicate count), and `eq` — the
  * 1e-6-quantized Shannon entropy `round((ln n − Σ round(c·ln c·1e6)/1e6/n)
  * ·1e6)`, with every rounding step the same HALF_UP `BigDecimal` Spark's
  * `round` applies, so the value is bit-identical to the declarative twin
  * (and therefore to the shared DuckDB oracle).
  */
case class CascadeSigs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = CascadeSigs.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cascade_sigs"

  override def nullSafeEval(input: Any): Any =
    CascadeSigs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // stays inside whole-stage codegen; the pass lives in one static
    // JIT-compiled call (same pattern as WinnowFps / builtin json exprs)
    defineCodeGen(ctx, ev, c => s"graft.functions.CascadeSigs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CascadeSigs =
    copy(child = newChild)
}

object CascadeSigs {
  val schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false),
    StructField("tri_total", LongType, nullable = false),
    StructField("tri_dup", LongType, nullable = false),
    StructField("eq", LongType, nullable = false)))

  /** Spark's `round(double)`: HALF_UP on the shortest-decimal BigDecimal,
    * then the whole double truncates exactly to long. */
  private def halfUp(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).toString; i += 1 }

    val counts = new java.util.HashMap[String, Int](Math.max(16, n * 2))
    var stopHits = 0L
    var topCnt = 0L
    i = 0
    while (i < n) {
      val t = toks(i)
      if (t == "the" || t == "a" || t == "of" || t == "and") stopHits += 1
      val c: Int = counts.merge(t, 1, (a, b) => a + b)
      if (c > topCnt) topCnt = c.toLong
      i += 1
    }

    val triTotal = if (n >= 3) (n - 2).toLong else 0L
    var triDup = 0L
    if (n >= 3) {
      val seen = new java.util.HashSet[String](Math.max(16, n * 2))
      i = 0
      while (i < n - 2) {
        if (!seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2)))
          triDup += 1
        i += 1
      }
    }

    var s = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      s += halfUp(c * Math.log(c) * 1000000.0)
    }
    val eq =
      if (n == 0) 0L // unused: the n<20 rule fires first; avoid ln(0)
      else halfUp((Math.log(n.toDouble) - s.toDouble / 1e6 / n) * 1000000.0)

    new GenericInternalRow(
      Array[Any](n.toLong, stopHits, topCnt, triTotal, triDup, eq))
  }
}
