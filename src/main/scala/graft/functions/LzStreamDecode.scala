package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `lz_stream_decode(s)`: the full LZ77 token-automaton readout of the
  * `mm_lz_decode` lane as ONE native expression — struct(n_bytes, n_toks,
  * n_copies, out_len, value_sum, wsum, ok), all BIGINT.
  *
  * The higher-order-function form walked the stream as an `aggregate`
  * whose STATE carried the growing output buffer as a string column:
  * every literal re-allocated the whole buffer (`concat(o, ch)`), every
  * copied byte re-sliced and re-allocated it again, and the ~12-branch
  * `when` cascade was interpreted per character — O(output²) bytes
  * churned per row. This expression runs the identical automaton over a
  * code-point array with an int output buffer — O(output) — and inlines
  * into whole-stage codegen via a static call (round-17; the
  * CosineSimilarity / DctPhash precedent).
  *
  * Semantics are the HOF fold's, branch for branch (MultimodalOpsSpec
  * pins native ≡ HOF on the generated corpus AND the hand-packed
  * malformed fixtures): token count read from chars 5-6 (absent chars
  * read as `ascii('') = 0`), the walk starts at char 7, parser modes
  * tag → literal → copy-length → dist-hi → dist-lo, copies applied
  * byte-by-byte against the GROWING buffer (dist < len self-extends),
  * malformed transitions set `bad` and keep walking, and
  * ok = magic ∧ md=0 ∧ tk=tT ∧ bad=0. All positions/lengths count code
  * points, matching `length`/`substr`/`ascii` on both engines. Null iff
  * the input string is null.
  */
case class LzStreamDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = LzStreamDecode.Schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "lz_stream_decode"

  override def nullSafeEval(a: Any): Any =
    LzStreamDecode.decode(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LzStreamDecode.decode($a);")

  override protected def withNewChildInternal(newChild: Expression): LzStreamDecode =
    copy(child = newChild)
}

object LzStreamDecode {
  val Schema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_toks", LongType, nullable = false),
    StructField("n_copies", LongType, nullable = false),
    StructField("out_len", LongType, nullable = false),
    StructField("value_sum", LongType, nullable = false),
    StructField("wsum", LongType, nullable = false),
    StructField("ok", LongType, nullable = false)))

  def decode(s: UTF8String): InternalRow = {
    val str = s.toString
    // code points, the unit every string primitive here counts in
    val cps = str.codePoints().toArray
    val n = cps.length
    // tT from 1-based chars 5 and 6; a missing char reads as ascii('')=0
    def cpAt(i1: Int): Long = if (i1 <= n) cps(i1 - 1).toLong else 0L
    val tT = (cpAt(5) - 32L) * 64L + cpAt(6) - 32L
    // automaton state
    var md = 0L; var pl = 0L; var ph = 0L
    var tk = 0L; var cp = 0L; var bad = 0L
    var out = new Array[Int](64)
    var outLen = 0
    def append(c: Int): Unit = {
      if (outLen == out.length) {
        out = java.util.Arrays.copyOf(out, out.length * 2)
      }
      out(outLen) = c
      outLen += 1
    }
    var i = 6 // 0-based index of the 7th char
    while (i < n) {
      val ch = cps(i)
      val b = ch.toLong
      if (md == 0L) {
        if (ch == 'L') md = 1L
        else if (ch == 'C') md = 2L
        else bad = 1L
      } else if (md == 1L) {
        md = 0L; tk += 1L; append(ch)
        if (b < 32L) bad = 1L
      } else if (md == 2L) {
        md = 3L; pl = b - 32L
        if (b <= 32L || b > 95L) bad = 1L
      } else if (md == 3L) {
        md = 4L; ph = b - 32L
        if (b < 32L || b > 95L) bad = 1L
      } else { // md == 4: resolve and apply the copy
        val dist = ph * 64L + b - 32L
        if (b >= 32L && b <= 95L && dist >= 1L && dist <= outLen && pl >= 1L) {
          var k = 0L
          while (k < pl) {
            append(out((outLen - dist).toInt))
            k += 1L
          }
        } else bad = 1L
        md = 0L; pl = 0L; ph = 0L; tk += 1L; cp += 1L
      }
      i += 1
    }
    var vs = 0L; var ws = 0L
    var j = 0
    while (j < outLen) {
      val b = out(j).toLong
      vs += b
      ws += (j + 1L) * b
      j += 1
    }
    val magic = n >= 4 && cps(0) == 'L' && cps(1) == 'Z' && cps(2) == '1' &&
      cps(3) == '\n'
    val ok = if (magic && md == 0L && tk == tT && bad == 0L) 1L else 0L
    new GenericInternalRow(Array[Any](n.toLong, tk, cp, outLen.toLong, vs, ws, ok))
  }
}
