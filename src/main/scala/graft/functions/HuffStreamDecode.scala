package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `huff_stream_decode(s)`: the `mm_huffman_decode` bit automaton as ONE
  * native expression — struct(n_bytes, n_syms, value_sum, wsum, bit_len,
  * ok), all BIGINT.
  *
  * This is the PLAIN bit automaton, not the per-(carry, char) transition
  * table the HOF form uses for its fast path — sound because the table was
  * derived from (and round-16 A/B-verified bit-identical to) exactly this
  * automaton, including the boundary-char argument: a char that completes
  * the m-th code mid-char can only take the table fast path when its
  * remaining bits are all 1s (a 0 would have emitted another code), which
  * is precisely what the bit walk verifies. MultimodalOpsSpec pins native
  * ≡ HOF on the generated corpus and the hand-packed malformed fixtures.
  *
  * Stream (from char 7, 1-based; m from chars 5-6, absent chars reading
  * as ascii('') = 0): each char carries 6 bits MSB-first of the comma
  * code (symbol k ∈ [0,6] = k ones then a zero; symbol 7 = seven ones);
  * chars after the m-th code must be all-ones padding; out-of-alphabet
  * chars set `bad` and are skipped. ok = `HF1\n` magic ∧ n_syms = m ∧ no
  * dangling ones ∧ bad = 0 ∧ the packed-length identity
  * length = 6 + ⌈bit_len/6⌉. Null iff the input string is null.
  */
case class HuffStreamDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = HuffStreamDecode.Schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "huff_stream_decode"

  override def nullSafeEval(a: Any): Any =
    HuffStreamDecode.decode(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HuffStreamDecode.decode($a);")

  override protected def withNewChildInternal(
      newChild: Expression): HuffStreamDecode =
    copy(child = newChild)
}

object HuffStreamDecode {
  val Schema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_syms", LongType, nullable = false),
    StructField("value_sum", LongType, nullable = false),
    StructField("wsum", LongType, nullable = false),
    StructField("bit_len", LongType, nullable = false),
    StructField("ok", LongType, nullable = false)))

  def decode(s: UTF8String): InternalRow = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    def cpAt(i1: Int): Long = if (i1 <= n) cps(i1 - 1).toLong else 0L
    val m = (cpAt(5) - 32L) * 64L + cpAt(6) - 32L
    var ones = 0L; var dec = 0L
    var vsum = 0L; var wsum = 0L
    var bits = 0L; var bad = 0L
    var i = 6 // 0-based index of the 7th char
    while (i < n) {
      val u = cps(i).toLong - 32L
      if (u < 0L || u > 63L) bad = 1L
      else if (dec >= m) { if (u != 63L) bad = 1L }
      else {
        var k = 5
        while (k >= 0) {
          val bit = (u >> k) & 1L
          if (dec >= m) { if (bit == 0L) bad = 1L }
          else if (bit == 1L && ones == 6L) {
            ones = 0L; dec += 1L; vsum += 7L; wsum += dec * 7L; bits += 7L
          } else if (bit == 1L) ones += 1L
          else {
            dec += 1L; vsum += ones; wsum += dec * ones
            bits += ones + 1L; ones = 0L
          }
          k -= 1
        }
      }
      i += 1
    }
    val magic = n >= 4 && cps(0) == 'H' && cps(1) == 'F' && cps(2) == '1' &&
      cps(3) == '\n'
    val ok = if (magic && dec == m && ones == 0L && bad == 0L &&
      n.toLong == 6L + (bits + 5L) / 6L) 1L else 0L
    new GenericInternalRow(Array[Any](n.toLong, dec, vsum, wsum, bits, ok))
  }
}
