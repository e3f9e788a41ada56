package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (MOSS rolling-hash document
  * fingerprinting) — the performance seam the built-in form leaves open:
  * the declarative pipeline (`transform(sequence(...), i -> md5(substr))`
  * + posexplode + window-min) costs one md5 AND one substring allocation
  * PER CHARACTER of every document, then shuffles all gram rows into a
  * per-doc window sort. This expression does the whole thing in one linear
  * pass per document — O(1) Rabin-Karp hash update per character, a
  * monotonic-deque sliding minimum, zero per-gram allocations — and returns
  * the sorted distinct fingerprint set directly, so no explode/shuffle of
  * gram rows ever exists.
  *
  * Semantics (oracle parity): gram hash is the left-fold polynomial
  * `h = fold(h * B + codepoint) mod M` over each K consecutive Unicode
  * codepoints (B=263, M=2^31-1 — both engines evaluate it in exact BIGINT
  * arithmetic); a fingerprint is `min(h)` of each W-gram complete window;
  * the result is the ascending distinct fingerprint list, empty when the
  * text has fewer than K+W-1 codepoints (no complete window), null for
  * null input. DuckDB replays the identical fold via nested
  * `unicode(substr(...))` terms — see `LlmTextOps.winnowNative`.
  */
case class WinnowFps(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Stays inside whole-stage codegen; the loop itself lives in one static
    // JIT-compiled call (the pattern of builtin regexp/json expressions).
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  /** K-gram length in codepoints. */
  val K = 8
  /** Winnowing window in grams; guarantee horizon is K+W-1 codepoints. */
  val W = 4
  /** Polynomial base. */
  val B = 263L
  /** Modulus 2^31-1 (prime); every intermediate stays well under 2^63. */
  val M = 2147483647L
  private val Bk1: Long = { // B^(K-1) mod M
    var p = 1L; var j = 0
    while (j < K - 1) { p = p * B % M; j += 1 }
    p
  }

  def compute(u: UTF8String): ArrayData = {
    val s = u.toString
    val sLen = s.length
    // decode once: rolling over codepoints, matching DuckDB's substr/unicode
    var n = 0
    var si = 0
    while (si < sLen) { si += Character.charCount(s.codePointAt(si)); n += 1 }
    if (n < K + W - 1) return new GenericArrayData(Array.empty[Long])
    val cps = new Array[Int](n)
    si = 0; n = 0
    while (si < sLen) {
      val cp = s.codePointAt(si); cps(n) = cp; n += 1
      si += Character.charCount(cp)
    }

    val nGrams = n - K + 1
    val hs = new Array[Long](nGrams)
    var h = 0L
    var j = 0
    while (j < K) { h = (h * B + cps(j)) % M; j += 1 }
    hs(0) = h
    var i = 1
    while (i < nGrams) {
      // drop cps(i-1)'s leading term, shift, add cps(i+K-1)
      h = ((h - cps(i - 1) * Bk1 % M + M) % M * B + cps(i + K - 1)) % M
      hs(i) = h
      i += 1
    }

    // sliding-window minimum over complete windows via monotonic deque
    val fps = new java.util.HashSet[Long]()
    val deque = new Array[Int](nGrams) // indices, increasing h
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < nGrams) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - W) head += 1
      if (i >= W - 1) fps.add(hs(deque(head)))
      i += 1
    }
    val out = new Array[Long](fps.size)
    val it = fps.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}
