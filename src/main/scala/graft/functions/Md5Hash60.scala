package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit portable hash — the engine's cross-engine hash primitive
  * (`conv(substring(md5(x), 1, 15), 16, 10)` ≡ DuckDB
  * `('0x' || substr(md5(x),1,15))::BIGINT`), computed without materializing
  * the hex string: the value is just the first 60 bits of the md5 digest
  * read big-endian, so this expression takes the digest bytes directly
  * (7 full bytes + 1 high nibble) and skips the hex encode, the substring
  * allocation, and the base-16 string parse the declarative chain pays per
  * call. A thread-local MessageDigest removes the per-call getInstance
  * lookup. Bit-identical to the declarative form for every input — the
  * DuckDB oracles keep the md5/substr SQL unchanged — so every
  * similarity/dedup query (MinHash, SimHash, winnowing, Jaccard) stays
  * hash-verified while its hot loop gets a single fused eval per element.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string or binary argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "md5hash60"

  override def nullSafeEval(input: Any): Any = input match {
    case u: UTF8String  => Md5Hash60.hash60(u.getBytes)
    case b: Array[Byte] => Md5Hash60.hash60(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // One static JIT-compiled call inside whole-stage codegen, same pattern
    // as the builtin hash expressions.
    defineCodeGen(ctx, ev, c =>
      if (child.dataType == StringType)
        s"graft.functions.Md5Hash60.hash60(($c).getBytes())"
      else s"graft.functions.Md5Hash60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes), big-endian — exactly the value of the
    * first 15 hex digits of the digest parsed base-16. */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md.get().digest(bytes) // digest() resets the instance
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}
