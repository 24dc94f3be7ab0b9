package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `md5_prefix60(s)` — the first 60 bits of md5(s) as a non-negative long.
 *
 * Bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)` (and to
 * DuckDB's `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`): the first 15
 * hex characters of the digest are its top 60 bits, i.e. the first 8
 * bytes read big-endian shifted right by 4. The composed-builtins path
 * allocates a 32-char hex string, a substring, and runs a base-16 parser
 * PER TOKEN/SHINGLE — this expression hashes the UTF-8 bytes and reads
 * the long straight out of the digest buffer. It is the inner loop of
 * every md5-based text operator (minhash, fingerprints, simhash), which
 * at 100 TB are pure map stages bounded by exactly this cost.
 */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5Prefix60.hash($s);")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  // MessageDigest is stateful; one instance per thread covers both the
  // interpreted and the generated code path with zero per-row allocation
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5 of the UTF-8 bytes, as a non-negative long. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var l = 0L
    var i = 0
    while (i < 8) { l = (l << 8) | (d(i) & 0xffL); i += 1 }
    l >>> 4
  }
}

object HashFunctions {
  /** Column API for [[Md5Prefix60]]. */
  def md5Prefix60(c: Column): Column =
    GraftBridge.column(Md5Prefix60(GraftBridge.expression(c)))
}
