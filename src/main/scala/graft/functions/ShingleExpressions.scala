package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `shingle_hashes60(tokens, p[, n])` — distinct n-token shingles (default 3) of a token
 * array, each hashed to `md5-prefix-60 mod p`, in ONE pass.
 *
 * Semantically identical to the composed form the text operators started
 * from (and that the DuckDB oracles still spell out):
 * {{{
 *   transform(array_distinct(transform(sequence(0, n-3),
 *     i => concat_ws(" ", slice(toks, i+1, 3)))), s => md5p60(s) % p)
 * }}}
 * Deduplication happens on the shingle STRINGS (exactly like
 * `array_distinct` / DuckDB `list_distinct`), so even a 60-bit hash
 * collision between distinct shingles produces the same duplicate hash
 * values in both engines. Returns an empty array for < 3 tokens.
 *
 * The composed form is a higher-order-function chain — interpreted
 * lambda evaluation per element plus four intermediate arrays per row.
 * This expression builds each window into one reused buffer, dedupes via
 * a per-row hash set, and digests in place; the generated code is a
 * single static call, so the projection stays inside whole-stage codegen.
 * Returns an empty array for fewer than n tokens.
 */
case class ShingleHashes60(child: Expression, p: Long, n: Int = 3)
  extends UnaryExpression {

  require(p > 0, "modulus must be positive")
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes60"

  // null input -> EMPTY array, matching the composed form's
  // `when(size(toks) >= 3, ...).otherwise(array())` (size(null) is null,
  // so null tokens fall into the else branch): this expression is
  // therefore never null itself
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleHashes60.empty
    else ShingleHashes60.compute(v.asInstanceOf[ArrayData], p, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? graft.functions.ShingleHashes60.empty()
          : graft.functions.ShingleHashes60.compute(${c.value}, ${p}L, ${n});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes60 =
    copy(child = newChild)
}

object ShingleHashes60 {

  private val Space = UTF8String.fromString(" ")

  private val EmptyResult: ArrayData = new GenericArrayData(Array.empty[Long])
  /** Shared empty result (also referenced from generated code); consumers
    * never mutate ArrayData, so one instance serves every row. */
  def empty(): ArrayData = EmptyResult

  def compute(toks: ArrayData, p: Long, width: Int): ArrayData = {
    val n = toks.numElements()
    if (n < width) return empty()
    // dedupe on the shingle STRING (array_distinct parity), keep insertion
    // order (array_distinct keeps first occurrences in order)
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    val window = new Array[UTF8String](width)
    var i = 0
    while (i <= n - width) {
      var j = 0
      while (j < width) { window(j) = toks.getUTF8String(i + j); j += 1 }
      // UTF8String.concatWs SKIPS null inputs — same as the concat_ws
      // builtin the composed form used
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = Md5Prefix60.hash(it.next()) % p
      k += 1
    }
    new GenericArrayData(out)
  }
}

object ShingleFunctions {
  /** Column API for [[ShingleHashes60]] (3-token shingles). */
  def shingleHashes60(toks: Column, p: Long): Column =
    GraftBridge.column(ShingleHashes60(GraftBridge.expression(toks), p))

  /** [[ShingleHashes60]] with an explicit shingle width. */
  def shingleHashes60(toks: Column, p: Long, n: Int): Column =
    GraftBridge.column(ShingleHashes60(GraftBridge.expression(toks), p, n))
}
