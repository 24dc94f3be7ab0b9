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
 * Fused native expressions for the SimHash pipeline. The composed forms
 * they replace (still spelled out by the DuckDB oracles) are HOF chains —
 * interpreted lambdas, intermediate arrays, and for the fingerprint one
 * full array traversal PER BIT (60 of them):
 *
 *  - `token_hashes60(toks)` ==
 *    `array_distinct(transform(toks, t => md5prefix60(t)))` for arrays
 *    WITHOUT NULL ELEMENTS (split() never produces them) — distinct on
 *    the hash value in first-occurrence order. Divergence outside that
 *    domain, deliberate: a null token hashes as "" (the composed Spark
 *    form keeps a null element; DuckDB list_distinct drops it — the two
 *    composed forms already disagree there);
 *  - `simhash60(hs)` == the 60-bit majority-vote fingerprint
 *    `sum_b (sum_i sign(bit_b(h_i)) > 0 ? 2^b : 0)`
 *    — one pass accumulating all 60 vote counters per element.
 */
case class TokenHashes60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes60"

  override protected def nullSafeEval(input: Any): Any =
    TokenHashes60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.TokenHashes60.compute($toks);")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes60 =
    copy(child = newChild)
}

object TokenHashes60 {
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    // distinct on the HASH VALUE in first-occurrence order — exactly what
    // array_distinct over the transformed array does
    val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val s = if (t == null) UTF8String.EMPTY_UTF8 else t
      seen.add(Md5Prefix60.hash(s))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs =>
      s"${ev.value} = graft.functions.SimHash60.compute($hs);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  def compute(hs: ArrayData): Long = {
    val n = hs.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }
}

/** `shingle_strings3(toks)` == `shingles3` (distinct 3-token windows as
  * STRINGS, first-occurrence order; empty for < 3 tokens) — the raw-string
  * variant the exact n-gram Jaccard baseline explodes. */
case class ShingleStrings3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_strings3"

  // null input -> EMPTY array (shingles3's otherwise(array()) branch)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleStrings3.empty()
    else ShingleStrings3.compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? graft.functions.ShingleStrings3.empty()
          : graft.functions.ShingleStrings3.compute(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings3 =
    copy(child = newChild)
}

object ShingleStrings3 {
  private val Space = UTF8String.fromString(" ")

  private val EmptyResult: ArrayData = new GenericArrayData(Array.empty[Any])
  /** Shared empty result (also referenced from generated code); consumers
    * never mutate ArrayData, so one instance serves every row. */
  def empty(): ArrayData = EmptyResult

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return empty()
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i <= n - 3) {
      seen.add(UTF8String.concatWs(Space,
        toks.getUTF8String(i), toks.getUTF8String(i + 1),
        toks.getUTF8String(i + 2)))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

object SimHashFunctions {
  def tokenHashes60(toks: Column): Column =
    GraftBridge.column(TokenHashes60(GraftBridge.expression(toks)))
  def simhash60(hs: Column): Column =
    GraftBridge.column(SimHash60(GraftBridge.expression(hs)))
  def shingleStrings3(toks: Column): Column =
    GraftBridge.column(ShingleStrings3(GraftBridge.expression(toks)))
}
