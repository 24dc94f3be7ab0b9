package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * `dot(a, b)` over two `array<double>` columns as a native codegen
 * expression: a strict left fold `acc += a(i) * b(i)` in element order —
 * bit-identical to `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` (and to
 * DuckDB's `list_reduce(list_transform(list_zip(..)))`) for EQUAL-LENGTH
 * arrays with NO NULL ELEMENTS (the fixed-width embedding columns this
 * serves), but with no intermediate array allocation per row.
 *
 * Divergence outside that domain, deliberate for speed: mismatched
 * lengths truncate to the shorter array (the HOF returns NULL) and null
 * elements read as 0.0 via getDouble (the HOF returns NULL). Callers with
 * variable-length or null-holding vectors must pre-normalize.
 *
 * This is the hot inner loop of every similarity operator: brute-force
 * top-k evaluates it O(|queries| x |corpus|) times, so the
 * zip_with/aggregate HOF path (which allocates a 64-element ArrayData per
 * pair per dot) is the single biggest CPU cost in the benchmark. The
 * codegen loop reads both arrays in place.
 */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for [[DotProduct]]. */
  def dotp(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
