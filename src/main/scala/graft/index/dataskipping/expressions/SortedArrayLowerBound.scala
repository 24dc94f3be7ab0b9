package graft.index.dataskipping.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/**
 * 1-based index of the first element in a SORTED literal array that is
 * `>= value`; null when every element is smaller (reference:
 * index/dataskipping/expressions/SortedArrayLowerBound.scala:39-102 +
 * SortedArrayUtils.scala — binary search with eval and codegen paths).
 *
 * Used by the MinMax InSet translation: a file [min,max] may contain one
 * of the searched values iff `values[lowerBound(min)] <= max`.
 */
case class SortedArrayLowerBound(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(arrayValue: Any, value: Any): Any = {
    val idx = SortedArrayUtils.lowerBound(
      arrayValue.asInstanceOf[ArrayData], value, elementType)
    if (idx >= 0) idx + 1 else null
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = left.eval(input)
    if (arr == null) return null
    val v = right.eval(input)
    if (v == null) return null
    nullSafeEval(arr, v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val utils = SortedArrayUtils.getClass.getName.stripSuffix("$")
    val dt = ctx.addReferenceObj("elemType", elementType, classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, (arr, value) =>
      s"""
         |int idx = $utils.lowerBound($arr, (Object) $value, $dt);
         |if (idx >= 0) { ${ev.value} = idx + 1; } else { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayLowerBound =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_sorted_lower_bound"
}

object SortedArrayUtils {
  /** 0-based index of the first element >= value, or -1 if none. */
  def lowerBound(array: ArrayData, value: Any, elementType: DataType): Int = {
    val ordering = TypeUtils.getInterpretedOrdering(elementType)
    var lo = 0
    var hi = array.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val elem = array.get(mid, elementType)
      if (ordering.compare(elem, value) < 0) lo = mid + 1 else hi = mid
    }
    if (lo < array.numElements()) lo else -1
  }
}
