package graft.index.dataskipping.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/**
 * `mightContain(serializedBloom, value)` predicate over the bytes written
 * by [[BloomFilterAgg]] (reference:
 * index/dataskipping/expressions/BloomFilterMightContain.scala:32-60 —
 * same eval + codegen-via-helper shape).
 *
 * Runs over index data only (one row per source file), so the
 * deserialization per row is bounded by file count, not data size.
 */
case class BloomFilterMightContain(left: Expression, right: Expression)
  extends BinaryExpression with Predicate {

  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(bloomBytes: Any, value: Any): Any =
    BloomFilterUtils.mightContain(
      bloomBytes.asInstanceOf[Array[Byte]], value, right.dataType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val utils = BloomFilterUtils.getClass.getName.stripSuffix("$")
    val dt = ctx.addReferenceObj("dataType", right.dataType,
      classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, (bloom, value) =>
      s"${ev.value} = $utils.mightContain($bloom, (Object) $value, $dt);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomFilterMightContain =
    copy(left = newLeft, right = newRight)
}

/**
 * `mightContainAny(serializedBloom, literalValues)` — InSet translation
 * (reference: BloomFilterMightContainAny.scala:35-75). `values` must be a
 * literal array of the source column's type.
 */
case class BloomFilterMightContainAny(
    bloom: Expression,
    values: Array[Any],
    valueType: DataType)
  extends Expression with Predicate
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(bloom)
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val b = bloom.eval(input)
    if (b == null) null
    else BloomFilterUtils.mightContainAny(b.asInstanceOf[Array[Byte]], values, valueType)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterMightContainAny =
    copy(bloom = newChildren.head)
  override def prettyName: String = "graft_bloom_might_contain_any"
}
