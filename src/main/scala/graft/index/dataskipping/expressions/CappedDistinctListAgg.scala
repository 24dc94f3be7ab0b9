package graft.index.dataskipping.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Accumulator: distinct values up to the cap; `overflowed` is sticky. */
final class CappedDistinctBuffer(
    val values: java.util.LinkedHashSet[Any] = new java.util.LinkedHashSet[Any](),
    var overflowed: Boolean = false)

/**
 * `capped_distinct_list(e, max)` — the sorted distinct non-null values of
 * a group, or NULL when the group holds more than `max` distinct values.
 *
 * Equivalent to `when(size(array_sort(collect_set(e))) <= max, ...)` but
 * with the budget enforced DURING accumulation: once a task-local buffer
 * exceeds the cap it flips to a sticky overflow flag and drops its set,
 * so a high-cardinality file costs O(max) executor memory instead of
 * materializing millions of distinct values that the `when` would only
 * discard afterwards — the failure mode `maxValues` exists to prevent.
 * Partial aggregation applies; overflow merges as logical OR.
 */
case class CappedDistinctListAgg(
    child: Expression,
    maxValues: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedDistinctBuffer] with UnaryLike[Expression] {

  require(maxValues > 0, "maxValues must be positive")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "capped_distinct_list"

  override def createAggregationBuffer(): CappedDistinctBuffer =
    new CappedDistinctBuffer()

  override def update(
      buffer: CappedDistinctBuffer, input: InternalRow): CappedDistinctBuffer = {
    if (!buffer.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        buffer.values.add(InternalRow.copyValue(v))
        if (buffer.values.size > maxValues) {
          buffer.overflowed = true
          buffer.values.clear() // release the memory immediately
        }
      }
    }
    buffer
  }

  override def merge(
      buffer: CappedDistinctBuffer,
      other: CappedDistinctBuffer): CappedDistinctBuffer = {
    if (buffer.overflowed || other.overflowed) {
      buffer.overflowed = true
      buffer.values.clear()
    } else {
      val it = other.values.iterator()
      while (it.hasNext && !buffer.overflowed) {
        buffer.values.add(it.next())
        if (buffer.values.size > maxValues) {
          buffer.overflowed = true
          buffer.values.clear()
        }
      }
    }
    buffer
  }

  override def eval(buffer: CappedDistinctBuffer): Any =
    if (buffer.overflowed) null
    else {
      val ordering = TypeUtils.getInterpretedOrdering(child.dataType)
      val arr = buffer.values.toArray
      java.util.Arrays.sort(arr, ordering.asInstanceOf[java.util.Comparator[AnyRef]]
        .asInstanceOf[java.util.Comparator[Any]])
      new GenericArrayData(arr)
    }

  // serialize as a single-column UnsafeRow holding the (nullable) array:
  // null array <=> overflowed — same generic-value encoding Spark's own
  // Collect aggregates use
  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buffer: CappedDistinctBuffer): Array[Byte] = {
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    if (buffer.overflowed) row.update(0, null)
    else row.update(0, new GenericArrayData(buffer.values.toArray))
    projection.apply(row).getBytes
  }

  override def deserialize(bytes: Array[Byte]): CappedDistinctBuffer = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    if (row.isNullAt(0)) new CappedDistinctBuffer(overflowed = true)
    else {
      val arr = row.getArray(0)
      val buf = new CappedDistinctBuffer()
      var i = 0
      while (i < arr.numElements()) {
        buf.values.add(InternalRow.copyValue(arr.get(i, child.dataType)))
        i += 1
      }
      buf
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedDistinctListAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedDistinctListAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedDistinctListAgg =
    copy(child = newChild)
}
