package graft.index.dataskipping.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/**
 * Per-group bloom filter over a column, emitted as the sketch's serialized
 * bytes (reference: index/dataskipping/expressions/BloomFilterAgg.scala:30-83;
 * same `TypedImperativeAggregate[BloomFilter]` base, same
 * `spark.util.sketch.BloomFilter` engine).
 *
 * Scale: partial aggregation applies — each task builds a local filter and
 * only serialized filters cross the shuffle (one per file per task).
 */
case class BloomFilterAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) BloomFilterUtils.put(buffer, v, child.dataType)
    buffer
  }

  override def merge(buffer: BloomFilter, input: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(input)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_bloom_filter"
}

/** Type-dispatched put/mightContain over `spark.util.sketch.BloomFilter`
  * (reference: index/dataskipping/expressions/BloomFilterUtils.scala).
  * Public + static-shaped so generated code can call it. */
object BloomFilterUtils {

  def put(bf: BloomFilter, value: Any, dataType: DataType): Boolean = dataType match {
    case LongType => bf.putLong(value.asInstanceOf[Long])
    case IntegerType => bf.putLong(value.asInstanceOf[Int].toLong)
    case ShortType => bf.putLong(value.asInstanceOf[Short].toLong)
    case ByteType => bf.putLong(value.asInstanceOf[Byte].toLong)
    case DateType => bf.putLong(value.asInstanceOf[Int].toLong)
    case TimestampType => bf.putLong(value.asInstanceOf[Long])
    case StringType => bf.putBinary(value.asInstanceOf[UTF8String].getBytes)
    case BinaryType => bf.putBinary(value.asInstanceOf[Array[Byte]])
    case t => throw new UnsupportedOperationException(
      s"bloom filter sketch does not support type $t")
  }

  def mightContain(bytes: Array[Byte], value: Any, dataType: DataType): Boolean = {
    val bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    dataType match {
      case LongType => bf.mightContainLong(value.asInstanceOf[Long])
      case IntegerType => bf.mightContainLong(value.asInstanceOf[Int].toLong)
      case ShortType => bf.mightContainLong(value.asInstanceOf[Short].toLong)
      case ByteType => bf.mightContainLong(value.asInstanceOf[Byte].toLong)
      case DateType => bf.mightContainLong(value.asInstanceOf[Int].toLong)
      case TimestampType => bf.mightContainLong(value.asInstanceOf[Long])
      case StringType => bf.mightContainBinary(value.asInstanceOf[UTF8String].getBytes)
      case BinaryType => bf.mightContainBinary(value.asInstanceOf[Array[Byte]])
      case t => throw new UnsupportedOperationException(
        s"bloom filter sketch does not support type $t")
    }
  }

  /** Any-of variant used for InSet translation (reference:
    * BloomFilterMightContainAny.scala:35-75). */
  def mightContainAny(bytes: Array[Byte], values: Array[Any], dataType: DataType): Boolean = {
    val bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    values.exists {
      case null => false
      case v => dataType match {
        case LongType => bf.mightContainLong(v.asInstanceOf[Long])
        case IntegerType => bf.mightContainLong(v.asInstanceOf[Int].toLong)
        case ShortType => bf.mightContainLong(v.asInstanceOf[Short].toLong)
        case ByteType => bf.mightContainLong(v.asInstanceOf[Byte].toLong)
        case DateType => bf.mightContainLong(v.asInstanceOf[Int].toLong)
        case TimestampType => bf.mightContainLong(v.asInstanceOf[Long])
        case StringType => bf.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
        case BinaryType => bf.mightContainBinary(v.asInstanceOf[Array[Byte]])
        case t => throw new UnsupportedOperationException(
          s"bloom filter sketch does not support type $t")
      }
    }
  }
}
