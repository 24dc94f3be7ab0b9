package graft.sources.avro

import java.math.BigInteger
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.Schema.Type
import org.apache.avro.generic.{GenericFixed, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Avro &lt;-&gt; Spark schema and value conversion for the jarless Avro
 * source ([[AvroFileFormat]]). Only the Avro core jars that already ship
 * with Spark (avro, avro-mapred) are used — no spark-avro module.
 *
 * Type mapping follows the Avro spec's logical-type annotations:
 * `date` on int, `timestamp-millis`/`timestamp-micros` on long,
 * `decimal` on bytes/fixed. Nullability is the idiomatic
 * `union(null, T)`. Unions beyond that shape, and non-string map keys,
 * are rejected (same restriction the reference's avro leg inherits from
 * the Spark module it delegates to).
 */
object AvroSchemaConverters {

  // ------------------------------------------------------------ schemas

  /** Unwrap `union(null, T)` to (T, nullable=true). */
  private def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType != Type.UNION) (s, false)
    else {
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Type.NULL)
      if (nonNull.size != 1) {
        throw new UnsupportedOperationException(
          s"unsupported avro union (only [null, T] is supported): $s")
      }
      (nonNull.head, branches.size != nonNull.size)
    }

  def toSqlType(avro: Schema): DataType = {
    val (s, _) = unwrap(avro)
    s.getType match {
      case Type.BOOLEAN => BooleanType
      case Type.INT =>
        if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType
        else IntegerType
      case Type.LONG => s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
          TimestampType
        case _ => LongType
      }
      case Type.FLOAT => FloatType
      case Type.DOUBLE => DoubleType
      case Type.STRING | Type.ENUM => StringType
      case Type.BYTES | Type.FIXED => s.getLogicalType match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
      case Type.ARRAY =>
        val (elem, elemNullable) = unwrap(s.getElementType)
        ArrayType(toSqlType(elem), containsNull = elemNullable)
      case Type.MAP =>
        val (v, vNullable) = unwrap(s.getValueType)
        MapType(StringType, toSqlType(v), valueContainsNull = vNullable)
      case Type.RECORD => toStructType(s)
      case other =>
        throw new UnsupportedOperationException(s"unsupported avro type: $other")
    }
  }

  def toStructType(record: Schema): StructType = StructType(
    record.getFields.asScala.toSeq.map { f =>
      val (_, nullable) = unwrap(f.schema())
      StructField(f.name(), toSqlType(f.schema()), nullable = nullable)
    })

  /** Spark -&gt; Avro, for the write path. Nested record names are made
    * unique by suffixing the field path (avro requires distinct names). */
  def toAvroSchema(
      catalyst: StructType,
      recordName: String = "topLevelRecord",
      namespace: String = "graft.avro"): Schema = {
    val fields = catalyst.fields.map { f =>
      val t = toAvroType(f.dataType, s"${recordName}_${f.name}", namespace)
      val s = if (f.nullable) {
        Schema.createUnion(java.util.List.of(Schema.create(Type.NULL), t))
      } else t
      new Schema.Field(f.name, s, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, namespace, false, java.util.List.of(fields: _*))
  }

  private def toAvroType(dt: DataType, name: String, ns: String): Schema = dt match {
    case BooleanType => Schema.create(Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Type.INT)
    case LongType => Schema.create(Type.LONG)
    case FloatType => Schema.create(Type.FLOAT)
    case DoubleType => Schema.create(Type.DOUBLE)
    case StringType => Schema.create(Type.STRING)
    case BinaryType => Schema.create(Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Type.BYTES))
    case ArrayType(et, containsNull) =>
      val elem = toAvroType(et, s"${name}_item", ns)
      Schema.createArray(
        if (containsNull) {
          Schema.createUnion(java.util.List.of(Schema.create(Type.NULL), elem))
        } else elem)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = toAvroType(vt, s"${name}_value", ns)
      Schema.createMap(
        if (valueContainsNull) {
          Schema.createUnion(java.util.List.of(Schema.create(Type.NULL), v))
        } else v)
    case st: StructType => toAvroSchema(st, name, ns)
    case other =>
      throw new UnsupportedOperationException(s"unsupported spark type for avro: $other")
  }

  // ------------------------------------------------- avro -> catalyst

  /** Value converter from a decoded avro datum (of `avro`'s unwrapped
    * type) to the catalyst representation of `dt`. Null-safe. Numeric
    * widening is lenient (a user-supplied LongType reads an avro int)
    * because readers may pass an explicit schema. */
  def readerFor(avro: Schema, dt: DataType): Any => Any = {
    val (s, _) = unwrap(avro)
    val conv: Any => Any = dt match {
      case BooleanType => identity
      case IntegerType => v => v.asInstanceOf[Number].intValue()
      case LongType => v => v.asInstanceOf[Number].longValue()
      case FloatType => v => v.asInstanceOf[Number].floatValue()
      case DoubleType => v => v.asInstanceOf[Number].doubleValue()
      case DateType => v => v.asInstanceOf[Number].intValue() // days
      case TimestampType =>
        if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis]) {
          v => v.asInstanceOf[Number].longValue() * 1000L
        } else {
          v => v.asInstanceOf[Number].longValue() // micros
        }
      case StringType => v => UTF8String.fromString(v.toString)
      case BinaryType => v => toBytes(v)
      case d: DecimalType =>
        val scale = s.getLogicalType match {
          case dec: LogicalTypes.Decimal => dec.getScale
          case _ => d.scale
        }
        v => Decimal(
          new java.math.BigDecimal(new BigInteger(toBytes(v)), scale),
          d.precision, d.scale)
      case ArrayType(et, _) =>
        val elemConv = readerFor(s.getElementType, et)
        v => {
          val in = v.asInstanceOf[java.util.Collection[AnyRef]]
          val out = new Array[Any](in.size)
          val it = in.iterator()
          var i = 0
          while (it.hasNext) {
            val e = it.next()
            out(i) = if (e == null) null else elemConv(e)
            i += 1
          }
          new GenericArrayData(out)
        }
      case MapType(StringType, vt, _) =>
        val valConv = readerFor(s.getValueType, vt)
        v => {
          val in = v.asInstanceOf[java.util.Map[AnyRef, AnyRef]]
          val keys = new Array[Any](in.size)
          val vals = new Array[Any](in.size)
          val it = in.entrySet().iterator()
          var i = 0
          while (it.hasNext) {
            val e = it.next()
            keys(i) = UTF8String.fromString(e.getKey.toString)
            vals(i) = if (e.getValue == null) null else valConv(e.getValue)
            i += 1
          }
          ArrayBasedMapData(keys, vals)
        }
      case st: StructType =>
        val rowConv = recordReader(s, st)
        v => rowConv(v.asInstanceOf[GenericRecord])
      case other =>
        throw new UnsupportedOperationException(s"unsupported read type: $other")
    }
    v => if (v == null) null else conv(v)
  }

  /** Record converter: fields resolved BY NAME against the file schema;
    * fields absent from the file read as null (schema evolution). */
  def recordReader(fileSchema: Schema, required: StructType)
      : GenericRecord => InternalRow = {
    val (s, _) = unwrap(fileSchema)
    val fieldConvs: Array[Option[(String, Any => Any)]] =
      required.fields.map { f =>
        Option(s.getField(f.name)).map { af =>
          (f.name, readerFor(af.schema(), f.dataType))
        }
      }
    rec => {
      val out = new Array[Any](fieldConvs.length)
      var i = 0
      while (i < fieldConvs.length) {
        out(i) = fieldConvs(i) match {
          case Some((name, conv)) =>
            val v = rec.get(name)
            if (v == null) null else conv(v)
          case None => null
        }
        i += 1
      }
      new GenericInternalRow(out)
    }
  }

  private def toBytes(v: Any): Array[Byte] = v match {
    case bb: ByteBuffer =>
      val d = bb.duplicate()
      val out = new Array[Byte](d.remaining())
      d.get(out)
      out
    case f: GenericFixed => f.bytes().clone()
    case a: Array[Byte] => a
    case other => throw new UnsupportedOperationException(
      s"unexpected avro binary value: ${other.getClass}")
  }

  // ------------------------------------------------- catalyst -> avro

  /** Converter from the catalyst value of `dt` to the avro datum the
    * generic writer expects for the schema [[toAvroType]] produces. */
  def writerFor(dt: DataType, avro: Schema): Any => Any = {
    val (s, _) = unwrap(avro)
    dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           DateType | TimestampType => identity
      case ByteType => v => v.asInstanceOf[Byte].toInt
      case ShortType => v => v.asInstanceOf[Short].toInt
      case StringType => v => v.toString
      case BinaryType => v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case _: DecimalType => v => ByteBuffer.wrap(
        v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue().toByteArray)
      case ArrayType(et, _) =>
        val elemConv = writerFor(et, s.getElementType)
        v => {
          val ad = v.asInstanceOf[ArrayData]
          val n = ad.numElements()
          val out = new java.util.ArrayList[Any](n)
          var i = 0
          while (i < n) {
            out.add(if (ad.isNullAt(i)) null else elemConv(ad.get(i, et)))
            i += 1
          }
          out
        }
      case MapType(StringType, vt, _) =>
        val valConv = writerFor(vt, s.getValueType)
        v => {
          val md = v.asInstanceOf[MapData]
          val n = md.numElements()
          val keys = md.keyArray()
          val vals = md.valueArray()
          val out = new java.util.HashMap[String, Any](n * 2)
          var i = 0
          while (i < n) {
            out.put(keys.getUTF8String(i).toString,
              if (vals.isNullAt(i)) null else valConv(vals.get(i, vt)))
            i += 1
          }
          out
        }
      case st: StructType =>
        val rowConv = recordWriter(st, s)
        v => rowConv(v.asInstanceOf[InternalRow])
      case other =>
        throw new UnsupportedOperationException(s"unsupported write type: $other")
    }
  }

  def recordWriter(catalyst: StructType, avro: Schema): InternalRow => GenericRecord = {
    val (s, _) = unwrap(avro)
    val convs = catalyst.fields.map(f => writerFor(f.dataType, s.getField(f.name).schema()))
    val types = catalyst.fields.map(_.dataType)
    row => {
      val rec = new org.apache.avro.generic.GenericData.Record(s)
      var i = 0
      while (i < convs.length) {
        rec.put(i, if (row.isNullAt(i)) null else convs(i)(row.get(i, types(i))))
        i += 1
      }
      rec
    }
  }
}
