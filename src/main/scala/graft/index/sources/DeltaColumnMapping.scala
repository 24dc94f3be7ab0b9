package graft.index.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types._

/**
 * Delta COLUMN MAPPING (reader + writer support, jarless): a
 * column-mapped table stores data under stable PHYSICAL column names
 * (`delta.columnMapping.physicalName` in the schema's field metadata)
 * so logical renames never rewrite data files. Modern Delta writers
 * produce such tables routinely — any table that has had a column
 * renamed or dropped carries mode `name`; `id` mode additionally pins
 * parquet field ids. Both modes resolve here by physical name, which is
 * what every conforming writer stores in the files (the id leg of `id`
 * mode exists for readers that match by parquet field id; physical
 * names are required to be present and consistent in both modes).
 *
 * The reference predates column mapping entirely (its Delta support
 * delegates to the connector jar: sources/delta/DeltaLakeRelation
 * .scala:34-45); this module is what lets the jarless replay serve the
 * tables that jar would.
 */
object DeltaColumnMapping {

  val ModeKey = "delta.columnMapping.mode"
  val MaxIdKey = "delta.columnMapping.maxColumnId"
  val PhysicalNameKey = "delta.columnMapping.physicalName"
  val IdKey = "delta.columnMapping.id"

  def mode(configuration: Map[String, String]): String =
    configuration.getOrElse(ModeKey, "none")

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey))
      f.metadata.getString(PhysicalNameKey)
    else f.name

  /** Every field (at every nesting level) must carry a physicalName for
    * the table to be readable under mapping; a partial mapping is a
    * non-conforming writer and must be refused, not guessed at. */
  def fullyMapped(schema: StructType): Boolean = {
    def ok(dt: DataType): Boolean = dt match {
      case s: StructType =>
        s.fields.forall(f => f.metadata.contains(PhysicalNameKey) && ok(f.dataType))
      case a: ArrayType => ok(a.elementType)
      case m: MapType => ok(m.keyType) && ok(m.valueType)
      case _ => true
    }
    ok(schema)
  }

  /** The schema as the parquet files spell it: physical names at every
    * level, logical types unchanged. */
  def physicalSchema(schema: StructType): StructType = {
    def conv(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(name = physicalName(f), dataType = conv(f.dataType))))
      case a: ArrayType => a.copy(elementType = conv(a.elementType))
      case m: MapType =>
        m.copy(keyType = conv(m.keyType), valueType = conv(m.valueType))
      case other => other
    }
    conv(schema).asInstanceOf[StructType]
  }

  private def structNamesDiffer(logical: DataType): Boolean = logical match {
    case s: StructType => s.fields.exists(f =>
      physicalName(f) != f.name || structNamesDiffer(f.dataType))
    case a: ArrayType => structNamesDiffer(a.elementType)
    case m: MapType => structNamesDiffer(m.keyType) || structNamesDiffer(m.valueType)
    case _ => false
  }

  /** Physical frame → logical: rename top-level columns, cast nested
    * structs (cast between structs matches by position, renaming inner
    * fields without touching values). Extra helper columns (`names`)
    * survive untouched. */
  def toLogical(df: DataFrame, schema: StructType,
      keep: Seq[String] = Nil): DataFrame = {
    val cols: Seq[Column] = schema.fields.toSeq.map { lf =>
      val c = df.col(physicalName(lf))
      (if (structNamesDiffer(lf.dataType)) c.cast(lf.dataType) else c)
        .as(lf.name)
    } ++ keep.map(df.col)
    df.select(cols: _*)
  }

  /** Logical frame → physical, for writes into a mapped table. */
  def toPhysical(df: DataFrame, schema: StructType): DataFrame = {
    val phys = physicalSchema(schema)
    val cols: Seq[Column] = schema.fields.toSeq.zip(phys.fields.toSeq).map {
      case (lf, pf) =>
        val c = df.col(lf.name)
        (if (structNamesDiffer(lf.dataType)) c.cast(pf.dataType) else c)
          .as(pf.name)
    }
    df.select(cols: _*)
  }

  /** Upgrade a schema to mapped form: every field gets its current name
    * as physicalName plus a fresh column id — data files stay valid
    * because physical names equal the names they were written with.
    * Returns the mapped schema and the max assigned id. */
  def assignMapping(schema: StructType, startId: Int = 0): (StructType, Int) = {
    var nextId = startId
    def conv(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map { f =>
        nextId += 1
        val md = new MetadataBuilder().withMetadata(f.metadata)
          .putString(PhysicalNameKey, f.name)
          .putLong(IdKey, nextId.toLong)
          .build()
        f.copy(metadata = md, dataType = conv(f.dataType))
      })
      case a: ArrayType => a.copy(elementType = conv(a.elementType))
      case m: MapType =>
        m.copy(keyType = conv(m.keyType), valueType = conv(m.valueType))
      case other => other
    }
    (conv(schema).asInstanceOf[StructType], nextId)
  }

  /** The highest column-mapping id recorded anywhere in the schema's
    * field metadata (any nesting level), 0 for an unmapped schema. The
    * authoritative counter is the `maxColumnId` table property, but a
    * foreign writer may enable mapping without recording it — deriving
    * the floor from the schema itself keeps a fresh id from colliding
    * with an existing field id and corrupting the mapping. */
  def maxFieldId(schema: StructType): Long = {
    def ofType(dt: DataType): Long = dt match {
      case s: StructType => s.fields.foldLeft(0L) { (acc, f) =>
        val own = if (f.metadata.contains(IdKey)) f.metadata.getLong(IdKey) else 0L
        math.max(acc, math.max(own, ofType(f.dataType)))
      }
      case a: ArrayType => ofType(a.elementType)
      case m: MapType => math.max(ofType(m.keyType), ofType(m.valueType))
      case _ => 0L
    }
    ofType(schema)
  }

  /** Rename one top-level column LOGICALLY (physicalName untouched —
    * that is the whole point of column mapping). */
  def renameField(schema: StructType, oldName: String,
      newName: String): StructType = {
    require(schema.fieldNames.contains(oldName),
      s"no column '$oldName' to rename (have ${schema.fieldNames.mkString(", ")})")
    require(!schema.fieldNames.contains(newName),
      s"column '$newName' already exists")
    StructType(schema.fields.map(f =>
      if (f.name == oldName) f.copy(name = newName) else f))
  }

  /** A NEW field for a mapped table: fresh `col-<uuid>` physical name
    * and the next column id — recursively, so a struct-typed addition
    * is fully mapped at every level (the [[fullyMapped]] invariant).
    * Returns the field and the last id consumed. */
  def mapNewField(name: String, dataType: DataType,
      startId: Long): (StructField, Long) = {
    var next = startId
    def freshMeta(base: Metadata): Metadata = {
      next += 1
      new MetadataBuilder().withMetadata(base)
        .putString(PhysicalNameKey, s"col-${java.util.UUID.randomUUID()}")
        .putLong(IdKey, next)
        .build()
    }
    def conv(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map { f =>
        val md = freshMeta(f.metadata)
        f.copy(metadata = md, dataType = conv(f.dataType))
      })
      case a: ArrayType => a.copy(elementType = conv(a.elementType))
      case m: MapType =>
        m.copy(keyType = conv(m.keyType), valueType = conv(m.valueType))
      case other => other
    }
    val topMeta = freshMeta(Metadata.empty)
    (StructField(name, conv(dataType), nullable = true, metadata = topMeta),
      next)
  }
}

/**
 * Nested-path StructType surgery for the column-DDL verbs: a target is
 * a name path (`Seq("a","b","c")` for `a.b.c`), resolved
 * case-insensitively like Spark's default resolver. Every operation
 * validates the path loudly (missing parents, non-struct parents,
 * duplicate names) — column DDL must refuse, never guess.
 */
object SchemaPaths {

  private def indexOf(schema: StructType, name: String): Int =
    schema.fields.indexWhere(_.name.equalsIgnoreCase(name))

  private def atParent(schema: StructType, parent: Seq[String],
      done: Seq[String])(op: StructType => StructType): StructType =
    if (parent.isEmpty) op(schema)
    else {
      val idx = indexOf(schema, parent.head)
      require(idx >= 0, s"no column '${(done :+ parent.head).mkString(".")}'" +
        s" (have ${schema.fieldNames.mkString(", ")})")
      val f = schema.fields(idx)
      val updated = f.dataType match {
        case st: StructType => f.copy(dataType =
          atParent(st, parent.tail, done :+ parent.head)(op))
        case other => throw new IllegalArgumentException(
          s"'${(done :+ parent.head).mkString(".")}' is not a struct " +
            s"(${other.simpleString}); nested column DDL needs a struct path")
      }
      StructType(schema.fields.updated(idx, updated))
    }

  /** Append `field` under the (possibly empty) parent path. */
  def addField(schema: StructType, parent: Seq[String],
      field: StructField): StructType =
    atParent(schema, parent, Nil) { st =>
      require(indexOf(st, field.name) < 0,
        s"column '${(parent :+ field.name).mkString(".")}' already exists")
      StructType(st.fields :+ field)
    }

  /** Rename the leaf at `path` (metadata — physicalName — untouched). */
  def renameAt(schema: StructType, path: Seq[String],
      newName: String): StructType =
    atParent(schema, path.init, Nil) { st =>
      val idx = indexOf(st, path.last)
      require(idx >= 0, s"no column '${path.mkString(".")}' " +
        s"(have ${st.fieldNames.mkString(", ")})")
      require(indexOf(st, newName) < 0,
        s"column '${(path.init :+ newName).mkString(".")}' already exists")
      StructType(st.fields.updated(idx, st.fields(idx).copy(name = newName)))
    }

  /** Remove the leaf at `path`; the parent must keep >=1 field. */
  def dropAt(schema: StructType, path: Seq[String]): StructType =
    atParent(schema, path.init, Nil) { st =>
      val idx = indexOf(st, path.last)
      require(idx >= 0, s"no column '${path.mkString(".")}' " +
        s"(have ${st.fieldNames.mkString(", ")})")
      require(st.fields.length > 1,
        s"cannot drop '${path.mkString(".")}': it is the only field of " +
          "its struct (drop the struct instead)")
      StructType(st.fields.patch(idx, Nil, 1))
    }

  /** The field at `path`, if present (case-insensitive). */
  def fieldAt(schema: StructType, path: Seq[String]): Option[StructField] = {
    val idx = indexOf(schema, path.head)
    if (idx < 0) None
    else if (path.size == 1) Some(schema.fields(idx))
    else schema.fields(idx).dataType match {
      case st: StructType => fieldAt(st, path.tail)
      case _ => None
    }
  }
}
