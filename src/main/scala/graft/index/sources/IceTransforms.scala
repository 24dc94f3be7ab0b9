package graft.index.sources

import scala.util.control.NonFatal

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.functions.{col, date_add, datediff, floor, lit, month, pmod, year}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * ICEBERG HIDDEN PARTITIONING — the partition-transform family of the
 * Iceberg table spec (identity, bucket[N], truncate[W], year, month,
 * day, hour, void), implemented Spark-first: the writer derives the
 * partition value as a Catalyst COLUMN (codegen'd end to end, computed
 * per row inside the staged write's WholeStageCodegen span), and the
 * reader prunes files by translating pushed-down predicates on the
 * SOURCE column into interval checks against the per-file partition
 * tuple carried by the manifests.
 *
 * This is the 100 TB story of hidden partitioning: `WHERE ts >=
 * '2024-01-01'` prunes a `day(ts)`-partitioned table to the matching
 * day directories, and `WHERE id = k` opens exactly one of the
 * `bucket(N, id)` buckets — without the query ever naming the
 * partition field, and without trusting data-file min/max (which a
 * bucket transform scrambles).
 *
 * Reference counterpart: sources/iceberg/IcebergRelation.scala:77-86
 * surfaces only identity partition columns and delegates transforms to
 * the iceberg jar; building the source jarlessly means re-deriving the
 * transform semantics from the public table spec (formats, appendix B
 * bucket hashing) here.
 */
private[graft] sealed trait IceTransformKind
private[graft] case object TIdentity extends IceTransformKind
private[graft] case object TVoid extends IceTransformKind
private[graft] final case class TBucket(n: Int) extends IceTransformKind
private[graft] final case class TTruncate(w: Int) extends IceTransformKind
private[graft] case object TYear extends IceTransformKind
private[graft] case object TMonth extends IceTransformKind
private[graft] case object TDay extends IceTransformKind
private[graft] case object THour extends IceTransformKind

/**
 * One field of an Iceberg partition spec. `transform` is the canonical
 * spec string (`identity`, `bucket[16]`, `truncate[4]`, `year`,
 * `month`, `day`, `hour`, `void`); `fieldId` is the spec's partition
 * field id (1000+, preserved verbatim when republishing metadata).
 */
final case class IcePartField(
    name: String, sourceCol: String, transform: String, fieldId: Int) {
  private[graft] def kind: IceTransformKind =
    IceTransforms.parseTransform(transform)
  /** Identity fields partition by the source column itself (and the
    * data files drop it — the path carries it); every other transform
    * partitions by a DERIVED bookkeeping column named `name`. */
  def partitionByName: String =
    if (kind == TIdentity) sourceCol else name
  override def toString: String = s"$name=$transform($sourceCol)"
}

/**
 * Murmur3 x86 32-bit (public domain algorithm, Austin Appleby) with
 * the Iceberg bucket-transform input encodings of the table spec's
 * Appendix B: seed 0; int/long/date/timestamp hashed as the
 * little-endian 8-byte long, strings as UTF-8 bytes. Spark's own
 * `hash()` is the same algorithm with seed 42 and Spark-specific
 * encodings — NOT interchangeable.
 */
object IceMurmur3 {

  def hashBytes(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0 // seed
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      val base = 4 * i
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    val rem = data.length & 3
    if (rem >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    hashBytes(b)
  }

  /** `(hash & Int.MaxValue) % n` — the spec's bucket function. */
  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Int.MaxValue) % n

  def bucketBytes(b: Array[Byte], n: Int): Int =
    (hashBytes(b) & Int.MaxValue) % n

  def bucketUtf8(s: UTF8String, n: Int): Int = bucketBytes(s.getBytes, n)

  def bucketString(s: String, n: Int): Int =
    bucketBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), n)

  /** First `w` Unicode CODE POINTS of `s` (the spec truncates strings
    * by code points, not UTF-16 units — surrogate pairs stay whole). */
  def truncateString(s: String, w: Int): String = {
    val cps = s.codePointCount(0, s.length)
    if (cps <= w) s else s.substring(0, s.offsetByCodePoints(0, w))
  }
}

/**
 * Iceberg bucket transform as a native Catalyst expression: computed
 * per row in the staged partitioned write, inside whole-stage codegen
 * (the generated code is one static call). Null input → null bucket
 * (the spec's null partition).
 */
case class IceBucketHash(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  private val util = IceMurmur3.getClass.getName.stripSuffix("$")

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => IceMurmur3.bucketUtf8(v.asInstanceOf[UTF8String], n)
    case ByteType => IceMurmur3.bucketLong(v.asInstanceOf[Byte].toLong, n)
    case ShortType => IceMurmur3.bucketLong(v.asInstanceOf[Short].toLong, n)
    case IntegerType | DateType =>
      IceMurmur3.bucketLong(v.asInstanceOf[Int].toLong, n)
    case LongType | TimestampType | TimestampNTZType =>
      IceMurmur3.bucketLong(v.asInstanceOf[Long], n)
    case other => throw new IllegalStateException(
      s"bucket transform over unsupported type ${other.simpleString}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType => s"${ev.value} = $util.bucketUtf8($c, $n);"
      case _ => s"${ev.value} = $util.bucketLong((long) $c, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): IceBucketHash =
    copy(child = newChild)
  override def prettyName: String = "ice_bucket"
}

/** Iceberg truncate[W] over strings — code-point truncation (see
  * [[IceMurmur3.truncateString]]); `substring` on UTF8String walks
  * UTF-8 chars, i.e. code points, so both paths agree. */
case class IceTruncateString(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(v: Any): Any =
    v.asInstanceOf[UTF8String].substring(0, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $c.substring(0, $w);")

  override protected def withNewChildInternal(newChild: Expression): IceTruncateString =
    copy(child = newChild)
  override def prettyName: String = "ice_truncate"
}

object IceTransforms {

  private val BucketRe = """^bucket\[(\d+)\]$""".r
  private val TruncateRe = """^truncate\[(\d+)\]$""".r

  /** Canonical spec transform string → kind. Accepts the plural
    * aliases some writers emit (`days`, `hours`, …). */
  private[graft] def parseTransform(t: String): IceTransformKind = t match {
    case "identity" => TIdentity
    case "void" => TVoid
    case BucketRe(n) => TBucket(n.toInt)
    case TruncateRe(w) => TTruncate(w.toInt)
    case "year" | "years" => TYear
    case "month" | "months" => TMonth
    case "day" | "days" | "date" => TDay
    case "hour" | "hours" | "date_hour" => THour
    case other => throw new IllegalArgumentException(
      s"unsupported Iceberg partition transform '$other' (supported: " +
        "identity, bucket[N], truncate[W], year, month, day, hour, void)")
  }

  private val FnRe = """^\s*(\w+)\s*\(([^)]*)\)\s*$""".r

  /**
   * One user-facing partition spec string → [[IcePartField]]. Accepts
   * the Iceberg SQL transform syntax alongside plain identity names:
   * `"c_mktsegment"`, `"bucket(16, id)"`, `"truncate(4, name)"`,
   * `"days(ts)"`, `"months(ts)"`, `"years(ts)"`, `"hours(ts)"`.
   * Field names follow Iceberg's defaults (`id_bucket`, `name_trunc`,
   * `ts_day`, …); `fieldId` is assigned by position (1000+i).
   */
  def parseFieldSpec(spec: String, schema: StructType, i: Int): IcePartField = {
    def sourceType(c: String): DataType =
      schema.fields.find(_.name == c).getOrElse(throw new IllegalArgumentException(
        s"partition spec '$spec': column '$c' is not in the frame schema " +
          schema.simpleString)).dataType
    spec match {
      case FnRe(fn, args) =>
        val parts = args.split(",").map(_.trim).filter(_.nonEmpty)
        fn.toLowerCase match {
          case "bucket" =>
            require(parts.length == 2 && parts(0).forall(_.isDigit),
              s"partition spec '$spec': expected bucket(N, column)")
            val (n, c) = (parts(0).toInt, parts(1))
            require(n > 0, s"partition spec '$spec': bucket width must be > 0")
            sourceType(c) match {
              case ByteType | ShortType | IntegerType | LongType | StringType |
                   DateType | TimestampType | TimestampNTZType =>
              case other => throw new IllegalArgumentException(
                s"partition spec '$spec': bucket over ${other.simpleString} " +
                  "is not supported (integral, string, date, timestamp)")
            }
            IcePartField(s"${c}_bucket", c, s"bucket[$n]", 1000 + i)
          case "truncate" =>
            require(parts.length == 2 && parts(0).forall(_.isDigit),
              s"partition spec '$spec': expected truncate(W, column)")
            val (w, c) = (parts(0).toInt, parts(1))
            require(w > 0, s"partition spec '$spec': truncate width must be > 0")
            sourceType(c) match {
              case ByteType | ShortType | IntegerType | LongType | StringType =>
              case other => throw new IllegalArgumentException(
                s"partition spec '$spec': truncate over ${other.simpleString} " +
                  "is not supported (integral and string)")
            }
            IcePartField(s"${c}_trunc", c, s"truncate[$w]", 1000 + i)
          case t @ ("year" | "years" | "month" | "months" | "day" | "days" |
                    "hour" | "hours") =>
            require(parts.length == 1,
              s"partition spec '$spec': expected $t(column)")
            val c = parts(0)
            val canonical = t.stripSuffix("s")
            sourceType(c) match {
              case DateType =>
                require(canonical != "hour",
                  s"partition spec '$spec': hour() needs a timestamp column")
              case TimestampType | TimestampNTZType =>
              case other => throw new IllegalArgumentException(
                s"partition spec '$spec': $t over ${other.simpleString} is " +
                  "not supported (date and timestamp)")
            }
            IcePartField(s"${c}_$canonical", c, canonical, 1000 + i)
          case other => throw new IllegalArgumentException(
            s"partition spec '$spec': unknown transform '$other'")
        }
      case name =>
        val dt = sourceType(name.trim)
        require(IcebergTable.partitionable(dt),
          s"partition column '$name' has type ${dt.simpleString}; identity " +
            "partitioning supports integral, string, boolean and date columns")
        IcePartField(name.trim, name.trim, "identity", 1000 + i)
    }
  }

  /** The partition field's RESULT type — the type of its path segment
    * value, manifest tuple entry, and pruning domain. */
  def resultType(f: IcePartField, sourceType: DataType): DataType = f.kind match {
    case TIdentity | TVoid => sourceType
    case TBucket(_) | TYear | TMonth | TDay | THour => IntegerType
    case TTruncate(_) => sourceType
  }

  private val EpochDate = java.sql.Date.valueOf("1970-01-01")

  /**
   * The derived partition value as a Spark COLUMN over `df` — what the
   * staged write partitions by. Everything composes from codegen'd
   * built-ins except bucket and string-truncate, which are the two
   * native expressions above (also codegen'd). Time transforms work in
   * epoch arithmetic (timestamp → UTC seconds via cast, calendar
   * fields via DateType, which is timezone-free), so the derived value
   * never depends on the session time zone.
   */
  def column(f: IcePartField, df: DataFrame): Column = {
    val src = df.col(f.sourceCol)
    val st = df.schema.fields.find(_.name == f.sourceCol)
      .getOrElse(throw new IllegalArgumentException(
        s"partition source column '${f.sourceCol}' is not in " +
          df.schema.simpleString)).dataType
    // TIMESTAMP is UTC micros — epoch arithmetic via cast-to-long.
    // TIMESTAMP_NTZ stores a wall-clock literal (no long cast exists);
    // its date/hour fields ARE the transform inputs, matching the
    // stats domain's micros-as-UTC reading exactly.
    def tsDay: Column = st match {
      case TimestampNTZType => datediff(src.cast(DateType), lit(EpochDate))
      case _ => floor(src.cast(LongType) / lit(86400)).cast(IntegerType)
    }
    def asDate: Column = st match {
      case DateType => src
      case TimestampNTZType => src.cast(DateType)
      case TimestampType => date_add(lit(EpochDate), tsDay)
      case other => throw new IllegalArgumentException(
        s"time transform over ${other.simpleString}")
    }
    f.kind match {
      case TIdentity => src
      case TVoid => lit(null).cast(st)
      case TBucket(n) =>
        GraftBridge.column(IceBucketHash(GraftBridge.expression(src), n))
      case TTruncate(w) => st match {
        case StringType =>
          GraftBridge.column(IceTruncateString(GraftBridge.expression(src), w))
        case _ => src - pmod(src, lit(w))
      }
      case TYear => year(asDate) - lit(1970)
      case TMonth => (year(asDate) - lit(1970)) * lit(12) + month(asDate) - lit(1)
      case TDay => st match {
        case DateType => datediff(src, lit(EpochDate))
        case _ => tsDay
      }
      case THour => st match {
        case TimestampNTZType =>
          (tsDay * lit(24) + org.apache.spark.sql.functions.hour(src))
            .cast(IntegerType)
        case TimestampType =>
          floor(src.cast(LongType) / lit(3600)).cast(IntegerType)
        case _ => throw new IllegalArgumentException(
          "hour() needs a timestamp column")
      }
    }
  }

  /**
   * Driver-side transform of a value in the stats comparison DOMAIN
   * (Long = integral / epoch-days / epoch-µs, String) — must agree
   * exactly with [[column]]; the consistency is spec-pinned. Used to
   * translate predicate literals into the partition domain. None =
   * outside the model (no pruning through this transform).
   */
  def domainValue(f: IcePartField, sourceType: DataType, v: Any): Option[Any] = {
    def epochDay: Option[Long] = (v, sourceType) match {
      case (d: Long, DateType) => Some(d)
      case (us: Long, TimestampType | TimestampNTZType) =>
        Some(Math.floorDiv(us, 86400000000L))
      case _ => None
    }
    f.kind match {
      case TIdentity => Some(v)
      case TVoid => None
      case TBucket(n) => (v, sourceType) match {
        case (x: Long, ByteType | ShortType | IntegerType | LongType |
                       DateType | TimestampType | TimestampNTZType) =>
          Some(IceMurmur3.bucketLong(x, n).toLong)
        case (s: String, StringType) =>
          Some(IceMurmur3.bucketString(s, n).toLong)
        case _ => None
      }
      case TTruncate(w) => v match {
        case x: Long => Some(Math.floorDiv(x, w) * w)
        case s: String => Some(IceMurmur3.truncateString(s, w))
        case _ => None
      }
      case TDay => epochDay
      case THour => (v, sourceType) match {
        case (us: Long, TimestampType | TimestampNTZType) =>
          Some(Math.floorDiv(us, 3600000000L))
        case _ => None
      }
      case TYear => epochDay.map(d =>
        (java.time.LocalDate.ofEpochDay(d).getYear - 1970).toLong)
      case TMonth => epochDay.map { d =>
        val ld = java.time.LocalDate.ofEpochDay(d)
        ((ld.getYear - 1970) * 12 + ld.getMonthValue - 1).toLong
      }
    }
  }

  /** Hive path segment string of a derived partition value → the
    * partition domain (None = unparseable → no pruning, sound). */
  def pathToDomain(f: IcePartField, sourceType: DataType,
      raw: String): Option[Any] =
    try {
      resultType(f, sourceType) match {
        case ByteType | ShortType | IntegerType | LongType => Some(raw.toLong)
        case StringType => Some(raw)
        case BooleanType => Some(raw.toBoolean)
        case DateType =>
          Some(java.sql.Date.valueOf(raw).toLocalDate.toEpochDay)
        case _ => None
      }
    } catch { case NonFatal(_) => None }

  /** Transforms through which RANGE predicates translate (v1 <= v2 ⇒
    * T(v1) <= T(v2)). Bucket scrambles order — equality only. */
  private def monotonic(k: IceTransformKind): Boolean = k match {
    case TTruncate(_) | TYear | TMonth | TDay | THour => true
    case _ => false
  }

  private[sources] def pseudoName(f: IcePartField): String = s"__icepart_${f.name}"

  private def pseudoType(f: IcePartField, sourceType: DataType): DataType =
    resultType(f, sourceType) match {
      case ByteType | ShortType | IntegerType | LongType | DateType => LongType
      case other => other
    }

  /**
   * Translate a pushed-down data predicate into a predicate over the
   * PSEUDO partition-field attributes, evaluated against per-file
   * partition tuples by [[IcePartitionPruningFileIndex]]. Sound by
   * construction: an untranslatable subtree degrades to "keep"
   * (And-side dropped, Or poisons the whole disjunct), and range
   * operators only translate through monotonic transforms — with the
   * boundary relaxed (`src < v` ⇒ `T(src) <= T(v)`) because transforms
   * are many-to-one.
   */
  def pruningPredicate(pred: Expression, fields: Seq[IcePartField],
      schema: StructType): Option[Expression] = {
    val byCol: Map[String, Seq[IcePartField]] =
      fields.filter(f => f.kind != TIdentity && f.kind != TVoid)
        .groupBy(_.sourceCol)
    if (byCol.isEmpty) return None

    def attr(f: IcePartField, st: DataType): AttributeReference =
      AttributeReference(pseudoName(f), pseudoType(f, st))()
    def litOf(v: Any, f: IcePartField, st: DataType): Literal = v match {
      case l: Long => Literal(l, LongType)
      case s: String => Literal.create(s, StringType)
      case b: Boolean => Literal(b, BooleanType)
      case other => Literal.create(other, pseudoType(f, st))
    }

    // attr-op-literal with the attribute normalized to the left
    def attrCmp(e: Expression): Option[(AttributeReference, Any, String)] = {
      def dom(a: AttributeReference, l: Literal): Option[Any] =
        StatsPredicate.toDomain(l.value, l.dataType)
      e match {
        case EqualTo(a: AttributeReference, l: Literal) => dom(a, l).map((a, _, "="))
        case EqualTo(l: Literal, a: AttributeReference) => dom(a, l).map((a, _, "="))
        case EqualNullSafe(a: AttributeReference, l: Literal) if l.value != null =>
          dom(a, l).map((a, _, "="))
        case EqualNullSafe(l: Literal, a: AttributeReference) if l.value != null =>
          dom(a, l).map((a, _, "="))
        case LessThan(a: AttributeReference, l: Literal) => dom(a, l).map((a, _, "<"))
        case LessThan(l: Literal, a: AttributeReference) => dom(a, l).map((a, _, ">"))
        case LessThanOrEqual(a: AttributeReference, l: Literal) =>
          dom(a, l).map((a, _, "<="))
        case LessThanOrEqual(l: Literal, a: AttributeReference) =>
          dom(a, l).map((a, _, ">="))
        case GreaterThan(a: AttributeReference, l: Literal) => dom(a, l).map((a, _, ">"))
        case GreaterThan(l: Literal, a: AttributeReference) => dom(a, l).map((a, _, "<"))
        case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
          dom(a, l).map((a, _, ">="))
        case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
          dom(a, l).map((a, _, "<="))
        case _ => None
      }
    }

    def perField(f: IcePartField, st: DataType, v: Any, op: String): Option[Expression] = {
      val t = domainValue(f, st, v)
      t.flatMap { tv =>
        val a = attr(f, st)
        val l = litOf(tv, f, st)
        (op, f.kind) match {
          case ("=", _) => Some(EqualTo(a, l))
          case (("<" | "<="), k) if monotonic(k) => Some(LessThanOrEqual(a, l))
          case ((">" | ">="), k) if monotonic(k) => Some(GreaterThanOrEqual(a, l))
          case _ => None
        }
      }
    }

    def translate(e: Expression): Option[Expression] = e match {
      case And(l, r) => (translate(l), translate(r)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (a, b) => a.orElse(b)
      }
      case Or(l, r) =>
        for (a <- translate(l); b <- translate(r)) yield Or(a, b)
      case In(a: AttributeReference, list)
          if list.forall(_.isInstanceOf[Literal]) =>
        byCol.get(a.name).flatMap { fs =>
          val alts = list.map {
            case l: Literal if l.value == null => None
            case l: Literal =>
              StatsPredicate.toDomain(l.value, l.dataType).flatMap { v =>
                fs.flatMap(f => perField(f, a.dataType, v, "="))
                  .reduceOption(And)
              }
          }
          // every alternative must translate, else the In may match
          // through an unmodeled value
          if (alts.exists(_.isEmpty)) None
          else alts.flatten.reduceOption(Or)
        }
      case e2 => attrCmp(e2).flatMap { case (a, v, op) =>
        byCol.get(a.name).flatMap(fs =>
          fs.flatMap(f => perField(f, a.dataType, v, op)).reduceOption(And))
      }
    }
    translate(pred)
  }

  /** Per-file pseudo-column stats from the file's partition tuple:
    * a defined value is an exact min=max point; a null partition value
    * (null source rows) stays unknown — kept by every comparison. */
  private[sources] def tupleStats(fields: Seq[IcePartField],
      vals: Map[String, Option[Any]]): FileStats =
    FileStats(None, fields.flatMap { f =>
      vals.get(f.name).map {
        case Some(v) => pseudoName(f) -> FileColStats(Some(v), Some(v), Some(0L))
        case None => pseudoName(f) -> FileColStats(None, None, None)
      }
    }.toMap)
}

/**
 * `FileIndex` decorator pruning by HIDDEN-PARTITION tuples: translates
 * the pushed-down data filters through the spec's transforms
 * ([[IceTransforms.pruningPredicate]]) and keeps only files whose
 * manifest partition tuple may match. Driver-side per-file checks at
 * listing time, same contract as [[StatsPruningFileIndex]] (unknown →
 * keep); composes with it — stats prune by source min/max, this prunes
 * by transform value, and bucket transforms only the latter can prune.
 */
final class IcePartitionPruningFileIndex(
    base: FileIndex,
    fields: Seq[IcePartField],
    valuesByPath: Map[String, Map[String, Option[Any]]],
    schema: StructType) extends FileIndex {

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val listed = base.listFiles(partitionFilters, dataFilters)
    val pred = dataFilters.reduceOption(And)
      .flatMap(p => try IceTransforms.pruningPredicate(p, fields, schema)
        catch { case NonFatal(_) => None })
    pred match {
      case None => listed
      case Some(p) => listed.map { pd =>
        pd.copy(files = pd.files.filter { f =>
          valuesByPath.get(DeltaTable.normPath(f.getPath.toString)).forall {
            vals =>
              try StatsPredicate.mayMatch(IceTransforms.tupleStats(fields, vals), p)
              catch { case NonFatal(_) => true }
          }
        })
      }.filter(_.files.nonEmpty)
    }
  }

  override def rootPaths: Seq[Path] = base.rootPaths
  override def inputFiles: Array[String] = base.inputFiles
  override def refresh(): Unit = base.refresh()
  override def sizeInBytes: Long = base.sizeInBytes
  override def partitionSchema: StructType = base.partitionSchema
}

object IceTransformPruning {

  /** Rewrap `df`'s scan so listing prunes by the hidden-partition
    * tuples (no-op for identity-only specs or missing tuples). */
  def wrap(df: DataFrame, fields: Seq[IcePartField],
      valuesByPath: Map[String, Map[String, Option[Any]]],
      schema: StructType): DataFrame = {
    if (valuesByPath.isEmpty ||
        !fields.exists(f => f.kind != TIdentity && f.kind != TVoid)) return df
    val spark = df.sparkSession
    val plan = df.queryExecution.analyzed.transform {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        val hfs = l.relation.asInstanceOf[HadoopFsRelation]
        l.copy(relation = hfs.copy(location = new IcePartitionPruningFileIndex(
          hfs.location, fields, valuesByPath, schema))(spark))
    }
    GraftBridge.ofRows(spark, plan)
  }
}
