package graft.index

import java.time.{LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{IceMurmur3, IcePartField, IceTransforms}

/**
 * The transform layer of Iceberg hidden partitioning, unit-level:
 * bucket hashing pinned to the PUBLIC test vectors of the Iceberg
 * table spec (Appendix B, "32-bit Hash Requirements"), writer-column
 * vs driver-domain consistency (the two must agree exactly or pruning
 * would lie), and the soundness rules of the predicate translation.
 */
class IceTransformsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------ spec appendix B vectors

  test("murmur3 bucket hash matches the Iceberg spec's published vectors") {
    // int/long hash identically (widened to the little-endian long)
    assert(IceMurmur3.hashLong(34L) === 2017239379)
    assert(IceMurmur3.hashBytes(
      "iceberg".getBytes(java.nio.charset.StandardCharsets.UTF_8)) === 1210000089)
    // date 2017-11-16, hashed as its epoch-day int
    val d = LocalDate.of(2017, 11, 16).toEpochDay
    assert(IceMurmur3.hashLong(d) === -653330422)
    // timestamp 2017-11-16T22:31:08 (UTC), hashed as epoch microseconds
    val us = LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toEpochSecond(ZoneOffset.UTC) * 1000000L
    assert(IceMurmur3.hashLong(us) === -2047944441)
    // time 22:31:08, microseconds from midnight
    assert(IceMurmur3.hashLong(((22 * 3600 + 31 * 60 + 8) * 1000000L)) === -662762989)
  }

  test("bucket is (hash & Int.MaxValue) % N — never negative") {
    (0 until 1000).foreach { i =>
      val b = IceMurmur3.bucketLong(i.toLong * 2654435761L, 16)
      assert(b >= 0 && b < 16)
    }
    assert(IceMurmur3.bucketString("iceberg", 16) ===
      ((1210000089 & Int.MaxValue) % 16))
  }

  test("string truncate counts code points, not UTF-16 units") {
    assert(IceMurmur3.truncateString("iceberg", 3) === "ice")
    assert(IceMurmur3.truncateString("ab", 5) === "ab")
    // U+1D11E (musical G clef) is a surrogate pair in UTF-16
    val clef = new String(Character.toChars(0x1D11E))
    assert(IceMurmur3.truncateString(clef + "abc", 2) === clef + "a")
  }

  // ------------------------------------------ field spec parsing

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("d", DateType), StructField("ts", TimestampType)))

  test("parseFieldSpec: identity, transforms, default names, validation") {
    val id = IceTransforms.parseFieldSpec("name", schema, 0)
    assert(id.transform === "identity" && id.partitionByName === "name")
    val b = IceTransforms.parseFieldSpec("bucket(16, id)", schema, 1)
    assert(b.name === "id_bucket" && b.transform === "bucket[16]" &&
      b.sourceCol === "id" && b.fieldId === 1001)
    val t = IceTransforms.parseFieldSpec("truncate(4, name)", schema, 0)
    assert(t.name === "name_trunc" && t.transform === "truncate[4]")
    val day = IceTransforms.parseFieldSpec("days(d)", schema, 0)
    assert(day.name === "d_day" && day.transform === "day")
    val mo = IceTransforms.parseFieldSpec("months(ts)", schema, 0)
    assert(mo.transform === "month")
    intercept[IllegalArgumentException] {
      IceTransforms.parseFieldSpec("hours(d)", schema, 0) // hour needs ts
    }
    intercept[IllegalArgumentException] {
      IceTransforms.parseFieldSpec("bucket(16, nope)", schema, 0)
    }
    intercept[IllegalArgumentException] {
      IceTransforms.parseFieldSpec("sqrt(id)", schema, 0)
    }
  }

  // --------------------------- writer column vs driver domain parity

  test("column() and domainValue() agree on every transform") {
    val rows = Seq(
      (34L, "iceberg", java.sql.Date.valueOf("2017-11-16"),
        java.sql.Timestamp.valueOf("2017-11-16 22:31:08")),
      (-7L, "a", java.sql.Date.valueOf("1969-06-30"),
        java.sql.Timestamp.valueOf("1969-06-30 01:02:03")),
      (0L, "", java.sql.Date.valueOf("1970-01-01"),
        java.sql.Timestamp.valueOf("1970-01-01 00:00:00")))
    val df = rows.toDF("id", "name", "d", "ts")

    def check(spec: String, expectFrom: ((Long, String, java.sql.Date,
        java.sql.Timestamp)) => Any): Unit = {
      val f = IceTransforms.parseFieldSpec(spec, df.schema, 0)
      val got = df.select(IceTransforms.column(f, df)).collect().map(_.get(0))
      val want = rows.map(expectFrom)
      assert(got.toSeq === want, s"spec $spec")
    }
    // session tz is pinned UTC by TestSpark; domain values computed
    // driver-side from the same epoch arithmetic
    def dDays(d: java.sql.Date): Long = d.toLocalDate.toEpochDay
    def tsUs(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000 % 1000000

    def domain(spec: String, src: String, v: Any): Any = {
      val f = IceTransforms.parseFieldSpec(spec, df.schema, 0)
      IceTransforms.domainValue(f, df.schema(src).dataType, v).get
    }

    check("bucket(16, id)", r => domain("bucket(16, id)", "id", r._1).asInstanceOf[Long].toInt)
    check("bucket(16, name)", r => domain("bucket(16, name)", "name", r._2).asInstanceOf[Long].toInt)
    check("bucket(16, d)", r => domain("bucket(16, d)", "d", dDays(r._3)).asInstanceOf[Long].toInt)
    check("bucket(16, ts)", r => domain("bucket(16, ts)", "ts", tsUs(r._4)).asInstanceOf[Long].toInt)
    check("truncate(10, id)", r => domain("truncate(10, id)", "id", r._1))
    check("truncate(3, name)", r => domain("truncate(3, name)", "name", r._2))
    check("days(d)", r => domain("days(d)", "d", dDays(r._3)).asInstanceOf[Long].toInt)
    check("days(ts)", r => domain("days(ts)", "ts", tsUs(r._4)).asInstanceOf[Long].toInt)
    check("months(d)", r => domain("months(d)", "d", dDays(r._3)).asInstanceOf[Long].toInt)
    check("months(ts)", r => domain("months(ts)", "ts", tsUs(r._4)).asInstanceOf[Long].toInt)
    check("years(d)", r => domain("years(d)", "d", dDays(r._3)).asInstanceOf[Long].toInt)
    check("hours(ts)", r => domain("hours(ts)", "ts", tsUs(r._4)).asInstanceOf[Long].toInt)
  }

  // ------------------------------------------ predicate translation

  private def fields(specs: String*): Seq[IcePartField] =
    specs.zipWithIndex.map { case (s, i) =>
      IceTransforms.parseFieldSpec(s, schema, i)
    }

  private def attr(n: String): AttributeReference =
    AttributeReference(n, schema(n).dataType)()

  test("pruning predicate: bucket translates equality, refuses ranges") {
    val fs = fields("bucket(16, id)")
    val eq = IceTransforms.pruningPredicate(
      EqualTo(attr("id"), Literal(34L, LongType)), fs, schema)
    assert(eq.isDefined)
    val expectBucket = IceMurmur3.bucketLong(34L, 16).toLong
    assert(eq.get match {
      case EqualTo(a: AttributeReference, Literal(v, LongType)) =>
        a.name == "__icepart_id_bucket" && v == expectBucket
      case _ => false
    })
    // a range through bucket is untranslatable → None (keep all files)
    assert(IceTransforms.pruningPredicate(
      GreaterThan(attr("id"), Literal(34L, LongType)), fs, schema).isEmpty)
  }

  test("pruning predicate: monotonic transforms relax range boundaries") {
    val fs = fields("days(d)")
    // d < 2017-11-16 ⇒ day(d) <= day(2017-11-16): the boundary day may
    // still hold earlier rows of the same day
    val days = LocalDate.of(2017, 11, 16).toEpochDay
    val p = IceTransforms.pruningPredicate(
      LessThan(attr("d"), Literal(days.toInt, DateType)), fs, schema)
    assert(p.get match {
      case LessThanOrEqual(a: AttributeReference, Literal(v, LongType)) =>
        a.name == "__icepart_d_day" && v == days
      case _ => false
    })
  }

  test("pruning predicate: Or poisons on any untranslatable side, And drops it") {
    val fs = fields("bucket(16, id)")
    val eq = EqualTo(attr("id"), Literal(34L, LongType))
    val range = GreaterThan(attr("id"), Literal(1L, LongType))
    // And: the translatable side still prunes
    assert(IceTransforms.pruningPredicate(And(eq, range), fs, schema).isDefined)
    // Or: an unmodeled alternative may match anything → no pruning
    assert(IceTransforms.pruningPredicate(Or(eq, range), fs, schema).isEmpty)
  }

  test("pruning predicate: In translates through bucket per alternative") {
    val fs = fields("bucket(16, id)")
    val p = IceTransforms.pruningPredicate(
      In(attr("id"), Seq(Literal(1L, LongType), Literal(2L, LongType))),
      fs, schema)
    assert(p.isDefined)
    val buckets = Seq(1L, 2L).map(IceMurmur3.bucketLong(_, 16).toLong).toSet
    val seen = scala.collection.mutable.Set.empty[Long]
    p.get.foreach {
      case Literal(v: Long, LongType) => seen += v
      case _ =>
    }
    assert(seen.toSet === buckets)
  }
}
