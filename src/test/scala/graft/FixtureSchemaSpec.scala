package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Fixture-drift canary. The test fixtures under /root/testdata are
 * regenerated out-of-band, and a silent physical-schema change there
 * should fail HERE, loudly and localized ("events.ts changed to X"),
 * instead of as a scatter of analysis errors and wrong-answer streams
 * across unrelated suites (exactly what a TIMESTAMP(NANOS) →
 * TIMESTAMP_NTZ regeneration caused once).
 *
 * Two layers:
 *  1. per-table NORMALIZED schema pins — what `Tables.load` hands every
 *     query, after [[EventTs]] normalization. These must never drift.
 *  2. the events.ts PHYSICAL type must be one of the [[EventTs]]
 *     variants (the adaptive surface), asserted with a message naming
 *     the offending type.
 */
class FixtureSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  test("normalized schema of every fixture table matches the pinned contract") {
    Tables.names.foreach { name =>
      val actual = Tables.load(spark, TestSpark.sfDir, name).schema
        .map(f => f.name -> f.dataType)
      val want = expected(name)
      actual.zipAll(want, null, null).foreach {
        case ((an, at), (wn, wt)) if an == wn && at == wt => ()
        case ((an, at), (wn, wt)) =>
          fail(s"FIXTURE DRIFT: $name.${Option(wn).getOrElse(an)} changed — " +
            s"expected ${Option(wn).map(n => s"$n: $wt").getOrElse("<absent>")}, " +
            s"found ${Option(an).map(n => s"$n: $at").getOrElse("<absent>")}. " +
            "If the driver regenerated /root/testdata with a new layout, " +
            "update Tables/EventTs normalization, then this pin.")
        case _ => ()
      }
    }
  }

  test("events.ts physical type is a supported EventTs variant") {
    val physical = spark.read
      .parquet(Tables.path(TestSpark.sfDir, "events")).schema("ts").dataType
    val v = EventTs.of(physical) // throws with a naming message if drifted
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType)(physical),
      s"events.ts physical type drifted to $physical")
    assert(v.tsType == physical)
  }

  test("EventTs rejects unsupported physical types loudly") {
    val e = intercept[IllegalStateException](EventTs.of(StringType))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  /**
   * Pin all three variant branches on hand-written fixtures holding the
   * SAME instants, so a future fixture regeneration in any direction
   * keeps identical query-visible values. (A TIMESTAMP(NANOS) parquet
   * file cannot be written from Spark; the Long-ns fixture below is
   * byte-for-byte what the legacy nanosAsLong reader hands back for one,
   * which is the code path under test.)
   */
  test("EventTs variants normalize identical instants identically") {
    import scala.jdk.CollectionConverters._
    // positive epochs only: the SQL `div` used by the variants truncates
    // toward zero, which equals floor exactly on the non-negative range
    // real event timestamps occupy
    val micros = Seq(0L, 1723500000123456L, 1723500001999999L, 999999L)
    def schema(dt: DataType) = StructType(Seq(StructField("ts", dt)))
    def df(variant: EventTs.Variant) = spark.createDataFrame(
      micros.map(us => Row(variant.rowValue(us))).asJava, schema(variant.tsType))

    val variants = Seq(EventTs.NanosLong, EventTs.Micros, EventTs.MicrosNtz)
    val normMicros = variants.map { v =>
      v.micros(df(v)).select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    }
    assert(normMicros.distinct.size == 1,
      s"micros() disagrees across variants: ${variants.zip(normMicros)}")
    assert(normMicros.head == micros)

    val normSeconds = variants.map { v =>
      v.seconds(df(v)).select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    }
    assert(normSeconds.distinct.size == 1,
      s"seconds() disagrees across variants: ${variants.zip(normSeconds)}")
    // floor semantics, including for the negative-epoch instant
    assert(normSeconds.head == micros.map(us => Math.floorDiv(us, 1000000L) * 1000000L))
  }
}
