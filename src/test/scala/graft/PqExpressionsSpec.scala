package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.ivf.PqCodec

/** Pins the native PQ codec expressions ([[graft.functions.PqExpressions]])
  * bit-identical to the higher-order-function spellings they replaced
  * (the optimization contract: same strict fold order, same
  * first-occurrence argmin, only the evaluation engine changed). */
class PqExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val cb = PqCodec.formulaCodebook(8, 8)

  private def cwCol(m: Int, k: Int) = array(cb(m)(k).map(lit): _*)

  /** The replaced HOF spellings, verbatim. */
  private def hofCodes(v: org.apache.spark.sql.Column) =
    array(cb.indices.map { m =>
      val sub = slice(v, m * cb(m).head.length + 1, cb(m).head.length)
      val dists = array(cb(m).indices.map { k =>
        aggregate(zip_with(sub, cwCol(m, k), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, t) => acc + t)
      }: _*)
      array_position(dists, array_min(dists))
    }: _*)

  private def hofQtab(qv: org.apache.spark.sql.Column) =
    array(cb.indices.map { m =>
      val sub = slice(qv, m * cb(m).head.length + 1, cb(m).head.length)
      array(cb(m).indices.map { k =>
        aggregate(zip_with(sub, cwCol(m, k), (x, y) => x * y),
          lit(0.0), (acc, t) => acc + t)
      }: _*)
    }: _*)

  private def hofAdc(codes: org.apache.spark.sql.Column,
      qtab: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(codes, qtab, (c, row) => element_at(row, c.cast("int"))),
      lit(0.0), (acc, t) => acc + t)

  private def emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("PqEncode is bit-identical to the aggregate/zip_with argmin fold") {
    val diff = emb
      .select(PqCodec.codesCol(col("v"), cb).as("a"), hofCodes(col("v")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff === 0L)
  }

  test("PqQueryTable is bit-identical to the HOF dot tables") {
    val diff = emb
      .select(PqCodec.queryTableCol(col("v"), cb).as("a"),
        hofQtab(col("v")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff === 0L)
  }

  test("PqAdcDot is bit-identical to the element_at fold, null in -> null out") {
    val both = emb.select(col("vec_id"),
      PqCodec.codesCol(col("v"), cb).as("codes"),
      PqCodec.queryTableCol(col("v"), cb).as("qtab"))
    val diff = both
      .select(PqCodec.adcDot(col("codes"), col("qtab")).as("a"),
        hofAdc(col("codes"), col("qtab")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff === 0L)
    import spark.implicits._
    val nulls = Seq((None: Option[Array[Long]], Some(Array(Array(1.0)))))
      .toDF("codes", "qtab")
    assert(nulls.select(PqCodec.adcDot(col("codes"), col("qtab")))
      .head.isNullAt(0))
  }

  test("the PQ expressions participate in whole-stage codegen") {
    val df = emb.select(
      PqCodec.adcDot(PqCodec.codesCol(col("v"), cb),
        PqCodec.queryTableCol(col("v"), cb)).as("adc"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_pq_adc_dot"),
      s"PQ Project not codegen'd in:\n$plan")
  }
}
