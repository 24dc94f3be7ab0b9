package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions.dotp

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dotp is bit-identical to the aggregate(zip_with) fold") {
    import spark.implicits._
    val df = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("w", reverse(col("v")))
    val hof = aggregate(zip_with(col("v"), col("w"), (x, y) => x * y),
      lit(0.0), (acc, t) => acc + t)
    val diff = df.select(dotp(col("v"), col("w")).as("a"), hof.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0L)
    // and a hand-checked value
    val one = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b").select(dotp(col("a"), col("b"))).head.getDouble(0)
    assert(one === 32.0)
  }

  test("dotp nulls propagate") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(dotp(col("a"), col("b"))).head.isNullAt(0))
  }

  test("dotp participates in whole-stage codegen") {
    val df = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(dotp(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")).as("d"))
    // "*(n)" prefixes a WholeStageCodegen stage in the plan string; the
    // Project evaluating graft_dot must carry it (no CodegenFallback)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"),
      s"graft_dot Project not codegen'd in:\n$plan")
  }
}
