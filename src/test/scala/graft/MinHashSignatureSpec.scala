package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashFunctions.minhashSignature
import graft.queries.TextPrimitives._

class MinHashSignatureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sigCol = minhashSignature(col("hs"),
    (0 until MinHashK).map(permA), (0 until MinHashK).map(permB), HashP)

  test("signature matches the K-traversal array_min formulation") {
    val base = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        shingleHashes(shingles3(tokens(col("text")))).as("hs"))
      .filter(size(col("hs")) > 0)
    val slow = array((0 until MinHashK).map(i => minHash(col("hs"), i)): _*)
    val diff = base.select(sigCol.as("fast"), slow.as("slow"))
      .filter(not(col("fast") === col("slow"))).count()
    assert(diff === 0L)
  }

  test("null input -> null, empty input -> null") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq.empty[Long])), (2L, None))
      .toDF("id", "hs")
    val rows = df.select(sigCol).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("participates in whole-stage codegen") {
    // materialize hs first: the HOF shingle pipeline (transform/lambda) is
    // CodegenFallback and would knock ANY containing Project out of WSCG —
    // the signature must stay codegen'd when fed a plain array column
    val tmp = java.nio.file.Files.createTempDirectory("mh_sig").toString
    Tables.load(spark, TestSpark.sfDir, "documents")
      .select(shingleHashes(shingles3(tokens(col("text")))).as("hs"))
      .write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp).select(sigCol.as("sig"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [minhash_signature"),
      s"minhash_signature Project not codegen'd in:\n$plan")
  }
}
