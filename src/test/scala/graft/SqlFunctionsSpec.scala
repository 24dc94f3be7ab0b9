package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextPrimitives._

/** The extension-registered SQL functions must return exactly what the
  * DataFrame/Column API returns — pure-SQL users get the same kernels. */
class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = spark.read
    .parquet(s"${TestSpark.sfDir}/documents.parquet").limit(50)

  test("graft_md5_prefix60 / token_hashes60 / simhash60 match the Column API") {
    import graft.functions.SimHashFunctions._
    docs.createOrReplaceTempView("sqlfn_docs")
    val sql = spark.sql(
      """SELECT doc_id,
        |  graft_md5_prefix60(text) AS h,
        |  graft_simhash60(graft_token_hashes60(split(text, ' '))) AS fp
        |FROM sqlfn_docs""".stripMargin)
    val api = docs.select(col("doc_id"),
      graft.functions.HashFunctions.md5Prefix60(col("text")).as("h"),
      simhash60(tokenHashes60(split(col("text"), " "))).as("fp"))
    assert(sql.collect().toSet == api.collect().toSet)
  }

  test("graft_shingle_hashes60 (width arg) and minhash_signature match") {
    docs.createOrReplaceTempView("sqlfn_docs2")
    val sql = spark.sql(
      s"""SELECT doc_id,
         |  graft_minhash_signature(
         |    graft_shingle_hashes60(split(text, ' '), ${HashP}L, 3)) AS sig
         |FROM sqlfn_docs2""".stripMargin)
    val api = docs.select(col("doc_id"),
      graft.functions.MinHashFunctions.minhashSignature(
        shingleHashSet(col("text")),
        (0 until MinHashK).map(permA), (0 until MinHashK).map(permB), HashP)
        .as("sig"))
    assert(sql.collect().map(r => (r.getLong(0), Option(r.getSeq[Long](1)))).toSet
      == api.collect().map(r => (r.getLong(0), Option(r.getSeq[Long](1)))).toSet)
  }

  test("graft_dot matches DotProduct") {
    val emb = spark.read
      .parquet(s"${TestSpark.sfDir}/embeddings.parquet").limit(20)
    emb.createOrReplaceTempView("sqlfn_emb")
    // DotProduct requires array<double> (same contract as the Column API)
    val sql = spark.sql(
      """SELECT vec_id,
        |  graft_dot(cast(embedding AS array<double>),
        |            cast(embedding AS array<double>)) AS d
        |FROM sqlfn_emb""".stripMargin)
    val cd = col("embedding").cast("array<double>")
    val api = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.dotp(cd, cd).as("d"))
    assert(sql.collect().toSet == api.collect().toSet)
  }

  test("non-literal modulus is rejected with a clear message") {
    docs.createOrReplaceTempView("sqlfn_docs3")
    val ex = intercept[Exception](spark.sql(
      "SELECT graft_shingle_hashes60(split(text,' '), doc_id) FROM sqlfn_docs3")
      .collect())
    assert(ex.getMessage.contains("literal"))
  }
}
