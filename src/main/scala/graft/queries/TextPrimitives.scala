package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Cross-engine deterministic text/hash primitives shared by the dedup /
 * similarity / text-analysis operators.
 *
 * The correctness gate compares Spark results against DuckDB running the
 * `oracleSql` on the same parquet — so every primitive here has an exact
 * SQL twin (the `sql*` builders) producing bit-identical values:
 *
 *  - token hash: first 15 hex chars of md5 parsed as a 60-bit positive
 *    long. md5 is identical across engines and 15 hex chars always fit a
 *    signed 64-bit int.
 *  - shingles: 3-token sliding windows over a single-space tokenization.
 *  - minhash permutations: (a*x + b) mod p with p = 2^31-1 and x already
 *    reduced mod p, so a*x stays below 2^62 (no overflow — DuckDB traps
 *    on BIGINT overflow, Spark wraps; staying in range keeps them equal).
 *
 * Scale notes: everything here is a codegen'd Catalyst expression over
 * arrays (no UDFs, no driver-side work), so the operators stay inside
 * whole-stage codegen and distribute with the scan.
 */
object TextPrimitives {

  /** Modulus for minhash permutations: the Mersenne prime 2^31 - 1. */
  val HashP = 2147483647L

  /** Number of minhash permutations and LSH band layout (4 bands x 4 rows). */
  val MinHashK = 16
  val LshBands = 4
  val LshRows = 4

  /** Deterministic permutation constants a_i (odd, nonzero mod p) and b_i. */
  def permA(i: Int): Long = (1000003L * (2 * i + 1)) % HashP
  def permB(i: Int): Long = (999983L * (i + 17)) % HashP

  // ------------------------------------------------------------ Spark side

  /** Single-space tokenization (matches DuckDB string_split literal ' '). */
  def tokens(text: Column): Column = split(text, " ")

  /** 60-bit positive hash of a string: md5 hex prefix as a long.
    * Native codegen ([[graft.functions.Md5Prefix60]]) — bit-identical to
    * `conv(substring(md5(c), 1, 15), 16, 10)` without the per-token hex
    * string + base-16 parse (spec-verified parity). */
  def tokenHash(c: Column): Column =
    graft.functions.HashFunctions.md5Prefix60(c)

  /** Distinct 3-token shingles; empty array when the doc is too short. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(
        transform(sequence(lit(0), size(toks) - lit(3)),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(3))))))
      .otherwise(array().cast("array<string>"))

  /** Per-element 60-bit hashes reduced mod p (minhash input domain). */
  def shingleHashes(sh: Column): Column =
    transform(sh, s => tokenHash(s) % HashP)

  /** Fused `shingleHashes(shingles3(toks))` as ONE native codegen pass
    * ([[graft.functions.ShingleHashes60]]) — same values, no HOF chain,
    * no intermediate shingle-string arrays (spec-verified parity). */
  def shingleHashSet(text: Column): Column =
    graft.functions.ShingleFunctions.shingleHashes60(tokens(text), HashP)

  /** minhash_i = min over hashes of (a_i*x + b_i) mod p. */
  def minHash(hashes: Column, i: Int): Column =
    array_min(transform(hashes,
      x => (lit(permA(i)) * x + lit(permB(i))) % HashP))

  // ----------------------------------------------------------- DuckDB side

  def sqlTokens(textExpr: String): String = s"string_split($textExpr, ' ')"

  def sqlTokenHash(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** DuckDB twin of an n-token shingle set (1-based list indexing,
    * end-exclusive range) — generic width for the decontamination op. */
  def sqlShinglesN(toksExpr: String, n: Int): String = {
    val concat = (0 until n).map(j => s"$toksExpr[i+$j]").mkString(" || ' ' || ")
    s"""CASE WHEN len($toksExpr) >= $n THEN
       | list_distinct(list_transform(range(1, len($toksExpr) - ${n - 2}),
       |   i -> $concat))
       | ELSE [] END""".stripMargin.replaceAll("\n", " ")
  }

  /** DuckDB twin of [[shingles3]] (1-based list indexing, end-exclusive range). */
  def sqlShingles3(toksExpr: String): String =
    s"""CASE WHEN len($toksExpr) >= 3 THEN
       | list_distinct(list_transform(range(1, len($toksExpr) - 1),
       |   i -> $toksExpr[i] || ' ' || $toksExpr[i+1] || ' ' || $toksExpr[i+2]))
       | ELSE [] END""".stripMargin.replaceAll("\n", " ")

  def sqlShingleHashes(shExpr: String): String =
    s"list_transform($shExpr, s -> ${sqlTokenHash("s")} % $HashP)"

  def sqlMinHash(hashesExpr: String, i: Int): String =
    s"list_min(list_transform($hashesExpr, x -> (${permA(i)} * x + ${permB(i)}) % $HashP))"
}
