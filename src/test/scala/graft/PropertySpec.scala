package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashFunctions.minhashSignature
import graft.functions.VectorFunctions.dotp
import graft.queries.TextPrimitives._

/**
 * Property-based checks for the custom codegen expressions: the JVM-side
 * reference implementation must agree with the Catalyst expression on
 * arbitrary inputs (not just the corpus), including edge shapes a table
 * scan rarely produces (singletons, duplicates, extremes).
 */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic sampling (no scalatestplus bridge in the offline
    * cache): fixed seeds -> reproducible failures. */
  private def forAll[T](g: Gen[T], n: Int = 40)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(0xC0FFEE + i.toLong))
        .foreach(body)
    }

  private val hashGen: Gen[Long] = Gen.chooseNum(0L, HashP - 1)
  private val hashesGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(hashGen)

  test("MinHashSignature == per-permutation scalar reference on arbitrary input") {
    forAll(hashesGen) { hs =>
      // JVM reference: direct fold per permutation
      val expected = (0 until MinHashK).map { i =>
        hs.map(x => (permA(i) * x + permB(i)) % HashP).min
      }
      import spark.implicits._
      val actual = Seq(Tuple1(hs)).toDF("hs")
        .select(minhashSignature(col("hs"),
          (0 until MinHashK).map(permA), (0 until MinHashK).map(permB), HashP))
        .head.getSeq[Long](0)
      assert(actual == expected)
    }
  }

  test("MinHashSignature is permutation-invariant and duplicate-insensitive") {
    forAll(hashesGen) { hs =>
      import spark.implicits._
      def sig(xs: List[Long]) = Seq(Tuple1(xs)).toDF("hs")
        .select(minhashSignature(col("hs"),
          (0 until MinHashK).map(permA), (0 until MinHashK).map(permB), HashP))
        .head.getSeq[Long](0)
      assert(sig(hs.reverse) == sig(hs))
      assert(sig(hs ++ hs.take(1)) == sig(hs)) // min over a multiset
    }
  }

  test("dotp == JVM fold for equal-length arrays") {
    val vecGen = Gen.chooseNum(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6)).flatMap(a =>
        Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6)).map(b => (a, b))))
    forAll(vecGen) { case (a, b) =>
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      import spark.implicits._
      val actual = Seq((a, b)).toDF("a", "b")
        .select(dotp(col("a"), col("b"))).head.getDouble(0)
      assert(java.lang.Double.doubleToLongBits(actual) ==
        java.lang.Double.doubleToLongBits(expected))
    }
  }

  test("shingle pipeline: size bounds and determinism") {
    val textGen = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "d", "e"))
      .map(_.mkString(" "))
    forAll(textGen) { text =>
      import spark.implicits._
      val df = Seq(Tuple1(text)).toDF("text")
      val n = df.select(size(tokens(col("text")))).head.getInt(0)
      val sh = df.select(shingles3(tokens(col("text")))).head.getSeq[String](0)
      if (n < 3) assert(sh.isEmpty)
      else {
        assert(sh.nonEmpty && sh.size <= n - 2) // distinct windows
        assert(sh.forall(_.split(" ").length == 3))
      }
    }
  }

  test("Md5Prefix60 == conv(substring(md5)) builtin chain, arbitrary strings") {
    import graft.functions.HashFunctions.md5Prefix60
    val strGen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf("abc", "日本語", "ü", " ", "0", "!?")).map(_.mkString),
      Gen.const(""))
    forAll(strGen) { str =>
      import spark.implicits._
      val df = Seq(Tuple1(str)).toDF("s")
      val builtin = conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
      val row = df.select(md5Prefix60(col("s")), builtin).head
      assert(row.getLong(0) == row.getLong(1), s"mismatch for ${str.take(30)}")
      assert(row.getLong(0) >= 0L)
    }
  }
}
