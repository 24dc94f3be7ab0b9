package graft.sql

import org.scalatest.funsuite.AnyFunSuite

/**
 * Quote-aware `OPTIONS (...)` tokenization: a `','` or `')'` INSIDE a
 * quoted value must neither split a pair nor truncate the group, and
 * malformed input still refuses loudly (a typo'd option must never
 * silently build a default index).
 */
class OptionsParsingSpec extends AnyFunSuite {

  test("quoted values may contain commas and parens") {
    assert(GraftSqlParser.parseOptions("a = 'x,y'") == Map("a" -> "x,y"))
    assert(GraftSqlParser.parseOptions("a = 'x)y', b = 2") ==
      Map("a" -> "x)y", "b" -> "2"))
    assert(GraftSqlParser.parseOptions("""a = "p,q)r", b = 'v'""") ==
      Map("a" -> "p,q)r", "b" -> "v"))
  }

  test("plain pairs, empty list, and whitespace behave as before") {
    assert(GraftSqlParser.parseOptions("") == Map.empty)
    assert(GraftSqlParser.parseOptions(" k = v ,k2=8 ") ==
      Map("k" -> "v", "k2" -> "8"))
  }

  test("SQL-style doubled-quote escapes stay inside the value") {
    assert(GraftSqlParser.parseOptions("a = 'it''s'") == Map("a" -> "it's"))
    assert(GraftSqlParser.parseOptions("a = \"say \"\"hi\"\"\", b = 1") ==
      Map("a" -> "say \"hi\"", "b" -> "1"))
    // an escaped quote must not CLOSE the run: the comma stays inside
    assert(GraftSqlParser.parseOptions("a = 'x'',y', b = 2") ==
      Map("a" -> "x',y", "b" -> "2"))
    // empty string and a value that is ONLY an escaped quote
    assert(GraftSqlParser.parseOptions("a = ''''") == Map("a" -> "'"))
  }

  test("PROPERTY: quote-escape round-trip — any value, including ones " +
      "full of quotes/commas/parens, survives format -> parse") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val valueGen: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('\'', '"', ',', ')', '(', ' ', '=')))
      .map(_.mkString)
    def quote(v: String, q: Char): String =
      q + v.replace(q.toString, s"$q$q") + q
    (0 until 200).foreach { i =>
      valueGen(Gen.Parameters.default, Seed(0xBEEF + i.toLong)).foreach { v =>
        for (q <- Seq('\'', '"')) {
          val raw = s"k1 = ${quote(v, q)}, k2 = 7"
          val parsed = GraftSqlParser.parseOptions(raw)
          assert(parsed == Map("k1" -> v, "k2" -> "7"),
            s"round-trip failed for value <$v> via $q: $parsed")
        }
      }
    }
  }

  test("malformed input refuses loudly") {
    val e1 = intercept[IllegalArgumentException](
      GraftSqlParser.parseOptions("novalue"))
    assert(e1.getMessage.contains("key = value"))
    val e2 = intercept[IllegalArgumentException](
      GraftSqlParser.parseOptions("a = 'unterminated"))
    assert(e2.getMessage.contains("unterminated quote"))
  }
}
