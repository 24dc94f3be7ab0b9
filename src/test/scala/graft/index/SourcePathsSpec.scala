package graft.index

import org.scalatest.funsuite.AnyFunSuite

/** File→root assignment used by refresh reads and hybrid-scan appended
  * legs: must tolerate scheme-qualification skew between listed files
  * and logged roots, must never false-match on name prefixes, and must
  * fail loudly (not guess) when a file is under no logged root. */
class SourcePathsSpec extends AnyFunSuite {

  test("scheme-qualified file matches unqualified root") {
    val g = SourcePaths.groupByRoot(
      Seq("/data/tbl"), Seq("file:/data/tbl/part-0.parquet"))
    assert(g == Seq("/data/tbl" -> Seq("file:/data/tbl/part-0.parquet")))
  }

  test("unqualified file matches scheme-qualified root") {
    val g = SourcePaths.groupByRoot(
      Seq("file:/data/tbl"), Seq("/data/tbl/p=1/part-0.parquet"))
    assert(g.map(_._1) == Seq("file:/data/tbl"))
  }

  test("multi-root source groups each file under its containing root") {
    val g = SourcePaths.groupByRoot(
      Seq("/data/a", "/data/b"),
      Seq("file:/data/b/part-1.parquet",
        "file:/data/a/part-0.parquet",
        "file:/data/b/part-2.parquet")).toMap
    assert(g("/data/a") == Seq("file:/data/a/part-0.parquet"))
    assert(g("/data/b").size == 2)
  }

  test("name-prefix similarity is not containment") {
    // /data/tbl2 must NOT be grouped under root /data/tbl
    val ex = intercept[IllegalStateException] {
      SourcePaths.groupByRoot(Seq("/data/tbl"),
        Seq("/data/tbl2/part-0.parquet"))
    }
    assert(ex.getMessage.contains("not under any logged source root"))
  }

  test("trailing slash on the root is tolerated") {
    val g = SourcePaths.groupByRoot(
      Seq("/data/tbl/"), Seq("file:/data/tbl/part-0.parquet"))
    assert(g.map(_._1) == Seq("/data/tbl/"))
  }

  test("file equal to the root path itself matches (single-file source)") {
    val g = SourcePaths.groupByRoot(
      Seq("/data/one.parquet"), Seq("file:/data/one.parquet"))
    assert(g.map(_._1) == Seq("/data/one.parquet"))
  }

  test("orphan file throws instead of defaulting to roots.head") {
    val ex = intercept[IllegalStateException] {
      SourcePaths.groupByRoot(Seq("/data/a", "/data/b"),
        Seq("/elsewhere/part-0.parquet"))
    }
    assert(ex.getMessage.contains("/elsewhere/part-0.parquet"))
  }
}
