package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/**
 * Golden-plan stability for the index-accelerated queries (reference:
 * goldstandard/PlanStabilitySuite.scala:83-290 — simplified physical plan
 * text vs approved files, regenerated via an env flag).
 *
 * The simplified plan strips everything volatile (exprIds, paths, stats,
 * codegen/plan ids) and keeps the operator shape — exactly what a rewrite
 * regression changes (e.g. an index scan silently falling back to the
 * source, a lost bucketed no-shuffle join, a lineage filter disappearing).
 *
 * Regenerate after an INTENTIONAL plan change with:
 *   GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.index.GoldenPlanSpec"
 */
class GoldenPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val goldenDir: Path = Paths.get("src/test/resources/goldenplans")
  private val regen = sys.env.contains("GRAFT_REGEN_GOLDEN")

  /** Volatile-detail scrub: operator shape survives, identifiers don't. */
  private def simplify(plan: String): String =
    plan.linesIterator
      .map(_
        .replaceAll("#\\d+L?", "#x")
        .replaceAll("plan_id=\\d+", "plan_id=x")
        .replaceAll("Location: [^,\\]]+", "Location: [scrubbed]")
        .replaceAll("InMemoryFileIndex\\([^)]*\\)[^,\\]]*", "InMemoryFileIndex[scrubbed]")
        .replaceAll("file:[^,\\s\\]]+", "[path]")
        .replaceAll("/[-_/a-zA-Z0-9.]+/(graft[-_a-zA-Z0-9]*|testdata)[^,\\s\\]]*", "[path]")
        .replaceAll("Statistics\\([^)]*\\)", "Statistics[scrubbed]")
        .replaceAll(", \\d+\\)\\)", ", n))")
        .replaceAll("\\[id=#x\\]", ""))
      .map(_.replaceAll("\\s+$", ""))
      .mkString("\n").trim + "\n"

  private def check(name: String): Unit = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sfDir)
    // initial physical plan: deterministic (pre-AQE) and captures both the
    // logical rewrite (index scan substitution) and physical properties
    // (bucketed no-shuffle join, exchanges, pushed filters)
    val actual = simplify(df.queryExecution.executedPlan.toString)
    val file = goldenDir.resolve(s"$name.txt")
    if (regen) {
      Files.createDirectories(goldenDir)
      Files.write(file, actual.getBytes(StandardCharsets.UTF_8))
      info(s"regenerated $file")
    } else {
      assert(Files.exists(file),
        s"golden plan missing: $file (run with GRAFT_REGEN_GOLDEN=1)")
      val expected = new String(Files.readAllBytes(file), StandardCharsets.UTF_8)
      assert(actual == expected,
        s"""plan shape changed for $name.
           |If intentional, regenerate with GRAFT_REGEN_GOLDEN=1.
           |--- approved ---
           |$expected
           |--- actual ---
           |$actual""".stripMargin)
    }
  }

  Seq("idx_covering_filter", "idx_join", "idx_zorder_filter",
    "idx_dataskip_filter").foreach { q =>
    test(s"golden plan: $q") { check(q) }
  }
}
