package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): for every declared
  * query, split the Bench-equivalent pass into PLANNING (force the count
  * plan's executedPlan: analysis + optimizer incl. the graft rules +
  * physical planning) and EXECUTION (collect on the already-planned
  * frame), plus the per-rule share from [[graft.index.rules.RuleTimer]].
  * Local diagnostics only — not part of the driver contract.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_ONLY (comma filter),
  * SPARK_GRAFT_PROF_PASSES (default 3). */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROF_PASSES", "3").toInt
    val spark = GraftSession.local()
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val out = new StringBuilder
    out ++= "query,build,plan,exec,rules\n"
    names.foreach { name =>
      try {
        // warmup, untimed; the cache is NOT cleared between passes —
        // Bench keeps persisted intermediates live across a query's
        // passes (clearCache only between queries), so hot passes are
        // what the bench statistic reports
        SparkEntry.queries(name)(spark, sfDir).count()
        val rows = (1 to passes).map { _ =>
          val r0 = graft.index.rules.RuleTimer.snapshot().values.sum
          var cdf: org.apache.spark.sql.DataFrame = null
          val tB = time {
            cdf = SparkEntry.queries(name)(spark, sfDir).groupBy().count()
          }
          val tP = time(cdf.queryExecution.executedPlan)
          val tE = time(cdf.collect())
          val rN = graft.index.rules.RuleTimer.snapshot().values.sum - r0
          (tB, tP, tE, rN / 1e9)
        }
        spark.sharedState.cacheManager.clearCache()
        def mn(sel: ((Double, Double, Double, Double)) => Double) =
          rows.map(sel).min
        out ++= f"$name,${mn(_._1)}%.3f,${mn(_._2)}%.3f," +
          f"${mn(_._3)}%.3f,${mn(_._4)}%.3f\n"
        println(out.toString.linesIterator.toSeq.last)
      } catch {
        case t: Throwable =>
          out ++= s"$name,ERR,${t.getClass.getSimpleName}\n"
          println(out.toString.linesIterator.toSeq.last)
      }
    }
    val perRule = graft.index.rules.RuleTimer.snapshot()
    out ++= perRule.toSeq.sortBy(-_._2).map { case (k, v) =>
      f"# rule_total $k ${v / 1e9}%.3f s" }.mkString("", "\n", "\n")
    println(perRule.toSeq.sortBy(-_._2).map { case (k, v) =>
      f"# rule_total $k ${v / 1e9}%.3f s" }.mkString("\n"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_PROF_OUT", "profile_out.csv")),
      out.toString)
    spark.stop()
  }
}
