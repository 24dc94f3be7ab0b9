package graft

/** Dump `.explain("formatted")` for declared queries to files — the
  * optimization round's plan-evidence artifacts (plans/rNN/). Args:
  * outDir [suffix]; filter via SPARK_GRAFT_ONLY. Local diagnostics only. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = if (args.length > 1) args(1) else ""
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = GraftSession.local()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n))).foreach { n =>
        val path = java.nio.file.Paths.get(outDir, s"$n$suffix.txt")
        try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(path, txt)
          spark.sharedState.cacheManager.clearCache()
        } catch {
          case t: Throwable =>
            java.nio.file.Files.writeString(path, s"ERROR: $t\n")
        }
      }
    spark.stop()
  }
}
