package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Optimization-round diagnostics (guide §1): run the streaming gate
  * queries under a progress listener and print per-batch durationMs
  * breakdowns (queryPlanning / addBatch / walCommit / commitOffsets),
  * plus wall totals and the graft rule time each pass spent (verifies
  * the planning caches cover streaming micro-batch plans). Local
  * diagnostics only, not part of the driver contract.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_ONLY (comma filter),
  * SPARK_GRAFT_PROBE_PASSES (default 2). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "2").toInt
    val spark = GraftSession.local()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"### started ${e.name} at ${System.nanoTime() / 1000000}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"### progress ${e.progress.name} batch=${e.progress.batchId} " +
          s"rows=${e.progress.numInputRows} durations=${e.progress.durationMs}")
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"### terminated at ${System.nanoTime() / 1000000}")
    })
    val defaults = Seq("stream_window_counts", "stream_join", "stream_sessions",
      "stream_dedup", "stream_dedup_watermark", "stream_enrich",
      "stream_delta_source", "stream_iceberg_source")
    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq).getOrElse(defaults)
    names.foreach { n =>
      (1 to passes).foreach { pass =>
        val r0 = graft.index.rules.RuleTimer.snapshot().values.sum
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val rN = (graft.index.rules.RuleTimer.snapshot().values.sum - r0) / 1e9
        println(f"### $n pass $pass total ${(System.nanoTime() - t0) / 1e9}%.3f s" +
          f" graftRules $rN%.3f s")
      }
    }
    spark.stop()
  }
}
