package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Optimization-round diagnostics (guide §1): run the streaming gate
  * queries under a progress listener and print per-batch durationMs
  * breakdowns (queryPlanning / addBatch / walCommit / commitOffsets),
  * plus wall totals — the evidence behind the "streaming build time is
  * micro-batch machinery" disposition in OPTIMIZATION_r17.md. Local
  * diagnostics only, not part of the driver contract. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    Seq("stream_window_counts", "stream_join", "stream_sessions").foreach { n =>
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        println(f"### $n pass $pass total ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
