package graft

import scala.collection.mutable

import org.apache.spark.scheduler._

/** Optimization-round diagnostics (guide §1/§7): run a query hot and
  * attribute its wall time to STAGES vs the gaps BETWEEN stages (the
  * driver-side fixed cost: AQE re-planning, codegen, scheduling). For
  * each timed pass prints every stage's [submit..complete] span and the
  * idle gap since the previous stage completed, plus totals. Local
  * diagnostics only, not part of the driver contract.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_ONLY (comma filter, default a
  * stage-latency-bound sample). */
object StageProbe {
  final case class StageSpan(id: Int, name: String, tasks: Int,
      submitted: Long, completed: Long, runMs: Long, cpuMs: Long,
      deserMs: Long, gcMs: Long, fetchWaitMs: Long, schedDelayMs: Long,
      resultSerMs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val spans = mutable.Buffer.empty[StageSpan]
    val jobs = mutable.Buffer.empty[(Int, Long, Long)]
    var jobStart = Map.empty[Int, Long]
    val taskAgg = mutable.Map.empty[Int, Array[Long]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) taskAgg.synchronized {
          val a = taskAgg.getOrElseUpdate(e.stageId, Array.fill(7)(0L))
          a(0) += m.executorRunTime
          a(1) += m.executorCpuTime / 1000000
          a(2) += m.executorDeserializeTime
          a(3) += m.jvmGCTime
          a(4) += Option(m.shuffleReadMetrics).map(_.fetchWaitTime).getOrElse(0L)
          // scheduler delay = launch-to-finish wall minus everything attributed
          val info = e.taskInfo
          if (info != null)
            a(5) += math.max(0L, info.finishTime - info.launchTime -
              m.executorRunTime - m.executorDeserializeTime -
              m.resultSerializationTime)
          a(6) += m.resultSerializationTime
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val a = taskAgg.synchronized(
          taskAgg.getOrElse(i.stageId, Array.fill(7)(0L)))
        spans.synchronized {
          spans += StageSpan(i.stageId, i.name.takeWhile(_ != '\n').take(60),
            i.numTasks, i.submissionTime.getOrElse(0L),
            i.completionTime.getOrElse(0L),
            a(0), a(1), a(2), a(3), a(4), a(5), a(6))
        }
      }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized { jobStart += e.jobId -> e.time }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs += ((e.jobId, jobStart.getOrElse(e.jobId, 0L), e.time))
        }
    })
    val names = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
      .getOrElse(Seq("qds14_cross_channel", "qds4_yoy_channel_growth",
        "qds24_returned_netpaid", "dedup_ngram_jaccard"))
    names.foreach { n =>
      // warmup (untimed): codegen + index builds reach steady state
      SparkEntry.queries(n)(spark, sfDir).count()
      spans.synchronized(spans.clear()); jobs.synchronized(jobs.clear())
      taskAgg.synchronized(taskAgg.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // let straggling listener events drain (listenerBus is private[spark])
      Thread.sleep(500)
      val ss = spans.synchronized(spans.sortBy(_.submitted).toVector)
      println(f"### $n wall $wall%.3f s, ${ss.size} stages, " +
        s"${jobs.synchronized(jobs.size)} jobs")
      var prevEnd = 0L
      var inStage = 0L
      var gapSum = 0L
      ss.foreach { s =>
        val gap = if (prevEnd == 0) 0 else math.max(0, s.submitted - prevEnd)
        inStage += s.completed - s.submitted
        gapSum += gap
        println(f"  stage ${s.id}%4d tasks=${s.tasks}%3d " +
          f"span=${(s.completed - s.submitted) / 1e3}%.3fs gap=${gap / 1e3}%.3fs " +
          f"run=${s.runMs / 1e3}%.3f cpu=${s.cpuMs / 1e3}%.3f " +
          f"deser=${s.deserMs / 1e3}%.3f gc=${s.gcMs / 1e3}%.3f " +
          f"fetch=${s.fetchWaitMs / 1e3}%.3f sched=${s.schedDelayMs / 1e3}%.3f " +
          f"rser=${s.resultSerMs / 1e3}%.3f")
        prevEnd = math.max(prevEnd, s.completed)
      }
      println(f"  ### inStage=${inStage / 1e3}%.3fs gaps=${gapSum / 1e3}%.3fs " +
        f"unattributed=${wall - (inStage + gapSum) / 1e3}%.3fs")
    }
    spark.stop()
  }
}
