package graft
object LoopQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = sys.env.getOrElse("SPARK_GRAFT_Q", "qds4_yoy_channel_growth")
    val spark = GraftSession.local()
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "60").toInt
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"### pass $i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
