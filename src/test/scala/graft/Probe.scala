package graft

import org.apache.spark.sql.SparkSession

/** Dev-only perf probe (Test scope, not shipped): find the stall inside
  * q_d_incremental_dedup runs whose wall time fluctuates 6 s..60 s on an
  * idle box. Logs every job with timestamps + durations via a listener.
  * Run: SPARK_GRAFT_CPUS=8 sbt "Test/runMain graft.Probe"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var lastEnd = System.nanoTime()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val now = System.nanoTime()
          val gap = (now - lastEnd) / 1e9
          starts.put(js.jobId, now)
          if (gap > 0.5) println(f"  [gap before job ${js.jobId}] $gap%6.2f s")
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val now = System.nanoTime()
          lastEnd = now
          val dur = (now - starts.getOrDefault(je.jobId, now)) / 1e9
          if (dur > 0.5) println(f"  [job ${je.jobId}] $dur%6.2f s")
        }
      })

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (n=$n)")
    }
    val dir = "/root/testdata/sf0.001"
    Tables(spark, dir, "documents").count()
    for (pass <- 1 to 4) time(s"incremental pass$pass") {
      val n = SparkEntry.queries("q_d_incremental_dedup")(spark, dir).count()
      CacheScope.release(spark); n
    }
    spark.stop()
  }
}
