package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only contention probe (Test scope, not shipped): counts the Spark
  * JOBS a query launches and times it on an idle host. Serial jobs are
  * the unit of contention amplification — every job boundary is a
  * driver-side wall that pays the contention tax on a busy host (the r7
  * pagerank lesson: 45 s driver vs 3 s idle was eager-checkpoint walls,
  * not compute). r9 verdict item 4 asks the two most action-serialized
  * queries (q_d_pagerank_canonical, q_d_winnow_incremental) to come down
  * to ≤2× idle-host time in the driver bench — fewer serial jobs is the
  * lever this probe measures.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.ContentionProbe [names...]"
  */
object ContentionProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val sites = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val cs = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        sites.add(s"${js.stageInfos.size}st $cs")
      }
    })

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_d_pagerank_canonical", "q_d_winnow_incremental")
    Tables(spark, dir, "documents").count() // warm the scan path
    for (name <- names; pass <- 1 to 2) {
      Thread.sleep(300) // let listener drain
      jobs.set(0)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"$name%-28s pass$pass ${secs}%7.2f s  jobs=${jobs.get}%3d  rows=$n")
      if (sys.env.contains("GRAFT_PROBE_SITES")) {
        import scala.jdk.CollectionConverters._
        sites.asScala.groupBy(identity).toSeq.sortBy(-_._2.size)
          .foreach { case (s, xs) => println(f"    ${xs.size}%3d x $s") }
      }
      sites.clear()
      CacheScope.release(spark)
    }
    spark.stop()
  }
}
