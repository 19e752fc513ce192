package graft

import org.apache.spark.sql.SparkSession

/** Dev-only perf probe (Test scope, not shipped): time bench outliers in
  * isolation to separate query cost from bench-order effects (JIT, GC
  * pressure, cache churn). Run:
  * SPARK_GRAFT_CPUS=8 sbt "Test/runMain graft.Probe"
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

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-50s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (n=$n)")
    }
    def runQ(q: String, dir: String): Long = {
      val df = SparkEntry.queries(q)(spark, dir)
      val n = df.count()
      CacheScope.release(spark)
      n
    }

    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      Tables.all.foreach(t => Tables(spark, dir, t).count()) // warm footers
      for (q <- Seq("q_a2_distinct_approx", "q_d_incremental_dedup",
          "q_t_bloom_decontaminate", "q_e_sem_decontaminate",
          "q_e_hard_negatives"); pass <- 1 to 2)
        time(s"$q $sf pass$pass")(runQ(q, dir))
    }
    spark.stop()
  }
}
