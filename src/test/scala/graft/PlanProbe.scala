package graft
// dev scratch probe: full executedPlan dump for named queries
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    args.foreach { q =>
      println(s"=== $q ===")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan)
      CacheScope.release(spark)
    }
    spark.stop()
  }
}
