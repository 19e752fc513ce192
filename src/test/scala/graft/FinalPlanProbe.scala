package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: print the POST-EXECUTION (AQE-final) plan for named queries —
  * ExplainDump shows the initial plan; runtime ReusedExchange/
  * AQEShuffleRead decisions only appear here.
  * Run: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.FinalPlanProbe <q>..."
  */
object FinalPlanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      df.select(xxhash64(df.columns.map(col): _*).as("__h"))
        .agg(expr("bit_xor(__h)")).collect()
      println(s"=== $q (final) ===")
      println(df.queryExecution.executedPlan.toString.take(12000))
      CacheScope.release(spark)
    }
    spark.stop()
  }
}
