package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch probe (r14): where does q_a2_distinct_approx's ~1.5 s
  * go? 100k rows, 5 groups, one HLL++ aggregate.
  */
object A2Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(xxhash64(df.columns.map(col): _*).as("__h"))
        .agg(expr("bit_xor(__h)")).collect()
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime(); force(df)
      val t1 = System.nanoTime(); force(df)
      val t2 = System.nanoTime()
      println(f"$name%-52s run1 ${(t1 - t0) / 1e9}%6.2f  run2 ${(t2 - t1) / 1e9}%6.2f")
    }
    val ev = Tables(spark, dir, "events")
    time("hll rsd=0.01 + orderBy (the query)") {
      ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
        .orderBy("event_type")
    }
    time("hll rsd=0.01 no orderBy") {
      ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
    }
    time("hll rsd=0.05") {
      ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.05).as("approx_users"))
    }
    time("exact count_distinct") {
      ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("u"))
    }
    time("plain count") {
      ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }
    spark.stop()
  }
}
// (appended variants live in A2Probe2 to avoid editing main above)
object A2Probe2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      val t1 = System.nanoTime(); f
      val t2 = System.nanoTime()
      println(f"$name%-40s run1 ${(t1 - t0) / 1e9}%6.2f  run2 ${(t2 - t1) / 1e9}%6.2f")
    }
    time("range 100k hll 0.01, 5 groups") {
      spark.range(100000).selectExpr("id % 5 AS g", "id % 1000 AS u")
        .groupBy("g").agg(approx_count_distinct(col("u"), 0.01)).collect()
    }
    time("range 100k hll 0.01, 1 group agg") {
      spark.range(100000).selectExpr("id % 1000 AS u")
        .agg(approx_count_distinct(col("u"), 0.01)).collect()
    }
    time("range 10M hll 0.01, 5 groups") {
      spark.range(10000000).selectExpr("id % 5 AS g", "id % 1000 AS u")
        .groupBy("g").agg(approx_count_distinct(col("u"), 0.01)).collect()
    }
    spark.stop()
  }
}
