package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (r15): WHERE does q_a2's per-execution ~1.3 s go?
  * Times each QueryExecution phase plus the action, twice, and A/Bs
  * codegen factory modes — separating driver planning, janino compile,
  * and execution for the 1,639-word HLL++ buffer.
  */
object A2PhaseProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def phases(tag: String): Unit = {
      val df = spark.range(100000).selectExpr("id % 5 AS g", "id % 1000 AS u")
        .groupBy("g").agg(approx_count_distinct(col("u"), 0.01).as("a"))
        .orderBy("g")
      val qe = df.queryExecution
      def t[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  [$tag] $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
        r
      }
      t("analyzed")(qe.analyzed)
      t("optimized")(qe.optimizedPlan)
      t("sparkPlan")(qe.sparkPlan)
      t("executedPlan")(qe.executedPlan)
      t("toRdd")(qe.toRdd)
      t("collect")(df.collect())
      t("collect2") (df.collect())
    }
    phases("warm0") // JVM warmup execution
    phases("run1")
    phases("run2")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    phases("nocodegen")
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.stop()
  }
}
