package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located-join story from SURVEY §4 / the brief: two
  * tables bucketed and sorted on the join key join WITHOUT a shuffle —
  * at 100 TB that is the standing shuffle you pay once at write time
  * instead of on every join.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  test("join of co-bucketed tables plans no shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("bucketed").toString
    val n = 10000
    val facts = (1 to n).map(i => (i.toLong % 97, i.toLong, i * 1.5))
      .toDF("k", "id", "v")
    val dims = (0L to 96L).map(k => (k, s"name_$k")).toDF("k", "name")
    // force SMJ so the co-location (not a broadcast) is what's tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      facts.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
        .saveAsTable("facts_b")
      dims.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
        .saveAsTable("dims_b")
      // AQE hides children until executed — run, then read the final plan
      def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
        df.count()
        df.queryExecution.executedPlan.toString
      }
      val joined = spark.table("facts_b").join(spark.table("dims_b"), "k")
      assert(joined.count() == n)
      val bucketedPlan = finalPlan(joined)
      assert(!bucketedPlan.contains("Exchange"),
        s"expected shuffle-free co-located join:\n$bucketedPlan")

      // control: the same join on plain (unbucketed) parquet shuffles
      facts.write.mode("overwrite").parquet(s"$dir/facts_p")
      dims.write.mode("overwrite").parquet(s"$dir/dims_p")
      val plain = spark.read.parquet(s"$dir/facts_p")
        .join(spark.read.parquet(s"$dir/dims_p"), "k")
      assert(finalPlan(plain).contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
    }
  }
}
