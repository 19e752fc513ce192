package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.functions.HllPlusPlusBinary]] BIT-EQUAL to Spark's
  * built-in `approx_count_distinct` — same helper, same registers, so
  * the estimate must match exactly on every input shape, precision, and
  * aggregation topology the suite uses (grouped, global, nulls, strings,
  * repartitioned so partial-merge order varies).
  */
class HllBinarySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def binary(c: Column, rsd: Double): Column =
    ColumnBridge.column(graft.functions.HllPlusPlusBinary(
      ColumnBridge.eagerExpression(c), rsd).toAggregateExpression())

  private def check(df: org.apache.spark.sql.DataFrame, value: String,
      rsd: Double): Unit = {
    val a = df.agg(approx_count_distinct(col(value), rsd).as("x"))
      .collect().map(_.getLong(0)).toSeq
    val b = df.agg(binary(col(value), rsd).as("x"))
      .collect().map(_.getLong(0)).toSeq
    assert(a === b, s"global rsd=$rsd")
  }

  test("grouped estimates equal the built-in at rsd 0.01 and 0.05") {
    val df = spark.range(100000)
      .selectExpr("id % 7 AS g", "(id * 2654435761) % 12345 AS u")
      .repartition(13) // partial buffers merge in varying order
    for (rsd <- Seq(0.01, 0.05)) {
      val a = df.groupBy("g").agg(approx_count_distinct(col("u"), rsd))
        .orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val b = df.groupBy("g").agg(binary(col("u"), rsd))
        .orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(a === b, s"grouped rsd=$rsd")
    }
  }

  test("global, strings, nulls, empty") {
    val strs = (0 until 5000).map(i => if (i % 11 == 0) null
      else s"user_${i % 997}").toDF("u")
    check(strs, "u", 0.01)
    check(strs, "u", 0.05)
    check(spark.range(0).selectExpr("CAST(id AS STRING) AS u"), "u", 0.01)
    check(spark.range(1000000).selectExpr("id AS u"), "u", 0.01) // high card
  }

  test("q_a2 on the smoke corpus matches the built-in form row for row") {
    val dir = "/root/testdata/sf0.001"
    val now = SparkEntry.queries("q_a2_distinct_approx")(spark, dir)
      .collect().map(_.toString).toSeq
    val builtin = Tables(spark, dir, "events").groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy("event_type").collect().map(_.toString).toSeq
    assert(now === builtin)
    CacheScope.release(spark)
  }
}
