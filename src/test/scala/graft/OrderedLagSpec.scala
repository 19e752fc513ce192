package graft

import graft.ops.OrderedLag
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OrderedLag must be BIT-EQUAL to `lag(...) OVER (PARTITION BY key ORDER
  * BY ...)` — it is pure row shifting, so any difference is a bug, not a
  * rounding story.
  */
class OrderedLagSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def compare(n: Int, nKeys: Int, nParts: Int,
      lags: Seq[(String, Int)]): Unit = {
    val rnd = new scala.util.Random(n * 31 + nKeys)
    val rows = (0 until n).map { i =>
      (s"k${rnd.nextInt(nKeys)}", i.toLong, rnd.nextDouble() * 100)
    }
    val df = rows.toDF("key", "seq", "value")
    val w = Window.partitionBy("key").orderBy(col("seq"))
    val expected = lags.foldLeft(df) { case (d, (name, j)) =>
      d.withColumn(name, lag(col("value"), j).over(w))
    }.orderBy("key", "seq").collect().toSeq
    val got = OrderedLag.withLags(df, Seq("key"), Seq(col("seq")),
        "value", lags, nPartsOpt = Some(nParts))
      .orderBy("key", "seq").collect().toSeq
    CacheScope.release(spark)
    assert(got == expected, s"n=$n nKeys=$nKeys nParts=$nParts")
  }

  test("matches window lag: many rows, few keys, keys span many tiles") {
    compare(n = 5000, nKeys = 3, nParts = 16,
      lags = Seq("l1" -> 1, "l2" -> 2))
  }

  test("matches window lag: more keys than tiles") {
    compare(n = 2000, nKeys = 100, nParts = 8, lags = Seq("l1" -> 1))
  }

  test("matches window lag: tiles smaller than maxLag (carry walks back)") {
    // 7 rows over 32 tiles: most tiles hold 0-1 rows, so a lag-3 carry
    // must walk across several preceding tiles
    compare(n = 7, nKeys = 2, nParts = 32, lags = Seq("l3" -> 3))
  }

  test("matches window lag: single key (worst case for the window plan)") {
    compare(n = 3000, nKeys = 1, nParts = 16,
      lags = Seq("l1" -> 1, "l5" -> 5))
  }

  test("null values shift through like any other value") {
    val df = Seq(
      ("a", 1L, Some(1.0)), ("a", 2L, None), ("a", 3L, Some(3.0)),
      ("b", 1L, Some(9.0)), ("b", 2L, Some(8.0)))
      .toDF("key", "seq", "value")
    val w = Window.partitionBy("key").orderBy(col("seq"))
    val expected = df.withColumn("l1", lag(col("value"), 1).over(w))
      .orderBy("key", "seq").collect().toSeq
    val got = OrderedLag.withLags(df, Seq("key"), Seq(col("seq")),
        "value", Seq("l1" -> 1), nPartsOpt = Some(4))
      .orderBy("key", "seq").collect().toSeq
    CacheScope.release(spark)
    assert(got == expected)
  }
}
