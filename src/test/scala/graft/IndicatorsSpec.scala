package graft

import graft.ts.Indicators
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden test for the recursive-EMA indicator pass (SURVEY §2.5 W7-W10).
  * Expected values were computed by an independent replication of the
  * documented semantics (pandas `ewm(adjust=False, min_periods=n)` seeding,
  * SMA-seeded Wilder ATR with TR from the 2nd row, ta OBV tie rule) over a
  * fixed 40-point series `50 + 10·sin(0.7·i) + (i mod 5)` rounded to 2dp.
  */
class IndicatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSpec.session

  private val vals = Seq(
    50.0, 57.44, 61.85, 61.63, 57.35, 46.49, 42.28, 42.18, 46.69, 54.17,
    56.57, 60.88, 60.55, 56.19, 50.34, 41.2, 41.21, 45.82, 53.34, 60.7,
    59.91, 59.46, 55.03, 49.18, 45.12, 40.24, 44.95, 52.5, 59.82, 63.93,
    58.37, 53.87, 48.02, 44.05, 44.28, 44.09, 51.67, 58.94, 62.95, 62.27)

  private lazy val rows: Map[Long, Indicators.IndicatorRow] = {
    import spark.implicits._
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("k", new java.sql.Timestamp(1700000000000L + i * 60000L), i.toLong, v)
    }.toDF("key", "ts", "id", "v")
    import org.apache.spark.sql.Encoders
    Indicators.compute(df, "key", "ts", "id", "v", "v", "v", "v")
      .as[Indicators.IndicatorRow](Encoders.product[Indicators.IndicatorRow])
      .collect().map(r => r.id -> r).toMap
  }

  private def approx(a: Option[Double], b: Option[Double]): Unit = (a, b) match {
    case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-6, s"$x vs $y")
    case (x, y) => assert(x == y)
  }

  test("warmup rows are null") {
    val r0 = rows(0L)
    assert(r0.rsi.isEmpty && r0.macd.isEmpty && r0.atr.isEmpty)
    assert(rows(13L).rsi.isEmpty && rows(13L).atr.isEmpty)
    assert(rows(25L).macd.isDefined && rows(25L).macd_signal.isEmpty)
    assert(rows(32L).macd_signal.isEmpty && rows(33L).macd_signal.isDefined)
  }

  test("RSI(14) matches golden recursion") {
    approx(rows(14L).rsi, Some(73.005579))
    approx(rows(25L).rsi, Some(53.385759))
    approx(rows(39L).rsi, Some(62.614934))
  }

  test("MACD(12,26,9) matches golden recursion") {
    approx(rows(25L).macd, Some(-0.871993))
    approx(rows(33L).macd_signal, Some(0.171695))
    approx(rows(33L).macd_diff, Some(-0.346606))
    approx(rows(39L).macd_diff, Some(1.255895))
  }

  test("ATR(14) matches golden recursion") {
    approx(rows(14L).atr, Some(4.34))
    approx(rows(25L).atr, Some(4.365327))
    approx(rows(39L).atr, Some(4.297338))
  }

  test("OBV follows the ta tie rule (volume = value here)") {
    assert(math.abs(rows(0L).obv - 50.0) < 1e-9)
    assert(math.abs(rows(14L).obv - -29.41) < 1e-9)
    assert(math.abs(rows(39L).obv - -50.11) < 1e-9)
  }

  test("multi-key isolation: state resets at key boundary") {
    import spark.implicits._
    val df = (vals.zipWithIndex.map { case (v, i) =>
      ("a", new java.sql.Timestamp(1700000000000L + i * 60000L), i.toLong, v)
    } ++ vals.zipWithIndex.map { case (v, i) =>
      ("b", new java.sql.Timestamp(1700000000000L + i * 60000L), (100 + i).toLong, v)
    }).toDF("key", "ts", "id", "v")
    val out = Indicators.compute(df, "key", "ts", "id", "v", "v", "v", "v")
    val byKey = out.collect().groupBy(_.getString(0))
    // identical series per key → identical indicator outputs
    val a = byKey("a").sortBy(_.getLong(2)).map(_.toSeq.drop(3))
    val b = byKey("b").sortBy(_.getLong(2)).map(_.toSeq.drop(3))
    assert(a.toSeq == b.toSeq)
  }
}
