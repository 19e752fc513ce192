package graft.ts

import graft.ts.TimeSeriesOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 26-feature crypto frame — the reference's parity contract
  * (data_loader.py:77-126; FIXTURES.md §4 fixes the exact column order):
  * price block, volume block, indicator block, calendar block. One
  * shuffle on the series key; every rolling feature evaluates in the same
  * sorted partition, the recursive indicators run as one streaming
  * mapPartitions pass joined back on (key, id).
  *
  * `warmupCut` mirrors the reference's trailing `dropna()`
  * (data_loader.py:126): on a gapless grid every column is non-null from
  * row 34 per key (MACD 12/26/9 signal warm-up dominates), so the cut is
  * positional and engine-independent.
  */
object FeatureFrame {

  /** FIXTURES.md §4 order. */
  val FeatureCols: Seq[String] = Seq(
    "open", "high", "low", "close", "price_ma_ratio", "price_spread",
    "volume", "volume_zscore", "volume_ma_ratio", "liquidity",
    "rsi", "macd", "atr", "obv", "log_returns",
    "volatility_6", "volatility_12", "volatility_24",
    "momentum_3_6", "momentum_6_12",
    "hour_sin", "hour_cos", "dow_sin", "dow_cos",
    "is_weekend", "is_market_open")

  /** MACD(12,26,9) needs 26+9-1 rows before macd_diff is defined. */
  val WarmupRows = 33

  /** Input: (key, ts, id, open, high, low, close, volume). Output: input
    * keys + the 26 features, first `WarmupRows` rows per key dropped.
    */
  def enhance(df: DataFrame, key: String, ts: String, id: String,
      dropWarmup: Boolean = true): DataFrame = {
    val w = keyedOrder(key, ts, id)
    val lr = logReturns(col("close"), w)

    val ind = Indicators.compute(df, key, ts, id,
        "high", "low", "close", "volume")
      .select(col("key").as("__ik"), col("id").as("__ii"),
        col("rsi"), col("macd_diff").as("macd"), col("atr"), col("obv"))

    val base = df
      .withColumn("price_ma_ratio", maRatio(col("close"), w, 24))
      .withColumn("price_spread", safeDiv(col("high") - col("low"), col("close")))
      .withColumn("volume_zscore", rollingZscore(col("volume"), w, 24))
      .withColumn("volume_ma_ratio", maRatio(col("volume"), w, 24))
      .withColumn("liquidity", log1p(col("volume") * col("close")))
      .withColumn("log_returns", lr)
      .withColumn("volatility_6", rollingStd(col("log_returns"), w, 6))
      .withColumn("volatility_12", rollingStd(col("log_returns"), w, 12))
      .withColumn("volatility_24", rollingStd(col("log_returns"), w, 24))
      .withColumn("momentum_3_6", momentum(col("close"), w, 3, 6))
      .withColumn("momentum_6_12", momentum(col("close"), w, 6, 12))
      .withColumn("hour_sin", hourSin(col(ts)))
      .withColumn("hour_cos", hourCos(col(ts)))
      .withColumn("dow_sin", dowSin(col(ts)))
      .withColumn("dow_cos", dowCos(col(ts)))
      .withColumn("is_weekend", isWeekend(col(ts)))
      .withColumn("is_market_open", isMarketOpen(col(ts)))
      .withColumn("__rn", row_number().over(w))

    val joined = base.join(ind,
        base(key).cast("string") === col("__ik") &&
          base(id).cast("long") === col("__ii"))
      .drop("__ik", "__ii")

    val cut = if (dropWarmup) joined.where(col("__rn") > WarmupRows) else joined
    cut.select((Seq(key, ts, id) ++ FeatureCols).map(col): _*)
  }

  /** S6+P7: OHLCV CSV scan with the reference's header normalization
    * (data_loader.py:46-63) — declared schema (no inference pass),
    * rename map, timestamp parse, time order.
    */
  def loadOhlcvCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema("timestamp STRING, Open DOUBLE, High DOUBLE, Low DOUBLE, " +
        "Close DOUBLE, Volume DOUBLE")
      .csv(path)
      .withColumnsRenamed(Map(
        "Open" -> "open", "High" -> "high", "Low" -> "low",
        "Close" -> "close", "Volume" -> "volume"))
      .withColumn("ts", to_timestamp(col("timestamp")))
      .drop("timestamp")
      .withColumn("id", unix_timestamp(col("ts")))
}
