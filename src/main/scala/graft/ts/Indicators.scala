package graft.ts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wilder/exponential technical indicators (SURVEY §2.5 W7-W9, §7.3):
  * RSI(14), MACD(12,26,9), ATR(14), plus ta-style OBV.
  *
  * EMA is an order-dependent recursion `e_t = (1-α)·e_{t-1} + α·x_t` — not
  * an associative aggregate — so it cannot be a plain window function.
  * Implementation: hash-repartition on the series key, sort each partition
  * by (key, ts, id), then a single streaming `mapPartitions` pass holding
  * O(1) state per key (SURVEY §7.3 option (b)). Scale posture: each key's
  * series stays in exactly one task (correctness requirement for the
  * recursion); parallelism = #keys; memory is constant per row — a
  * 10^9-row key streams through without materializing.
  *
  * Semantics (documented engine contract, mirrors pandas
  * `ewm(adjust=False, min_periods=n)` as used by the `ta` library —
  * reference data_loader.py:101-104):
  *  - RSI: diffs from the 2nd row; gain/loss EMAs seeded with the first
  *    diff; output null until `rsiN` diffs seen.
  *  - MACD: fast/slow EMAs seeded with the first close, recursion from row
  *    0; `macd` null until `slow` rows; signal EMA seeded with the first
  *    valid macd value; `macd_diff` null until `slow + sig - 1` rows.
  *  - ATR: true range `max(h-l, |h-prev_c|, |l-prev_c|)` defined from the
  *    2nd row (needs prev close — deliberate deviation from ta's
  *    `tr_0 = h-l`); seeded with the mean of the first `atrN` TRs, Wilder
  *    recursion `(atr·(n-1) + tr)/n` after.
  *  - OBV: cumulative ±volume with ta's tie rule (`close < prev ? -v : +v`).
  */
object Indicators {

  /** Input contract for the sorted pass (public: Spark codegen must be able
    * to reach the encoder's accessors).
    */
  final case class In(key: String, ts: java.sql.Timestamp, id: Long,
      high: Double, low: Double, close: Double, volume: Double)

  final case class IndicatorRow(key: String, ts: java.sql.Timestamp, id: Long, close: Double,
      rsi: Option[Double], macd: Option[Double], macd_signal: Option[Double],
      macd_diff: Option[Double], atr: Option[Double],
      ema_fast: Double, ema_slow: Double, obv: Double)

  /** Mutable per-key recursion state — one instance per key per task. */
  private final class State(rsiN: Int, fast: Int, slow: Int, sig: Int, atrN: Int) {
    private val aRsi = 1.0 / rsiN
    private val aFast = 2.0 / (fast + 1)
    private val aSlow = 2.0 / (slow + 1)
    private val aSig = 2.0 / (sig + 1)

    private var i = 0 // row index within key
    private var prevClose = 0.0
    private var emaUp = 0.0; private var emaDn = 0.0; private var nDiff = 0
    private var emaFast = 0.0; private var emaSlow = 0.0
    private var emaSig = 0.0; private var nSig = 0
    private var atr = 0.0; private var trSum = 0.0; private var nTr = 0
    private var obv = 0.0

    def update(high: Double, low: Double, close: Double, volume: Double)
        : (Option[Double], Option[Double], Option[Double], Option[Double],
           Option[Double], Double, Double, Double) = {
      if (i == 0) {
        emaFast = close; emaSlow = close
        obv += volume // ta: close < NaN is false → +volume
      } else {
        val d = close - prevClose
        val up = math.max(d, 0.0); val dn = math.max(-d, 0.0)
        nDiff += 1
        if (nDiff == 1) { emaUp = up; emaDn = dn }
        else {
          emaUp = emaUp * (1 - aRsi) + up * aRsi
          emaDn = emaDn * (1 - aRsi) + dn * aRsi
        }
        val tr = math.max(high - low,
          math.max(math.abs(high - prevClose), math.abs(low - prevClose)))
        nTr += 1
        if (nTr <= atrN) {
          trSum += tr
          if (nTr == atrN) atr = trSum / atrN
        } else atr = (atr * (atrN - 1) + tr) / atrN
        emaFast = emaFast * (1 - aFast) + close * aFast
        emaSlow = emaSlow * (1 - aSlow) + close * aSlow
        obv += (if (close < prevClose) -volume else volume)
      }
      val macd = emaFast - emaSlow
      if (i >= slow - 1) {
        nSig += 1
        if (nSig == 1) emaSig = macd
        else emaSig = emaSig * (1 - aSig) + macd * aSig
      }
      val rsiOut =
        if (nDiff >= rsiN)
          Some(100.0 - 100.0 / (1.0 + emaUp / emaDn))
        else None
      val macdOut = if (i >= slow - 1) Some(macd) else None
      val sigOut = if (nSig >= sig) Some(emaSig) else None
      val diffOut = for (m <- macdOut; s <- sigOut) yield m - s
      val atrOut = if (nTr >= atrN) Some(atr) else None
      prevClose = close
      i += 1
      (rsiOut, macdOut, sigOut, diffOut, atrOut, emaFast, emaSlow, obv)
    }
  }

  /** Computes all indicator columns in one pass. Output: one row per input
    * row with (key, id, close, rsi, macd, macd_signal, macd_diff, atr,
    * ema_fast, ema_slow, obv).
    */
  def compute(df: DataFrame, key: String, ts: String, id: String,
      high: String, low: String, close: String, volume: String,
      rsiN: Int = 14, fast: Int = 12, slow: Int = 26, sig: Int = 9,
      atrN: Int = 14): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(
      col(key).cast("string").as("key"), col(ts).cast("timestamp").as("ts"),
      col(id).cast("long").as("id"), col(high).cast("double").as("high"),
      col(low).cast("double").as("low"), col(close).cast("double").as("close"),
      col(volume).cast("double").as("volume")).as[In]
    typed
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ts"), col("id"))
      .mapPartitions { rows =>
        var curKey: String = null
        var st: State = null
        rows.map { r =>
          if (r.key != curKey) {
            curKey = r.key
            st = new State(rsiN, fast, slow, sig, atrN)
          }
          val (rsi, macd, sigV, diff, atr, ef, es, obv) =
            st.update(r.high, r.low, r.close, r.volume)
          IndicatorRow(r.key, r.ts, r.id, r.close, rsi, macd, sigV, diff, atr,
            ef, es, obv)
        }
      }
      .toDF()
  }

  /** Final (most recent) indicator values per key — the shape the serving
    * path consumes (predict from the latest state) and the one the DuckDB
    * oracle can replay with an explicit list_reduce fold.
    */
  def finals(df: DataFrame, key: String, ts: String, id: String,
      close: String): DataFrame = {
    val ind = compute(df, key, ts, id, close, close, close, close)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("ts").desc, col("id").desc)
    ind.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .drop("__rn")
  }
}
