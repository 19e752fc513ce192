package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Serving path (SURVEY §2.5 W13-W15, §2.8 U1-U5, §2.2 K5): sliding
  * training/inference windows, a deterministic surrogate forward pass,
  * scaler apply/inverse as column arithmetic over a broadcast params
  * table, confidence defaults, and the dual-table prediction write.
  *
  * The model itself is a Scala UDF (U1 is the system's one real UDF —
  * SURVEY §2.8: a reimplemented forward pass or an ONNX call slot in
  * exactly this signature `Seq[Double] ⇒ Seq[Double]`); everything around
  * it is codegen'd column work. The surrogate used for tests/oracles is a
  * fixed-weight linear reader: ascending-index left-fold so ANSI SQL
  * replays it bit-exactly.
  */
object Serving {

  /** W13: per-key sliding windows — x = `seqLen` feature rows starting at
    * the current row, y = the following `predLen` label rows. Only
    * complete windows survive (reference data_loader.py:163-172).
    * One shuffle on the key; both frames evaluate in the same sort.
    */
  def slidingWindows(df: DataFrame, key: String, ts: String, id: String,
      featureCol: String, labelCol: String, seqLen: Int, predLen: Int): DataFrame = {
    // Executed via OrderedRolling's frame_array (descending order turns
    // the forward collect frames into trailing ring slices — offsets
    // 0..seqLen-1 for x, seqLen..seqLen+predLen-1 for y — emitted in
    // scan order = descending time, then reverse()d to the ascending-time
    // training shape; OrderedRollingSpec pins equality with the window
    // formulation, PropertySpec the per-key count identity). The
    // window form ran every key's sort + 324-value transient array
    // builds on #keys tasks: 57 s at the 100x probe scale on the
    // 5-event-type corpus.
    import graft.ops.OrderedRolling
    OrderedRolling.withRollups(df, Seq(key),
        Seq(col(ts).desc, col(id).desc),
        Seq(OrderedRolling.Roll("x", "frame_array", seqLen, featureCol),
          OrderedRolling.Roll("y", "frame_array", predLen, labelCol,
            skip = seqLen)))
      // frame_array emits in scan order = DESCENDING time under the desc
      // sort; the training contract wants ascending-time sequences, so
      // reverse here (array reversal of doubles is exact)
      .withColumn("x", reverse(col("x")))
      .withColumn("y", reverse(col("y")))
      .where(size(col("x")) === seqLen && size(col("y")) === predLen)
  }

  /** W14 tail: the newest complete `seqLen` window per key, as one row
    * (key, last_ts, x) — the inference input shape (predictor.py:197).
    */
  def latestWindow(df: DataFrame, key: String, ts: String, id: String,
      featureCol: String, seqLen: Int): DataFrame = {
    val wDesc = Window.partitionBy(col(key)).orderBy(col(ts).desc, col(id).desc)
    df
      .withColumn("__rn", row_number().over(wDesc))
      .where(col("__rn") <= seqLen)
      .groupBy(col(key))
      .agg(max(col(ts)).as("last_ts"),
        sort_array(collect_list(struct(col(ts), col(id),
          col(featureCol).as("v")))).as("__s"),
        count(lit(1)).as("__n"))
      .where(col("__n") === seqLen)
      .select(col(key), col("last_ts"),
        expr("transform(__s, s -> s.v)").as("x"))
  }

  /** U1 surrogate forward pass: weighted mean of the window with weights
    * (i+1)/Σ(i+1) (ascending-index fold), then a fixed per-horizon drift.
    * Deterministic, order-pinned float math — the oracle replays it.
    */
  def surrogateForward(x: Seq[Double], predLen: Int): Seq[Double] = {
    val n = x.length
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * (i + 1); i += 1 }
    val wm = s / (n.toLong * (n + 1) / 2).toDouble
    Seq.tabulate(predLen)(h => wm * (1.0 + 0.001 * (h + 1)))
  }

  /** U1+W15+U5+P16: latest window per key → forward pass → one row per
    * horizon with target timestamp, ±5% default confidence band and a
    * JSON metadata column. The surrogate fills the model slot; the real
    * reimplemented stack is [[predictLatestWith]]+[[LstmForward.forward]].
    */
  def predictLatest(df: DataFrame, key: String, ts: String, id: String,
      featureCol: String, seqLen: Int, predLen: Int,
      stepSeconds: Int, modelName: String): DataFrame =
    predictLatestWith(df, key, ts, id, featureCol, seqLen, stepSeconds,
      modelName, x => surrogateForward(x, predLen))

  /** The U1 model slot, forward pass injectable: any deterministic
    * `Seq[Double] ⇒ Seq[Double]` (the surrogate, [[LstmForward.forward]],
    * or an ONNX-session call) runs as the single UDF between the window
    * build and the horizon fan-out — the plan around it is identical.
    */
  def predictLatestWith(df: DataFrame, key: String, ts: String, id: String,
      featureCol: String, seqLen: Int, stepSeconds: Int, modelName: String,
      forwardFn: Seq[Double] => Seq[Double]): DataFrame = {
    val forward = udf(forwardFn)
    latestWindow(df, key, ts, id, featureCol, seqLen)
      // the when-guard re-states latestWindow's __n === seqLen filter AT
      // the UDF call site: Spark does not guarantee a Filter evaluates
      // before a Project's UDF once stages collapse, so a short series
      // (fewer than seqLen rows for a key) could reach the forward pass
      // and trip its exact-window require. `when` short-circuits in
      // codegen; posexplode drops the null rows. No-op on complete
      // windows (DegenerateProbe).
      .withColumn("__preds",
        when(size(col("x")) === seqLen, forward(col("x"))))
      .select(col(key), col("last_ts"),
        posexplode(col("__preds")).as(Seq("__h0", "predicted_price")))
      .withColumn("horizon", col("__h0") + 1)
      .withColumn("target_ts",
        expr(s"timestampadd(SECOND, horizon * $stepSeconds, last_ts)"))
      .withColumn("confidence_lower", col("predicted_price") * 0.95)
      .withColumn("confidence_upper", col("predicted_price") * 1.05)
      .withColumn("metadata",
        format_string("""{"model":"%s","horizon":%d}""", lit(modelName),
          col("horizon")))
      .drop("__h0")
  }

  /** A5-apply half of U2: robust-scale `valueCol` using a per-key params
    * table (key, center, scale) — broadcast join (J3), zero-IQR guarded
    * (U3 fallback posture: degenerate scale → 0, not NaN).
    */
  def robustScale(df: DataFrame, params: DataFrame, key: String,
      valueCol: String): DataFrame =
    df.join(broadcast(params), key)
      .withColumn(valueCol + "_scaled",
        when(col("scale") =!= 0.0,
          (col(valueCol) - col("center")) / col("scale"))
          .otherwise(lit(0.0)))

  /** U2 inverse: `x·scale + center` (predictor.py:239-259). */
  def robustInverse(c: Column, center: Column, scale: Column): Column =
    when(scale =!= 0.0, c * scale + center).otherwise(center)

  /** A6-apply half of U2: min-max scale into [lo, hi] from a per-key
    * (key, vmin, vmax) params table — the reference's indicator
    * (-1,1) / time (0,1) feature groups (data_loader.py:37-38).
    * Degenerate range → lo.
    */
  def minMaxScale(df: DataFrame, params: DataFrame, key: String,
      valueCol: String, lo: Double, hi: Double): DataFrame =
    df.join(broadcast(params), key)
      .withColumn(valueCol + "_mm",
        when(col("vmax") > col("vmin"),
          lit(lo) + (col(valueCol) - col("vmin")) * lit(hi - lo) /
            (col("vmax") - col("vmin")))
          .otherwise(lit(lo)))

  /** U2 min-max inverse: `(x − lo)·(vmax − vmin)/(hi − lo) + vmin`. */
  def minMaxInverse(c: Column, vmin: Column, vmax: Column,
      lo: Double, hi: Double): Column =
    when(vmax > vmin,
      (c - lit(lo)) * (vmax - vmin) / lit(hi - lo) + vmin)
      .otherwise(vmin)

  /** U4: input validation before inference (predictor.py:346-371). */
  def validateInput(df: DataFrame, requiredCols: Seq[String],
      minRows: Long): Seq[String] = {
    val missing = requiredCols.filterNot(df.columns.contains)
      .map(c => s"missing column: $c")
    if (missing.nonEmpty) missing
    else {
      val n = df.count()
      val sizeErr = if (n < minRows) Seq(s"need >= $minRows rows, got $n") else Nil
      if (n == 0) sizeErr // sum() over zero rows is null — nothing to scan
      else {
        val nullCounts = df.select(requiredCols.map(c =>
          sum(col(c).isNull.cast("long")).as(c)): _*).head()
        val nullErr = requiredCols.zipWithIndex
          .filter { case (_, i) =>
            !nullCounts.isNullAt(i) && nullCounts.getLong(i) > 0 }
          .map { case (c, i) => s"column $c has ${nullCounts.getLong(i)} nulls" }
        sizeErr ++ nullErr
      }
    }
  }

  /** K5: the two prediction-table layouts written from ONE computed frame
    * (data_writer.py:155-180) — cache, write the base table, write the
    * by-horizon projection partitioned for the per-horizon dashboard scan.
    */
  def dualWrite(preds: DataFrame, predictionsPath: String,
      byHorizonPath: String): Unit = {
    val cached = preds.cache()
    try {
      cached.write.mode("overwrite").parquet(predictionsPath)
      cached.write.mode("overwrite").partitionBy("horizon")
        .parquet(byHorizonPath)
    } finally cached.unpersist()
  }
}
