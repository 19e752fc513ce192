package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types.StructType

/** Runtime observability for the ingest paths — the Spark-native analog of
  * the reference's health/status endpoint and container healthchecks
  * (`prediction_service/src/prediction_service.py:324-351`,
  * `docker-compose.yml:39-44`): per-(micro)batch row / corrupt-row /
  * late-row counters computed INSIDE the ingest plan via
  * `Dataset.observe`, surfaced through `StreamingQueryProgress
  * .observedMetrics` on streams and [[Observation]] on batch, and folded
  * into a health report a service publishes.
  *
  * Why observe() and not a second aggregate: the metrics ride the SAME
  * pass as the ingest (a `CollectMetrics` node over the flowing rows) —
  * zero extra scans, zero extra shuffles, identical cost on a 100 TB
  * ingest as on a fixture. And because the metric EXPRESSIONS are shared
  * (one definition below), batch and streaming report identical values
  * over identical data — asserted in StreamingSpec.
  */
object Observability {

  /** The observed-metrics name (the key in `observedMetrics`). */
  val MetricsName = "graft_ingest"

  /** A value is corrupt when it cannot enter downstream arithmetic:
    * NULL, NaN, or ±Inf (the P10 zero/inf→null gate's refusal set).
    */
  def corruptCond(valueCol: String): Column =
    col(valueCol).isNull || isnan(col(valueCol)) ||
      col(valueCol) === Double.PositiveInfinity ||
      col(valueCol) === Double.NegativeInfinity

  /** A row is late when its event time predates `threshold` (on streams
    * the caller derives the threshold from its watermark horizon; the
    * batch health query uses max(ts) − 24 h).
    */
  def lateCond(tsCol: String, threshold: Column): Column =
    col(tsCol) < threshold

  /** The three shared metric aggregates — ONE definition so batch and
    * streaming cannot drift: n_rows, corrupt_rows, late_rows.
    */
  private def metricAggs(valueCol: String, tsCol: String,
      lateThreshold: Column): Seq[Column] = Seq(
    count(lit(1)).as("n_rows"),
    sum(when(corruptCond(valueCol), 1L).otherwise(0L)).as("corrupt_rows"),
    sum(when(lateCond(tsCol, lateThreshold), 1L).otherwise(0L))
      .as("late_rows"))

  /** Attach the ingest metrics to a STREAMING frame; read them per batch
    * from `progress.observedMetrics.get(MetricsName)` (see
    * [[MetricsListener]]).
    */
  def observeIngestStream(df: DataFrame, valueCol: String, tsCol: String,
      lateThreshold: Column): DataFrame = {
    val aggs = metricAggs(valueCol, tsCol, lateThreshold)
    df.observe(MetricsName, aggs.head, aggs.tail: _*)
  }

  /** Attach the ingest metrics to a BATCH frame through an [[Observation]]
    * (its `get` blocks until the caller's first action completes).
    */
  def observeIngestBatch(df: DataFrame, obs: Observation, valueCol: String,
      tsCol: String, lateThreshold: Column): DataFrame = {
    val aggs = metricAggs(valueCol, tsCol, lateThreshold)
    df.observe(obs, aggs.head, aggs.tail: _*)
  }

  /** Schema of the emitted metrics table (one row per micro-batch on
    * streams; one row per observed action on batch).
    */
  val metricsSchema: StructType = new StructType()
    .add("batch_id", "long").add("n_rows", "long")
    .add("corrupt_rows", "long").add("late_rows", "long")

  /** Fold a metrics table (rows of [[metricsSchema]]) into the 1-row
    * health report the reference's /health endpoint publishes: totals,
    * corrupt/late ratios, and a status verdict. `healthy` iff nothing is
    * corrupt and late data stays under 50 % — the same shape as
    * q_u4_data_profile's gate, but over ingest counters instead of
    * column stats. Exact-integer sums; ratios rounded at the boundary.
    */
  def healthReport(metrics: DataFrame): DataFrame =
    metrics.agg(
      sum("n_rows").as("n_rows"),
      sum("corrupt_rows").as("corrupt_rows"),
      sum("late_rows").as("late_rows"))
      .select(col("n_rows"), col("corrupt_rows"), col("late_rows"),
        // nullif: a zero-row slice reports null ratios (and therefore
        // 'degraded' — no data IS a health finding), never an ANSI
        // DIVIDE_BY_ZERO (DegenerateProbe)
        (round(col("corrupt_rows") / nullif(col("n_rows"), lit(0L)), 6)
          + lit(0.0)).as("corrupt_ratio"),
        (round(col("late_rows") / nullif(col("n_rows"), lit(0L)), 6)
          + lit(0.0)).as("late_ratio"))
      .withColumn("status",
        when(col("corrupt_rows") === 0 && col("late_ratio") < 0.5,
          lit("healthy")).otherwise(lit("degraded")))

  /** Schema of the dedup-gate metrics table (one row per gated
    * micro-batch — see [[graft.dedup.NearDup.incrementalWinnowGated]]).
    */
  val gateMetricsSchema: StructType = new StructType()
    .add("batch_id", "long").add("fp_seen", "long")
    .add("fp_stopped", "long").add("stop_frac", "double")
    .add("pairs_mined", "long")

  /** Per-batch gate metrics → the gate-metrics table. */
  def gateMetricsFrame(spark: SparkSession,
      rows: Seq[(Long, graft.dedup.NearDup.WinnowGateMetrics)]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (b, m) =>
        Row(b, m.fpSeen, m.fpStopped, m.stopFrac, m.pairsMined) }: _*),
      gateMetricsSchema)

  /** Fold gate metrics into the 1-row suppression health report (VERDICT
    * r10 #2): a corpus whose near-dup recall collapses to zero — every
    * fingerprint crossing the total-df stop list, the designed
    * template-text behavior at ≥100 replicas (r10b: mined rows
    * 18 744 → 0) — reports `suppressed` instead of passing silently.
    * The verdict is on the stop FRACTION, not on pairs mined: zero pairs
    * from a clean batch is healthy; zero pairs because the stop list
    * swallowed the batch is not. It trips on EITHER the aggregate
    * fraction or the per-batch max (ADVICE r11, medium): a single
    * fully-suppressed batch diluted by many healthy ones is exactly the
    * silent-degradation case this report exists to catch.
    */
  def gateHealthReport(metrics: DataFrame): DataFrame =
    metrics.agg(
      sum("fp_seen").as("fp_seen"),
      sum("fp_stopped").as("fp_stopped"),
      sum("pairs_mined").as("pairs_mined"),
      max("stop_frac").as("max_batch_stop_frac"))
      .select(col("fp_seen"), col("fp_stopped"), col("pairs_mined"),
        (round(col("fp_stopped") / greatest(col("fp_seen"), lit(1L)), 6)
          + lit(0.0)).as("stop_frac"),
        col("max_batch_stop_frac"))
      .withColumn("status",
        when(col("stop_frac") > 0.5 || col("max_batch_stop_frac") > 0.5,
          lit("suppressed"))
          .otherwise(lit("healthy")))

  /** Schema of the semantic-gate cap-engagement table (one row per gated
    * micro-batch — see
    * [[graft.vector.VectorSearch.incrementalSemDedupGated]]).
    */
  val semGateMetricsSchema: StructType = new StructType()
    .add("batch_id", "long").add("delta_rows", "long")
    .add("hot_cells", "long").add("starred_members", "long")
    .add("star_frac", "double").add("pairs_flagged", "long")

  /** Per-batch semantic-gate metrics → the metrics table. */
  def semGateMetricsFrame(spark: SparkSession,
      rows: Seq[(Long, graft.vector.VectorSearch.SemGateMetrics)]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (b, m) =>
        Row(b, m.deltaRows, m.hotCells, m.starredMembers, m.starFrac,
          m.pairsFlagged) }: _*), semGateMetricsSchema)

  /** 1-row cap-engagement report for the semantic gate: `star_capped`
    * when most of the traffic routed through representatives instead of
    * probing the corpus itself (output stays exact-verified but
    * pair-incomplete — the r11 star-cap residuals), `healthy` otherwise.
    * The same alert-on-silent-degradation contract as
    * [[gateHealthReport]]: the verdict is on the star fraction, never on
    * the pair count — and, like there, it trips on either the aggregate
    * fraction or the per-batch max so one fully-starred batch cannot
    * hide behind many healthy ones (ADVICE r11, medium).
    */
  def semGateHealthReport(metrics: DataFrame): DataFrame =
    metrics.agg(
      sum("delta_rows").as("delta_rows"),
      sum("hot_cells").as("hot_cells"),
      sum("starred_members").as("starred_members"),
      sum("pairs_flagged").as("pairs_flagged"),
      max("star_frac").as("max_batch_star_frac"))
      .select(col("delta_rows"), col("hot_cells"), col("starred_members"),
        col("pairs_flagged"),
        (round(col("starred_members") / greatest(col("delta_rows"), lit(1L)),
          6) + lit(0.0)).as("star_frac"),
        col("max_batch_star_frac"))
      .withColumn("status",
        when(col("star_frac") > 0.5 || col("max_batch_star_frac") > 0.5,
          lit("star_capped"))
          .otherwise(lit("healthy")))

  /** Captures each micro-batch's observed ingest metrics — the listener a
    * deployment points at its metrics sink. Thread-safe; `snapshot` turns
    * the captured rows into the metrics table [[healthReport]] folds.
    */
  final class MetricsListener extends StreamingQueryListener {
    private val buf =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val m = e.progress.observedMetrics
      if (m.containsKey(MetricsName)) {
        val r = m.get(MetricsName)
        buf.add((e.progress.batchId, r.getAs[Long]("n_rows"),
          r.getAs[Long]("corrupt_rows"), r.getAs[Long]("late_rows")))
      }
    }

    def batches: Seq[(Long, Long, Long, Long)] = {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq.sortBy(_._1)
    }

    def snapshot(spark: SparkSession): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(batches.map { case (b, n, c, l) =>
          Row(b, n, c, l) }: _*), metricsSchema)
  }
}
