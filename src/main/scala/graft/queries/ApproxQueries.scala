package graft.queries

import graft.{Query, QueryPack, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-safe approximate-percentile variants of A4/A5/P9 (VERDICT r1 #4:
  * exact `percentile` buffers every group value in executor memory — the
  * one operator in the r1 surface that cannot survive 100 TB groups).
  *
  * `approx_percentile(col, p, 10000)` (Greenwald-Khanna) holds an
  * O(accuracy·log n) sketch per group and merges map-side: rank error
  * ≤ n/10000 (documented engine contract). The approx values cannot
  * hash-match DuckDB's different sketch, so these queries are declared
  * rows-only; AccuracySpec pins them within rank-error bounds of the
  * exact result, and the exact twins (q_a4/q_a5/q_p9) keep full oracle
  * parity at sf0.01.
  */
object ApproxQueries extends QueryPack {

  private def ev(s: SparkSession, dir: String) = Tables(s, dir, "events")

  /** [[graft.functions.HllPlusPlusBinary]] as a Column (see q_a2). */
  private def hllBinary(c: org.apache.spark.sql.Column,
      rsd: Double): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.HllPlusPlusBinary(
      ColumnBridge.eagerExpression(c), rsd).toAggregateExpression())
  }

  /** Accuracy parameter: rank error ≤ n/10000. */
  val Accuracy = 10000

  override def queries: Seq[Query] = Seq(

    // One sketch per group, queried at every needed percentile — the
    // array form. Separate approx_percentile(p) calls each build their
    // OWN Greenwald-Khanna sketch over the group (3 sketch builds where
    // one suffices; measured 6 s → the bench's worst query before this).
    Query(
      "q_a4_quantiles_approx",
      (s, dir) =>
        ev(s, dir).groupBy(col("event_type")).agg(
          expr(s"approx_percentile(value, array(0.25, 0.5, 0.75), $Accuracy)")
            .as("__p"))
          .select(col("event_type"),
            round(element_at(col("__p"), 1), 4).as("q25"),
            round(element_at(col("__p"), 2), 4).as("q50"),
            round(element_at(col("__p"), 3), 4).as("q75"))
          .orderBy("event_type"),
      None,
      doc = "SURVEY A4 at scale: mergeable quantile sketch, O(1e4·log n) " +
        "state per group instead of O(n) exact-percentile buffers; ONE " +
        "sketch answers all three percentiles (array form)"),

    Query(
      "q_a5_robust_scaler_approx",
      (s, dir) =>
        ev(s, dir).groupBy(col("event_type")).agg(
          expr(s"approx_percentile(value, array(0.25, 0.5, 0.75), $Accuracy)")
            .as("__p"))
          .select(col("event_type"),
            round(element_at(col("__p"), 2), 4).as("center"),
            round(element_at(col("__p"), 3)
              - element_at(col("__p"), 1), 4).as("scale"))
          .orderBy("event_type"),
      None,
      doc = "SURVEY A5 at scale: robust-scaler fit from the sketch — the " +
        "params table a 100 TB fit job would produce; one sketch per " +
        "group feeds median and IQR"),

    Query(
      "q_p9_winsorize_approx",
      (s, dir) => {
        val e = ev(s, dir)
        val bounds = e.groupBy(col("event_type")).agg(
          expr(s"approx_percentile(value, array(0.01, 0.99), $Accuracy)")
            .as("__p"))
          .select(col("event_type"),
            element_at(col("__p"), 1).as("__q_lo"),
            element_at(col("__p"), 2).as("__q_hi"))
        e.join(broadcast(bounds), "event_type")
          .select(col("event_type"), col("event_id"),
            round(least(greatest(col("value"), col("__q_lo")), col("__q_hi")), 4)
              .as("value_clipped"))
      },
      None,
      doc = "SURVEY P9 at scale: winsorize with sketch bounds — same broadcast " +
        "join-back shape as the exact twin, executor memory bounded"),

    // MAD gate at scale (VERDICT r5 #1: q_p_outlier_mad's exact
    // `percentile` buffers every group value twice — the same liability
    // A4/A5/P9 already fixed). Median and MAD are both percentiles, so
    // the twin is mechanical: sketch the median, join back, sketch the
    // MAD, flag. Rows-only like the other sketch twins; AccuracySpec
    // pins the flagged fraction against the exact gate.
    Query(
      "q_p_outlier_mad_approx",
      (s, dir) => {
        val e = ev(s, dir)
        val med = e.groupBy(col("event_type"))
          .agg((round(expr(s"approx_percentile(value, 0.5, $Accuracy)"), 4)
            + lit(0.0)).as("med"))
        val withMed = e.join(broadcast(med), "event_type")
        val mad = withMed.groupBy(col("event_type"))
          .agg((round(
            expr(s"approx_percentile(abs(value - med), 0.5, $Accuracy)"), 4)
            + lit(0.0)).as("mad"))
        withMed.join(broadcast(mad), "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum((abs(col("value") - col("med")) * lit(0.6745)
              > col("mad") * lit(3.5)).cast("long")).as("n_out"))
          .select(col("event_type"), col("n"), col("n_out"),
            (round(col("n_out") / col("n"), 4) + lit(0.0)).as("out_frac"))
          .orderBy("event_type")
      },
      None,
      doc = "SURVEY P-outlier at scale: MAD robust gate (modified z) on " +
        "quantile sketches — O(1e4·log n) state per group instead of two " +
        "full exact-percentile buffers; same broadcast-params plan shape " +
        "as the exact twin q_p_outlier_mad"),

    Query(
      "q_a2_distinct_approx",
      (s, dir) =>
        // r15: HLL++ through the binary-buffer form — Spark's built-in
        // declares 1,639 buffer attributes at rsd 0.01 and every task of
        // every execution paid ~1.3-2.3 s of data-independent projection
        // plumbing over that width (measured in A2PhaseProbe; identical
        // at 100k and 10M rows). HllPlusPlusBinary delegates update/
        // merge/query verbatim to Spark's own HyperLogLogPlusPlusHelper
        // over one binary buffer: bit-identical estimates (HllBinarySpec
        // pins equality against the built-in), same O(kB)-per-group
        // sketch posture at 100 TB.
        ev(s, dir).groupBy(col("event_type")).agg(
          hllBinary(col("user_id"), 0.01).as("approx_users"))
          .orderBy("event_type"),
      None,
      doc = "SURVEY A2 at scale: HyperLogLog++ distinct-user counts (rsd 1%) " +
        "— O(kB) sketch per group vs the exact distinct's full shuffle of " +
        "the key universe; rows-only (engines' sketches differ), bounds " +
        "pinned in AccuracySpec"),

    Query(
      "q_a3_salted_summary",
      (s, dir) =>
        graft.ops.SkewSafe.saltedSummary(ev(s, dir), "event_type",
          "event_id", "value", buckets = 32)
          .select(col("event_type"),
            round(col("sum_value"), 2).as("sum_value"), col("n"),
            col("min_value"), col("max_value"))
          .orderBy("event_type"),
      Some("""SELECT event_type, ROUND(SUM(value), 2) AS sum_value, COUNT(*) AS n,
             |  MIN(value) AS min_value, MAX(value) AS max_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "skew-safe A3: two-phase salted aggregation (32 sub-groups per " +
        "key, combine partials) — identical result to the direct groupBy, " +
        "oracle is the direct SQL; the hot-key shuffle mitigation at 100 TB"),

    Query(
      "q_s_curriculum_phases_approx",
      (s, dir) => {
        import graft.text.TextAnalysis
        // the declared 100 TB path for q_s_curriculum_phases: the tercile
        // cut fit uses the mergeable quantile sketch instead of exact
        // percentile (which buffers every quality value — measured 8× at
        // 10×); assignment and report are unchanged map-only/partial-agg
        val q = Tables(s, dir, "documents").select(col("doc_id"),
          round(TextAnalysis.qualityScore("text"), 4).as("quality"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        val cuts = broadcast(q.agg(
          expr(s"approx_percentile(quality, array(0.3333333333333333, " +
            s"0.6666666666666666), $Accuracy)").as("__c"))
          .select(
            (round(element_at(col("__c"), 1), 4) + lit(0.0)).as("c33"),
            (round(element_at(col("__c"), 2), 4) + lit(0.0)).as("c66")))
        q.crossJoin(cuts)
          .select(col("quality"), col("n_tokens"),
            when(col("quality") >= col("c66"), lit(1))
              .when(col("quality") >= col("c33"), lit(2))
              .otherwise(lit(3)).as("phase"))
          .groupBy("phase")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
            (round(min("quality"), 4) + lit(0.0)).as("q_min"),
            (round(max("quality"), 4) + lit(0.0)).as("q_max"))
          .orderBy("phase")
      },
      None,
      doc = "curriculum phases at scale: ONE quantile sketch fits both " +
        "tercile cuts (O(1e4·log n) state, merges map-side) — the " +
        "rows-only scale twin of q_s_curriculum_phases, pinned against " +
        "the exact phase populations in AccuracySpec"),

    Query(
      "q_a_active_users_approx",
      (s, dir) => {
        // The sketch twin of q_a_active_users, in the persisted-sketch-
        // table shape: ONE raw pass folds each day's users into a ~16 KiB
        // Datasketches HLL (partials absorb duplicates map-side, the
        // shuffle carries one sketch per (partition, day)); DAU reads the
        // estimate straight off the day sketch, and the trailing-7-day
        // union explodes the O(#days) SKETCH rows — never raw rows — and
        // hll_union_agg merges ≤7 registers per target day. This is the
        // level-1 frame a warehouse persists: any window (WAU/MAU) is an
        // O(window) register merge over it, history never re-scans — the
        // batch face of streaming/StreamingEngagement's register state.
        // Rows-only (engines' sketches differ); AccuracySpec pins each
        // day against the exact twin.
        val au = ev(s, dir)
          .select(to_date(col("ts")).as("d"), col("user_id"))
        val sk = au.groupBy("d")
          .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
        graft.CacheScope.retain(sk) // O(#days) x ~16 KiB (lgK=14 dense) — the persisted frame
        val maxD = sk.agg(max(col("d")).as("max_d"))
        val dau = sk.select(col("d"),
          hll_sketch_estimate(col("sk")).as("dau_approx"))
        val wau = sk
          .select(col("sk"),
            explode(sequence(lit(0), lit(6))).as("off"), col("d"))
          .select(col("sk"), date_add(col("d"), col("off")).as("day"))
          .join(broadcast(maxD), col("day") <= col("max_d"))
          .groupBy("day")
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("wau7_approx"))
        dau.join(wau, dau("d") === wau("day"))
          .select(col("d").cast("timestamp").as("day"), col("dau_approx"),
            col("wau7_approx"))
      },
      None,
      doc = "rolling active users at scale, persisted-sketch-table shape: " +
        "one raw pass folds each day into a ~16 KiB (lgK=14) Datasketches HLL " +
        "(duplicates absorbed map-side), DAU = the day sketch's estimate, " +
        "WAU = hll_union_agg over the ≤7 exploded SKETCH rows — the x7 " +
        "fanout moved from raw rows to O(#days) sketches, and any window " +
        "re-answers from the retained frame without re-scanning history; " +
        "rows-only scale twin of q_a_active_users, per-day deltas pinned " +
        "in AccuracySpec, register state matches StreamingEngagement's " +
        "continuous path")
  )
}
